"""Twin-engine cross-check: exact SPD closure vs stochastic tape frontier.

The framework computes the same physics two ways that share no code
path: the EXACT engine integrates the window-probability closure ODE
(the reference's formulation, `tape_multiverse.scm`), while the
ENSEMBLE engine evolves a weighted frontier of concrete tapes with
sampled branching (`engine/ensemble.py`, the headline-bench kernel).
This script runs both on the ex2 ferromagnet and overlays the
time-resolved island probabilities p(D U^L D)(t): the frontier's
weighted window statistics must track the exact closure within
sampling error at every snapshot — a physics-level validation of the
stochastic engine as a scientific instrument, not just a benchmark.

Time calibration: one stratified round fires each site with probability
E/L, so it advances Poisson-clock time by dt = −log(1 − E/L) per round
(the rule fires once per site per unit time in the exact semantics).
E (events per round) is therefore the frontier's TIME STEP: sites fired
in the same round are lattice-separated, so adjacent-site event
sequences inside one round window are excluded — measured on this
workload as a −2.3% bias on p(D U³ D) at E=8 (dt≈0.065), and at the
sampling-noise floor (±0.4%) for E ≤ 4. This script runs E=4.

Runs in ~1 min on one CPU; sizes scale up via CKPE_EX2CC_K.
"""

import math
import os

import numpy as np

import _common
from _common import finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
    markov_tapes,
)
from chemical_kinetics_and_program_execution_tpu.engine import ensemble
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG = "ex2-ferromagnetic-chain"
CL_K = 5
K = int(os.environ.get("CKPE_EX2CC_K", "8192"))
L, E = 128, 4
# Reduced smoke runs write suffixed artifacts; never overwrite the
# committed full-scale ones (CLAUDE.md convention).
SUFFIX = "" if K == 8192 else f"_k{K}"
ROUNDS_PER_SNAP = 32  # one merge/resample pass per snapshot
N_SNAPS = 40
N_SEEDS = 4
LENGTHS = (1, 2, 3)


def frontier_trajectory(seed, p0, dt_round):
    """One seed's frontier run; returns [N_SNAPS+1, size] empirical SPDs."""
    import jax
    import jax.numpy as jnp

    dm = ensemble.compile_decision_machine(TAG)
    key = jax.random.PRNGKey(seed)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), p0, 2, CL_K, K, L)
    ptape = jnp.zeros((K, L), jnp.int8)
    lw = jnp.full((K,), -math.log(K), jnp.float64)
    spds = [np.asarray(
        ensemble.weighted_window_counts(dtape, jnp.exp(lw), 2, CL_K))]
    for snap in range(N_SNAPS):
        (ptape, dtape), lw, _ = ensemble.run_weighted_frontier_blocked(
            jax.random.fold_in(key, 1 + snap), (ptape, dtape), lw, dm,
            (1, ROUNDS_PER_SNAP, E))
        spds.append(np.asarray(
            ensemble.weighted_window_counts(dtape, jnp.exp(lw), 2, CL_K)))
    return np.stack(spds)


def island_probs(spds, ts):
    """p(D U^L D) per snapshot for each island length."""
    out = {}
    for length in LENGTHS:
        out[length] = np.array([
            float(np.squeeze(markov_tapes.seq_prob(
                s.reshape((2,) * CL_K), (0, *((1,) * length), 0))[0]))
            for s in spds
        ])
    return out


def main():
    dt_round = -math.log1p(-E / L)
    dt_snap = ROUNDS_PER_SNAP * dt_round
    ts = np.arange(N_SNAPS + 1) * dt_snap
    p0 = ferromagnet_p0(CL_K, p_pair=1 / 250).ravel()

    # Exact closure trajectory on the snapshot grid.
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    exact_ys = _common.cached(
        f"ex2_ensemble_crosscheck_exact{SUFFIX}.npz",
        lambda: np.asarray(
            solve(lambda y, t: fn(y), p0, ts, rtol=1e-10, atol=1e-12)),
        ts=ts)
    exact = island_probs(exact_ys, ts)

    # Frontier trajectories (stochastic twin), N_SEEDS independent runs.
    emp_spds = _common.cached(
        f"ex2_ensemble_crosscheck_frontier{SUFFIX}.npz",
        lambda: np.stack([
            frontier_trajectory(s, p0, dt_round) for s in range(N_SEEDS)
        ]))
    emp = [island_probs(emp_spds[s], ts) for s in range(N_SEEDS)]

    fig, ax = new_fig(figsize=(16, 10), grid=False)
    colors = {1: "k", 2: "r", 3: "b"}
    worst = 0.0
    for length in LENGTHS:
        c = colors[length]
        ax.plot(ts, log10(exact[length]), c + "-",
                label=f"exact closure, L={length}")
        runs = np.stack([emp[s][length] for s in range(N_SEEDS)])
        mean = runs.mean(axis=0)
        ax.fill_between(ts, log10(runs.min(axis=0)),
                        log10(runs.max(axis=0)), color=c, alpha=0.15)
        ax.plot(ts, log10(mean), c + "--",
                label=f"tape frontier (K={K}, {N_SEEDS} seeds)")
        rel = np.abs(mean - exact[length]) / np.maximum(exact[length],
                                                        1e-12)
        worst = max(worst, float(rel[1:].max()))
        print(f"L={length}: max rel deviation of seed-mean from exact "
              f"= {rel[1:].max():.3f}")
    # Self-validating: the seed-mean must track the exact closure.
    # Sampling error at K*L*N_SEEDS ~ 4M window draws and p >= 3e-3
    # puts the statistical floor well under 10% at the full K=8192;
    # reduced smoke runs scale the gate by the Monte-Carlo 1/sqrt(K).
    gate = 0.10 * max(1.0, math.sqrt(8192 / K))
    assert worst < gate, (
        f"frontier diverged from exact closure: {worst} (gate {gate:.3f})")
    ax.set_title("ex2: exact SPD closure vs stochastic tape frontier")
    finish(fig, ax, f"ex2_ensemble_crosscheck{SUFFIX}.pdf",
           ylabel=r"$\log_{10} p(\mathrm{D\,U^L\,D})$")


if __name__ == "__main__":
    main()
