"""First-passage analysis on the tape ensemble: time to first U-island
of length 4 in the ex2 ferromagnet, starting from pair soup.

The exact engine evolves the MEAN window distribution, which cannot
distinguish "a UUUU island has appeared somewhere by time t" from its
occupancy at t — first-passage questions are only posable on concrete
tapes. `ensemble.first_passage_times` evolves B independent rings in
lockstep and records each member's first hit (resolution: one
stratified round). This script plots the first-passage survival curve
S(t) = P(no UUUU yet) and, for contrast, the exact closure's occupancy
proxy p(D U⁴ D)(t) — the two curves answer different questions and
visibly differ.

Runs in ~30 s on one CPU.
"""

import math
import os

import numpy as np

import _common
from _common import finish, new_fig
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

TAG, CL_K = "ex2-ferromagnetic-chain", 6
B = int(os.environ.get("CKPE_EX2FP_B", "4096"))
L, E, ROUNDS = 128, 4, 4800
PATTERN = (1, 1, 1, 1)  # U U U U
# Reduced smoke runs write suffixed artifacts; never overwrite the
# committed full-scale ones (CLAUDE.md convention).
SUFFIX = "" if B == 4096 else f"_b{B}"


def main():
    import jax
    import jax.numpy as jnp

    p0 = ferromagnet_p0(CL_K, p_pair=0.02, corrected=True).ravel()
    dm = ensemble.compile_decision_machine(TAG)
    dt_round = -math.log1p(-E / L)
    t_max = ROUNDS * dt_round

    def compute():
        dtape = ensemble.sample_tapes_from_spd(
            jax.random.PRNGKey(0), p0, 2, CL_K, B, L)
        ptape = jnp.zeros((B, L), jnp.int8)
        t_hit, hit, _ = ensemble.first_passage_times(
            jax.random.PRNGKey(1), (ptape, dtape), dm, PATTERN,
            (ROUNDS, E))
        return np.asarray(t_hit)

    t_hit = _common.cached(f"ex2_first_passage{SUFFIX}.npz", compute,
                           key="t_hit")
    frac_hit = np.isfinite(t_hit).mean()
    if frac_hit > 0:
        print(f"hit fraction within t={t_max:.1f}: {frac_hit:.3f}; "
              f"median first-passage "
              f"t={np.median(t_hit[np.isfinite(t_hit)]):.2f}")
    else:
        print(f"hit fraction within t={t_max:.1f}: 0 — no member hit; "
              "increase ROUNDS or B")

    ts = np.linspace(0.0, t_max, 200)
    surv = np.array([(t_hit > t).mean() for t in ts])

    # Late-time regime: survivors sit in the field-suppressed
    # quasi-equilibrium and UUUU formation is a rare fluctuation, so
    # S(t) decays exponentially — the tail slope is the per-tape island
    # NUCLEATION RATE, an observable only the first-passage formulation
    # exposes (occupancy saturates instead). Fit only where S > 0 (at
    # small B every member can hit before t_max, zeroing the tail).
    tail = (ts > 0.5 * t_max) & (surv > 0)
    if tail.sum() >= 2:
        rate = -np.polyfit(ts[tail], np.log(surv[tail]), 1)[0]
        print(f"late-time island nucleation rate per tape: {rate:.3e} "
              f"(1/time; L={L} sites)")
    else:
        print("late-time tail fully absorbed — no nucleation-rate fit "
              f"(B={B} too small for the survival tail)")

    # Exact closure occupancy proxy: p(D U^4 D)(t) needs cl_k >= 6.
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    ys = solve(lambda y, t: fn(y), p0, ts, rtol=1e-9, atol=1e-11)
    occ = np.array([
        float(np.squeeze(markov_tapes.seq_prob(
            np.asarray(y).reshape((2,) * CL_K), (0, 1, 1, 1, 1, 0))[0]))
        for y in ys
    ])

    fig, ax = new_fig(figsize=(14, 8))
    ax.plot(ts, surv, "k-",
            label=f"ensemble: P(no UUUU island yet) (B={B}, L={L})")
    ax.plot(ts, 1.0 - occ * L, "r--",
            label=r"closure proxy: $1 - L\cdot p(\mathrm{DU^4D})(t)$"
                  " (occupancy, not first passage)")
    ax.set_ylim(-0.02, 1.02)
    ax.set_title("ex2: first passage to a length-4 island")
    finish(fig, ax, f"ex2_first_passage{SUFFIX}.pdf", ylabel="survival")


if __name__ == "__main__":
    main()
