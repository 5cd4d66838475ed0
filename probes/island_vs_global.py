"""Island vs global frontier estimator quality (VERDICT round-1 item #7).

Quantifies the design claim in `parallel/sharding.py` (island-mode
sharded frontier): that independent per-device islands give a
competitive (lower-variance) estimator of the SPD compared to one
global top-k beam of the same total width — and how both compare to the
blocked merge-resample frontier.

Method: ex2 ferromagnet at cl_k=3 from the corrected pair p0, evolved to
t = 2.0. Ground truth = the exact dense SPD ODE at rtol 1e-10. Each
estimator runs at total width K with S seeds; we report the mean and
spread of the L1 and Linf errors of the weighted window statistics.

Run on CPU:  CKPE_PLATFORM=cpu python probes/island_vs_global.py
Writes results to stdout; DESIGN.md records the numbers.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu import (  # noqa: E402
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    ensemble,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E402
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import (  # noqa: E402
    solve,
)

TAG = "ex2-ferromagnetic-chain"
CL_K = 3
K = 256
L = 128
T_END = 2.0
SEEDS = int(os.environ.get("PROBE_SEEDS", "8"))


def exact_spd(p0, t_end):
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0.0, t_end, 3),
               rtol=1e-10, atol=1e-12)
    return np.asarray(ys[-1])


def errs(p_emp, p_exact):
    d = np.abs(np.asarray(p_emp) - p_exact)
    return d.sum(), d.max()


def run_global(key, p0, dtab, steps):
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), p0, 2, CL_K, K, L)
    pt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K))
    (_, dt2), lw = ensemble.run_weighted_frontier(
        jax.random.fold_in(key, 1), (pt, dtape), lw, dtab, steps, K)
    return ensemble.weighted_window_counts(dt2, jnp.exp(lw), 2, CL_K)


def run_global_merge(key, p0, dtab, steps):
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), p0, 2, CL_K, K, L)
    pt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K))
    (_, dt2), lw = ensemble.run_weighted_frontier(
        jax.random.fold_in(key, 1), (pt, dtape), lw, dtab, steps, K, 4)
    return ensemble.weighted_window_counts(dt2, jnp.exp(lw), 2, CL_K)


def run_islands(key, p0, dtab, steps, n_islands):
    k_loc = K // n_islands
    outs = []
    for i in range(n_islands):
        ki = jax.random.fold_in(key, 100 + i)
        dtape = ensemble.sample_tapes_from_spd(
            jax.random.fold_in(ki, 0), p0, 2, CL_K, k_loc, L)
        pt = jnp.zeros((k_loc, L), jnp.int32)
        lw = jnp.full((k_loc,), -math.log(k_loc))
        (_, dt2), lw = ensemble.run_weighted_frontier(
            jax.random.fold_in(ki, 1), (pt, dtape), lw, dtab, steps, k_loc)
        outs.append(np.asarray(
            ensemble.weighted_window_counts(dt2, jnp.exp(lw), 2, CL_K)))
    return np.mean(outs, axis=0)  # uniform island mixture


def run_blocked(key, p0, dm, tau):
    E = 8
    dt_round = -math.log1p(-E / L)
    rounds = 4
    blocks = max(1, round(T_END / (dt_round * rounds)))
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), p0, 2, CL_K, K, L)
    pt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K))
    (_, dt2), lw, _ = ensemble.run_weighted_frontier_blocked(
        jax.random.fold_in(key, 1), (pt, dtape), lw, dm,
        (blocks, rounds, E), tau=tau)
    t_eff = blocks * rounds * dt_round
    return ensemble.weighted_window_counts(dt2, jnp.exp(lw), 2, CL_K), t_eff


def main():
    p0 = ferromagnet_p0(CL_K, p_pair=0.05, corrected=True).ravel()
    dtab = ensemble.device_table(ensemble.compile_transition_table(TAG))
    dm = ensemble.compile_decision_machine(TAG)
    steps = int(round(T_END * L))
    p_exact = exact_spd(p0, T_END)
    # The blocked mode quantises t to whole rounds; use its effective t
    # for ITS ground truth.
    _, t_eff = run_blocked(jax.random.PRNGKey(0), p0, dm, 1.0)
    p_exact_b = exact_spd(p0, t_eff)
    print(f"K={K} L={L} t={T_END} (blocked t={t_eff:.3f}) seeds={SEEDS}")

    rows = {}
    for name, fn, ref in [
        ("global beam (per-step)", lambda k: run_global(k, p0, dtab, steps),
         p_exact),
        ("global beam + merge4", lambda k: run_global_merge(
            k, p0, dtab, steps), p_exact),
        ("islands 4x64", lambda k: run_islands(k, p0, dtab, steps, 4),
         p_exact),
        ("islands 16x16", lambda k: run_islands(k, p0, dtab, steps, 16),
         p_exact),
        ("blocked tau=1.0", lambda k: run_blocked(k, p0, dm, 1.0)[0],
         p_exact_b),
        ("blocked tau=0.5", lambda k: run_blocked(k, p0, dm, 0.5)[0],
         p_exact_b),
    ]:
        l1s, lis = [], []
        for s in range(SEEDS):
            l1, li = errs(fn(jax.random.PRNGKey(7 + s)), ref)
            l1s.append(l1)
            lis.append(li)
        rows[name] = (np.mean(l1s), np.std(l1s), np.mean(lis), np.max(lis))
        m = rows[name]
        print(f"{name:26s} L1 {m[0]:.4f} ± {m[1]:.4f}   "
              f"Linf mean {m[2]:.4f} max {m[3]:.4f}", flush=True)


if __name__ == "__main__":
    main()
