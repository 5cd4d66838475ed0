"""Decompose the K=10^7 blocked-frontier block: rounds vs merge
(round-3 verdict weak #3: the 1e7-tape frontier runs 3.5e9
branch-steps/s vs 4.7e9 at K=10^6 with no account of where the 26%
goes).

One bench block = `_blocked_rounds` (512 stratified rounds on [E, K]
planes) + `_blocked_merge` (content hash + sort-based merge-by-key +
systematic slot resample over K members). Times each piece separately
at K=10^6 and K=10^7 (bench geometry: ex2, L=64, E=4, tau=1) with the
repeat-min methodology, and reports the implied no-merge rate — if
merge dominates the gap, rarer cadence or a cheaper dedup is the fix;
if the rounds themselves slow down, it's an HBM-residency effect.

Run ON THE ACCELERATOR:  python probes/frontier1e7_decompose.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    ensemble,
)

ROUNDS, EVENTS, L = 512, 4, 64


def timed(fn, reps=5):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    stride = L // EVENTS
    for K in (1_000_000, 10_000_000):
        pt = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0, 3,
                                dtype=jnp.int8)
        pp = ensemble._to_planes_t(pt, stride=stride)
        dd = ensemble._to_planes_t(jnp.zeros((K, L), jnp.int8),
                                   stride=stride)
        lw = jnp.full((K,), -np.log(K), jnp.float64)

        state = [pp, dd, lw]

        def rounds_call(i=[0]):
            i[0] += 1
            pp, dd, lw = ensemble._blocked_rounds(
                jax.random.fold_in(jax.random.PRNGKey(1), i[0]),
                state[0], state[1], state[2], dm,
                rounds=ROUNDS, tau=1.0)
            jax.block_until_ready(lw)
            float(jnp.sum(pp[0][..., :1].astype(jnp.float32)))
            state[:] = [pp, dd, lw]

        def merge_call(i=[0]):
            i[0] += 1
            pp, dd, lw, nu = ensemble._blocked_merge(
                jax.random.fold_in(jax.random.PRNGKey(2), i[0]),
                state[0], state[1], state[2])
            float(jnp.sum(lw)) + float(nu)
            state[:] = [pp, dd, lw]

        t_rounds = timed(rounds_call)
        t_merge = timed(merge_call)
        block = t_rounds + t_merge
        per = K * ROUNDS * EVENTS
        print(f"K={K:.0e}: rounds {t_rounds:.3f} s "
              f"({per / t_rounds:.3e} steps/s rounds-only), "
              f"merge {t_merge:.3f} s "
              f"({100 * t_merge / block:.1f}% of block), "
              f"block {block:.3f} s -> {per / block:.3e} steps/s",
              flush=True)


if __name__ == "__main__":
    main()
