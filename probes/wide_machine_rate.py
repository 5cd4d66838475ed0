"""Blocked-frontier rate on WIDE decision machines (round 3).

The adaptive packing (`ensemble.compile_decision_machine`) lifts the
63-spec / 16-symbol / 2^15-state cliffs, so rules that previously only
had the gather-heavy table (or, like ex6-lite at 12^7 table rows, no
fast engine at all) now run the blocked weighted frontier. Run ON THE
ACCELERATOR:

    python probes/wide_machine_rate.py

Measured 2026-08-20 (TPU v5 lite, K=10^6, L=64, merge every 512x4
transitions, differenced over blocks 1 vs 4):

  fuzz-wide-specs   (199 specs, 276 states): 3.17e9 branch-steps/s
  ex6-mini-bff-lite ( 85 specs, 262 states): 4.31e8 branch-steps/s
                                  round 4:   3.34e9 branch-steps/s

Rate evolution on the fuzz rule: 6.11e7 with per-NODE FSM cascades
(the 144 hash-consed choose continuations each paid their own
where-cascade) -> 5.50e8 after the same-distribution choose grouping
in `ensemble._machine_specs_planes_leveled` (9.0x) -> 3.17e9 once the
same grouping made the rule SAMPLEABLE and the blocked rounds engage
the bit-sliced sampling circuit (`bitslice.machine_is_sampleable` now
counts branch bits per DISTINCT distribution; 5.8x more, 52x total).

Round 3's remaining cliff — ex6-lite's 28-bit window exceeded the
whole-level tabulation cap, keeping it on the (grouped) FSM walk at
4.31e8 — fell in round 4: the SPLIT synthesis (one sub-table per
cell/distribution group, `bitslice._compile_sampling_circuit`) makes
the rule sampleable at ~11k ops and the same command measured
**3.339e9 branch-steps/s (7.7x)** on 2026-08-20, level with its
spec-wide sibling. Driver-captured each round as bench family
`frontier_wide_lite`.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from chemical_kinetics_and_program_execution_tpu.engine import ensemble
import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401


def main():
    for tag, L in (("fuzz-wide-specs", 64), ("ex6-mini-bff-lite", 64)):
        dm = ensemble.compile_decision_machine(tag)
        K, rounds, events = 1_000_000, 512, 4
        pt = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0,
                                dm.size_a, dtype=jnp.int8)
        dtp = jnp.zeros((K, L), jnp.int8)
        lw0 = jnp.full((K,), -np.log(K), jnp.float64)
        times = {}
        for b in (1, 4):
            ts = []
            for i in range(3):
                t0 = time.time()
                (p, d), lw, nu = ensemble.run_weighted_frontier_blocked(
                    jax.random.fold_in(jax.random.PRNGKey(2),
                                       b * 131 + i),
                    (pt, dtp), lw0, dm, (b, rounds, events))
                float(jnp.sum(p.astype(jnp.int64))) + float(jnp.sum(lw))
                ts.append(time.time() - t0)
            times[b] = min(ts[1:])
            print(tag, "blocks", b, ["%.3f" % t for t in ts],
                  flush=True)
        rate = K * rounds * events * (4 - 1) / (times[4] - times[1])
        print(f"{tag} ({dm.num_specs} specs, {dm.n_states} states): "
              f"{rate:.3e} branch-steps/s", flush=True)


if __name__ == "__main__":
    main()
