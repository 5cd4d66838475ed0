"""Stationarity probe for the soup error-threshold claims.

The committed `examples/ex6_bff_mutation.py` sweep reads the final
state at t ≈ 10 (640 rounds). This probe runs 3× longer (1920 rounds,
t ≈ 30) at the three decisive mutation rates to check that the
threshold location is not a finite-time artifact: below threshold
(mu=1e-3) the replicator's coverage must persist or grow, above
(mu=2e-2) it must stay extinct, and at the crossover (mu=3e-3) the
direction of drift between t=10 and t=30 tells whether the t=10 value
over- or under-states the stationary coverage.

Usage: CKPE_PLATFORM=cpu python probes/soup_stationarity.py
Quoted in RESULTS.md ("Error threshold under background mutation").
"""

import math
import os
import sys

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "examples"))

from chemical_kinetics_and_program_execution_tpu.engine import bff  # noqa: E402
from ex6_bff_self import KGRAM, kgram_census  # noqa: E402

TAG = "ex6-mini-bff-self"
B, L, E = 1024, 256, 4
CHECKS = (640, 1280, 1920)  # rounds at which to read coverage
MUS = (0.0, 1e-3, 3e-3, 2e-2)


def main():
    import jax

    m = bff.compile_bff(TAG)
    size_a = m.size_a
    dot8 = sum(m.dot * size_a ** i for i in range(KGRAM))
    dt_round = -math.log1p(-E / L)
    key = jax.random.PRNGKey(17)
    print(f"B={B}, L={L}, E={E}; checks at t = "
          f"{[f'{r * dt_round:.1f}' for r in CHECKS]}")
    for mi, mu in enumerate(MUS):
        tape = jax.random.randint(jax.random.fold_in(key, 2000 + mi),
                                  (B, L), 0, size_a, dtype=np.int32)
        done = 0
        row = []
        for r in CHECKS:
            tape, _ = bff.run_ensemble_bff(
                jax.random.fold_in(key, 300 * mi + r), tape, m,
                (r - done, E), mutation_rate=mu)
            done = r
            t_np = np.asarray(tape)
            ranks, counts = kgram_census(t_np, KGRAM, size_a)
            hit = counts[ranks == dot8]
            cov = (hit[0] / t_np.size) if hit.size else 0.0
            cd = ((t_np == m.dot) | (t_np == m.comma)).mean()
            row.append((r * dt_round, cov, cd))
        print(f"mu={mu:g}: " + "; ".join(
            f"t={t:.1f}: dot8 {c:.4f}, copy {d:.3f}" for t, c, d in row))


if __name__ == "__main__":
    main()
