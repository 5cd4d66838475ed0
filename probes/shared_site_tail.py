"""Measure the shared-site heavy tail that motivated
``run_ensemble(independent_sites=True)`` (RESULTS.md "master
equation"; `engine/ensemble.run_ensemble` docstring).

Run from the repo root:

    CKPE_PLATFORM=cpu python probes/shared_site_tail.py

The default ensemble design shares one firing-site sequence across all
members of a run (common random numbers — the dense hot path). Per-
member marginals are exact, but observables tied to RARE tape patterns
acquire a heavy-tailed per-key law: creating the pattern requires
specific site sub-sequences most 12-round draws lack, so a single-key
estimate of p(111) can read a hard zero while the across-key mean
stays exact. This probe quantifies that on the seed-2 fuzz rule from
`tests/test_master.py` against the EXACT discrete round kernel
(I + Q/L at E=1, `engine/master.py`), and shows
``independent_sites=True`` restores the plain binomial floor.

Measured (n_keys=100, B=512/key, 12 rounds at L=12):

    exact p(111) after 12 rounds: 5.0e-3
    shared sites:      zero-fraction ~0.94, mean tracks exact
    independent sites: zero-fraction 0.00,  mean tracks exact
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

from chemical_kinetics_and_program_execution_tpu.engine import (
    ensemble,
    master,
)
from tests.test_master import _register_random_single_tape

SEED, SIZE_A = 2, 2
L, CL_K, ROUNDS, E = 12, 3, 12, 1
N_KEYS, B_K = 100, 512
WORD = (1, 1, 1)


def main():
    tag = _register_random_single_tape(SEED, SIZE_A)
    dm = ensemble.compile_decision_machine(tag)

    # Exact discrete kernel from the uniform ring law.
    Q = master.build_ring_generator(tag, L)
    S = SIZE_A ** L
    p = np.full(S, 1.0 / S)
    for _ in range(ROUNDS):
        p = p + (Q @ p) / L
    marg = master.state_window_marginals(p, L, SIZE_A, CL_K)
    rank = 0
    for s in WORD:
        rank = rank * SIZE_A + s
    exact = float(marg[rank])
    print(f"exact p{WORD} after {ROUNDS} rounds (I + Q/L kernel): "
          f"{exact:.4e}")

    for independent in (False, True):
        vals = []
        for kk in range(N_KEYS):
            key = jax.random.PRNGKey(100 + 37 * SEED + kk)
            dtape = jax.random.randint(jax.random.fold_in(key, 0),
                                       (B_K, L), 0, SIZE_A,
                                       dtype=np.int32)
            ptape = np.zeros((B_K, L), np.int32)
            (_, dtape), _ = ensemble.run_ensemble(
                jax.random.fold_in(key, 1), (ptape, dtape), dm,
                (ROUNDS, E), independent_sites=independent)
            w = np.asarray(ensemble.weighted_window_counts(
                np.asarray(dtape), np.full(B_K, 1.0 / B_K), SIZE_A,
                CL_K))
            vals.append(float(w[rank]))
        vals = np.asarray(vals)
        mode = "independent" if independent else "shared     "
        print(f"{mode} sites: zero-fraction "
              f"{float((vals == 0).mean()):.2f}  mean {vals.mean():.4e}"
              f"  (sem {vals.std(ddof=1) / np.sqrt(N_KEYS):.1e})")


if __name__ == "__main__":
    main()
