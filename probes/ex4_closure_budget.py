"""Closure-error budget of the flagship ex4 workload at the
reference's production choice cl_k=5 (RESULTS.md 'Closure error
without the bigger solve').

Run from `examples/` (needs the committed k5/k6 trajectory artifacts):

    cd examples && CKPE_PLATFORM=cpu python ../probes/ex4_closure_budget.py

Decomposes the measured cl_k=5 ↔ 6 trajectory gap into its two
sources, using one dense RHS call per checkpoint:

- DYNAMICAL closure error: the off-manifold defect ν(t)
  (`ops/closure.closure_defect`) along the committed cl_k=5
  trajectory. Measured ~2e-10 per unit time for t ≥ 1 (and 1.7e-4
  only at the t=0 mixture state) — over the full t=2000 horizon the
  dynamics contribute ≲4e-7: the ex4 closure manifold is essentially
  invariant, cl_k=5 is dynamically sound.
- INITIAL-CONDITION representation: |p0(cl_k=6) − extend(p0(cl_k=5))|₁
  = 5.8e-3 (one `markov_extend` call) — the cl_k=6 state encodes
  initial mixture correlations the extension of the 5-window state
  cannot, and THIS is what the observed 3.1e-4 asymptotic k-marginal
  gap (and the ~1e-4-relative observable shifts in the cl_k
  convergence tests) inherits.

Conclusion the meter makes cheap: raising ex4's cl_k buys a better
INITIAL representation, not a better propagator.
"""

import sys

import numpy as np

sys.path.insert(0, "..")

from chemical_kinetics_and_program_execution_tpu.engine import build_dy_dt
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_p0,
)
from chemical_kinetics_and_program_execution_tpu.ops import closure

TAG, SIZE_A, K = "ex4-chemical-turing", 9, 5


def main():
    fn5, _ = build_dy_dt(TAG, K)
    fn6, _ = build_dy_dt(TAG, K + 1)
    pair = (fn5, fn6, SIZE_A)
    z5 = np.load("ex4_chemical_turing_a_k5.npz")["ode_ys"]
    z6 = np.load("ex4_chemical_turing_a_k6.npz")["ode_ys"]
    # Index-as-time assumptions: k5 sampled at t=0..2000 step 1, k6 at
    # step 40 — regenerated artifacts with other grids must not pass
    # silently.
    assert z5.shape[0] == 2001 and z6.shape[0] == 51, (z5.shape,
                                                       z6.shape)

    p06 = chemical_turing_p0(K + 1, powered_fraction=0.04).ravel()
    ic = np.abs(p06 - closure.markov_extend(z5[0], SIZE_A, K).ravel())
    print(f"IC representation |p0_k6 - extend(p0_k5)|_1 = {ic.sum():.4e}")

    idxs = [0, 1, 2, 4, 8, 16, 40, 100, 400, 1200, 2000]
    nus = np.array([
        closure.closure_defect(TAG, K, z5[i], compiled_pair=pair)
        for i in idxs
    ])
    for i, nu in zip(idxs, nus):
        print(f"t={i:5d}  nu = {nu:.4e}")
    integ = np.trapezoid(nus, np.array(idxs, float))
    print(f"int nu dt over [0, 2000] ~ {integ:.3e} "
          "(dominated by the t=0 mixture spike)")

    for k6i, k5i in ((1, 40), (10, 400), (50, 2000)):
        gap = np.abs(z6[k6i].reshape((SIZE_A,) * (K + 1)).sum(axis=-1)
                     .ravel() - z5[k5i]).sum()
        print(f"true k-marginal L1 gap at t={k5i}: {gap:.4e}")

    assert nus[1:].max() < 1e-8, "dynamical defect no longer negligible"
    assert ic.sum() > 1e-3, "IC term vanished — revisit the conclusion"


if __name__ == "__main__":
    main()
