"""Trusting cl_k without solving at cl_k+1: the off-manifold defect as
a practical truncation-error meter.

The reference's only way to judge its cl_k choice is to re-run the
workload one context length up (hours at production scale). The
closure's truncation error has a computable LOCAL source: the
component of the (k+1)-flow at the Markov extension of the state that
leaves the extension manifold (`ops/closure.closure_defect`, one
cl_k+1 RHS call per checkpoint — module docstring for the math and the
exactly-zero consistency identity it builds on).

This script solves ex2 at cl_k=3 AND cl_k=4 (small enough to afford
the ground truth), and compares three curves:

- ν(t): the defect rate along the cl_k=3 trajectory;
- ∫ν dt: its accumulation — the PREDICTION available without ever
  touching cl_k=4;
- the true gap ||marg(p₄(t)) − p₃(t)||₁ from the solved cl_k=4 run.

Gates: the integral is conservative (≥ true gap, as an error-source
bound should be — decaying error components are not credited) and
sharp to within 10× over the whole window. Measured: factor 1.5–2.9.

Runs in ~1 min on one CPU. Output: `ex2_closure_error.pdf`.
"""

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve
from chemical_kinetics_and_program_execution_tpu.ops import closure

TAG, SIZE_A, K = "ex2-ferromagnetic-chain", 2, 3
TS = np.linspace(0.0, 20.0, 41)


def compute():
    fn3 = make_dy_dt(compile_problem(TAG, K))
    fn4 = make_dy_dt(compile_problem(TAG, K + 1))
    p3 = np.asarray(solve(lambda y, t: fn3(y),
                          ferromagnet_p0(K, p_pair=1 / 250).ravel(),
                          TS, rtol=1e-11, atol=1e-14))
    p4 = np.asarray(solve(lambda y, t: fn4(y),
                          ferromagnet_p0(K + 1, p_pair=1 / 250).ravel(),
                          TS, rtol=1e-11, atol=1e-14))
    nus, integ = closure.integrate_defect(
        TAG, K, TS, p3, compiled_pair=(fn3, fn4, SIZE_A))
    gaps = np.array([
        np.abs(p4[i].reshape((SIZE_A,) * (K + 1)).sum(axis=-1).ravel()
               - p3[i]).sum()
        for i in range(len(TS))
    ])
    return np.stack([nus, integ, gaps])


def main():
    nus, integ, gaps = _common.cached("ex2_closure_error.npz", compute,
                                      key="rows", ts=TS)

    fig, ax = _common.pyplot.subplots(figsize=(9, 6))
    ax.semilogy(TS[1:], nus[1:], "-", color="C2",
                label=r"defect rate $\nu(t)$ (1 RHS call each)")
    ax.semilogy(TS[1:], integ[1:], "-", color="C0",
                label=r"$\int_0^t \nu\,dt$ — predicted error budget")
    ax.semilogy(TS[1:], gaps[1:], "o", ms=4, mfc="none", color="C1",
                label=r"true gap $\|m(p_4) - p_3\|_1$ (cl_k+1 solved)")
    ax.set_xlabel("t")
    ax.set_ylabel(r"$L_1$ over length-3 windows")
    ax.set_title(f"ex2 closure truncation error at cl_k={K}: "
                 "local indicator vs ground truth")
    ax.legend(fontsize=12)
    ax.grid(alpha=0.3)

    ratio = integ[1:] / gaps[1:]
    print("integral/true-gap ratio over t in (0, 20]: "
          f"min {ratio.min():.2f}, max {ratio.max():.2f}")
    assert np.all(ratio >= 1.0), ratio.min()   # conservative
    assert np.all(ratio <= 10.0), ratio.max()  # and sharp enough

    fig.tight_layout()
    out = _common.out_path("ex2_closure_error.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
