"""Conservatism range of the closure-defect meter on ex5 (RESULTS.md
'Closure error without the bigger solve', 'Conservatism range: ex5'
row).

Run from `examples/` (needs the committed k5/k7 trajectory artifacts):

    cd examples && CKPE_PLATFORM=cpu python ../probes/ex5_conservatism.py

Measures the three numbers the RESULTS row states:

1. ν(t) along the committed ex5 cl_k=5 trajectory (complex-step
   tangent, `ops/closure.closure_defect`) — holds steady at ~1.6e-4.
2. The same ν via a LOCAL central finite difference of the extension
   tangent (implemented here; the library path is complex-step only).
   Agreement (rel ≤ 3e-11 at every t>0 checkpoint) shows the defect
   is genuine off-manifold flow, not a guard-boundary artifact of
   either differentiation scheme. The ONE checkpoint where they
   disagree (t=0, rel 0.5) is the expected boundary case: the sparse
   initial machine state sits ON zero-support guard boundaries, where
   central FD straddles the branch jump while complex-step takes the
   documented one-sided tangent (`ops/closure.closure_defect`).
3. The tracked-window gap between the committed cl_k=5 and cl_k=7
   trajectories (k7 marginalised to 5-windows) — ~1e-10, solver
   tolerance.

Together: ν>0 with observables unmoved ⇒ for this machine the
off-manifold components decay without feeding the weighted windows;
ν is a CONSERVATIVE flag (sharp on ex2 per
`examples/ex2_closure_error.py`, loose under strong contraction).
"""

import sys

import numpy as np

sys.path.insert(0, "..")

from chemical_kinetics_and_program_execution_tpu.engine import build_dy_dt
from chemical_kinetics_and_program_execution_tpu.ops import closure

TAG, SIZE_A, CL_K = "ex5-msrtf-machine", 5, 5


def fd_defect(fns, p, *, h=1e-7, norm="l1"):
    """ν via central FD of the extension tangent (vs the library's
    complex-step): D extend(p)[v] ≈ (extend(p+hv) − extend(p−hv))/2h
    with v = F_k(p)."""
    fn_k, fn_k1, size_a = fns
    p = np.asarray(p, dtype=np.float64).ravel()
    v = np.asarray(fn_k(p))
    scale = h / max(np.abs(v).max(), 1e-300)
    ext_p = closure.markov_extend(p + scale * v, size_a, CL_K).ravel()
    ext_m = closure.markov_extend(p - scale * v, size_a, CL_K).ravel()
    dext = (ext_p - ext_m) / (2.0 * scale)
    f_up = np.asarray(fn_k1(
        closure.markov_extend(p, size_a, CL_K).ravel()))
    diff = f_up - dext
    return float(np.abs(diff).sum()) if norm == "l1" else float(
        np.abs(diff).max())


def main():
    ys5 = np.load("ex5_msrtf_k5.npz")["ode_ys"]
    ys7 = np.load("ex5_msrtf_k7.npz")["ode_ys"]
    assert ys5.shape[0] == ys7.shape[0]

    # (3) tracked-window k5<->k7 gap: marginalise 7-windows to 5.
    marg = ys7.reshape(ys7.shape[0], *((SIZE_A,) * 7)).sum(
        axis=(6, 7)).reshape(ys7.shape[0], -1)
    gap = np.abs(marg - ys5).max()
    print(f"k5<->k7 tracked-window gap (max over "
          f"{ys5.shape[0]} checkpoints): {gap:.3e}")

    # (1)+(2) nu along the k5 trajectory, both tangent schemes.
    fn5, _ = build_dy_dt(TAG, CL_K)
    fn7, _ = build_dy_dt(TAG, CL_K + 1)
    fns = (fn5, fn7, SIZE_A)
    idxs = range(0, ys5.shape[0], 20)
    print(" idx      nu(complex-step)        nu(central FD)    rel")
    for i in idxs:
        nu_cs = closure.closure_defect(TAG, CL_K, ys5[i],
                                       compiled_pair=fns)
        nu_fd = fd_defect(fns, ys5[i])
        rel = abs(nu_cs - nu_fd) / max(nu_cs, 1e-300)
        print(f"{i:4d}  {nu_cs:20.6e}  {nu_fd:20.6e}  {rel:.2e}")


if __name__ == "__main__":
    main()
