"""Dual-SPD copolymerization: monomer soup and polymer strand as
SEPARATE tape ensembles (beyond the reference's shared distribution).

In the reference every reveal — monomer soup (program tape) or polymer
strand (data tape) — draws from ONE sequence distribution
(`tape_multiverse.scm:441-442, 1424-1443`). The dual-SPD engine
(`engine/compile.compile_problem_dual`) lifts that restriction: each
tape carries its own SPD, reveals use that tape's marginal pyramid, and
each tape's changed windows flow into its own dp/dt — with the exact
consistency guarantee that at equal distributions the two halves sum to
the shared engine's dy/dt (`tests/test_dual.py`).

Here the soup starts monomer-RICH (p_a=0.06) while the strand ensemble
starts at the reference's dilute p0 (p_a=0.02). The richer soup feeds
faster chain growth on the strand than the shared-SPD model predicts at
either density — a physics question (what if the feedstock and the
polymer have different statistics?) the reference cannot pose.

Runs in ~1 min on one CPU.
"""

import numpy as np

import _common
from _common import finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.engine import dense
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    copolymerization_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, CL_K, SIZE_A = "ex3-copolymerization", 5, 4
T_MAX, N_SAMPLES = 1000.0, 401
P_A_SOUP, P_A_STRAND = 0.06, 0.02

# Chain motifs on the strand: A bonded to M/N comonomers (O=0 A=1 M=2 N=3).
MOTIFS = [((1, 2), "-r", "p(AM)"), ((1, 3), "-b", "p(AN)"),
          ((2, 1, 3), "--m", "p(MAN)")]


def main():
    # Dense transfer-matrix engine, dual mode (the flagship kernel).
    dual = dense.compile_dense_dual(TAG, CL_K)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    half = SIZE_A**CL_K

    def rhs(y, t):
        return fn(y)

    ts = np.linspace(0.0, T_MAX, N_SAMPLES)

    def run(p_a_soup):
        y0 = np.concatenate([
            copolymerization_p0(CL_K, p_a=p_a_soup).ravel(),
            copolymerization_p0(CL_K, p_a=P_A_STRAND).ravel(),
        ])
        return np.asarray(solve(rhs, y0, ts, rtol=1e-9, atol=1e-11,
                                method="dop853"))

    ys_rich = _common.cached("ex3_dual_tape_rich.npz",
                             lambda: run(P_A_SOUP), ts=ts)
    ys_same = _common.cached("ex3_dual_tape_same.npz",
                             lambda: run(P_A_STRAND), ts=ts)

    fig, ax = new_fig(figsize=(14, 9))
    for seq, style, label in MOTIFS:
        for ys, lw, suffix in ((ys_rich, 3.0, f" (soup p_a={P_A_SOUP})"),
                               (ys_same, 1.2, f" (soup p_a={P_A_STRAND})")):
            strand = ys[:, half:]
            probs = np.array([
                float(np.squeeze(markov_tapes.seq_prob(
                    s.reshape((SIZE_A,) * CL_K), seq)[0]))
                for s in strand
            ])
            ax.plot(ts[1:], log10(probs[1:]), style, linewidth=lw,
                    label=label + suffix)
            print(f"{label}{suffix}: p_final={probs[-1]:.6e}")
    ax.set_title("ex3 dual-SPD: strand chain motifs vs soup density")
    finish(fig, ax, "ex3_dual_tape.pdf")


if __name__ == "__main__":
    main()
