"""Dual-SPD chemical Turing machine: fuel solution and machine tape as
separate ensembles (beyond the reference's shared distribution).

The reference's ex4 p0 mixes fuel (P/X in solvent) and machine tape
(cursor + I/O bits) into ONE window distribution weighted by
``tape_fraction`` (`ex4_chemical_turing.py:44-83`) — every tape window
statistically "contains" solvent windows and vice versa, because both
tapes must share one SPD (`tape_multiverse.scm:441-442`). The dual-SPD
engine removes the compromise: the program tape carries a PURE
solvent/fuel distribution and the data tape a PURE tape/cursor
distribution. This script sweeps the fuel richness (powered fraction)
alone — machine-tape statistics held exactly fixed — and plots the
machine's execution products p(IOID) and cursor advancement on the
data half against fuel depletion p(P) -> p(X) on the program half: a
clean fuel-dose/response curve the shared model can only approximate
by reweighting both phases at once.

Runs in a few minutes on one CPU (cl_k=4, dense dual engine).
"""

import numpy as np

import _common
from _common import finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.engine import dense
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, CL_K, SIZE_A = "ex4-chemical-turing", 4, 9
T_MAX, N_SAMPLES = 2000.0, 401
POWERED = (0.01, 0.04, 0.16)
STYLES = {0.01: ":", 0.04: "--", 0.16: "-"}


def main():
    dual = dense.compile_dense_dual(TAG, CL_K)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    half = SIZE_A**CL_K
    ts = np.linspace(0.0, T_MAX, N_SAMPLES)

    # Machine half: pure tape phase (random 0/1 content, dilute cursor).
    p_tape = chemical_turing_p0(
        CL_K, tape_fraction=1.0, cursor_fraction=0.001, random01=True
    ).ravel()

    def run(pf):
        p_fuel = chemical_turing_p0(
            CL_K, tape_fraction=0.0, powered_fraction=pf).ravel()
        y0 = np.concatenate([p_fuel, p_tape])
        return np.asarray(solve(lambda y, t: fn(y), y0, ts,
                                rtol=1e-9, atol=1e-12, method="dop853"))

    fig, ax = new_fig(figsize=(14, 9))
    for pf in POWERED:
        ys = _common.cached(f"ex4_dual_fuel_pf{pf}.npz",
                            lambda pf=pf: run(pf), ts=ts)
        sty = STYLES[pf]
        fuel, tape = ys[:, :half], ys[:, half:]

        def seq(rows, s):
            return np.array([
                float(np.squeeze(markov_tapes.seq_prob(
                    r.reshape((SIZE_A,) * CL_K), s)[0]))
                for r in rows
            ])

        # Execution product on the machine tape: I O I D (= the written
        # bit trail behind an advanced cursor, `ex4var1` plot motif).
        ax.plot(ts[1:], log10(seq(tape, (4, 5, 4, 3))[1:]), sty + "r",
                label=f"p(IOID) data, powered={pf}")
        cursor_d = seq(tape, (3,))
        ax.plot(ts[1:], log10(cursor_d[1:]), sty + "m",
                label=f"p(D cursor) data, powered={pf}")
        ax.plot(ts[1:], log10(seq(fuel, (7,))[1:]), sty + "b",
                label=f"p(X spent) fuel, powered={pf}")
        # Endpoints saturate at the cursor density (every cursor
        # eventually completes); the fuel dose controls the RATE.
        t_half = float(np.interp(0.5 * cursor_d[-1], cursor_d, ts))
        print(f"powered={pf}: p(IOID)_final={seq(tape, (4, 5, 4, 3))[-1]:.6e}"
              f"  p(D)_final={cursor_d[-1]:.6e}"
              f"  t_half(D)={t_half:.1f}")
    ax.set_title("ex4 dual-SPD: machine response to fuel dose "
                 "(tape ensemble held fixed)")
    finish(fig, ax, "ex4_dual_fuel.pdf")


if __name__ == "__main__":
    main()
