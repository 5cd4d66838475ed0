"""Ferromagnetic chain via the tape/MPD engine, cl_k=3..7 (reference
`examples/ex2_ferromagnet_tape.py`).

Integrates the single-spin-flip rule at several context lengths, plots
island-probability curves p(0 U^L 0)(t) per cl_k, and overlays the
analytic island-population approximation
(`ex2_ferromagnet_analytic.py`, reimplemented in models/ferromagnet.py).
"""

import argparse

import numpy as np

import _common
from _common import finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.models.ferromagnet import (
    analytic_p_history,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)

T_MAX = 60.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--min-cl-k", type=int, default=3)
    ap.add_argument("--max-cl-k", type=int, default=7)
    args = ap.parse_args()

    ode_ts = np.linspace(0, T_MAX, 1001)
    histories = {}
    for cl_k in range(args.min_cl_k, args.max_cl_k + 1):
        print(f"Doing cl_k={cl_k}...")
        p0 = ferromagnet_p0(cl_k, p_pair=1 / 250)
        ys = markov_tapes.ode_integrate(
            tag="ex2-ferromagnetic-chain", size_a=2, cl_k=cl_k,
            p0=p0.ravel(), ts=ode_ts, backend=args.backend,
            odeint_kwargs=dict(rtol=1e-9, atol=1e-9),
        )
        histories[cl_k] = ys.reshape(ode_ts.shape + (2,) * cl_k)

    # Context-length comparison: p(D U^L D) over time for L=1..5.
    fig, ax = new_fig(figsize=(16, 12), grid=False)
    styles = [(7, "-"), (5, "--"), (4, "-."), (3, ":")]
    for length, color in ((1, "k"), (2, "r"), (3, "b"), (4, "g"), (5, "m")):
        for cl_k, style in styles:
            if cl_k not in histories:
                continue
            probs = markov_tapes.seq_prob(
                histories[cl_k], (0, *((1,) * length), 0),
                num_prefix_indices=1,
            )[0][1:]
            ax.plot(ode_ts[1:], log10(probs), style + color,
                    label=f"L={length}, cl_k={cl_k}")
    finish(fig, ax, "ex2_ferromagnet_tape_cl_k.pdf")

    # Comparison against the analytic island-population model.
    best_k = max(histories)
    analytic = analytic_p_history(t_max=T_MAX, t_steps=1001)
    fig, ax = new_fig(figsize=(16, 12), grid=False)
    for length, color in ((1, "k"), (2, "r"), (3, "b"), (4, "g"), (5, "m")):
        probs = markov_tapes.seq_prob(
            histories[best_k], (0, *((1,) * length), 0),
            num_prefix_indices=1,
        )[0][1:]
        ax.plot(ode_ts[1:], log10(probs), "-" + color,
                label=f"L={length} (tape, cl_k={best_k})")
        ax.plot(ode_ts[1:], log10(analytic[1:, length - 1]), "--" + color,
                label=f"L={length} (analytic)")
    finish(fig, ax, "ex2_ferromagnet_tape_vs_analytic.pdf")


if __name__ == "__main__":
    main()
