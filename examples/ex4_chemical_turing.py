"""Chemical Turing machine, two scenarios (reference
`examples/ex4_chemical_turing.py`).

Runs the 9-symbol cursor machine at cl_k=5 (59,049-dim SPD) for a
well-powered (powered_fraction=0.04) and a starved (0.01) scenario to
t=2000 at rtol/atol 1e-13, plots log10 sequence probabilities, and prints
the p_final regression values (`ex4_chemical_turing.py:150-170` — the
committed oracle in BASELINE.md).

Usage: python ex4_chemical_turing.py [--backend jax|scipy] [--cl-k K]
"""

import argparse

import numpy as np

import _common
from _common import SeqProbPlotter, cached, finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_p0,
)

SIZE_A = 9
TAG = "ex4-chemical-turing"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    ap.add_argument("--t-max", type=float, default=2000.0)
    ap.add_argument("--tol", type=float, default=1e-13)
    # Beyond-reference runs (e.g. --cl-k 6: 531,441-dim state, 9x the
    # reference's largest) keep the sample grid small: sample transfer
    # off-chip, not device compute, dominates at that state size.
    ap.add_argument("--n-samples", type=int, default=2001)
    ap.add_argument("--scenario", default=None, choices=["a", "b"])
    ap.add_argument("--chunk-size", type=int, default=100)
    args = ap.parse_args()
    cl_k = args.cl_k

    ode_ts = np.linspace(0, args.t_max, args.n_samples)
    scenarios = (
        ("a", chemical_turing_p0(cl_k, powered_fraction=0.04)),
        ("b", chemical_turing_p0(cl_k, powered_fraction=0.01)),  # starved
    )
    if args.scenario:
        scenarios = tuple(s for s in scenarios if s[0] == args.scenario)
    for name, p0 in scenarios:
        ode_ys = cached(
            f"ex4_chemical_turing_{name}_k{cl_k}.npz",
            lambda p0=p0: markov_tapes.ode_integrate_ivp(
                tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(), ts=ode_ts,
                backend=args.backend,
                ivp_kwargs=dict(rtol=args.tol, atol=args.tol,
                                method="DOP853",
                                # bounded device-program chunks: long
                                # single programs trip tunnel watchdogs
                                chunk_size=100, progress=True),
            ),
        )
        fig, ax = new_fig()
        pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k)
        pl.plot([5, 0, 5, 5, 5], "-k", "p(OAOOO)")
        pl.plot([5, 4, 1, 5, 5], "-b", "p(OIBOO)")
        pl.plot([5, 4, 1, 4, 5], "--b", "p(OIBIO)")
        pl.plot([5, 4, 5, 2, 5], "-m", "p(OIOCO)")
        pl.plot([5, 4, 5, 2, 4], "--m", "p(OIOCI)")
        pl.plot([5, 4, 5, 4, 3], "-r", "p(OIOID)")
        pl.plot([6], ":k", "p(P)")
        pl.plot([7], ":b", "p(X)")
        c_tot = sum(pl.seq_prob([s]) for s in (0, 1, 2, 3))
        ax.plot(ode_ts[1:], log10(c_tot[1:]), "--r", label="{total cursor}")
        suffix = "" if cl_k == 5 else f"_k{cl_k}"
        finish(fig, ax, f"ex4_chemical_turing_{name}{suffix}.pdf")


if __name__ == "__main__":
    main()
