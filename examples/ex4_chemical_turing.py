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
from _common import SeqProbPlotter, cached, finish, log10, new_fig, sample_grid
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
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="samples per device call (default: 500 in "
                    "observables mode, 100 with --full-spd)")
    # Observables-only is the DEFAULT (round 4): the warm wall clock
    # was ~100x device compute, dominated by the full-SPD f64 sample
    # transfer over the TPU tunnel (2001 x 59049 x 8 B ~ 0.9 GB per
    # scenario) plus per-chunk dispatch — the projection transfers
    # ~100 B/sample instead and prints the same p_final oracles.
    ap.add_argument("--observables-only", action="store_true",
                    default=True,
                    help="Evaluate the plotted observables on device and "
                    "transfer only those (default; required for cl_k >= "
                    "7 where full-state samples are GBs over the tunnel).")
    ap.add_argument("--full-spd", dest="observables_only",
                    action="store_false",
                    help="Transfer full SPD samples (the mode that "
                    "produced the committed oracle artifacts "
                    "ex4_chemical_turing_*_k5.npz).")
    args = ap.parse_args()
    if args.chunk_size is None:
        args.chunk_size = 500 if args.observables_only else 100
    cl_k = args.cl_k

    scenarios = (
        ("a", chemical_turing_p0(cl_k, powered_fraction=0.04)),
        ("b", chemical_turing_p0(cl_k, powered_fraction=0.01)),  # starved
    )
    if args.scenario:
        scenarios = tuple(s for s in scenarios if s[0] == args.scenario)
    curves = [
        ([5, 0, 5, 5, 5], "-k", "p(OAOOO)"),
        ([5, 4, 1, 5, 5], "-b", "p(OIBOO)"),
        ([5, 4, 1, 4, 5], "--b", "p(OIBIO)"),
        ([5, 4, 5, 2, 5], "-m", "p(OIOCO)"),
        ([5, 4, 5, 2, 4], "--m", "p(OIOCI)"),
        ([5, 4, 5, 4, 3], "-r", "p(OIOID)"),
        ([6], ":k", "p(P)"),
        ([7], ":b", "p(X)"),
    ]
    cursors = [[0], [1], [2], [3]]
    for name, p0 in scenarios:
        suffix = "" if cl_k == 5 else f"_k{cl_k}"
        obs_part = "_obs" if args.observables_only else ""
        cache_name = f"ex4_chemical_turing_{name}_k{cl_k}{obs_part}.npz"
        ode_ts = sample_grid(cache_name, 0, args.t_max, args.n_samples)
        solver_kwargs = dict(rtol=args.tol, atol=args.tol,
                             method="DOP853",
                             # bounded device-program chunks: long
                             # single programs trip tunnel watchdogs
                             chunk_size=args.chunk_size, progress=True)
        fig, ax = new_fig()
        if args.observables_only:
            # Large-state mode (cl_k >= 7): every plotted quantity is a
            # linear functional of p — evaluate on device, transfer only
            # [T, n_obs] instead of [T, size_a**cl_k] (38 MB/sample at
            # cl_k=7 over a ~12 MB/s tunnel).
            from chemical_kinetics_and_program_execution_tpu.ops.observables import (  # noqa: E501
                seq_prob_projector,
            )

            seqs = [s for s, _, _ in curves] + cursors
            proj = seq_prob_projector(seqs, SIZE_A, cl_k)
            obs = cached(
                cache_name,
                lambda p0=p0, proj=proj: markov_tapes.ode_integrate_ivp(
                    tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                    ts=ode_ts, backend=args.backend,
                    ivp_kwargs=dict(project=proj, **solver_kwargs),
                ),
                ts=ode_ts,
            )
            for j, (_, style, label) in enumerate(curves):
                ax.plot(ode_ts[1:], log10(obs[1:, j]), style, label=label)
                print(f"{label}: p_final={obs[-1, j]}")
            c_tot = obs[:, len(curves):].sum(axis=1)
        else:
            ode_ys = cached(
                cache_name,
                lambda p0=p0: markov_tapes.ode_integrate_ivp(
                    tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                    ts=ode_ts, backend=args.backend,
                    ivp_kwargs=solver_kwargs,
                ),
                ts=ode_ts,
            )
            pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k)
            for seq, style, label in curves:
                pl.plot(seq, style, label)
            c_tot = sum(pl.seq_prob(s) for s in cursors)
        ax.plot(ode_ts[1:], log10(c_tot[1:]), "--r", label="{total cursor}")
        finish(fig, ax, f"ex4_chemical_turing_{name}{suffix}.pdf")


if __name__ == "__main__":
    main()
