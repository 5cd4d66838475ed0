"""Chemical Turing machine, thermodynamically neutral reverse reaction
(reference `examples/ex4var1_chemical_turing.py`).

Random-0/1 tape content, dilute cursors (0.001), solve to t=2000 at
1e-13; plots per-symbol + p(IOID) probabilities and the Markov-entropy
trace with the initial/final entropy delta printed.
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
TAG = "ex4var1-chemical-turing"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    # Beyond-reference runs (--cl-k 6) keep the sample grid small:
    # off-chip sample transfer dominates at that state size.
    ap.add_argument("--n-samples", type=int, default=2001)
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="samples per device call (default: 500 in "
                    "observables mode, 100 with --full-spd)")
    ap.add_argument("--tol", type=float, default=1e-13)
    # Observables-only is the DEFAULT (round 5, same treatment as ex4
    # in round 4): warm wall clock was dominated by the full-SPD f64
    # sample transfer over the TPU tunnel, and every printed/plotted
    # quantity — including the entropy trace — is a device projection.
    ap.add_argument("--observables-only", action="store_true",
                    default=True,
                    help="evaluate the plotted probabilities AND the "
                    "entropy trace on device, transfer only [T, n_obs] "
                    "(default; required for cl_k >= 7)")
    ap.add_argument("--full-spd", dest="observables_only",
                    action="store_false",
                    help="transfer full SPD samples (the mode that "
                    "produced the committed ex4var1_*_k5.npz artifact)")
    args = ap.parse_args()
    if args.chunk_size is None:
        args.chunk_size = 500 if args.observables_only else 100
    cl_k = args.cl_k

    p0 = chemical_turing_p0(
        cl_k, cursor_fraction=0.001, powered_fraction=0.05, random01=True
    )
    obs_part = "_obs" if args.observables_only else ""
    cache_name = f"ex4var1_chemical_turing_k{cl_k}{obs_part}.npz"
    ode_ts = sample_grid(cache_name, 0, 2000.0, args.n_samples)
    solver_kwargs = dict(rtol=args.tol, atol=args.tol, method="DOP853",
                         chunk_size=args.chunk_size, progress=True)
    curves = [
        ([0], "-k", "p(A)"),
        ([1], "-b", "p(B)"),
        ([2], "-m", "p(C)"),
        ([3], "-r", "p(D)"),
        ([4, 5, 4, 3], "--r", "p(IOID)"),
        ([6], ":k", "p(P)"),
        ([7], ":b", "p(X)"),
    ]
    fig, ax = new_fig()
    suffix = "" if cl_k == 5 else f"_k{cl_k}"
    if args.observables_only:
        # Large-state mode: the probability columns are linear slices
        # and the entropy trace is a nonlinear device projection —
        # stacked into one [T, n_obs+1] projector so the full state
        # never crosses the host link.
        from chemical_kinetics_and_program_execution_tpu.ops.observables import (  # noqa: E501
            markov_entropy_projector,
            seq_prob_projector,
            stack_projectors,
        )

        # curves[0..3] already project p(A)/p(B)/p(C)/p(D), so c_tot
        # below reuses those columns instead of duplicating them.
        seqs = [s for s, _, _ in curves]
        proj = stack_projectors(
            seq_prob_projector(seqs, SIZE_A, cl_k),
            markov_entropy_projector(SIZE_A, cl_k))
        obs = cached(
            cache_name,
            lambda: markov_tapes.ode_integrate_ivp(
                tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                ts=ode_ts, backend=args.backend,
                ivp_kwargs=dict(project=proj, **solver_kwargs),
            ),
            ts=ode_ts,
        )
        for j, (_, style, label) in enumerate(curves):
            ax.plot(ode_ts[1:], log10(obs[1:, j]), style, label=label)
            print(f"{label}: p_final={obs[-1, j]}")
        c_tot = obs[:, 0:4].sum(axis=1)
        entropies = obs[:, -1]
    else:
        ode_ys = cached(
            cache_name,
            lambda: markov_tapes.ode_integrate_ivp(
                tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                ts=ode_ts, backend=args.backend,
                ivp_kwargs=solver_kwargs,
            ),
            ts=ode_ts,
        )
        pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k)
        for seq, style, label in curves:
            pl.plot(seq, style, label)
        c_tot = sum(pl.seq_prob([s]) for s in (0, 1, 2, 3))
        # Markov-entropy trace (`ex4var1_chemical_turing.py:142-154`).
        entropies = np.array([
            markov_tapes.markov_entropy(ys.reshape([SIZE_A] * cl_k))
            for ys in ode_ys
        ])
    ax.plot(ode_ts[1:], log10(c_tot[1:]), ":m", label="{total cursor}")
    finish(fig, ax, f"ex4var1_chemical_turing{suffix}.pdf")
    print(f"S_initial: {entropies[0]}, S_final: {entropies[-1]}, "
          f"S_delta: {entropies[-1] - entropies[0]}")
    fig_s, ax_s = new_fig()
    ax_s.plot(ode_ts, entropies, "-k")
    finish(fig_s, ax_s, f"ex4var1_chemical_turing{suffix}_s.pdf",
           ylabel="Markov entropy")


if __name__ == "__main__":
    main()
