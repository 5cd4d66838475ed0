"""MSRTF mini machine language (reference `examples/ex5_msrtf_machine.py`).

Uniform p0 over M,S,R at cl_k=5 (3125-dim SPD), eigen-gate, solve to
t=500 at 1e-13, linear-scale sequence-probability plot.
"""

import argparse

import numpy as np

import _common
from _common import SeqProbPlotter, cached, finish, new_fig, sample_grid
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    msrtf_p0,
)

SIZE_A = 5


CURVES = [
    ([1, 4, 3, 0], "-k", "p(SFTM)", 1.0),
    ([1, 3, 0, 1], "-b", "p(STMS)", 1.0),
    ([0, 0, 0, 0], "-r", "p(MMMM)", 1.0),
    ([2, 2, 2, 2], "--r", "p(RRRR)", 1.0),
    ([0, 2, 0, 0], "-m", "p(MRMM)", 1.0),
    ([0, 1, 2, 3], "--m", "p(MSRT)", 1.0),
] + [([sym], style, f"p({name})/50", 1 / 50)
     for sym, style, name in ((0, ":k", "M"), (1, ":b", "S"),
                              (2, ":c", "R"), (3, ":r", "T"),
                              (4, ":m", "F"))]


def run(tag, filename_stem, t_max, backend="jax", cl_k=5,
        print_window_extrema=False, n_samples=4001, chunk_size=200,
        observables_only=True):
    p0 = msrtf_p0(cl_k)
    if SIZE_A**cl_k <= 20_000:
        # The eigen-gate builds the [A^k, A^k] context transfer matrix
        # on the host (`markov_tapes.py:133-175`) — O(A^2k) memory, so
        # it is skipped for beyond-reference cl_k where it would need
        # tens of GB; the same i.i.d.-uniform p0 family passes the gate
        # at every reference cl_k.
        delta, _ = markov_tapes.get_ctm_eigenvalue1_eigenspace(p0)
        if delta > 1e-10:
            raise ValueError("Impossible p0.")

    if cl_k < 4:
        # The 4-symbol curves need the (nonlinear) Markov-chain
        # extension below cl_k=4 — not expressible as a device-side
        # linear projection; smoke runs fall back to full-SPD samples.
        observables_only = False
    obs_part = "_obs" if observables_only else ""
    cache_name = f"{filename_stem}_k{cl_k}{obs_part}.npz"
    ode_ts = sample_grid(cache_name, 0, t_max, n_samples)
    solver_kwargs = dict(rtol=1e-13, atol=1e-13, method="DOP853",
                         chunk_size=chunk_size, progress=True)
    fig, ax = new_fig()
    suffix = "" if cl_k == 5 else f"_k{cl_k}"
    if observables_only:
        # Round-5 default (the ex4 round-4 treatment): every plotted
        # curve is a linear projection, and the window-extrema report
        # needs only the length-4 marginal — all evaluated on device,
        # transferring [T, 11 + A^4] instead of [T, A^cl_k] samples.
        from chemical_kinetics_and_program_execution_tpu.ops.observables import (  # noqa: E501
            seq_prob_projector,
        )

        n_curves = len(CURVES)
        seqs = [s for s, _, _, _ in CURVES]
        marg_len = min(4, cl_k)
        marg_seqs = [list(np.unravel_index(i, [SIZE_A] * marg_len))
                     for i in range(SIZE_A**marg_len)]
        proj = seq_prob_projector(seqs + marg_seqs, SIZE_A, cl_k)
        obs = cached(
            cache_name,
            lambda: markov_tapes.ode_integrate_ivp(
                tag=tag, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                ts=ode_ts, backend=backend,
                ivp_kwargs=dict(project=proj, **solver_kwargs),
            ),
            ts=ode_ts,
        )
        for j, (_, style, label, scale) in enumerate(CURVES):
            ax.plot(ode_ts[1:], obs[1:, j] * scale, style, label=label)
            print(f"{label}: p_final={obs[-1, j] * scale}")
        marg4_flat = obs[-1, n_curves:]
    else:
        ode_ys = cached(
            cache_name,
            lambda: markov_tapes.ode_integrate_ivp(
                tag=tag, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                ts=ode_ts, backend=backend,
                ivp_kwargs=solver_kwargs,
            ),
            ts=ode_ts,
        )
        pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k, logy=False)
        for seq, style, label, scale in CURVES:
            pl.plot(seq, style, label, scale=scale)
        marg4_flat = np.asarray(ode_ys[-1]).reshape(
            [SIZE_A] * cl_k).reshape(SIZE_A**4, -1).sum(axis=-1).ravel()
    finish(fig, ax, f"{filename_stem}{suffix}.pdf", ylabel="probability")

    if print_window_extrema and cl_k >= 4:
        # Report the least/most likely length-4 windows at t_final
        # (`ex5var1_msrtf_machine.py:101-106`, with the loop-shadowing
        # quirk noted in SURVEY §7.4 fixed: report actual argmin/argmax).
        flat = marg4_flat
        for label, idx in (("argmin", int(flat.argmin())),
                           ("argmax", int(flat.argmax()))):
            window = np.unravel_index(idx, [SIZE_A] * 4)
            syms = "".join("MSRTF"[s] for s in window)
            print(f"{label} length-4 window: {syms} p={flat[idx]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    ap.add_argument("--n-samples", type=int, default=4001)
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="samples per device call (default: 500 in "
                    "observables mode, 200 with --full-spd)")
    ap.add_argument("--observables-only", action="store_true",
                    default=True,
                    help="device-side projections only (default)")
    ap.add_argument("--full-spd", dest="observables_only",
                    action="store_false",
                    help="transfer full SPD samples (the committed "
                    "ex5_msrtf_k5.npz artifact mode)")
    args = ap.parse_args()
    if args.chunk_size is None:
        args.chunk_size = 500 if args.observables_only else 200
    run("ex5-msrtf-machine", "ex5_msrtf", 500.0,
        backend=args.backend, cl_k=args.cl_k,
        n_samples=args.n_samples, chunk_size=args.chunk_size,
        observables_only=args.observables_only)


if __name__ == "__main__":
    main()
