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


def run(tag, filename_stem, t_max, backend="jax", cl_k=5,
        print_window_extrema=False, n_samples=4001, chunk_size=200):
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

    cache_name = f"{filename_stem}_k{cl_k}.npz"
    ode_ts = sample_grid(cache_name, 0, t_max, n_samples)
    ode_ys = cached(
        cache_name,
        lambda: markov_tapes.ode_integrate_ivp(
            tag=tag, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(), ts=ode_ts,
            backend=backend,
            ivp_kwargs=dict(rtol=1e-13, atol=1e-13, method="DOP853",
                            chunk_size=chunk_size, progress=True),
        ),
        ts=ode_ts,
    )
    fig, ax = new_fig()
    pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k, logy=False)
    pl.plot([1, 4, 3, 0], "-k", "p(SFTM)")
    pl.plot([1, 3, 0, 1], "-b", "p(STMS)")
    pl.plot([0, 0, 0, 0], "-r", "p(MMMM)")
    pl.plot([2, 2, 2, 2], "--r", "p(RRRR)")
    pl.plot([0, 2, 0, 0], "-m", "p(MRMM)")
    pl.plot([0, 1, 2, 3], "--m", "p(MSRT)")
    for sym, style, name in ((0, ":k", "M"), (1, ":b", "S"), (2, ":c", "R"),
                             (3, ":r", "T"), (4, ":m", "F")):
        pl.plot([sym], style, f"p({name})/50", scale=1 / 50)
    suffix = "" if cl_k == 5 else f"_k{cl_k}"
    finish(fig, ax, f"{filename_stem}{suffix}.pdf", ylabel="probability")

    if print_window_extrema and cl_k >= 4:
        # Report the least/most likely length-4 windows at t_final
        # (`ex5var1_msrtf_machine.py:101-106`, with the loop-shadowing
        # quirk noted in SURVEY §7.4 fixed: report actual argmin/argmax).
        marg4 = np.asarray(ode_ys[-1]).reshape(
            [SIZE_A] * cl_k).reshape(SIZE_A**4, -1).sum(axis=-1).reshape(
            [SIZE_A] * 4)
        flat = marg4.ravel()
        for label, idx in (("argmin", int(flat.argmin())),
                           ("argmax", int(flat.argmax()))):
            window = np.unravel_index(idx, marg4.shape)
            syms = "".join("MSRTF"[s] for s in window)
            print(f"{label} length-4 window: {syms} p={flat[idx]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    ap.add_argument("--n-samples", type=int, default=4001)
    ap.add_argument("--chunk-size", type=int, default=200)
    args = ap.parse_args()
    run("ex5-msrtf-machine", "ex5_msrtf", 500.0,
        backend=args.backend, cl_k=args.cl_k,
        n_samples=args.n_samples, chunk_size=args.chunk_size)


if __name__ == "__main__":
    main()
