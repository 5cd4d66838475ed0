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
    ap.add_argument("--chunk-size", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-13)
    args = ap.parse_args()
    cl_k = args.cl_k

    p0 = chemical_turing_p0(
        cl_k, cursor_fraction=0.001, powered_fraction=0.05, random01=True
    )
    cache_name = f"ex4var1_chemical_turing_k{cl_k}.npz"
    ode_ts = sample_grid(cache_name, 0, 2000.0, args.n_samples)
    ode_ys = cached(
        cache_name,
        lambda: markov_tapes.ode_integrate_ivp(
            tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(), ts=ode_ts,
            backend=args.backend,
            ivp_kwargs=dict(rtol=args.tol, atol=args.tol,
                            method="DOP853",
                            chunk_size=args.chunk_size, progress=True),
        ),
        ts=ode_ts,
    )

    fig, ax = new_fig()
    pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k)
    pl.plot([0], "-k", "p(A)")
    pl.plot([1], "-b", "p(B)")
    pl.plot([2], "-m", "p(C)")
    pl.plot([3], "-r", "p(D)")
    pl.plot([4, 5, 4, 3], "--r", "p(IOID)", linewidth=3)
    pl.plot([6], ":k", "p(P)")
    pl.plot([7], ":b", "p(X)")
    c_tot = sum(pl.seq_prob([s]) for s in (0, 1, 2, 3))
    ax.plot(ode_ts[1:], log10(c_tot[1:]), ":m", label="{total cursor}")
    suffix = "" if cl_k == 5 else f"_k{cl_k}"
    finish(fig, ax, f"ex4var1_chemical_turing{suffix}.pdf")

    # Markov-entropy trace (`ex4var1_chemical_turing.py:142-154`).
    entropies = np.array([
        markov_tapes.markov_entropy(ys.reshape([SIZE_A] * cl_k))
        for ys in ode_ys
    ])
    print(f"S_initial: {entropies[0]}, S_final: {entropies[-1]}, "
          f"S_delta: {entropies[-1] - entropies[0]}")
    fig_s, ax_s = new_fig()
    ax_s.plot(ode_ts, entropies, "-k")
    finish(fig_s, ax_s, f"ex4var1_chemical_turing{suffix}_s.pdf",
           ylabel="Markov entropy")


if __name__ == "__main__":
    main()
