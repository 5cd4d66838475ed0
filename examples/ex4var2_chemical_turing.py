"""Chemical Turing machine with detachable evaluator (reference
`examples/ex4var2_chemical_turing.py`).

10-symbol alphabet (E = detached evaluator), 100,000-dim SPD at cl_k=5 —
the largest workload the reference solves. Evaluators start in solution;
solve to t=10,000 at 1e-11 with a log-log sequence-probability plot.
"""

import argparse

import numpy as np

import _common
from _common import SeqProbPlotter, cached, finish, log10, new_fig, sample_grid
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_v2_p0,
)

SIZE_A = 10
TAG = "ex4var2-chemical-turing"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    ap.add_argument("--check-p0", action="store_true",
                    help="Run the (slow, RAM-heavy) eigen-space p0 gate.")
    # Beyond-reference runs (--cl-k 6: a 10^6-dim state) keep the
    # sample grid small — off-chip sample transfer dominates there.
    ap.add_argument("--n-samples", type=int, default=5001)
    ap.add_argument("--chunk-size", type=int, default=100)
    args = ap.parse_args()
    cl_k = args.cl_k

    p0 = chemical_turing_v2_p0(cl_k)
    if args.check_p0:
        delta, _ = markov_tapes.get_ctm_eigenvalue1_eigenspace(p0)
        if delta > 1e-6:
            raise ValueError("Impossible p0.")

    cache_name = f"ex4var2_chemical_turing_k{cl_k}.npz"
    ode_ts = sample_grid(cache_name, 0, 10000.0, args.n_samples)
    ode_ys = cached(
        cache_name,
        lambda: markov_tapes.ode_integrate_ivp(
            tag=TAG, size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(), ts=ode_ts,
            backend=args.backend,
            ivp_kwargs=dict(rtol=1e-11, atol=1e-11, method="DOP853",
                            chunk_size=args.chunk_size, progress=True),
        ),
        ts=ode_ts,
    )

    fig, ax = new_fig()
    pl = SeqProbPlotter(ax, ode_ys, ode_ts, SIZE_A, cl_k, logx=True)
    pl.plot([0], "-k", "p(A)")
    pl.plot([1], "-b", "p(B)")
    pl.plot([2], "-m", "p(C)")
    pl.plot([3], "-r", "p(D)")
    pl.plot([4, 5, 4, 3], "--r", "p(IOID)", linewidth=3)
    pl.plot([5, 4, 5, 4, 5], "--k", "p(OIOIO)", linewidth=3)
    pl.plot([4, 4, 4, 4], "--g", "p(IIII)", linewidth=3)
    pl.plot([6], "-.k", "p(P)")
    pl.plot([7], "-.b", "p(X)")
    pl.plot([9], "-.g", "p(E)")
    c_tot = sum(pl.seq_prob([s]) for s in (0, 1, 2, 3))
    ax.plot(np.log(ode_ts[1:]) / np.log(10), log10(c_tot[1:]),
            "-.m", label="{total cursor}")
    suffix = "" if cl_k == 5 else f"_k{cl_k}"
    finish(fig, ax, f"ex4var2_chemical_turing{suffix}.pdf",
           xlabel=r"$\log_{10}$(time)")


if __name__ == "__main__":
    main()
