"""Copolymerization sequence statistics, 3 variants (reference
`examples/ex3_copolymerization.py`).

Starts from isolated dilute monomers (p_a=0.02), gates the p0 on the
eigenvalue-1 validity check, integrates ex3 + var1 (alternation
preference) + var2 (reversible depolymerization) at size_a=4, cl_k=6, and
plots log10 probabilities of characteristic chain sequences. The
reference's `DATA_FILENAME`/`DATA_FILE` NameError (`:87`, SURVEY §7.4) has
no analogue here.
"""

import argparse

import numpy as np

import _common
from _common import SeqProbPlotter, cached, finish, new_fig, sample_grid
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    copolymerization_p0,
)

SIZE_A = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=6)
    # Beyond-reference runs (--cl-k 8: 65,536-dim) keep the sample
    # grid small and may select a single variant.
    ap.add_argument("--n-samples", type=int, default=1001)
    ap.add_argument("--chunk-size", type=int, default=None)
    ap.add_argument("--only", default=None,
                    choices=["base", "var1", "var2"])
    args = ap.parse_args()
    cl_k = args.cl_k

    p0 = copolymerization_p0(cl_k)
    if SIZE_A**cl_k <= 20_000:
        # The eigen-gate's context transfer matrix is [A^k, A^k] on the
        # host — 34 GB at cl_k=8, so it is bounded by state size.
        delta, _ = markov_tapes.get_ctm_eigenvalue1_eigenspace(p0)
        if delta > 1e-10:
            raise ValueError("Impossible p0.")

    odeint_kwargs = dict(rtol=1e-9, atol=1e-9)
    if args.backend == "jax":
        # Chunking/progress are jax-solver options; the scipy backend
        # forwards odeint_kwargs verbatim to scipy.integrate.odeint.
        odeint_kwargs.update(chunk_size=args.chunk_size,
                             progress=args.chunk_size is not None)
    kwargs = dict(size_a=SIZE_A, cl_k=cl_k, p0=p0.ravel(),
                  backend=args.backend,
                  odeint_kwargs=odeint_kwargs)
    t_maxes = {"": 1000.0, "_var1": 1000.0, "_var2": 200.0}

    runs = (
        ("", "ex3-copolymerization"),
        ("_var1", "ex3var1-copolymerization"),
        ("_var2", "ex3var2-copolymerization"),
    )
    ksuf = "" if cl_k == 6 else f"_k{cl_k}"
    for suffix, tag in runs:
        if args.only and suffix != {"base": "", "var1": "_var1",
                                    "var2": "_var2"}[args.only]:
            continue
        cache_name = f"ex3{suffix}_k{cl_k}.npz"
        ts = sample_grid(cache_name, 0, t_maxes[suffix], args.n_samples)
        ys = cached(
            cache_name,
            lambda tag=tag, ts=ts: markov_tapes.ode_integrate(
                tag=tag, ts=ts, **kwargs),
            ts=ts,
        )
        fig, ax = new_fig()
        pl = SeqProbPlotter(ax, ys, ts, SIZE_A, cl_k)
        pl.plot([0, 1, 0], "-k", "p(OAO)")
        pl.plot([0, 2, 0], "-g", "p(OMO)")
        pl.plot([0, 1, 2, 0], "-m", "p(OAMO)")
        pl.plot([0, 2, 1, 3, 0], "-c", "p(OMANO)")
        pl.plot([0, 2, 1, 2, 0], "-r", "p(OMAMO)")
        pl.plot([1, 3, 1, 2], "-b", "p(ANAM)")
        pl.plot([1, 3, 1, 3], "--b", "p(ANAN)", linewidth=3)
        finish(fig, ax, f"ex3_copolymerization{suffix}{ksuf}.pdf")


if __name__ == "__main__":
    main()
