"""Radioactive decay, the minimal published problem
(`problems.scm:22-26`; the reference ships no dedicated script — this is
the paper's warm-up figure): p(B) must decay as 0.5·exp(-t) from a
uniform p0, independent of context length."""

import argparse

import numpy as np

import _common
from _common import finish, new_fig
from chemical_kinetics_and_program_execution_tpu import markov_tapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=3)
    args = ap.parse_args()
    cl_k = args.cl_k

    p0 = np.full(2**cl_k, 2.0**-cl_k)
    ts = np.linspace(0, 5, 501)
    ys = markov_tapes.ode_integrate(
        tag="ex1-radioactive-decay", size_a=2, cl_k=cl_k, p0=p0, ts=ts,
        backend=args.backend, odeint_kwargs=dict(rtol=1e-10, atol=1e-12),
    )
    p_b = np.array([
        markov_tapes.seq_prob(y.reshape([2] * cl_k), (1,))[0] for y in ys
    ])
    exact = 0.5 * np.exp(-ts)
    print(f"max |p(B) - 0.5 exp(-t)| = {np.abs(p_b - exact).max():.3e}")

    fig, ax = new_fig()
    ax.plot(ts, p_b, "-k", label="p(B), tape engine")
    ax.plot(ts, exact, "--r", label=r"$0.5\,e^{-t}$")
    finish(fig, ax, "ex1_radioactive_decay.pdf", ylabel="probability")


if __name__ == "__main__":
    main()
