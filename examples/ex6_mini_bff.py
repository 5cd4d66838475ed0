"""Faithful mini-BFF in pruned exact mode (beyond-reference example).

The reference registers `ex6-mini-bff` but its Scheme form is broken and
no example exercises it (SURVEY §2.3); its multiverse is also far too
deep to enumerate exactly. This example runs the *repaired, faithful*
rule (fuel 10, detached second data head) with the pruned exact engine:
execution paths are enumerated under a reference distribution down to a
weight threshold, the kept multiverse is compiled to the dense
transfer-matrix kernel, and the un-enumerated mass ``1 - Σ w(p)`` is
measured at every output time — the exact-mode flavour of the
north-star "frontier expansion with top-k pruning".

Usage: python ex6_mini_bff.py [--threshold 1e-4] [--cl-k 3]
"""

import argparse

import numpy as np

import _common
from _common import finish, log10, new_fig
from chemical_kinetics_and_program_execution_tpu.engine import dense, dsl
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG = "ex6-mini-bff"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1e-4)
    ap.add_argument("--cl-k", type=int, default=3)
    ap.add_argument("--t-max", type=float, default=50.0)
    args = ap.parse_args()
    cl_k = args.cl_k

    prob = dsl.get_problem(TAG)
    a = prob.size_a
    # Mostly-quiescent tape: dominant symbol 0, everything else rare.
    psym = np.full(a, 0.1 / (a - 1))
    psym[0] = 0.9
    p0 = _common.iid_spd(psym, cl_k).ravel()

    # Adaptive pruned solve: enumeration is cheap (milliseconds), so the
    # kept multiverse is re-selected against the *current* distribution
    # at every segment — the exact-mode analogue of re-pruning a beam.
    ts = np.linspace(0.0, args.t_max, 201)
    n_seg = 10
    seg = (len(ts) - 1) // n_seg
    ys_parts = [p0[None]]
    masses = [None]
    y = p0
    for s in range(n_seg):
        prog = dense.compile_dense(
            TAG, cl_k, p_ref=y, prune_threshold=args.threshold,
            max_worlds=1_000_000,
        )
        fn = dense.make_dense_dy_dt(prog, with_mass=True)
        ts_seg = ts[s * seg:(s + 1) * seg + 1]
        ys_seg = solve(lambda y_, t: fn(y_)[0], y, ts_seg,
                       rtol=1e-9, atol=1e-9)
        ys_parts.append(ys_seg[1:])
        masses.extend(float(fn(yy)[1]) for yy in ys_seg[1:])
        y = ys_seg[-1]
        print(f"t={ts_seg[-1]:g}: {prog.num_worlds} worlds kept, "
              f"measured mass={masses[-1]:.6f}", flush=True)
    ys = np.concatenate(ys_parts, axis=0)
    masses[0] = masses[1]
    masses = np.array(masses)
    print(f"measured enumerated mass: min={masses.min():.6f} "
          f"final={masses[-1]:.6f}")

    fig, ax = new_fig()
    per_symbol = ys.reshape(len(ts), a, -1).sum(axis=2)
    for s, style in zip(range(4), ("-k", "-b", "-r", "-m")):
        ax.plot(ts[1:], log10(per_symbol[1:, s]), style,
                label=f"p({prob.symbols[s]})")
    ax.plot(ts[1:], log10(1 - masses[1:]), "--g",
            label="pruned mass bound")
    finish(fig, ax, "ex6_mini_bff.pdf")


if __name__ == "__main__":
    main()
