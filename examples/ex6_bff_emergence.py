"""Replicator birth rate across the error threshold (WE splitting).

The mutation sweep (`ex6_bff_mutation.py`) shows the ESTABLISHED
replicator's extinction between mu=3e-3 and 2e-2; the stationarity
probe shows the survivors' coverage. This run measures the other side
of the threshold coin: the EMERGENCE kinetics — how often does a
uniform random soup give birth to a self-replicator (a contiguous
'dot' run of >= 12 cells, one full head-separation copy loop) — and
how that birth rate collapses as background mutation rises.

Near and above the threshold the event is far too rare for plain
Monte Carlo (nothing happens in 2048 rings x t~8), so the measurement
uses weighted-ensemble splitting on the interpreter engine
(`engine/soup_we.py`, unbiasedness gated by
`tests/test_bff.py::test_we_emergence_unbiased`): walkers are binned
by their longest dot-run and systematically resampled after every
block, enriching the leading edge while exactly preserving every
weighted observable. Survival-mode WE yields P(no replicator by t)
down to ~1e-6 at equal walker budget.

Usage: CKPE_PLATFORM=cpu python ex6_bff_emergence.py [--k 2048]
Output: ex6_bff_emergence.pdf (+ .npz artifact)

Reference twin: none — beyond-reference capability (the reference has
neither a soup engine nor rare-event machinery).
"""

import argparse
import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import (
    bff,
    soup_we,
)

TAG = "ex6-mini-bff-self"
L, E = 256, 4
Q_TARGET = 12          # one full head-separation copy loop
BLOCKS, ROUNDS = 32, 12
MUS = (0.0, 2e-3, 5e-3, 1e-2, 2e-2)
N_SEEDS = int(os.environ.get("CKPE_EX6EM_SEEDS", "2"))


def _suffix(args):
    return "" if args.k == 2048 and N_SEEDS == 2 else \
        f"_k{args.k}x{N_SEEDS}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2048)
    args = ap.parse_args()
    import jax

    m = bff.compile_bff(TAG)
    dt_block = -math.log1p(-E / L) * ROUNDS
    t_max = BLOCKS * dt_block
    print(f"K={args.k} walkers, {BLOCKS}x{ROUNDS} rounds -> "
          f"t_max={t_max:.1f}; target: dot-run >= {Q_TARGET}")

    surv = {}
    for mu in MUS:
        rows = []
        for s in range(N_SEEDS):
            rng = np.random.default_rng(7000 + 100 * s)
            init = (lambda n, _r=rng: _r.integers(
                0, m.size_a, (n, L), dtype=np.int32))
            r = soup_we.we_emergence(
                jax.random.PRNGKey(300 + 10 * s + int(mu * 1e5)), m,
                init, plan=(args.k, BLOCKS, ROUNDS, E),
                q_target=Q_TARGET, mutation_rate=mu, seed=s)
            rows.append(r.survival)
        surv[mu] = np.stack(rows)
        S = surv[mu].mean(axis=0)
        print(f"mu={mu:g}: S(t_max)={S[-1]:.3e} "
              f"(seeds {[f'{x[-1]:.2e}' for x in surv[mu]]})",
              flush=True)

    times = r.times
    # Late-time hazard (birth rate per ring per unit soup time) from
    # the second half of -log S.
    half = BLOCKS // 2
    rates, rate_err = [], []
    for mu in MUS:
        h = -np.log(np.maximum(surv[mu], 1e-300))
        slopes = [np.polyfit(times[half:], hh[half:], 1)[0]
                  for hh in h]
        rates.append(np.mean(slopes))
        rate_err.append(np.std(slopes, ddof=1) / np.sqrt(N_SEEDS)
                        if N_SEEDS > 1 else 0.0)
        print(f"mu={mu:g}: birth rate {rates[-1]:.3e} /ring/time "
              f"(+- {rate_err[-1]:.1e})")
    rates = np.asarray(rates)
    rate_err = np.asarray(rate_err)

    np.savez_compressed(
        _common.out_path(f"ex6_bff_emergence{_suffix(args)}.npz"),
        times=times, mus=np.asarray(MUS),
        surv=np.stack([surv[mu] for mu in MUS]),
        rates=rates, rate_err=rate_err, q_target=Q_TARGET,
        k=args.k, n_seeds=N_SEEDS)

    fig, axes = _common.pyplot.subplots(1, 2, figsize=(16, 7))
    ax = axes[0]
    for mu in MUS:
        S = surv[mu].mean(axis=0)
        lo = surv[mu].min(axis=0)
        hi = surv[mu].max(axis=0)
        (line,) = ax.semilogy(times, S, "o-", ms=3,
                              label=f"$\\mu$ = {mu:g}")
        ax.fill_between(times, np.maximum(lo, 1e-12), hi, alpha=0.15,
                        color=line.get_color())
    ax.set_xlabel("time")
    ax.set_ylabel(f"P(no dot-run $\\geq$ {Q_TARGET} yet)")
    ax.set_title("replicator emergence: WE survival curves")
    ax.legend()
    ax.grid()

    ax = axes[1]
    pos = rates > 0
    ax.errorbar(np.asarray(MUS)[pos], rates[pos], yerr=rate_err[pos],
                fmt="o-", capsize=4)
    ax.set_yscale("log")
    ax.axvspan(3e-3, 2e-2, alpha=0.1, color="red",
               label="extinction window (mutation sweep)")
    ax.set_xlabel("mutation rate $\\mu$ per cell per round")
    ax.set_ylabel("replicator birth rate [/ring/time]")
    ax.set_title("the birth rate collapses across the error threshold")
    ax.legend()
    ax.grid()
    fig.tight_layout()
    out = _common.out_path(f"ex6_bff_emergence{_suffix(args)}.pdf")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
