"""Metropolis Monte-Carlo ferromagnet vs analytic approximation
(reference `examples/ex2_ferromagnet_mc.py` + `ex2_ferromagnet_analytic.py`).

100 trials x 4000 steps x 500 flip-trials/step on a 50,000-site ring —
run as one vmapped on-device batch (models/ferromagnet.py) instead of the
reference's sequential per-trial Python loop. Island-length counts are
plotted as 10/50/90th-percentile bands against the analytic
island-population model.
"""

import argparse

import numpy as np

import _common
from _common import cached, finish, new_fig
from chemical_kinetics_and_program_execution_tpu.models import ferromagnet

NUM_TRIALS = 100
CHAIN_LENGTH = 50_000
NUM_TIME_STEPS = 4000
SITES_PER_PAIR = 250
TRIALS_PER_STEP = CHAIN_LENGTH // 100
BETA, J, H = 1.0, 1.0, -0.25
T_MAX, T_STEPS = 40.0, 4000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-trials", type=int, default=NUM_TRIALS)
    ap.add_argument("--num-steps", type=int, default=NUM_TIME_STEPS)
    args = ap.parse_args()

    counts = cached(
        "ferromagnet_mc_chain_counts.npz",
        lambda: ferromagnet.mc_island_history(
            num_trials=args.num_trials, chain_length=CHAIN_LENGTH,
            num_steps=args.num_steps, trials_per_step=TRIALS_PER_STEP,
            sites_per_pair=SITES_PER_PAIR, J=J, h=H, beta=BETA,
        ),
        key="chain_counts",
    )
    p10, p50, p90 = (
        np.percentile(counts, q, axis=0) / CHAIN_LENGTH for q in (10, 50, 90)
    )
    ts = np.linspace(0, T_MAX, args.num_steps)
    analytic = ferromagnet.analytic_p_history(
        beta=BETA, J=J, h=H, t_max=T_MAX, t_steps=args.num_steps,
        p0_pair=1 / SITES_PER_PAIR,
    )

    fig, ax = new_fig(figsize=(16, 12))
    for n, style in enumerate(("-k", "-r", "-b", "-g"), 1):
        scaling, tag = (0.25, "*0.25") if n == 2 else (1, "")
        ax.plot(ts, p10[:, n] * scaling, style, label=f"p(L={n}){tag}, MC")
        ax.plot(ts, p50[:, n] * scaling, style)
        ax.plot(ts, p90[:, n] * scaling, style)
        ax.plot(ts, scaling * analytic[:, n - 1], style,
                label=f"p(L={n}){tag}, AA", linewidth=3)
    ax.set_title("p(L), Monte-Carlo 10th/50th/90th percentile "
                 "vs. analytic approximation")
    finish(fig, ax, "ferromagnet_mc_plot.pdf", xlabel="Time",
           ylabel="p(L)")


if __name__ == "__main__":
    main()
