"""Error threshold of the BFF computational soup.

The self-modifying soup (`ex6_bff_self.py`) selects an exact
fixed-point replicator — the pure copy loop 'dot'×8 — with NO
extrinsic noise: the language's own execution is the only mutation
source, and activity anneals away as the attractor freezes in. The
computational-life literature's central control parameter is
background mutation (cosmic rays in Agüera y Arcas et al. 2024,
PAPERS.md): random cell resampling at rate μ both feeds the soup raw
material and degrades stored code. Quasispecies theory says there is
an ERROR THRESHOLD: replicators persist only while the per-copy
mutation load stays below the selective advantage.

This sweep measures that threshold for the mini-BFF soup. Per round,
after the rule events, every cell is resampled uniformly with
probability μ (engine support `bff.run_ensemble_bff(...,
mutation_rate=μ)`, gated exactly against the composed master kernel
M(q)·(I+Q/L) in `tests/test_bff.py`). For each μ we track the copy-op
tape density and, at final time, the census observables: dot×8
coverage, 8-gram entropy, dot marginal.

Usage: python ex6_bff_mutation.py [--rounds N]
Output: ex6_bff_mutation.pdf (+ .npz artifact)

Reference twin: none — beyond-reference capability.
"""

import argparse
import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import bff
from ex6_bff_self import KGRAM, kgram_census, kgram_stats

TAG = "ex6-mini-bff-self"
B = int(os.environ.get("CKPE_EX6M_B", "1024"))
L, E = 256, 4
SNAPS = 16
MUS = (0.0, 1e-3, 3e-3, 1e-2, 2e-2, 3e-2, 5e-2, 1e-1)
def _suffix(rounds):
    """Non-default runs write suffixed filenames so smoke runs never
    overwrite the committed full-scale regression artifacts
    (CLAUDE.md convention)."""
    s = "" if B == 1024 else f"_b{B}"
    return s if rounds == 640 else s + f"_r{rounds}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=640)
    args = ap.parse_args()
    import jax

    m = bff.compile_bff(TAG)
    size_a = m.size_a
    dot8 = sum(m.dot * size_a ** i for i in range(KGRAM))
    if args.rounds <= 0 or args.rounds % SNAPS:
        raise SystemExit(
            f"--rounds must be a positive multiple of {SNAPS} "
            f"(snapshot count), got {args.rounds}")
    suffix = _suffix(args.rounds)
    rounds_per_snap = args.rounds // SNAPS
    dt_round = -math.log1p(-E / L)
    print(f"{m.summary()}; B={B}, L={L}, E={E}, {args.rounds} rounds "
          f"-> t_max = {args.rounds * dt_round:.2f}; mu sweep {MUS}")

    key = jax.random.PRNGKey(17)
    ts = dt_round * rounds_per_snap * np.arange(SNAPS + 1)
    cd_hist = np.zeros((len(MUS), SNAPS + 1))
    dot8_cov = np.zeros(len(MUS))
    kg_final = np.zeros((len(MUS), 2))
    dot_marg = np.zeros(len(MUS))
    for mi, mu in enumerate(MUS):
        tape = jax.random.randint(jax.random.fold_in(key, 1000 + mi),
                                  (B, L), 0, size_a, dtype=np.int32)
        t_np = np.asarray(tape)
        cd_hist[mi, 0] = ((t_np == m.dot) | (t_np == m.comma)).mean()
        for snap in range(SNAPS):
            tape, _ = bff.run_ensemble_bff(
                jax.random.fold_in(key, 100 * mi + snap), tape, m,
                (rounds_per_snap, E), mutation_rate=mu)
            t_np = np.asarray(tape)
            cd_hist[mi, snap + 1] = ((t_np == m.dot)
                                     | (t_np == m.comma)).mean()
        ranks, counts = kgram_census(t_np, KGRAM, size_a)
        hit = counts[ranks == dot8]
        dot8_cov[mi] = (hit[0] / t_np.size) if hit.size else 0.0
        kg_final[mi] = kgram_stats(t_np, KGRAM, size_a)
        dot_marg[mi] = (t_np == m.dot).mean()
        print(f"mu={mu:7.4f}: copy density {cd_hist[mi, -1]:.3f}, "
              f"dot*8 coverage {dot8_cov[mi]:.4f}, 8-gram entropy "
              f"{kg_final[mi, 1]:.2f} nats, p(dot) {dot_marg[mi]:.3f}")

    np.savez_compressed(
        _common.out_path(f"ex6_bff_mutation{suffix}.npz"),
        mus=np.asarray(MUS), ts=ts, cd_hist=cd_hist,
        dot8_cov=dot8_cov, kg_final=kg_final, dot_marg=dot_marg)

    fig, axes = _common.pyplot.subplots(1, 3, figsize=(26, 7))
    ax = axes[0]
    for mi, mu in enumerate(MUS):
        ax.plot(ts, cd_hist[mi], "o-", ms=3, label=f"mu = {mu:g}")
    ax.axhline(2 / size_a, color="gray", ls=":", label="uniform (2/12)")
    ax.set_xlabel("time")
    ax.set_ylabel("dot/comma tape density")
    ax.set_title("copy invasion under background mutation")
    ax.legend(fontsize=8)
    ax.grid()

    ax = axes[1]
    eps = 2e-4  # plotting offset so mu=0 appears on the log axis
    mus_plot = np.maximum(np.asarray(MUS), eps)
    ax.semilogx(mus_plot, cd_hist[:, -1], "o-",
                label="copy density (final)")
    ax.semilogx(mus_plot, dot_marg, "s-", label="p(dot) (final)")
    ax.axhline(2 / size_a, color="gray", ls=":", label="uniform (2/12)")
    ax.axhline(1 / size_a, color="gray", ls="--", label="uniform (1/12)")
    ax.set_xlabel(f"mutation rate per cell per round (mu=0 at {eps:g})")
    ax.set_ylabel("final density")
    ax.set_title("error threshold: selection vs mutation load")
    ax.legend()
    ax.grid()

    ax = axes[2]
    ax.semilogx(mus_plot, dot8_cov, "o-", color="tab:red",
                label=r"dot$\times$8 coverage")
    ax2 = ax.twinx()
    ax2.semilogx(mus_plot, kg_final[:, 1], "s--", color="tab:blue",
                 label="8-gram entropy [nats]")
    ax.set_xlabel(f"mutation rate per cell per round (mu=0 at {eps:g})")
    ax.set_ylabel("fraction of all cells on the pure copy loop")
    ax2.set_ylabel("8-gram entropy [nats]")
    ax.set_title("the replicator and the code diversity it suppresses")
    ax.legend(loc="center left")
    ax2.legend(loc="center right")
    ax.grid()
    fig.tight_layout()
    out = _common.out_path(f"ex6_bff_mutation{suffix}.pdf")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
