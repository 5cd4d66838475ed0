"""mu_c horizon-extension study (round-5 verdict weak #1: the headline
precision is definitional — mu_c(THR=3) = 8.5e-3 vs mu_c(THR=4) =
4.16e-3 at the fixed horizon t_end ~ 12, a ~2x/THR-unit systematic
100x the quoted SEM).

The physics claim this probe tests: the THR dependence at FIXED
horizon is a DETECTION-DELAY artifact, not a property of the
transition. Collapse (monoculture -> uniform-soup attractor switch) is
dynamically absorbing for safe cuts; a lower THR merely detects the
same collapse later, so P_ext(t; THR) curves for safe cuts converge as
t grows and mu_c(THR, t) -> mu_c. Unsafe cuts (THR=5 fires on healthy
coverage fluctuations — the example already REJECTED THR=8 on these
grounds) instead drift down indefinitely (first passage to a
recoverable set is eventually certain), which is evidence FOR the
no-return criterion, not a systematic of the threshold.

Runs the ex6_bff_threshold harness (same machine, init, WE splitting,
q = L - max cyclic dot-run) at 4x the example's horizon (BLOCKS=192,
t_end ~ 48.4) for THR in {3, 4, 5} x mus x seeds, recording the FULL
per-block survival curves, so mu_c(THR, t) at every intermediate
horizon (incl. the committed 1x point, a consistency check against the
round-4 artifact) comes from the same runs.

Writes probes/mu_c_horizon.npz and prints the mu_c(THR, t) table.

Run ON THE ACCELERATOR:  python probes/mu_c_horizon.py [--seeds 3]
"""

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    bff,
    soup_we,
)

TAG = "ex6-mini-bff-self"
L, E = 256, 4
K = 1024
BLOCKS, ROUNDS = 192, 16   # 4x the example's 48 blocks
THRS = (3, 4, 5)
# grid extended DOWN: crossings move to lower mu at longer horizons
MUS = (1.4e-3, 2e-3, 3e-3, 5e-3, 8e-3, 1.4e-2)
HORIZON_BLOCKS = (48, 96, 192)  # 1x, 2x, 4x


def _monoculture_init(rng, m):
    probs = np.full(m.size_a, 0.02 / (m.size_a - 1))
    probs[m.dot] = 0.98

    def init(n):
        return rng.choice(m.size_a, size=(n, L), p=probs).astype(
            np.int32)

    return init


def _mu_c_from_pe(pe_rows, mus):
    lmus = np.log(np.asarray(mus))
    seeds = []
    for pe in pe_rows:
        pe = np.maximum.accumulate(pe)
        seeds.append(float(np.exp(np.interp(0.5, pe, lmus))))
    seeds = np.asarray(seeds)
    sem = (seeds.std(ddof=1) / np.sqrt(len(seeds))
           if len(seeds) > 1 else 0.0)
    return seeds.mean(), sem, seeds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="probes/mu_c_horizon.npz")
    args = ap.parse_args()

    m = bff.compile_bff(TAG)

    def q_fn(tapes):
        return L - soup_we.max_cyclic_run(tapes, m.dot)

    dt_block = -math.log1p(-E / L) * ROUNDS
    print(f"K={K}, {BLOCKS}x{ROUNDS} rounds, t_end="
          f"{BLOCKS * dt_block:.1f} (example horizon "
          f"{48 * dt_block:.1f})", flush=True)

    # surv[thr][si, mi, b]
    surv = {thr: np.zeros((args.seeds, len(MUS), BLOCKS))
            for thr in THRS}
    for thr in THRS:
        qt = L - (thr - 1)
        for si in range(args.seeds):
            for mi, mu in enumerate(MUS):
                t0 = time.time()
                rng = np.random.default_rng(8000 + 100 * si)
                r = soup_we.we_emergence(
                    jax.random.PRNGKey(700 + 1000 * thr + 10 * si
                                       + int(mu * 1e5)), m,
                    _monoculture_init(rng, m),
                    plan=(K, BLOCKS, ROUNDS, E),
                    q_target=qt, q_fn=q_fn, mutation_rate=mu,
                    seed=1000 * thr + si)
                surv[thr][si, mi] = r.survival
                print(f"THR={thr} seed={si} mu={mu:g}: "
                      f"P_ext(1x/2x/4x) = "
                      + "/".join(f"{1 - r.survival[b - 1]:.3g}"
                                 for b in HORIZON_BLOCKS)
                      + f"  [{time.time() - t0:.0f} s]", flush=True)

    mu_c = np.zeros((len(THRS), len(HORIZON_BLOCKS)))
    mu_sem = np.zeros_like(mu_c)
    for ti, thr in enumerate(THRS):
        for hi, b in enumerate(HORIZON_BLOCKS):
            pe_rows = 1.0 - surv[thr][:, :, b - 1]
            mu_c[ti, hi], mu_sem[ti, hi], _ = _mu_c_from_pe(
                pe_rows, MUS)
    print("\nmu_c(THR, t):")
    for ti, thr in enumerate(THRS):
        print(f"  THR={thr}: " + "  ".join(
            f"{h * dt_block:.0f}t:{mu_c[ti, hi]:.2e}+-"
            f"{mu_sem[ti, hi]:.1e}"
            for hi, h in enumerate(HORIZON_BLOCKS)), flush=True)

    np.savez_compressed(
        args.out, thrs=np.asarray(THRS), mus=np.asarray(MUS),
        horizon_blocks=np.asarray(HORIZON_BLOCKS),
        surv=np.stack([surv[t] for t in THRS]),
        mu_c=mu_c, mu_c_sem=mu_sem, k=K, n_seeds=args.seeds,
        blocks=BLOCKS, rounds=ROUNDS, dt_block=dt_block)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
