"""Genealogy of the computational soup: who copied whom?

`ex6_bff_self.py` shows WHAT wins (the pure copy loop); this run shows
HOW: every cell carries a LINEAGE id (its ancestral ring position at
t=0) that copy ops propagate — 'dot'/'comma' carry the source cell's
provenance, 'plus'/'minus' mutate in place and keep it, background
mutation stamps -1 "de novo" (engine support `run_ensemble_bff(...,
prov=...)`, bit-exact vs an independent host interpreter and
content-invariant — `tests/test_bff.py`).

The population-genetics observables this makes measurable:

1. **Coalescence.** The number of distinct surviving ancestors per
   ring collapses as successful code overwrites everything else — the
   soup's version of lineage fixation.
2. **Dominant-lineage fraction** ("LUCA share"): what fraction of the
   final tape descends from the single most successful ancestral cell.
3. **Lineage rank-size structure**: sorted lineage sizes at final
   time — selection concentrates descent onto few, large clones.
4. **Turnover under mutation**: at μ>0, the de-novo (-1) share and
   the steady re-coalescence of new lineages.

Usage: python ex6_bff_lineage.py [--rounds N]
Output: ex6_bff_lineage.pdf (+ .npz artifact)

Reference twin: none — beyond-reference capability.
"""

import argparse
import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import bff

TAG = "ex6-mini-bff-self"
B = int(os.environ.get("CKPE_EX6L_B", "2048"))
L, E = 256, 4
SNAPS = 16
MUS = (0.0, 1e-3)
def _suffix(rounds):
    """Non-default runs write suffixed filenames so smoke runs never
    overwrite the committed full-scale regression artifacts
    (CLAUDE.md convention)."""
    s = "" if B == 2048 else f"_b{B}"
    return s if rounds == 640 else s + f"_r{rounds}"


def lineage_stats(prov):
    """Per-ring genealogy summaries, averaged over the batch.

    Returns (mean distinct surviving ancestors, mean dominant-lineage
    fraction, de-novo fraction, mean sorted lineage-size spectrum
    [top 32, as fractions of L])."""
    prov = np.asarray(prov)
    Bn, Ln = prov.shape
    n_anc = np.zeros(Bn)
    dom = np.zeros(Bn)
    spec = np.zeros((Bn, 32))
    for b in range(Bn):
        row = prov[b]
        vals, counts = np.unique(row[row >= 0], return_counts=True)
        n_anc[b] = vals.size
        counts = np.sort(counts)[::-1]
        dom[b] = (counts[0] / Ln) if counts.size else 0.0
        k = min(32, counts.size)
        spec[b, :k] = counts[:k] / Ln
    return (float(n_anc.mean()), float(dom.mean()),
            float((prov < 0).mean()), spec.mean(axis=0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=640)
    args = ap.parse_args()
    import jax

    m = bff.compile_bff(TAG)
    size_a = m.size_a
    if args.rounds <= 0 or args.rounds % SNAPS:
        raise SystemExit(
            f"--rounds must be a positive multiple of {SNAPS} "
            f"(snapshot count), got {args.rounds}")
    suffix = _suffix(args.rounds)
    rounds_per_snap = args.rounds // SNAPS
    dt_round = -math.log1p(-E / L)
    print(f"{m.summary()}; B={B}, L={L}, E={E}, {args.rounds} rounds "
          f"-> t_max = {args.rounds * dt_round:.2f}; mus {MUS}")

    key = jax.random.PRNGKey(29)
    ts = dt_round * rounds_per_snap * np.arange(SNAPS + 1)
    res = {}
    for mi, mu in enumerate(MUS):
        tape = jax.random.randint(jax.random.fold_in(key, 50 + mi),
                                  (B, L), 0, size_a, dtype=np.int32)
        prov = np.tile(np.arange(L, dtype=np.int32), (B, 1))
        anc = [float(L)]
        dom = [1.0 / L]
        denovo = [0.0]
        spec = None
        for snap in range(SNAPS):
            (tape, prov), _ = bff.run_ensemble_bff(
                jax.random.fold_in(key, 100 * mi + snap), tape, m,
                (rounds_per_snap, E), mutation_rate=mu, prov=prov)
            a, d, dn, sp = lineage_stats(prov)
            anc.append(a)
            dom.append(d)
            denovo.append(dn)
            spec = sp
        res[mu] = dict(anc=np.asarray(anc), dom=np.asarray(dom),
                       denovo=np.asarray(denovo), spec=spec)
        print(f"mu={mu:g}: ancestors {L} -> {anc[-1]:.1f} per ring; "
              f"dominant lineage {dom[-1]:.3f} of tape; de novo "
              f"{denovo[-1]:.3f}")

    np.savez_compressed(
        _common.out_path(f"ex6_bff_lineage{suffix}.npz"),
        ts=ts, mus=np.asarray(MUS),
        anc0=res[MUS[0]]["anc"], dom0=res[MUS[0]]["dom"],
        spec0=res[MUS[0]]["spec"],
        anc1=res[MUS[1]]["anc"], dom1=res[MUS[1]]["dom"],
        denovo1=res[MUS[1]]["denovo"], spec1=res[MUS[1]]["spec"])

    fig, axes = _common.pyplot.subplots(1, 3, figsize=(26, 7))
    ax = axes[0]
    for mu in MUS:
        ax.semilogy(ts, res[mu]["anc"], "o-", label=f"mu = {mu:g}")
    ax.axhline(L, color="gray", ls=":", label=f"all {L} cells")
    ax.set_xlabel("time")
    ax.set_ylabel("distinct surviving ancestors per ring")
    ax.set_title("coalescence: lineages fix as copy code wins")
    ax.legend()
    ax.grid()

    ax = axes[1]
    for mu in MUS:
        ax.plot(ts, res[mu]["dom"], "o-", label=f"dominant, mu={mu:g}")
    ax.plot(ts, res[MUS[1]]["denovo"], "s--",
            label=f"de novo (-1), mu={MUS[1]:g}")
    ax.set_xlabel("time")
    ax.set_ylabel("fraction of tape")
    ax.set_title("the LUCA share: descent from one ancestral cell")
    ax.legend()
    ax.grid()

    ax = axes[2]
    for mu in MUS:
        sp = res[mu]["spec"]
        ax.loglog(np.arange(1, sp.size + 1), np.maximum(sp, 1e-6),
                  "o-", label=f"mu = {mu:g}")
    ax.axhline(1 / L, color="gray", ls=":", label="1 cell")
    ax.set_xlabel("lineage rank")
    ax.set_ylabel("lineage size / L (mean over rings)")
    ax.set_title("final lineage rank-size spectrum")
    ax.legend()
    ax.grid()
    fig.tight_layout()
    out = _common.out_path(f"ex6_bff_lineage{suffix}.pdf")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
