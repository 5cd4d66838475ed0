"""Computational soup: SELF-MODIFYING mini-BFF at ensemble scale.

The reference's ex6 freezes the program tape by construction
(`problems.scm:529-629` reads ops from one tape, data from the other).
This run drops that wall: `ex6-mini-bff-self` puts opcodes and data on
ONE ring, so every plus/minus/dot/comma write lands in the instruction
stream — the computational-life setting the BFF language comes from
(Agüera y Arcas et al. 2024, PAPERS.md), where code rewrites and
copies code. The interpreter fetches each step's opcode from the live
window (bit-exact vs the host DSL rule, round assembly bit-exact vs
host application, dynamics 6σ-gated against the single-ring master
equation — `tests/test_bff.py`).

The questions this run measures:

1. **Which opcodes survive their own execution?** The language has an
   intrinsic mutation flow: 'plus' with d0 on the pc increments ITSELF
   (plus→dot in the symbol order), 'minus' decrements itself, while
   'dot' with d0 on the pc COPIES itself one head-separation
   downstream — the smallest possible self-replicator. The symbol
   marginals over time are the fitness landscape of that flow.
2. **Do copy ops invade?** Three soups with different initial
   dot/comma densities (0%, uniform 1/6, 40%) track the copy-op
   density; convergence to a common attractor from above AND below
   separates selection from initial-condition memory.
3. **Does the head geometry still imprint?** MI(d) must again grow
   structure at the head separation d=12 — but now the correlations
   are carried by the code itself.
4. **WHICH code wins?** A k-gram census over the population tracks the
   collapse of code diversity (distinct 8-grams, 8-gram entropy) and
   identifies the dominant motifs; a self-maintenance probe then runs
   rings tiled with the top motif and measures how much of it survives
   its own execution vs a random-code control — the operational test
   that the attractor is (near-)fixed-point code, not just a biased
   symbol mix.

Usage: python ex6_bff_self.py [--rounds N]
Output: ex6_bff_self.pdf (+ .npz artifact)

Reference twin: none — beyond-reference capability.
"""

import argparse
import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import bff
from ex6_bff_ensemble import pair_mi

TAG = "ex6-mini-bff-self"
B = int(os.environ.get("CKPE_EX6S_B", "4096"))
L, E = 256, 4  # stride 64 > 2*span = 62
SNAPS = 20
KGRAM = 8  # census motif length (12^8 ranks fit int64 exactly)
def _suffix(rounds):
    """Non-default runs write suffixed filenames so smoke runs never
    overwrite the committed full-scale regression artifacts
    (CLAUDE.md convention)."""
    s = "" if B == 4096 else f"_b{B}"
    return s if rounds == 640 else s + f"_r{rounds}"


def dsl_symbols():
    from chemical_kinetics_and_program_execution_tpu.engine import dsl
    return dsl.get_problem(TAG).symbols


def kgram_census(t, k, size_a):
    """(ranks, counts) of all cyclic k-grams across the population.

    Ranks are base-``size_a`` ints, first symbol most significant; with
    k=8, size_a=12 the 12^8 ≈ 4.3e8 rank space fits int64 exactly."""
    t = np.asarray(t).astype(np.int64)
    r = np.zeros(t.shape, np.int64)
    for i in range(k):
        r = r * size_a + np.roll(t, -i, axis=1)
    return np.unique(r.ravel(), return_counts=True)


def kgram_stats(t, k, size_a):
    """(distinct count, entropy in nats) of the cyclic k-gram census."""
    _, counts = kgram_census(t, k, size_a)
    p = counts / counts.sum()
    return len(counts), float(-(p * np.log(p)).sum())


def decode_motif(rank, k, size_a, syms):
    out = []
    for _ in range(k):
        rank, s = divmod(int(rank), size_a)
        out.append(syms[s])
    return " ".join(reversed(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=640)
    args = ap.parse_args()
    import jax

    m = bff.compile_bff(TAG)
    size_a = m.size_a
    syms = dsl_symbols()
    print(m.summary())
    if args.rounds <= 0 or args.rounds % SNAPS:
        raise SystemExit(
            f"--rounds must be a positive multiple of {SNAPS} "
            f"(snapshot count), got {args.rounds}")
    suffix = _suffix(args.rounds)
    rounds_per_snap = args.rounds // SNAPS
    dt_round = -math.log1p(-E / L)
    print(f"B={B} members, L={L} rings, E={E} events/round, "
          f"{args.rounds} rounds -> t_max = "
          f"{args.rounds * dt_round:.2f}")

    key = jax.random.PRNGKey(7)

    def marginals(t):
        return np.bincount(np.asarray(t).ravel(),
                           minlength=size_a) / np.asarray(t).size

    def copy_density(t):
        t = np.asarray(t)
        return float(((t == m.dot) | (t == m.comma)).mean())

    # --- Main soup: uniform iid start --------------------------------
    tape = jax.random.randint(jax.random.fold_in(key, 0), (B, L), 0,
                              size_a, dtype=np.int32)
    ds = np.arange(1, 25)
    ts = [0.0]
    mi_hist = [np.array([pair_mi(tape, d, size_a) for d in ds])]
    marg_hist = [marginals(tape)]
    kg_hist = [kgram_stats(tape, KGRAM, size_a)]  # (distinct, entropy)
    opmix_hist = []  # executed-op mix per snapshot interval
    changed = []     # fraction of cells rewritten per snapshot interval
    for snap in range(SNAPS):
        prev = np.asarray(tape)
        tape, (ops, _) = bff.run_ensemble_bff(
            jax.random.fold_in(key, 100 + snap), tape, m,
            (rounds_per_snap, E))
        t_np = np.asarray(tape)
        ts.append((snap + 1) * rounds_per_snap * dt_round)
        mi_hist.append(np.array([pair_mi(t_np, d, size_a)
                                 for d in ds]))
        marg_hist.append(marginals(t_np))
        kg_hist.append(kgram_stats(t_np, KGRAM, size_a))
        ops_tot = np.asarray(ops).sum(axis=0).astype(float)
        opmix_hist.append(ops_tot / ops_tot.sum())
        changed.append(float((t_np != prev).mean()))
    ts = np.asarray(ts)
    mi_hist = np.stack(mi_hist)
    marg_hist = np.stack(marg_hist)
    kg_hist = np.asarray(kg_hist)  # [SNAPS+1, 2]
    opmix_hist = np.stack(opmix_hist)  # [SNAPS, size_a]
    changed = np.asarray(changed)

    # --- Replicator census: which code won? ---------------------------
    ranks, counts = kgram_census(tape, KGRAM, size_a)
    order = np.argsort(counts)[::-1][:10]
    top_ranks, top_counts = ranks[order], counts[order]
    n_cells = np.asarray(tape).size
    print(f"{KGRAM}-gram census: {kg_hist[0, 0]:.0f} distinct "
          f"({kg_hist[0, 1]:.2f} nats) -> {kg_hist[-1, 0]:.0f} "
          f"({kg_hist[-1, 1]:.2f} nats)")
    for r, c in zip(top_ranks[:5], top_counts[:5]):
        print(f"  {c / n_cells:7.4f}  {decode_motif(r, KGRAM, size_a, syms)}")

    dev = marg_hist[-1] - 1 / size_a
    print(f"marginal drift at t={ts[-1]:.1f}: most enriched "
          f"{syms[int(dev.argmax())]!r} ({dev.max():+.3f}), most "
          f"depleted {syms[int(dev.argmin())]!r} ({dev.min():+.3f})")
    print(f"copy-op (dot/comma) tape density: {2 / size_a:.3f} -> "
          f"{marg_hist[-1][m.dot] + marg_hist[-1][m.comma]:.3f}")
    print(f"MI(12): {mi_hist[0][11]:.2e} -> {mi_hist[-1][11]:.2e} "
          f"nats; rewrite activity {changed[0]:.3f} -> "
          f"{changed[-1]:.3f} of cells per snapshot interval")

    # --- Copy invasion: three initial copy densities ------------------
    B3 = max(256, B // 4)
    non_copy = np.asarray([s for s in range(size_a)
                           if s not in (m.dot, m.comma)], np.int32)
    inits = {}
    k3 = jax.random.fold_in(key, 2)
    # 0%: draw from the 10 non-copy symbols.
    idx = np.asarray(jax.random.randint(
        jax.random.fold_in(k3, 0), (B3, L), 0, non_copy.size,
        dtype=np.int32))
    inits["0% copies"] = non_copy[idx]
    inits["uniform (1/6)"] = np.asarray(jax.random.randint(
        jax.random.fold_in(k3, 1), (B3, L), 0, size_a, dtype=np.int32))
    # 40%: replace a Bernoulli(0.4) mask with dot/comma evenly.
    u = np.asarray(jax.random.uniform(jax.random.fold_in(k3, 2),
                                      (B3, L)))
    cp = np.where(u < 0.2, m.dot, np.where(u < 0.4, m.comma, -1))
    inits["40% copies"] = np.where(
        cp >= 0, cp, inits["uniform (1/6)"]).astype(np.int32)

    cd_traj = {}
    soup_top = {}  # final top-10 motif ranks per soup
    for si, (name, t0) in enumerate(inits.items()):
        t_ = t0
        traj = [copy_density(t_)]
        for snap in range(SNAPS):
            # NB seed on the soup INDEX: str hash() is salted per
            # process, which silently made reruns non-reproducible.
            t_, _ = bff.run_ensemble_bff(
                jax.random.fold_in(jax.random.fold_in(key, 3),
                                   1000 * si + snap),
                t_, m, (rounds_per_snap, E))
            traj.append(copy_density(t_))
        cd_traj[name] = np.asarray(traj)
        rk, ct = kgram_census(t_, KGRAM, size_a)
        soup_top[name] = rk[np.argsort(ct)[::-1][:10]]
        print(f"copy invasion [{name}]: {traj[0]:.3f} -> {traj[-1]:.3f}"
              f"; top motif "
              f"{decode_motif(soup_top[name][0], KGRAM, size_a, syms)}")
    shared = set(map(int, soup_top["0% copies"]))
    for v in soup_top.values():
        shared &= set(map(int, v))
    print(f"top-10 motifs shared by all three soups: {len(shared)}")

    # --- Self-maintenance: is the winning motif fixed-point code? -----
    # Rings tiled with the top motif vs uniform-random control, same
    # event budget; measure the per-round fraction of cells rewritten.
    probe_rounds = 32
    rank = int(top_ranks[0])
    digits = []
    for _ in range(KGRAM):
        rank, s = divmod(rank, size_a)
        digits.append(s)
    motif_syms = np.asarray(digits[::-1], np.int32)
    tiled = np.tile(motif_syms, (256, L // KGRAM)).astype(np.int32)
    rand0 = np.asarray(jax.random.randint(
        jax.random.fold_in(key, 4), (256, L), 0, size_a,
        dtype=np.int32))
    maint = {}
    for pname, t0 in (("motif", tiled), ("random", rand0)):
        t1, _ = bff.run_ensemble_bff(
            jax.random.fold_in(key, 5), t0, m, (probe_rounds, E))
        maint[pname] = float((np.asarray(t1) != t0).mean())
    ratio = ("exact fixed point" if maint["motif"] == 0.0 else
             f"{maint['random'] / maint['motif']:.1f}x")
    print(f"self-maintenance: after {probe_rounds} rounds, "
          f"{maint['motif']:.4f} of cells differ on motif-tiled rings "
          f"vs {maint['random']:.4f} on the random control ({ratio})")

    np.savez_compressed(
        _common.out_path(f"ex6_bff_self{suffix}.npz"),
        ts=ts, ds=ds, mi_hist=mi_hist, marg_hist=marg_hist,
        opmix_hist=opmix_hist, changed=changed,
        cd_zero=cd_traj["0% copies"],
        cd_uniform=cd_traj["uniform (1/6)"],
        cd_rich=cd_traj["40% copies"],
        kg_hist=kg_hist, top_ranks=top_ranks, top_counts=top_counts,
        n_cells=n_cells, n_shared_motifs=len(shared),
        soup_top=np.stack([soup_top[k] for k in inits]),
        maint_motif=maint["motif"], maint_random=maint["random"])

    fig, axes = _common.pyplot.subplots(2, 3, figsize=(28, 14))
    axes = axes.ravel()
    hl_syms = ("dot", "comma", "plus", "minus", "zero")
    ax = axes[0]
    for s in range(size_a):
        hl = syms[s] in hl_syms
        ax.plot(ts, marg_hist[:, s] - 1 / size_a,
                "o-" if hl else "-", lw=2 if hl else 0.8,
                label=syms[s] if hl else None,
                color=None if hl else "gray", alpha=1 if hl else 0.5)
    ax.axhline(0, color="k", lw=0.5)
    ax.set_xlabel("time")
    ax.set_ylabel(r"$p_{\mathrm{sym}} - 1/12$")
    ax.set_title("self-modification selects its own instruction set")
    ax.legend()
    ax.grid()

    ax = axes[1]
    for s in range(size_a):
        hl = syms[s] in hl_syms
        ax.plot(ts[1:], opmix_hist[:, s],
                "o-" if hl else "-", lw=2 if hl else 0.8,
                label=syms[s] if hl else None,
                color=None if hl else "gray", alpha=1 if hl else 0.5)
    ax2 = ax.twinx()
    ax2.plot(ts[1:], changed, "k--", label="rewrite activity")
    ax2.set_ylabel("fraction of cells rewritten per interval")
    ax.set_xlabel("time")
    ax.set_ylabel("fraction of fetched opcodes")
    ax.set_title("executed-op mix and rewrite activity")
    ax.legend(loc="upper left")
    ax2.legend(loc="upper right")
    ax.grid()

    ax = axes[2]
    for i in (0, SNAPS // 4, SNAPS // 2, SNAPS):
        ax.plot(ds, mi_hist[i], "o-", label=f"t = {ts[i]:.1f}")
    ax.axvline(m.d1_start, color="gray", ls=":",
               label=f"head separation {m.d1_start}")
    ax.set_xlabel("site separation d")
    ax.set_ylabel("MI(d) [nats]")
    ax.set_title("head geometry imprinted by self-copying code")
    ax.legend()
    ax.grid()

    ax = axes[3]
    for name, traj in cd_traj.items():
        ax.plot(ts, traj, "o-", label=f"start {name}")
    ax.axhline(2 / size_a, color="gray", ls=":",
               label="uniform (2/12)")
    ax.set_xlabel("time")
    ax.set_ylabel("dot/comma tape density")
    ax.set_title("copy invasion: attractor from above and below")
    ax.legend()
    ax.grid()

    ax = axes[4]
    ax.semilogy(ts, kg_hist[:, 0], "o-", label="distinct 8-grams")
    ax.axhline(n_cells, color="gray", ls=":", label="cells (upper bound)")
    ax2 = ax.twinx()
    ax2.plot(ts, kg_hist[:, 1], "s--", color="tab:red",
             label="8-gram entropy")
    ax2.set_ylabel("entropy [nats]")
    ax.set_xlabel("time")
    ax.set_ylabel("distinct cyclic 8-grams (population)")
    ax.set_title("code diversity collapses onto few motifs")
    ax.legend(loc="center left")
    ax2.legend(loc="center right")
    ax.grid()

    ax = axes[5]
    labels = [decode_motif(r, KGRAM, size_a, syms).replace(" ", "\n")
              for r in top_ranks]
    ax.bar(np.arange(len(top_ranks)), top_counts / n_cells)
    ax.set_xticks(np.arange(len(top_ranks)))
    ax.set_xticklabels(labels, fontsize=7)
    ax.set_ylabel("fraction of all cells")
    ax.set_title(
        f"top final 8-grams; motif-tiled rings rewrite "
        f"{maint['motif']:.3f} vs random {maint['random']:.3f} "
        f"after {probe_rounds} rounds")
    ax.grid(axis="y")
    fig.tight_layout()
    out = _common.out_path(f"ex6_bff_self{suffix}.pdf")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
