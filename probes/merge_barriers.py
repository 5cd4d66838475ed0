"""INVALIDATED (round-5): most rows here jit zero-arg
lambdas over CAPTURED arrays - XLA constant-folds those at
compile time (HloEvaluator, the absurd first-call times), so
the runtimes are just the ~26 ms dispatch + output-copy floor,
NOT op costs. Only rows whose functions take real arguments
(sort_u64 here) are valid. See probes/merge_microops.py for
the corrected argument-passing measurements.

Fusion-pathology probe: the merge's ops each run at the ~26 ms
dispatch floor when dispatched separately, but the SAME pipeline fused
into one jit costs 2.6-2.9 s at K=1e7 (`probes/merge_variants.py`,
`probes/merge_microops.py`) — XLA is fusing the random-access chain
into something that serialises. `lax.optimization_barrier` between
stages keeps ONE dispatch while forbidding cross-stage fusion.

Times, at K=1e7 (bench hash distribution):
  sorted_fused    — the sort-based resample, no barriers (baseline)
  sorted_barrier  — same with a barrier after every stage
  stats_fused     — current `_merge_stats`, no barriers
  stats_barrier   — `_merge_stats` with barriers between election,
                    group-join, and group-sum
Run ON THE ACCELERATOR:  python probes/merge_barriers.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    ensemble,
)

B = jax.lax.optimization_barrier


def timed(fn, reps=5):
    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))
                         for x in leaves))

    t0 = time.time()
    sync(fn())
    tf = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts), tf


def sorted_resample(key, h, lw, *, barrier):
    def b(x):
        return B(x) if barrier else x

    K = h.shape[0]
    _, k_u = jax.random.split(key)
    idx = jnp.arange(K, dtype=jnp.int32)
    hs, perm = b(jax.lax.sort((h, idx), num_keys=1))
    ws = b(lw[perm])
    neq = hs[1:] != hs[:-1]
    start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    gid = b(jnp.cumsum(start.astype(jnp.int32)) - 1)
    n_groups = gid[-1] + 1
    finite = jnp.isfinite(ws)
    m = jnp.max(jnp.where(finite, ws, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ce = b(jnp.cumsum(jnp.where(finite, jnp.exp(ws - m), 0.0)))
    drop = jnp.int32(K)
    end_ce = b(jnp.zeros((K,), ce.dtype).at[
        jnp.where(is_end, gid, drop)].set(ce, mode="drop",
                                          unique_indices=True))
    gsum = b(jnp.where(
        idx < n_groups,
        end_ce - jnp.concatenate(
            [jnp.zeros((1,), ce.dtype), end_ce[:-1]]),
        0.0))
    pos_start = b(jnp.zeros((K,), jnp.int32).at[
        jnp.where(start, gid, drop)].set(idx, mode="drop",
                                         unique_indices=True))
    orig_first = b(perm[pos_start])
    cum = jnp.cumsum(gsum)
    cum = b(cum / cum[-1])
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    f = jnp.floor(K * cum - u)
    mult = b((f - jnp.concatenate([jnp.full((1,), -1.0), f[:-1]])
              ).astype(jnp.int32))
    bounds = jnp.cumsum(mult)[:-1]
    slot_gid = b(jnp.cumsum(
        jnp.zeros((K,), jnp.int32).at[bounds].add(1, mode="drop")))
    slot_gid = jnp.minimum(slot_gid, K - 1)
    parent = b(orig_first[slot_gid])
    new_lw = (m + jnp.log(jnp.maximum(gsum[slot_gid], 1e-300))
              - jnp.log(jnp.maximum(mult[slot_gid], 1)))
    new_lw = jnp.where(gsum[slot_gid] > 0.0, new_lw, -jnp.inf)
    return parent, new_lw, n_groups


def stats(h, lw, *, barrier):
    def b(x):
        return B(x) if barrier else x

    K = h.shape[0]
    n_buckets = 1 << (2 * K - 1).bit_length()
    idx = jnp.arange(K, dtype=jnp.int32)
    bkt = b((h & jnp.uint64(n_buckets - 1)).astype(jnp.int32))
    winner = b(jnp.full((n_buckets,), K, jnp.int32).at[bkt].min(idx))
    cand = b(winner[bkt])
    grp = b(jnp.where(h[cand] == h, cand, idx))
    finite = jnp.isfinite(lw)
    m = jnp.max(jnp.where(finite, lw, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    gsum = b(jnp.zeros((K,), lw.dtype).at[grp].add(
        jnp.where(finite, jnp.exp(lw - m), 0.0)))
    merged_lw = jnp.where(
        gsum > 0.0, m + jnp.log(jnp.maximum(gsum, 1e-300)), -jnp.inf)
    is_rep = grp == idx
    return grp, merged_lw, is_rep, is_rep.sum()


def main():
    K = 10_000_000
    key = jax.random.PRNGKey(0)
    h = jax.random.bits(key, (K,), jnp.uint32).astype(jnp.uint64)
    # duplicate-heavy variant too: ~50% dups via modulo
    lw = jnp.full((K,), -np.log(K), jnp.float64)
    mk = jax.random.PRNGKey(1)

    for name, fn in [
        ("sorted_fused", jax.jit(
            lambda: sorted_resample(mk, h, lw, barrier=False))),
        ("sorted_barrier", jax.jit(
            lambda: sorted_resample(mk, h, lw, barrier=True))),
        ("stats_fused", jax.jit(lambda: stats(h, lw, barrier=False))),
        ("stats_barrier", jax.jit(lambda: stats(h, lw, barrier=True))),
    ]:
        try:
            t, tf = timed(fn)
            print(f"{name:15s} {t * 1e3:8.1f} ms (first {tf:.1f} s)",
                  flush=True)
        except Exception as e:
            print(f"{name:15s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
