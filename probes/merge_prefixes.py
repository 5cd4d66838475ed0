"""Bisect the merge's fused-graph pathology (round-5): every op of the
sorted resample runs at ~25-33 ms dispatched alone WITH REAL ARGUMENTS
(`merge_microops.py`), but the fused pipeline costs ~2 s at K=1e7.
Times fused PREFIXES P1..P10 of the sorted pipeline and S1..S4 of
`_merge_stats` to find the step where the fused cost jumps.

Run ON THE ACCELERATOR:  python probes/merge_prefixes.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, reps=3):
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


@partial(jax.jit, static_argnums=(3,))
def sorted_prefix(key, h, lw, depth):
    K = h.shape[0]
    _, k_u = jax.random.split(key)
    idx = jnp.arange(K, dtype=jnp.int32)
    hs, perm = jax.lax.sort((h, idx), num_keys=1)
    if depth == 1:
        return hs
    ws = lw[perm]
    if depth == 2:
        return ws
    neq = hs[1:] != hs[:-1]
    start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    gid = jnp.cumsum(start.astype(jnp.int32)) - 1
    if depth == 3:
        return gid
    n_groups = gid[-1] + 1
    finite = jnp.isfinite(ws)
    m = jnp.max(jnp.where(finite, ws, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ce = jnp.cumsum(jnp.where(finite, jnp.exp(ws - m), 0.0))
    if depth == 4:
        return ce
    drop = jnp.int32(K)
    end_ce = jnp.zeros((K,), ce.dtype).at[
        jnp.where(is_end, gid, drop)].set(ce, mode="drop",
                                          unique_indices=True)
    if depth == 5:
        return end_ce
    gsum = jnp.where(
        idx < n_groups,
        end_ce - jnp.concatenate(
            [jnp.zeros((1,), ce.dtype), end_ce[:-1]]),
        0.0)
    if depth == 6:
        return gsum
    pos_start = jnp.zeros((K,), jnp.int32).at[
        jnp.where(start, gid, drop)].set(idx, mode="drop",
                                         unique_indices=True)
    orig_first = perm[pos_start]
    if depth == 7:
        return orig_first
    cum = jnp.cumsum(gsum)
    cum = cum / cum[-1]
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    f = jnp.floor(K * cum - u)
    mult = (f - jnp.concatenate([jnp.full((1,), -1.0), f[:-1]])
            ).astype(jnp.int32)
    if depth == 8:
        return mult
    bounds = jnp.cumsum(mult)[:-1]
    slot_gid = jnp.cumsum(
        jnp.zeros((K,), jnp.int32).at[bounds].add(1, mode="drop"))
    slot_gid = jnp.minimum(slot_gid, K - 1)
    if depth == 9:
        return slot_gid
    parent = orig_first[slot_gid]
    new_lw = (m + jnp.log(jnp.maximum(gsum[slot_gid], 1e-300))
              - jnp.log(jnp.maximum(mult[slot_gid], 1)))
    new_lw = jnp.where(gsum[slot_gid] > 0.0, new_lw, -jnp.inf)
    return parent, new_lw


@partial(jax.jit, static_argnums=(2,))
def stats_prefix(h, lw, depth):
    K = h.shape[0]
    n_buckets = 1 << (2 * K - 1).bit_length()
    idx = jnp.arange(K, dtype=jnp.int32)
    bkt = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    winner = jnp.full((n_buckets,), K, jnp.int32).at[bkt].min(idx)
    if depth == 1:
        return winner
    cand = winner[bkt]
    if depth == 2:
        return cand
    grp = jnp.where(h[cand] == h, cand, idx)
    if depth == 3:
        return grp
    finite = jnp.isfinite(lw)
    m = jnp.max(jnp.where(finite, lw, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    gsum = jnp.zeros((K,), lw.dtype).at[grp].add(
        jnp.where(finite, jnp.exp(lw - m), 0.0))
    return gsum


def main():
    K = 10_000_000
    key = jax.random.PRNGKey(0)
    h = jax.random.bits(key, (K,), jnp.uint32).astype(jnp.uint64)
    lw = jnp.full((K,), -np.log(K), jnp.float64)
    mk = jax.random.PRNGKey(1)

    for d in range(1, 11):
        try:
            t, tf = timed(lambda: sorted_prefix(mk, h, lw, d))
            print(f"sorted P{d:<2d} {t * 1e3:8.1f} ms (first {tf:.1f} s)",
                  flush=True)
        except Exception as e:
            print(f"sorted P{d:<2d} FAILED: {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)
    for d in range(1, 5):
        try:
            t, tf = timed(lambda: stats_prefix(h, lw, d))
            print(f"stats  S{d:<2d} {t * 1e3:8.1f} ms (first {tf:.1f} s)",
                  flush=True)
        except Exception as e:
            print(f"stats  S{d:<2d} FAILED: {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
