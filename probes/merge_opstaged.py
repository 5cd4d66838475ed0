"""Fully op-staged merge (round-5): `merge_prefixes.py` shows the
fused-graph pathology starts at TWO ops (sort+gather fused = 208 ms vs
67 + 33 separate; five fused stages = 1.5 s), so this probe runs the
ENTIRE merge as one-op-per-dispatch jits and compares end-to-end
against the shipped fused `_blocked_merge` at bench geometry.

Run ON THE ACCELERATOR:  python probes/merge_opstaged.py
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

# --- one-op jits (all operands are ARGUMENTS — no constant folding) --

j_sort = jax.jit(lambda h, i: jax.lax.sort((h, i), num_keys=1))
j_take_f64 = jax.jit(lambda w, p: w[p])
j_take_i32 = jax.jit(lambda x, p: x[p])
j_neq = jax.jit(lambda hs: hs[1:] != hs[:-1])
j_gid = jax.jit(lambda neq: jnp.cumsum(jnp.concatenate(
    [jnp.ones((1,), jnp.int32), neq.astype(jnp.int32)])) - 1)
j_max = jax.jit(lambda ws: jnp.where(
    jnp.isfinite(jnp.max(jnp.where(jnp.isfinite(ws), ws, -jnp.inf))),
    jnp.max(jnp.where(jnp.isfinite(ws), ws, -jnp.inf)), 0.0))
j_expw = jax.jit(lambda ws, m: jnp.where(
    jnp.isfinite(ws), jnp.exp(ws - m), 0.0))
j_cumsum_f64 = jax.jit(jnp.cumsum)
j_cumsum_i32 = jax.jit(jnp.cumsum)


@jax.jit
def j_maskidx_end(neq, gid, K):
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    return jnp.where(is_end, gid, K)


@jax.jit
def j_maskidx_start(neq, gid, K):
    start = jnp.concatenate([jnp.ones((1,), bool), neq])
    return jnp.where(start, gid, K)


j_scatter_set_f64 = jax.jit(
    lambda idxs, vals, K: jnp.zeros((K,), vals.dtype).at[idxs].set(
        vals, mode="drop", unique_indices=True),
    static_argnums=(2,))
j_scatter_set_i32 = jax.jit(
    lambda idxs, vals, K: jnp.zeros((K,), jnp.int32).at[idxs].set(
        vals, mode="drop", unique_indices=True),
    static_argnums=(2,))
j_gsum = jax.jit(lambda end_ce, n_groups: jnp.where(
    jnp.arange(end_ce.shape[0]) < n_groups,
    end_ce - jnp.concatenate(
        [jnp.zeros((1,), end_ce.dtype), end_ce[:-1]]),
    0.0))
j_norm = jax.jit(lambda cum: cum / cum[-1])
j_mult = jax.jit(lambda cum, u, K: (
    jnp.floor(K * cum - u)
    - jnp.concatenate([jnp.full((1,), -1.0),
                       jnp.floor(K * cum - u)[:-1]])).astype(jnp.int32),
    static_argnums=(2,))
j_slotgid = jax.jit(lambda mult, K: jnp.minimum(jnp.cumsum(
    jnp.zeros((K,), jnp.int32).at[jnp.cumsum(mult)[:-1]].add(
        1, mode="drop")), K - 1), static_argnums=(1,))
j_newlw = jax.jit(lambda gsum_s, mult_s, m: jnp.where(
    gsum_s > 0.0,
    m + jnp.log(jnp.maximum(gsum_s, 1e-300))
    - jnp.log(jnp.maximum(mult_s, 1)), -jnp.inf))


def merge_opstaged(key, pp, dd, lw):
    E = pp[0].shape[0]
    K = lw.shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = hash_j(cols)
    idx = jnp.arange(K, dtype=jnp.int32)
    _, k_u = jax.random.split(key)
    hs, perm = j_sort(h, idx)
    ws = j_take_f64(lw, perm)
    neq = j_neq(hs)
    gid = j_gid(neq)
    m = j_max(ws)
    e = j_expw(ws, m)
    ce = j_cumsum_f64(e)
    idx_end = j_maskidx_end(neq, gid, jnp.int32(K))
    end_ce = j_scatter_set_f64(idx_end, ce, K)
    n_groups = gid[-1] + 1
    gsum = j_gsum(end_ce, n_groups)
    idx_start = j_maskidx_start(neq, gid, jnp.int32(K))
    pos_start = j_scatter_set_i32(idx_start, idx, K)
    orig_first = j_take_i32(perm, pos_start)
    cum = j_norm(j_cumsum_f64(gsum))
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    mult = j_mult(cum, u, K)
    slot_gid = j_slotgid(mult, K)
    parent = j_take_i32(orig_first, slot_gid)
    gsum_s = j_take_f64(gsum, slot_gid)
    mult_s = j_take_i32(mult, slot_gid)
    new_lw = j_newlw(gsum_s, mult_s.astype(jnp.float64), m)
    npp, ndd = gather_j(pp, dd, parent)
    return npp, ndd, new_lw, n_groups


hash_j = jax.jit(lambda cols: ensemble._content_hash(cols, bits=4))
gather_j = jax.jit(lambda pp, dd, par: (
    ensemble._gather_plane_columns(pp, par),
    ensemble._gather_plane_columns(dd, par)))


@jax.jit
def merge_barriered(key, pp, dd, lw):
    """ONE jit with `optimization_barrier` on every scatter/gather
    OPERAND (indices and updates) — the bisection hypothesis is that
    scatters/gathers whose producers fuse into them serialise their
    fused producer chain per element."""
    B = jax.lax.optimization_barrier
    E = pp[0].shape[0]
    K = lw.shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = ensemble._content_hash(cols, bits=4)
    idx = jnp.arange(K, dtype=jnp.int32)
    _, k_u = jax.random.split(key)
    hs, perm = B(jax.lax.sort((B(h), idx), num_keys=1))
    ws = lw[perm]
    neq = hs[1:] != hs[:-1]
    start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    gid = jnp.cumsum(start.astype(jnp.int32)) - 1
    n_groups = gid[-1] + 1
    finite = jnp.isfinite(ws)
    m = jnp.max(jnp.where(finite, ws, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ce = jnp.cumsum(jnp.where(finite, jnp.exp(ws - m), 0.0))
    drop = jnp.int32(K)
    idx_end, ce_b = B((jnp.where(is_end, gid, drop), ce))
    end_ce = jnp.zeros((K,), ce.dtype).at[idx_end].set(
        ce_b, mode="drop", unique_indices=True)
    gsum = jnp.where(
        idx < n_groups,
        end_ce - jnp.concatenate(
            [jnp.zeros((1,), ce.dtype), end_ce[:-1]]),
        0.0)
    idx_start = B(jnp.where(start, gid, drop))
    pos_start = jnp.zeros((K,), jnp.int32).at[idx_start].set(
        idx, mode="drop", unique_indices=True)
    orig_first = perm[B(pos_start)]
    cum = jnp.cumsum(B(gsum))
    cum = cum / cum[-1]
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    f = jnp.floor(K * cum - u)
    mult = (f - jnp.concatenate([jnp.full((1,), -1.0), f[:-1]])
            ).astype(jnp.int32)
    bounds = B(jnp.cumsum(mult)[:-1])
    slot_gid = jnp.cumsum(
        jnp.zeros((K,), jnp.int32).at[bounds].add(1, mode="drop"))
    slot_gid = B(jnp.minimum(slot_gid, K - 1))
    parent = orig_first[slot_gid]
    new_lw = (m + jnp.log(jnp.maximum(gsum[slot_gid], 1e-300))
              - jnp.log(jnp.maximum(mult[slot_gid], 1)))
    new_lw = jnp.where(gsum[slot_gid] > 0.0, new_lw, -jnp.inf)
    parent = B(parent)
    npp = ensemble._gather_plane_columns(pp, parent)
    ndd = ensemble._gather_plane_columns(dd, parent)
    return npp, ndd, new_lw, n_groups


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


def main():
    E, stride = 4, 16
    for K in (1_000_000, 10_000_000):
        key = jax.random.PRNGKey(0)
        pp = tuple(jax.random.randint(jax.random.fold_in(key, c),
                                      (E, K), 0, 3, dtype=jnp.int8)
                   for c in range(stride))
        dd = tuple(jnp.zeros((E, K), jnp.int8) for _ in range(stride))
        lw = jnp.full((K,), -np.log(K), jnp.float64)
        mk = jax.random.PRNGKey(1)

        # correctness cross-check vs the sorted fused twin (CPU-green
        # invariants suite covers the algorithm; here check slot-weight
        # totals agree with _merge_stats group totals)
        def report(name, fn):
            try:
                t, tf = timed(fn)
                print(f"K={K:.0e} {name:9s} {t * 1e3:8.1f} ms "
                      f"(first {tf:.1f} s)", flush=True)
            except Exception as e:
                print(f"K={K:.0e} {name:9s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)

        report("opstaged", lambda: merge_opstaged(mk, pp, dd, lw))
        report("barriered", lambda: merge_barriered(mk, pp, dd, lw))
        report("current",
               lambda: ensemble._blocked_merge(mk, pp, dd, lw))


if __name__ == "__main__":
    main()
