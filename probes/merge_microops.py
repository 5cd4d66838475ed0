"""Micro-op timings for redesigning `_merge_stats`/`_merge_resample`
at K=1e7.

CLOSURE-CAPTURE CAVEAT (round-5 lesson): a first version of this probe
jitted zero-arg lambdas over captured arrays — XLA treats captured
arrays as CONSTANTS and constant-folds the op at compile time (the
observed 100-700 s "compiles" were the HloEvaluator folding 1e7-element
ops on the host), so every "measurement" was just the ~26 ms dispatch +
output-copy floor. All functions below take their operands as REAL
ARGUMENTS; only these numbers are trustworthy. (The same caveat
invalidated `scatter_floor*.py`'s closure rows and all of
`merge_barriers.py`; `merge_variants.py`/`merge_staged.py` always
passed arguments and stand.)

Run ON THE ACCELERATOR:  python probes/merge_microops.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, reps=5):
    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))
                         for x in leaves))

    t0 = time.time()
    sync(fn())
    t_first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts), t_first


def main():
    K = 10_000_000
    key = jax.random.PRNGKey(0)
    n_buckets = 1 << (2 * K - 1).bit_length()
    h = jax.random.bits(key, (K,), jnp.uint32).astype(jnp.uint64)
    b = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    w = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (K,),
                                  jnp.float64))
    perm = jax.random.permutation(jax.random.fold_in(key, 3), K
                                  ).astype(jnp.int32)
    sperm = jnp.sort(jax.random.randint(jax.random.fold_in(key, 4),
                                        (K,), 0, K, jnp.int32))
    idx = jnp.arange(K, dtype=jnp.int32)
    big = jnp.full((n_buckets,), 1, jnp.int32)

    def report(name, fn):
        t, tf = timed(fn)
        print(f"{name:22s} {t * 1e3:8.1f} ms  (first {tf:.1f} s)",
              flush=True)

    report("gather_f64_rand", jax.jit(lambda: w[perm]))
    report("gather_f64_sorted", jax.jit(lambda: w[sperm]))
    report("gather_i32_rand", jax.jit(lambda: idx[perm]))
    report("gather_u64_rand", jax.jit(lambda: h[perm]))
    report("gather_i32_big_table", jax.jit(lambda: big[b]))
    report("cumsum_f64", jax.jit(lambda: jnp.cumsum(w)))
    report("cumsum_i32", jax.jit(lambda: jnp.cumsum(idx)))
    report("cmp_u64_shift", jax.jit(lambda: h[1:] != h[:-1]))
    report("scatter_set_unique", jax.jit(
        lambda: jnp.zeros((K,), jnp.int32).at[perm].set(
            idx, unique_indices=True)))
    report("exp_where", jax.jit(
        lambda: jnp.where(jnp.isfinite(w), jnp.exp(w - 1.0), 0.0)))
    # the current stats internals, isolated
    winner = jnp.full((n_buckets,), K, jnp.int32).at[b].min(idx)
    report("stats.winner_scatter", jax.jit(
        lambda: jnp.full((n_buckets,), K, jnp.int32).at[b].min(idx)))
    report("stats.cand_gather", jax.jit(lambda: winner[b]))
    cand = winner[b]
    report("stats.hcand_gather", jax.jit(lambda: h[cand]))
    # sort-based pipeline pieces
    sort_j = jax.jit(lambda: jax.lax.sort((h, idx), num_keys=1))
    report("sort_u64_i32", sort_j)
    hs, p = sort_j()
    report("sorted.wperm", jax.jit(lambda: w[p]))
    report("sorted.boundary+gid", jax.jit(lambda: jnp.cumsum(
        jnp.concatenate([jnp.ones((1,), jnp.int32),
                         (hs[1:] != hs[:-1]).astype(jnp.int32)])) - 1))


if __name__ == "__main__":
    main()
