"""INVALIDATED (round-5): most rows here jit zero-arg
lambdas over CAPTURED arrays - XLA constant-folds those at
compile time (HloEvaluator, the absurd first-call times), so
the runtimes are just the ~26 ms dispatch + output-copy floor,
NOT op costs. Only rows whose functions take real arguments
(sort_u64 here) are valid. See probes/merge_microops.py for
the corrected argument-passing measurements.

K=1e7 companion to `scatter_floor.py` — each variant printed as it
completes (the combined probe's 1e7 row hung inside one compile), plus
a no-op dispatch-floor baseline and the fused real-merge reference.

Run ON THE ACCELERATOR:  python probes/scatter_floor_1e7.py
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
    grp = jax.random.randint(jax.random.fold_in(key, 1), (K,), 0, K,
                             dtype=jnp.int32)
    w = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (K,),
                                  jnp.float64))
    perm = jax.random.permutation(jax.random.fold_in(key, 3), K
                                  ).astype(jnp.int32)
    idx = jnp.arange(K, dtype=jnp.int32)

    def report(name, fn, reps=5):
        t, t_first = timed(fn, reps)
        print(f"{name:12s} {t * 1e3:8.1f} ms   (first {t_first:.1f} s)",
              flush=True)

    report("noop", jax.jit(lambda: w + 1.0))
    report("add_f64", jax.jit(
        lambda: jnp.zeros((K,), jnp.float64).at[grp].add(w)))
    report("add_f32", jax.jit(
        lambda: jnp.zeros((K,), jnp.float32).at[grp].add(
            w.astype(jnp.float32))))
    report("add_unique", jax.jit(
        lambda: jnp.zeros((K,), jnp.float64).at[perm].add(
            w, unique_indices=True)))
    report("min_i32", jax.jit(
        lambda: jnp.full((n_buckets,), K, jnp.int32).at[b].min(idx)))
    sort_j = jax.jit(lambda hh, ii: jax.lax.sort((hh, ii), num_keys=1))
    report("sort_u64", lambda: sort_j(h, idx))
    sort1_j = jax.jit(lambda hh: jax.lax.sort(hh))
    report("sort1_u64", lambda: sort1_j(h))


if __name__ == "__main__":
    main()
