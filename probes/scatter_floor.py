"""INVALIDATED (round-5): most rows here jit zero-arg
lambdas over CAPTURED arrays - XLA constant-folds those at
compile time (HloEvaluator, the absurd first-call times), so
the runtimes are just the ~26 ms dispatch + output-copy floor,
NOT op costs. Only rows whose functions take real arguments
(sort_u64 here) are valid. See probes/merge_microops.py for
the corrected argument-passing measurements.

Is the frontier merge's scatter floor real? (round-4 verdict weak
#2: the two colliding-index scatters in `_merge_stats` are ~76% of a
blocked-frontier block at K=1e7, and "the sort route was excluded by
measurement, the scatter route wasn't").

Measures, at K = 1e6 / 1e7 on the accelerator:
  add_f64    — zeros(K).at[grp].add(w)          (the gsum scatter)
  add_f32    — same in float32
  add_unique — same with a permutation + unique_indices=True
  min_i32    — full(2K).at[b].min(idx)          (the bucket election)
  min_split8 — the same election as 8 vmapped private tables + min
  sort_u64   — jax.lax.sort of the 64-bit hash keys (+ payload), the
               canonical alternative; compile time reported separately
               (round-2 note: a 1e5 argsort compiled in 36 s — re-probe
               at real shapes before trusting that exclusion)
  sorted_seg — group-sum given sorted keys via cumsum + boundary
               gathers (scatter-free segment sum)

Run ON THE ACCELERATOR:  python probes/scatter_floor.py
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
    for K in (1_000_000, 10_000_000):
        key = jax.random.PRNGKey(0)
        n_buckets = 1 << (2 * K - 1).bit_length()
        h = jax.random.bits(key, (K,), jnp.uint32).astype(jnp.uint64)
        b = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
        # grp: ~realistic group ids (some duplicates): random in [0, K)
        grp = jax.random.randint(jax.random.fold_in(key, 1), (K,), 0, K,
                                 dtype=jnp.int32)
        w = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (K,),
                                      jnp.float64))
        perm = jax.random.permutation(jax.random.fold_in(key, 3), K
                                      ).astype(jnp.int32)
        idx = jnp.arange(K, dtype=jnp.int32)

        tests = {}
        tests["add_f64"], _ = timed(jax.jit(
            lambda: jnp.zeros((K,), jnp.float64).at[grp].add(w)))
        tests["add_f32"], _ = timed(jax.jit(
            lambda: jnp.zeros((K,), jnp.float32).at[grp].add(
                w.astype(jnp.float32))))
        tests["add_unique"], _ = timed(jax.jit(
            lambda: jnp.zeros((K,), jnp.float64).at[perm].add(
                w, unique_indices=True)))
        tests["min_i32"], _ = timed(jax.jit(
            lambda: jnp.full((n_buckets,), K, jnp.int32).at[b].min(idx)))

        R = 8
        b8 = b.reshape(R, K // R)
        i8 = idx.reshape(R, K // R)
        tests["min_split8"], _ = timed(jax.jit(
            lambda: jax.vmap(
                lambda bb, ii: jnp.full((n_buckets,), K, jnp.int32
                                        ).at[bb].min(ii))(b8, i8
                                                          ).min(axis=0)))

        sort_j = jax.jit(lambda hh, ii: jax.lax.sort((hh, ii),
                                                     num_keys=1))
        t_sort, t_sort_first = timed(lambda: sort_j(h, idx))
        tests["sort_u64"] = t_sort

        hs, _ = sort_j(h, idx)

        def sorted_seg(hs, ws):
            # Scatter-free group sum over sorted keys: boundaries ->
            # group id by cumsum -> inclusive-scan diff at ends.
            new = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                   (hs[1:] != hs[:-1]).astype(jnp.int32)])
            gid = jnp.cumsum(new) - 1
            cw = jnp.cumsum(ws)
            is_end = jnp.concatenate([hs[1:] != hs[:-1],
                                      jnp.ones((1,), bool)])
            end_cw = jnp.where(is_end, cw, 0.0)
            # total per group = cw at end minus cw at previous end
            return gid, end_cw

        tests["sorted_seg"], _ = timed(jax.jit(
            lambda: sorted_seg(hs, w)))

        line = " | ".join(f"{k} {v * 1e3:8.1f} ms"
                          for k, v in tests.items())
        print(f"K={K:.0e}: {line} | sort first-call "
              f"{t_sort_first:.1f} s", flush=True)


if __name__ == "__main__":
    main()
