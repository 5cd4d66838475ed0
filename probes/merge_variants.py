"""End-to-end timing of `_blocked_merge` variants (round-5 verdict
weak #2: break the merge's 'scatter floor').

Variants, each ONE fused jit at bench geometry (ex2, L=64, E=4):
  current   — hash + `_merge_resample` (hash-table election scatters)
              + 2x packed row gathers            (shipped round 4)
  sorted2   — hash + `_merge_resample_sorted` (70 ms u64 sort replaces
              the election) + 2x packed row gathers
  sortedP   — hash + sorted resample + ONE pair-packed row gather
              (`_gather_planes_pair_packed`, halves gather rows)
  gather2 / gatherP — the gathers alone, for attribution

Run ON THE ACCELERATOR:  python probes/merge_variants.py
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


@jax.jit
def merge_sorted2(key, pp, dd, lw):
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = ensemble._content_hash(cols, bits=4)
    parent, new_lw, n_unique = ensemble._merge_resample_sorted(
        key, h, lw)
    pp = ensemble._gather_plane_columns(pp, parent)
    dd = ensemble._gather_plane_columns(dd, parent)
    return pp, dd, new_lw - jnp.max(new_lw), n_unique


@jax.jit
def merge_sortedP(key, pp, dd, lw):
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = ensemble._content_hash(cols, bits=4)
    parent, new_lw, n_unique = ensemble._merge_resample_sorted(
        key, h, lw)
    pp, dd = ensemble._gather_planes_pair_packed(pp, dd, parent)
    return pp, dd, new_lw - jnp.max(new_lw), n_unique


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
        parent = jnp.sort(jax.random.randint(
            jax.random.fold_in(key, 99), (K,), 0, K, jnp.int32))

        def report(name, fn):
            try:
                t, tf = timed(fn)
                print(f"K={K:.0e} {name:10s} {t * 1e3:8.1f} ms "
                      f"(first {tf:.1f} s)", flush=True)
            except Exception as e:  # compile-helper crashes etc.
                print(f"K={K:.0e} {name:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

        report("current",
               lambda: ensemble._blocked_merge(mk, pp, dd, lw))
        report("sorted2", lambda: merge_sorted2(mk, pp, dd, lw))
        report("sortedP", lambda: merge_sortedP(mk, pp, dd, lw))
        g2 = jax.jit(lambda pp, dd, par: (
            ensemble._gather_plane_columns(pp, par),
            ensemble._gather_plane_columns(dd, par)))
        report("gather2", lambda: g2(pp, dd, parent))
        gP = jax.jit(ensemble._gather_planes_pair_packed)
        report("gatherP", lambda: gP(pp, dd, parent))


if __name__ == "__main__":
    main()
