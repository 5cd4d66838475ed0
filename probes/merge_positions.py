"""End-to-end timing of the position-space blocked merge (round-5)
vs the shipped hash-table fused merge, at bench geometry.

Run ON THE ACCELERATOR:  python probes/merge_positions.py
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

hash_j = jax.jit(lambda cols: ensemble._content_hash(cols, bits=4))
gather_j = jax.jit(lambda pp, dd, par: (
    ensemble._gather_plane_columns(pp, par),
    ensemble._gather_plane_columns(dd, par)))


def merge_positions(key, pp, dd, lw):
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = hash_j(cols)
    parent, new_lw, nu = ensemble._merge_resample_positions(key, h, lw)
    npp, ndd = gather_j(pp, dd, parent)
    return npp, ndd, new_lw, nu


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

        def report(name, fn):
            try:
                t, tf = timed(fn)
                print(f"K={K:.0e} {name:10s} {t * 1e3:8.1f} ms "
                      f"(first {tf:.1f} s)", flush=True)
            except Exception as e:
                print(f"K={K:.0e} {name:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)

        report("positions", lambda: merge_positions(mk, pp, dd, lw))
        report("current",
               lambda: ensemble._blocked_merge(mk, pp, dd, lw))


if __name__ == "__main__":
    main()
