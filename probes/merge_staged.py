"""Staged-merge timing (round-5): `probes/merge_barriers.py` showed
the sort-based resample costs 607 ms as its OWN jit at K=1e7 but ~1.9 s
when fused with the hash and gathers (and barriers inside one jit make
it WORSE, 1836 ms) — so the fix is coarse STAGING into separate jit
dispatches (~26 ms dispatch floor each on the tunnel, microseconds in
a non-tunnelled deployment).

Times, at bench geometry (ex2, L=64, E=4; K = 1e6 / 1e7):
  staged    — jit(hash) + jit(_merge_resample_sorted) + jit(gathers)
              dispatched in sequence (the proposed `_blocked_merge`)
  staged4   — same with the gather packed 8 cells/word at 4 bits
              (symbols < 16 is already the merge hash's precondition,
              enforced by `_validate_blocked_plan`) — halves gather
              bytes if the row gather is byte-bound
  current   — the shipped single-jit `_blocked_merge` (reference)

Run ON THE ACCELERATOR:  python probes/merge_staged.py
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
def hash_j(cols):
    return ensemble._content_hash(cols, bits=4)


resample_j = jax.jit(ensemble._merge_resample_sorted)


@jax.jit
def gather_j(pp, dd, parent):
    return (ensemble._gather_plane_columns(pp, parent),
            ensemble._gather_plane_columns(dd, parent))


@jax.jit
def gather4_j(pp, dd, parent):
    def pack4(planes):
        stride = len(planes)
        E, K = planes[0].shape
        st = jnp.stack(planes)
        n = stride * E
        pad = (-n) % 8
        t = st.reshape(n, K).T
        if pad:
            t = jnp.concatenate(
                [t, jnp.zeros((K, pad), t.dtype)], axis=1)
        t8 = t.reshape(K, (n + pad) // 8, 8).astype(jnp.int32) & 0xF
        w = t8[..., 0]
        for i in range(1, 8):
            w = w | (t8[..., i] << (4 * i))
        return w

    def unpack4(g, stride, E, dtype):
        K = g.shape[0]
        n = stride * E
        cells = jnp.stack([(g >> (4 * i)) & 0xF for i in range(8)],
                          axis=-1).reshape(K, g.shape[1] * 8)
        back = cells[:, :n].T.reshape(stride, E, K).astype(dtype)
        return tuple(back[c] for c in range(stride))

    stride = len(pp)
    E, K = pp[0].shape
    gp = jnp.take(pack4(pp), parent, axis=0)
    gd = jnp.take(pack4(dd), parent, axis=0)
    return (unpack4(gp, stride, E, pp[0].dtype),
            unpack4(gd, stride, E, dd[0].dtype))


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

        def staged(g):
            cols = [pl[e] for pl in pp for e in range(E)] + \
                   [pl[e] for pl in dd for e in range(E)]
            h = hash_j(cols)
            parent, new_lw, nu = resample_j(mk, h, lw)
            np_, nd = g(pp, dd, parent)
            return np_, nd, new_lw, nu

        def report(name, fn):
            try:
                t, tf = timed(fn)
                print(f"K={K:.0e} {name:10s} {t * 1e3:8.1f} ms "
                      f"(first {tf:.1f} s)", flush=True)
            except Exception as e:
                print(f"K={K:.0e} {name:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

        report("staged", lambda: staged(gather_j))
        report("staged4", lambda: staged(gather4_j))
        report("current",
               lambda: ensemble._blocked_merge(mk, pp, dd, lw))


if __name__ == "__main__":
    main()
