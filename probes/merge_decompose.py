"""What inside `_blocked_merge` costs 85% of a frontier block?
(`probes/frontier1e7_decompose.py` round-4 finding: merge 0.456 s at
K=1e6 vs 0.082 s for the 512 rounds it amortises over.)

Times, at bench geometry (ex2, L=64, E=4 -> 128 int8 columns):
  hash      — `_content_hash` over the 128 columns (u64-emulated fold)
  stats     — `_merge_stats` (bucket-election scatter-min + group
              scatter-add, the two remaining colliding scatters)
  resample  — the systematic slot reallocation (cumsums + boundary
              scatter)
  gather    — the parent gather of all plane columns
Run ON THE ACCELERATOR:  python probes/merge_decompose.py
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
    """`block_until_ready` is not a reliable sync on the tunnelled
    backend (bench.py checksum note) — sync with a tiny device-side
    reduction transferred to the host."""
    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))
                         for x in leaves))

    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    E, stride = 4, 16
    for K in (1_000_000, 10_000_000):
        key = jax.random.PRNGKey(0)
        pp = tuple(jax.random.randint(jax.random.fold_in(key, c),
                                      (E, K), 0, 3, dtype=jnp.int8)
                   for c in range(stride))
        dd = tuple(jnp.zeros((E, K), jnp.int8) for _ in range(stride))
        lw = jnp.zeros((K,), jnp.float64)
        cols = [pl[e] for pl in pp for e in range(E)] + \
               [pl[e] for pl in dd for e in range(E)]

        hash_j = jax.jit(lambda cs: ensemble._content_hash(cs, bits=4))
        h = hash_j(cols)
        stats_j = jax.jit(ensemble._merge_stats)
        resample_j = jax.jit(ensemble._merge_resample)
        parent = resample_j(jax.random.PRNGKey(1), h, lw)[0]
        gather_j = jax.jit(
            lambda pp, par: tuple(pl[:, par] for pl in pp))
        packed_j = jax.jit(
            lambda pp, dd, par: (ensemble._gather_plane_columns(pp, par),
                                 ensemble._gather_plane_columns(dd, par)))

        t_hash = timed(lambda: hash_j(cols))
        t_stats = timed(lambda: stats_j(h, lw))
        t_res = timed(lambda: resample_j(jax.random.PRNGKey(1), h, lw))
        t_gath = timed(lambda: (gather_j(pp, parent),
                                gather_j(dd, parent)))
        t_pack = timed(lambda: packed_j(pp, dd, parent))
        total = t_hash + t_res + t_pack
        print(f"K={K:.0e}: hash {t_hash*1e3:7.1f} ms | "
              f"stats(within resample) {t_stats*1e3:7.1f} ms | "
              f"resample(full) {t_res*1e3:7.1f} ms | "
              f"gather(old) {t_gath*1e3:7.1f} ms | "
              f"gather(packed) {t_pack*1e3:7.1f} ms | "
              f"sum(hash+resample+packed) {total*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
