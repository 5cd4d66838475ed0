"""Speed-of-light audit for the SSA family (round-5 verdict weak #6:
4.9e5 trajectories/s, unchanged for two rounds, never profiled).

One `ssa_batch` call at bench geometry (autocatalysis net: R=10, S=3,
max_order=2; B=65536, E=1000) scans 1000 steps; each step is
  (a) 2 threefry draws (exponential dt + branch uniform, [B] each)
  (b) mass-action propensities via a [R, S, B] broadcast factor tensor
      built max_order times (the j loop)
  (c) [R, B] cumsum + comparison select
  (d) one-hot [S,R]@[R,B] matmul state update
  (e) recording (t [B] f64, n [S, B] i32) per step -> 1.3 GB/call out.

Floors at bench geometry (v5e ~800 GB/s HBM):
  record-only: 1.31 GB -> ~1.6 ms/call
  step math as [B]-vectors (per-reaction unrolled: ~R*(order+2)+R ops
  ~= 50 [B]-f32 arrays r+w): ~26 GB -> ~33 ms/call
  the [R,S,B] broadcast formulation: +2 j-iterations x [R,S,B] x ~4
  arrays ~= 63 GB -> ~79 ms/call  <- the formulation overhead

Variants timed:
  full        — ssa_batch as benched
  norec       — same step, scan carries only the final state (isolates
                the recording cost)
  rng_only    — scan that only draws the randoms and sums them
  prop_only   — scan that only evaluates propensities from a FIXED n

Run ON THE ACCELERATOR:  python probes/ssa_decompose.py
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

from chemical_kinetics_and_program_execution_tpu.models import (  # noqa: E402
    gillespie,
)

B, E = 65536, 1000
DTYPE = jnp.float32


def timed(fn, reps=3):
    def sync(out):
        # bench_ssa's checksum form: ravel[:1] of the [B,E,S] chain
        # outputs hit a compile-helper failure on this backend
        leaves = jax.tree.leaves(out)
        return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))

    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    net = gillespie.autocatalysis_network(
        1.0, 100.0, 1.0, 1.0, 100.0, 1.0, 10.0, 2.0)  # bench params
    n0 = (0, 0, 2000)
    key = jax.random.PRNGKey(0)

    t_full = timed(lambda: gillespie.ssa_batch(
        key, n0, net.static, E, B, DTYPE))
    print(f"full      {t_full * 1e3:8.1f} ms  "
          f"({B / t_full:.3e} traj/s, {B * E / t_full:.3e} events/s)",
          flush=True)

    reactants_np = np.asarray(net.static[0])
    max_order = int(reactants_np.max())
    reactants, products, rates = (
        jnp.asarray(np.asarray(x)) for x in net.static)
    n_r, n_s = reactants.shape
    stoich_t = (products - reactants).astype(DTYPE).T

    @partial(jax.jit, static_argnums=())
    def norec(key):
        def step(carry, k):
            t, n = carry
            nf = n.astype(DTYPE)
            prop = jnp.broadcast_to(rates.astype(DTYPE)[:, None],
                                    (n_r, nf.shape[1]))
            for j in range(max_order):
                factor = jnp.where(reactants[:, :, None] > j,
                                   jnp.maximum(nf[None, :, :] - j, 0.0),
                                   1.0)
                prop = prop * jnp.prod(factor, axis=1)
            total = prop.sum(axis=0)
            alive = total > 0
            k1, k2 = jax.random.split(k)
            dt = jnp.where(
                alive,
                jax.random.exponential(k1, total.shape, DTYPE)
                / jnp.maximum(total, 1e-30),
                jnp.inf).astype(jnp.float64)
            u = jax.random.uniform(k2, total.shape, DTYPE) * total
            cum = jnp.cumsum(prop, axis=0)
            r = jnp.minimum((u[None, :] >= cum).sum(axis=0), n_r - 1)
            onehot = (jnp.arange(n_r)[:, None] == r[None, :]).astype(
                DTYPE)
            delta = (stoich_t @ onehot).astype(jnp.int32)
            n_new = jnp.where(alive[None, :], n + delta, n)
            return (t + dt, n_new), None

        n0_b = jnp.broadcast_to(
            jnp.asarray(n0, jnp.int32)[:, None], (n_s, B))
        _, _ = carry = jax.lax.scan(
            step, (jnp.zeros(B, jnp.float64), n0_b),
            jax.random.split(key, E))
        return carry[0]

    print(f"norec     {timed(lambda: norec(key)) * 1e3:8.1f} ms",
          flush=True)

    @jax.jit
    def rng_only(key):
        def step(acc, k):
            k1, k2 = jax.random.split(k)
            a = jax.random.exponential(k1, (B,), DTYPE)
            b = jax.random.uniform(k2, (B,), DTYPE)
            return acc + a + b, None

        acc, _ = jax.lax.scan(step, jnp.zeros(B, DTYPE),
                              jax.random.split(key, E))
        return acc

    print(f"rng_only  {timed(lambda: rng_only(key)) * 1e3:8.1f} ms",
          flush=True)

    n_fix = jnp.broadcast_to(jnp.asarray(n0, jnp.int32)[:, None],
                             (n_s, B))

    @jax.jit
    def prop_only():
        def step(acc, _):
            nf = (n_fix + acc.astype(jnp.int32)[None, :] % 3).astype(
                DTYPE)
            prop = jnp.broadcast_to(rates.astype(DTYPE)[:, None],
                                    (n_r, B))
            for j in range(max_order):
                factor = jnp.where(reactants[:, :, None] > j,
                                   jnp.maximum(nf[None, :, :] - j, 0.0),
                                   1.0)
                prop = prop * jnp.prod(factor, axis=1)
            return acc + prop.sum(axis=0), None

        acc, _ = jax.lax.scan(step, jnp.zeros(B, DTYPE), None, length=E)
        return acc

    print(f"prop_only {timed(prop_only) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
