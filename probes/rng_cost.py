"""Per-round RNG cost in the ensemble scan: threefry (jax.random
default) vs the raw XLA RngBitGenerator op.

probes/round_decompose.py showed the plane round at 0.674 ms while the
bench round costs ~1.26-1.46 ms; the difference is per-round RNG +
bookkeeping. This probe times each candidate uniform source in the
same scanned shape ([B, E] f32 per round).

Run: timeout 900 python probes/rng_cost.py   (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chemical_kinetics_and_program_execution_tpu.utils import config  # noqa: E402

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


B, E, iters = 16384, 256, 100


def timed(scanned, *args, reps=3):
    float(scanned(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(scanned(*args))
        ts.append((time.time() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), iters)

    @jax.jit
    def threefry(keys):
        def body(acc, k):
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, 16, dtype=jnp.int32)
            u = jax.random.uniform(k2, (B, E), dtype=jnp.float32)
            return acc + u[0, 0] + shift.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    print(f"threefry split+randint+uniform [{B},{E}]: "
          f"{timed(threefry, keys) * 1e3:.3f} ms/round", flush=True)

    @jax.jit
    def rbg(state0):
        def body(carry, _):
            acc, st = carry
            st, bits = jax.lax.rng_bit_generator(
                st, (B, E), dtype=jnp.uint32)
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            st, sb = jax.lax.rng_bit_generator(st, (1,), dtype=jnp.uint32)
            shift = (sb[0] & 15).astype(jnp.int32)
            return (acc + u[0, 0] + shift.astype(jnp.float32), st), None
        (acc, st), _ = jax.lax.scan(body, (jnp.float32(0), state0), None,
                                    length=iters)
        return acc

    state0 = jnp.zeros((4,), jnp.uint32)
    print(f"rng_bit_generator uniforms [{B},{E}]: "
          f"{timed(rbg, state0) * 1e3:.3f} ms/round", flush=True)




def main_planes():
    """Bit-plane shape for the ex4 sampling circuit: 72 uint32 planes."""
    n_rand, W, E = 72, 512, 256  # ex4: 3 choose levels x 24 bits, B=16384
    keys = jax.random.split(jax.random.PRNGKey(0), iters)

    @jax.jit
    def threefry_bits(keys):
        def body(acc, k):
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, 16, dtype=jnp.int32)
            r = jax.random.bits(k2, (n_rand, W, E), jnp.uint32)
            return acc + r[0, 0, 0] + shift.astype(jnp.uint32), None
        acc, _ = jax.lax.scan(body, jnp.uint32(0), keys)
        return acc

    print(f"threefry bits [{n_rand},{W},{E}]: "
          f"{timed(threefry_bits, keys) * 1e3:.3f} ms/round", flush=True)

    @jax.jit
    def rbg_bits(state0):
        def body(carry, _):
            acc, st = carry
            st, r = jax.lax.rng_bit_generator(
                st, (n_rand, W, E), dtype=jnp.uint32)
            st, sb = jax.lax.rng_bit_generator(st, (1,), dtype=jnp.uint32)
            shift = sb[0] & 15
            return (acc + r[0, 0, 0] + shift, st), None
        (acc, st), _ = jax.lax.scan(body, (jnp.uint32(0), state0), None,
                                    length=iters)
        return acc

    state0 = jnp.arange(4, dtype=jnp.uint32)
    print(f"rng_bit_generator bits [{n_rand},{W},{E}]: "
          f"{timed(rbg_bits, state0) * 1e3:.3f} ms/round", flush=True)

    @jax.jit
    def rbg_keyed(keys):
        # per-round state derived from the scanned threefry key: keeps
        # the run_ensemble key-per-round structure (no carried state)
        def body(acc, k):
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, 16, dtype=jnp.int32)
            st = jnp.concatenate([jax.random.key_data(
                jax.random.wrap_key_data(k2, impl='threefry2x32'))] * 2)
            _, r = jax.lax.rng_bit_generator(
                st, (n_rand, W, E), dtype=jnp.uint32)
            return acc + r[0, 0, 0] + shift.astype(jnp.uint32), None
        acc, _ = jax.lax.scan(body, jnp.uint32(0), keys)
        return acc

    print(f"rbg keyed-per-round bits [{n_rand},{W},{E}]: "
          f"{timed(rbg_keyed, keys) * 1e3:.3f} ms/round", flush=True)


if __name__ == "__main__":
    main()
    main_planes()
