"""Where do the faithful BFF round's ~190 us go? (round-3 verdict
weak item: ~4x gap to the ~50 us pure-traffic floor, attributed to
"input-extraction copies + fusion spills" without a measurement.)

Times three scanned kernels at bench geometry (B=16384, L=4096,
events=64 -> transposed words [E, S, P]):

  full     — the real round (`apply_bff_round_bitsliced` inside the
             jit driver), via the bench methodology.
  circuit  — ONLY the 7.7k-gate circuit evaluation: input words fixed
             in the carry (outputs fed back in, so the scan cannot
             hoist it), no plane extraction, no write-back.
  extract  — ONLY the extraction + write-back plumbing: per-cell
             dynamic_index + roll for all 50 cells and the n_d-cell
             write-back, with a trivial elementwise op standing in for
             the circuit.

If circuit-only ~= full, the extraction is already fused to noise and
the remaining gap to the traffic floor IS the circuit's compute (gate
ops at 32 members/lane) — i.e. XLA cannot close it without a cheaper
circuit, not better data movement. Run ON THE ACCELERATOR:

    python probes/bff_round_decompose.py

Measured 2026-08-21 (TPU v5 lite): circuit-only **186.6 us/round** vs
the bench's differenced full round 190.9 us (`BENCH` bff family) —
the extraction + write-back contribute ~4 us marginal; the round is
COMPUTE-bound on the gate ops, and the ~50 us HBM "pure-traffic
floor" is not the binding constraint. (This probe's own "full" prints
~309 us because it is not length-differenced — its per-call
pack/dispatch constant is ~120 us/round at ROUNDS=400; compare
circuit-only against the bench number.) Consistent negative controls:
the batched-extraction experiment made the round SLOWER (1.7x,
reverted), and Mosaic cannot compile circuits this size (DESIGN
round-3/4 re-probes) — further speedup requires a SMALLER circuit
(synthesis-level work), not a hand-written kernel.
"""

import sys
import time

sys.path.insert(0, ".")

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    bff,
    bff_bitslice,
)
from chemical_kinetics_and_program_execution_tpu.engine.bitslice import (  # noqa: E402
    _eval_circuit,
    tapes_to_bitplanes,
    transposed_word_shape,
)
import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401,E402

B, L, EVENTS, ROUNDS = 16384, 4096, 64, 400


def timed(fn, reps=5):
    def sync(out):
        return float(sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))
                         for x in jax.tree.leaves(out)))

    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts) / ROUNDS


def main():
    m = bff.compile_bff("ex6-mini-bff")
    circ = bff_bitslice.compile_bff_circuit(m)
    ops, outputs, nb, _ = circ
    stride = L // EVENTS
    wshape = transposed_word_shape(EVENTS, B // 32)
    site_axis = -len(wshape)
    key = jax.random.PRNGKey(0)
    pt = jax.random.randint(key, (B, L), 0, m.size_a, jnp.int32)
    dt = jax.random.randint(jax.random.fold_in(key, 1), (B, L), 0,
                            m.size_a, jnp.int32)
    n_in = (m.n_p + m.n_d) * nb
    n_out = len(outputs)

    # full round: the engine itself, differenced like the bench.
    state = (pt, dt)

    def full():
        return bff.run_ensemble_bff(jax.random.PRNGKey(3), state, m,
                                    (ROUNDS, EVENTS),
                                    engine="bitslice")[0]

    t_full = timed(full, reps=3)

    # circuit-only: feed outputs back into the first inputs.
    w0 = [jax.random.bits(jax.random.fold_in(key, 10 + i), wshape,
                          jnp.uint32) for i in range(n_in)]

    @jax.jit
    def circuit_scan(ws):
        def body(ws, _):
            outs = _eval_circuit(ops, outputs, ws, wshape)
            new = list(ws)
            for i in range(min(n_in, n_out)):
                new[i] = outs[i]
            return tuple(new), None
        ws, _ = jax.lax.scan(body, ws, None, length=ROUNDS)
        return ws[0]

    t_circ = timed(lambda: circuit_scan(tuple(w0)))

    # extraction-only: same plumbing, circuit replaced by a NOT.
    p_bp = tapes_to_bitplanes(pt, stride, nb, transpose=True)
    d_bp = tapes_to_bitplanes(dt, stride, nb, transpose=True)

    @jax.jit
    def extract_scan(p_bp, d_bp, k):
        def body(carry, kk):
            p_bp, d_bp = carry
            shift = jax.random.randint(kk, (), 0, L, jnp.int32)
            in_words, locs_d = [], []
            for bp, lo, n in ((p_bp, m.p_lo, m.n_p),
                              (d_bp, m.d_lo, m.n_d)):
                for j in range(n):
                    a = shift + lo + j
                    c = jnp.mod(a, stride)
                    e = jnp.floor_divide(a, stride)
                    x = jax.lax.dynamic_index_in_dim(bp, c, 0,
                                                     keepdims=False)
                    x = jnp.roll(x, -e, axis=site_axis)
                    for kbit in range(nb):
                        in_words.append(x[kbit])
                    if bp is d_bp:
                        locs_d.append((c, e))
            for j in range(m.n_d):
                c, e = locs_d[j]
                v = jnp.stack([~in_words[(m.n_p + j) * nb + kbit]
                               for kbit in range(nb)])
                v = jnp.roll(v, e, axis=site_axis)
                d_bp = jax.lax.dynamic_update_index_in_dim(d_bp, v, c, 0)
            return (p_bp, d_bp), None

        (p_bp, d_bp), _ = jax.lax.scan(
            body, (p_bp, d_bp), jax.random.split(k, ROUNDS))
        return d_bp

    t_ext = timed(lambda: extract_scan(p_bp, d_bp,
                                       jax.random.PRNGKey(4)), reps=3)

    print(f"full round   : {t_full*1e6:7.1f} us/round", flush=True)
    print(f"circuit only : {t_circ*1e6:7.1f} us/round "
          f"({100*t_circ/t_full:.0f}% of full)", flush=True)
    print(f"extract only : {t_ext*1e6:7.1f} us/round "
          f"({100*t_ext/t_full:.0f}% of full)", flush=True)


if __name__ == "__main__":
    main()
