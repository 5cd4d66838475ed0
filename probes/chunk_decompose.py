"""Decompose the config-5 bit-sliced round and settle the VMEM-chunking
hypothesis (REJECTED — see RESULTS.md "chunked circuit eval").

Hypothesis tested: config 5's 2.5 MB word arrays make the 555-gate
circuit's live set spill VMEM, so evaluating the circuit over member
CHUNKS (0.5 MB, the headline's array size) should recover the headline's
per-word-op rate. Measured on the TPU (2026-08-19): it does not —
  circuit/unchunked  0.801 ms   (full (2, 2500, 125)-word arrays)
  circuit/map        0.717 ms   (lax.map over 5 member chunks)
  circuit/unrolled   0.900 ms   (Python-unrolled chunk loop)
and the reason is that the circuit was never the bottleneck at all:
  round/full         0.758 ms   (real apply_round_bitsliced)
  round/identity     0.794 ms   (circuit replaced by identity wires)
The round is entirely tap-gather/roll/write-back bound — XLA already
fuses the 555 gate ops into the data movement at 2.5 MB shapes. A full
end-to-end run of the chunked layout confirmed neutrality: 9.71e9
transitions/s vs the committed 3-D layout's 9.9e9 (bench_config5,
same-day TPU), with a ~490 s cold-compile regression from the lax.map.

Variants timed at the config-5 geometry (B=1e7, L=32, E=2):
  circuit/unchunked   555-gate eval on the committed [E, S, P] words
  circuit/map         same gates inside lax.map over C member chunks
  circuit/unrolled    same gates, Python-unrolled chunk loop (no
                      while-loop fusion boundary)
  round/full          the real apply_round_bitsliced
  round/identity      full round with the circuit replaced by identity
                      (taps + rolls + write-back cost only)
The headline geometry's circuit (0.5 MB words) runs as the reference
point: per WORD it is ~3x slower than config 5's big arrays — big
elementwise arrays are fine on this TPU; the 5.7x transitions/s gap to
the headline lives in per-call pack/unpack + per-round data movement,
not in gate-op efficiency.

Run: timeout 1800 python probes/chunk_decompose.py   (TPU, ~1 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chemical_kinetics_and_program_execution_tpu.utils import config  # noqa: E402

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import bitslice as bs  # noqa: E402
from chemical_kinetics_and_program_execution_tpu.engine import ensemble  # noqa: E402


def timed(fn, *args, iters=50, reps=3, tag=""):
    @jax.jit
    def scanned(*a):
        def body(c, _):
            return fn(*c), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return jax.tree.reduce(
            lambda s, x: s + jnp.sum(x.ravel()[:1].astype(jnp.float32)),
            c, jnp.float32(0))

    t0 = time.time()
    float(scanned(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(scanned(*args))
        ts.append((time.time() - t0) / iters)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"  {tag:24s} {med * 1e3:8.3f} ms/iter   "
          f"(compile {compile_s:6.1f} s)", flush=True)
    return med


def circuit_variants(dm, circ, wshape, label, chunks=1):
    """Times the circuit eval on [*wshape] words; with chunks=C > 1 the
    leading wshape axis must factor as C*rest and the chunked variants
    evaluate [wshape/C] slices (the rejected VMEM-chunking experiment,
    reconstructed here without the 4-D layout code)."""
    ops, outputs, nb, n_rand = circ
    n_in = (dm.n_p + dm.n_d) * nb
    key = jax.random.PRNGKey(0)
    words = jax.random.bits(key, (n_in, *wshape), jnp.uint32)
    mb = int(jnp.prod(jnp.array(wshape))) * 4 / 1e6
    print(f"[{label}] circuit eval on {wshape} words ({mb:.2f} MB/array)",
          flush=True)

    def unchunked(w):
        outs = bs._eval_circuit(ops, outputs, list(w), w[0].shape)
        return (jnp.stack(outs) ^ w[:len(outs)],)

    timed(unchunked, words, tag="circuit/unchunked")

    if chunks > 1:
        C = chunks
        S = wshape[-2]
        assert S % C == 0
        cshape = (*wshape[:-2], C, S // C, wshape[-1])
        cw = words.reshape((n_in, *cshape))
        cw = jnp.moveaxis(cw, -3, 1)  # [n_in, C, ..., S/C, P]

        def mapped(w):
            def chunk_eval(ws):
                return tuple(bs._eval_circuit(ops, outputs, list(ws),
                                              ws[0].shape))
            outs = jax.lax.map(chunk_eval,
                               tuple(w[i] for i in range(n_in)))
            return (jnp.stack(outs) ^ w[:len(outs)],)

        timed(mapped, cw, tag="circuit/map")

        def unrolled(w):
            cols = []
            for c in range(C):
                ws = [w[i, c] for i in range(n_in)]
                cols.append(jnp.stack(
                    bs._eval_circuit(ops, outputs, ws, ws[0].shape)))
            return (jnp.stack(cols, axis=1) ^ w[:len(outputs)],)

        timed(unrolled, cw, tag="circuit/unrolled")


def round_variants(dm, circ, B, L, E, label):
    stride = L // E
    key = jax.random.PRNGKey(1)
    pt = jax.random.randint(key, (B, L), 0, dm.size_a, dtype=jnp.int32)
    dtp = jnp.zeros((B, L), jnp.int32)
    pp = bs.tapes_to_bitplanes(pt, stride, circ[2], transpose=True)
    dd = bs.tapes_to_bitplanes(dtp, stride, circ[2], transpose=True)
    wshape = bs.transposed_word_shape(E, B // 32)
    site_axis = -len(wshape)
    print(f"[{label}] round on bp{tuple(pp.shape)} site_axis={site_axis}",
          flush=True)

    def full(pp, dd, sh):
        p2, d2 = bs.apply_round_bitsliced(dm, circ, pp, dd, sh,
                                          site_axis=site_axis)
        return p2, d2, (sh + 1) % stride

    timed(full, pp, dd, jnp.int32(0), tag="round/full")

    nb = circ[2]
    ident = ([("in", i, 0) for i in range((dm.n_p + dm.n_d) * nb)],
             tuple(range((dm.n_p + dm.n_d) * nb)), nb, 0)

    def identity(pp, dd, sh):
        p2, d2 = bs.apply_round_bitsliced(dm, ident, pp, dd, sh,
                                          site_axis=site_axis)
        return p2, d2, (sh + 1) % stride

    timed(identity, pp, dd, jnp.int32(0), tag="round/identity")


def main():
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    circ = bs.compile_round_circuit(dm)

    # Config-5 geometry: committed layout (2, 2500, 125); the chunk
    # variants slice S into 5 chunks of 500 (the rejected experiment's
    # 0.5 MB chunk size).
    B5, L5, E5 = 10_000_000, 32, 2
    w5 = bs.transposed_word_shape(E5, B5 // 32)
    circuit_variants(dm, circ, w5, "config5", chunks=5)
    round_variants(dm, circ, B5, L5, E5, "config5")

    # Headline geometry reference (0.5 MB words).
    circuit_variants(dm, circ, (256, 512), "headline")


if __name__ == "__main__":
    main()
