"""Pallas probe: packed-int32 plane-round FSM kernel (not on any code path).

The round-2 Mosaic re-probe (DESIGN.md "Why no Pallas kernels") found
this platform's remote compiler accepts int32/float32 elementwise
kernels while still rejecting int8 — but the ensemble hot path stores
tapes as int8 planes precisely for HBM bandwidth, so a naive int32
Pallas port pays 4x traffic. This probe implements the designated
workaround: planes packed 4 symbols per int32 word (8-bit little-endian
fields), unpacked by in-kernel shifts, so HBM traffic stays at the int8
level while the kernel touches only int32 — the dtype set measured as
working.

Mirrors the XLA plane-round FSM+write phases
(`ensemble._machine_specs_planes` / `_machine_writes_planes`) exactly
like `probes/pallas_plane_round.py`, on the choose-free ex5 machine.

Run on CPU (CKPE_PLATFORM=cpu): verifies bit-exactness in Pallas
interpret mode. Run against the TPU tunnel: verifies on-chip, then
times the packed Pallas kernel vs the XLA int8 formulation.
"""
import os
import sys

sys.setrecursionlimit(100000)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from chemical_kinetics_and_program_execution_tpu.utils import config

config.initialize()

from chemical_kinetics_and_program_execution_tpu.engine import ensemble

ON_TPU = jax.default_backend() == "tpu"
try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - pallas tpu import is best-effort
    pltpu = None

dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
B = 16384 if ON_TPU else 256
L = 4096 if ON_TPU else 512
E = L // 16
assert E % 4 == 0
EW = E // 4  # packed words per row
n = dm.n_cells
print(f"machine: {dm.tag}, nodes={len(dm.nodes)}, n_cells={n}, "
      f"bits={dm.bits}, B={B}, E={E} ({EW} packed words)")

cells = [jax.random.randint(jax.random.PRNGKey(c), (B, E), 0, dm.size_a,
                            dtype=jnp.int8) for c in range(n)]
u = jax.random.uniform(jax.random.PRNGKey(99), (B, E), jnp.float32)


def pack4(plane):
    """[B, E] int8 -> [B, E//4] int32, 4 symbols per word (LE fields)."""
    w = plane.astype(jnp.int32).reshape(plane.shape[0], -1, 4)
    return (w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
            | (w[..., 3] << 24))


def unpack4(words):
    """[B, E//4] int32 -> [B, E] int8."""
    parts = [(words >> (8 * j)) & 0xFF for j in range(4)]
    return jnp.stack(parts, axis=-1).reshape(
        words.shape[0], -1).astype(jnp.int8)


def _divmod_const(v, d, vmax):
    """``v // d`` and ``v % d`` for 0 <= v <= vmax, division-free.

    Mosaic's lowering of int32 ``%``/``//`` dies in a _convert_helper
    infinite recursion on this jax version (measured 2026-08-19, see
    DESIGN.md); a comparison cascade over the tiny value range compiles
    fine and costs vmax//d compares.
    """
    q = jnp.zeros_like(v)
    for k in range(1, vmax // d + 1):
        q = q + (v >= k * d).astype(v.dtype)
    return q, v - q * d


def _fsm_slot(cells_v):
    """FSM walk + write decode on one field slot (all int32 [BB, EW])."""
    bits = dm.bits
    fields = 31 // bits
    state = jnp.full(cells_v[0].shape, dm.root, jnp.int32)
    spec = jnp.zeros(cells_v[0].shape, jnp.int32)
    for node in dm.nodes:
        mask = state == node.node_id
        b = cells_v[node.cell]
        widx, rem = _divmod_const(b, fields, dm.size_a - 1)
        shift_amt = bits * rem

        def unpack(words):
            v = jnp.right_shift(jnp.int32(words[0]), shift_amt)
            for wi in range(1, len(words)):
                v = jnp.where(widx == wi,
                              jnp.right_shift(jnp.int32(words[wi]),
                                              shift_amt), v)
            return v & ((1 << bits) - 1)

        state = jnp.where(mask, unpack(node.child_words), state)
        spec = jnp.where(mask, unpack(node.spec_words), spec)
    wi6, rem6 = _divmod_const(spec, 6, dm.num_specs - 1)
    sh5 = 5 * rem6
    outs = []
    for c in range(n):
        words = dm.wr_words[c]
        f = jnp.right_shift(jnp.int32(words[0]), sh5)
        for wix in range(1, len(words)):
            f = jnp.where(wi6 == wix,
                          jnp.right_shift(jnp.int32(words[wix]), sh5), f)
        f = f & 31
        wr = jnp.right_shift(f, 4) == 1
        outs.append(jnp.where(wr, f & 15, cells_v[c]))
    return outs


def fsm_kernel_packed(*refs):
    in_refs = refs[:n]
    out_refs = refs[n:]
    words = [r[:] for r in in_refs]
    # 4 independent site slots per word; walk each, then repack.
    out_words = [jnp.zeros_like(words[0]) for _ in range(n)]
    for j in range(4):
        slot = [(w >> (8 * j)) & 0xFF for w in words]
        outs = _fsm_slot(slot)
        for c in range(n):
            out_words[c] = out_words[c] | (outs[c] << (8 * j))
    for c in range(n):
        out_refs[c][:] = out_words[c]


BB = 1024 if ON_TPU else 64


def _imap(i):
    # np.int32(0), not 0: under x64 a Python-int index-map constant
    # lowers to i64 and the remote Mosaic dies legalizing
    # `func.return (i32, i64)` (measured 2026-08-19, see DESIGN.md).
    return (i, np.int32(0))


def make_pallas_round(interpret):
    kw = {}
    if not interpret and pltpu is not None:
        kw = dict(
            in_specs=[pl.BlockSpec((BB, EW), _imap,
                                   memory_space=pltpu.VMEM)] * n,
            out_specs=[pl.BlockSpec((BB, EW), _imap,
                                    memory_space=pltpu.VMEM)] * n,
        )
    else:
        kw = dict(
            in_specs=[pl.BlockSpec((BB, EW), _imap)] * n,
            out_specs=[pl.BlockSpec((BB, EW), _imap)] * n,
        )

    @jax.jit
    def pallas_round(*packed):
        return pl.pallas_call(
            fsm_kernel_packed,
            out_shape=[jax.ShapeDtypeStruct((B, EW), jnp.int32)] * n,
            grid=(B // BB,),
            interpret=interpret,
            **kw,
        )(*packed)

    return pallas_round


@jax.jit
def xla_round(*cells):
    spec = ensemble._machine_specs_planes(dm, list(cells), u)
    return ensemble._machine_writes_planes(dm, spec, list(cells))


def sync(arrs):
    return float(sum(jnp.sum(a.astype(jnp.float32)) for a in arrs))


packed = [pack4(c) for c in cells]
want = xla_round(*cells)

# Correctness: interpret mode everywhere; compiled mode on TPU.
got_i = make_pallas_round(interpret=True)(*packed)
ok_i = all(bool(jnp.all(unpack4(g) == w)) for g, w in zip(got_i, want))
print("packed pallas (interpret) == xla:", ok_i)
assert ok_i

if not ON_TPU:
    print("CPU run: correctness verified in interpret mode; "
          "run against the TPU tunnel for Mosaic compile + timing.")
    sys.exit(0)

pallas_round = make_pallas_round(interpret=False)
got = pallas_round(*packed)
ok = all(bool(jnp.all(unpack4(g) == w)) for g, w in zip(got, want))
print("packed pallas (mosaic) == xla:", ok)

N = 30


@jax.jit
def scan_pallas(packed):
    def step(c, _):
        return tuple(pallas_round(*c)), None
    out, _ = jax.lax.scan(step, tuple(packed), None, length=N)
    return out


@jax.jit
def scan_xla(cells):
    def step(c, _):
        return tuple(xla_round(*c)), None
    out, _ = jax.lax.scan(step, tuple(cells), None, length=N)
    return out


for name, fn, args in [("xla int8    ", scan_xla, tuple(cells)),
                       ("pallas pk32 ", scan_pallas, tuple(packed))]:
    out = fn(args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(args)
        sync(out)
        best = min(best, (time.time() - t0) / N)
    print(f"{name}: {best*1e3:.3f} ms/round-equivalent "
          f"-> {B*E/best:.3e} sites/s")
