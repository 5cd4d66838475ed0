"""Pallas probe: gather-free plane-round FSM kernel (not on any code path).

Mirrors the XLA plane-round formulation
(`ensemble._machine_specs_planes` / `_machine_writes_planes`) as a single
Pallas TPU kernel: decision-DAG walk via word-shift field unpacking (no
dynamic int indexing, no f64) with the write phase fused in.

Status (measured 2026-08-16, see DESIGN.md "Why no Pallas kernels"):
this container's tunnelled TPU cannot compile ANY Pallas kernel — even a
minimal int8 elementwise kernel fails Mosaic remote-compile with
HTTP 500 (`tpu_compile_helper subprocess exit code 1`). The probe is
kept runnable for a future platform where Mosaic works; it first
verifies bit-exactness against the XLA round, then times both.
"""
import sys

sys.setrecursionlimit(100000)

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chemical_kinetics_and_program_execution_tpu.engine import ensemble
dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
B, L = 16384, 4096
E = L // 16
n = dm.n_cells
print("nodes:", len(dm.nodes), "n_cells:", n, "bits:", dm.bits)

key = jax.random.PRNGKey(0)
cells = [jax.random.randint(jax.random.PRNGKey(c), (B, E), 0, dm.size_a,
                            dtype=jnp.int8) for c in range(n)]
u = jax.random.uniform(jax.random.PRNGKey(99), (B, E), jnp.float32)


def fsm_kernel(*refs):
    in_refs = refs[:n]
    out_refs = refs[n:]
    cells_v = [r[:] for r in in_refs]
    bits = dm.bits
    fields = 31 // bits
    state = jnp.full(cells_v[0].shape, dm.root, jnp.int8)
    spec = jnp.zeros(cells_v[0].shape, jnp.int8)
    for node in dm.nodes:
        mask = state == node.node_id
        b = cells_v[node.cell].astype(jnp.int32)
        shift_amt = bits * (b % fields)
        widx = b // fields

        def unpack(words):
            v = jnp.right_shift(jnp.int32(words[0]), shift_amt)
            for wi in range(1, len(words)):
                v = jnp.where(widx == wi,
                              jnp.right_shift(jnp.int32(words[wi]),
                                              shift_amt), v)
            return v & ((1 << bits) - 1)

        child = unpack(node.child_words).astype(jnp.int8)
        nspec = unpack(node.spec_words).astype(jnp.int8)
        state = jnp.where(mask, child, state)
        spec = jnp.where(mask, nspec, spec)
    spec32 = spec.astype(jnp.int32)
    sh5 = 5 * (spec32 % 6)
    wi6 = spec32 // 6
    for c in range(n):
        words = dm.wr_words[c]
        f = jnp.right_shift(jnp.int32(words[0]), sh5)
        for wix in range(1, len(words)):
            f = jnp.where(wi6 == wix,
                          jnp.right_shift(jnp.int32(words[wix]), sh5), f)
        f = f & 31
        wr = jnp.right_shift(f, 4) == 1
        out_refs[c][:] = jnp.where(wr, (f & 15).astype(jnp.int8),
                                   cells_v[c])


BB = 1024


@jax.jit
def pallas_round(*cells):
    return pl.pallas_call(
        fsm_kernel,
        out_shape=[jax.ShapeDtypeStruct((B, E), jnp.int8)] * n,
        grid=(B // BB,),
        in_specs=[pl.BlockSpec((BB, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * n,
        out_specs=[pl.BlockSpec((BB, E), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n,
    )(*cells)


@jax.jit
def xla_round(*cells):
    spec = ensemble._machine_specs_planes(dm, list(cells), u)
    return ensemble._machine_writes_planes(dm, spec, list(cells))


def sync(arrs):
    return float(sum(jnp.sum(a.astype(jnp.float32)) for a in arrs))


# correctness
got = pallas_round(*cells)
want = xla_round(*cells)
print("pallas == xla:", all(bool(jnp.all(g == w))
                            for g, w in zip(got, want)))

N = 30


@jax.jit
def scan_pallas(cells):
    def step(c, _):
        return tuple(pallas_round(*c)), None
    out, _ = jax.lax.scan(step, tuple(c for c in cells), None, length=N)
    return out


@jax.jit
def scan_xla(cells):
    def step(c, _):
        return tuple(xla_round(*c)), None
    out, _ = jax.lax.scan(step, tuple(c for c in cells), None, length=N)
    return out


for name, fn in [("xla   ", scan_xla), ("pallas", scan_pallas)]:
    out = fn(tuple(cells))
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(tuple(cells))
        sync(out)
        best = min(best, (time.time() - t0) / N)
    print(f"{name}: {best*1e3:.3f} ms/round-equivalent "
          f"-> {B*E/best:.3e} sites/s")
