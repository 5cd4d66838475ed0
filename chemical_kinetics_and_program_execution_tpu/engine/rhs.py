"""The runtime dy/dt kernel: dense gather → product → segment-sum.

This replaces the reference's per-call interpreter descent
(`tape_multiverse.scm:1464-1500` + the Python→C→Scheme FFI round-trip,
`markov_tapes.py:283-287`) with one jit-compiled device computation over
the static tables produced by `compile.py`:

    pyr  = marginal pyramid of p                    (log-depth reductions)
    w    = w_const · Π ratio(pyr[w_num], pyr[w_den])          [W worlds]
    s    = segment_sum of w over window signatures            [K sigs]
    v    = s[e_sig] · Π ratio(pyr[e_num], pyr[e_den])         [E events]
    dy   = sorted segment-sum of ±v into window ranks         [A**k]

where ``ratio(n, d) = n > 0 ? n / max(n, d) : 0`` reproduces the
reference's numerical-noise guards exactly
(`tape_multiverse.scm:560-562, 1263-1269`).

Everything composes with `jax.vmap` (ensembles of SPDs) and with sharding
of the event axis (`parallel/sharding.py`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..markov import pyramid
from .compile import CompiledProblem


@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """CompiledProblem arrays resident on device."""

    size_a: int
    cl_k: int
    num_signatures: int
    state_size: int
    w_num: jax.Array
    w_den: jax.Array
    w_const: jax.Array
    pair_world: jax.Array
    pair_sig: jax.Array
    e_num: jax.Array
    e_den: jax.Array
    e_sig: jax.Array
    ev_idx: jax.Array
    ev_sign: jax.Array
    ev_tgt: jax.Array


def device_tables(compiled: CompiledProblem,
                  dtype=jnp.float64) -> DeviceTables:
    as_i32 = partial(jnp.asarray, dtype=jnp.int32)
    return DeviceTables(
        size_a=compiled.size_a,
        cl_k=compiled.cl_k,
        num_signatures=compiled.num_signatures,
        state_size=compiled.state_size,
        w_num=as_i32(compiled.w_num),
        w_den=as_i32(compiled.w_den),
        w_const=jnp.asarray(compiled.w_const, dtype=dtype),
        pair_world=as_i32(compiled.pair_world),
        pair_sig=as_i32(compiled.pair_sig),
        e_num=as_i32(compiled.e_num),
        e_den=as_i32(compiled.e_den),
        e_sig=as_i32(compiled.e_sig),
        ev_idx=as_i32(compiled.ev_idx),
        ev_sign=jnp.asarray(compiled.ev_sign, dtype=dtype),
        ev_tgt=as_i32(compiled.ev_tgt),
    )


def _ratio_prod(pyr, num_idx, den_idx):
    num = pyr[num_idx]
    den = pyr[den_idx]
    r = jnp.where(num > 0, num / jnp.maximum(num, den), 0.0)
    return jnp.prod(r, axis=-1)


def dy_dt_from_tables(tables: DeviceTables, p: jax.Array) -> jax.Array:
    """Pure function mapping an SPD vector to its time derivative."""
    dtype = tables.w_const.dtype
    pyr = pyramid(p.astype(dtype), tables.size_a, tables.cl_k)
    # Stage 1: world weights.
    w = tables.w_const * _ratio_prod(pyr, tables.w_num, tables.w_den)
    # Stage 2: signature weights.
    s = jax.ops.segment_sum(
        w[tables.pair_world], tables.pair_sig,
        num_segments=tables.num_signatures,
    )
    # Stage 3: event values and the pre-sorted signed scatter.
    v = s[tables.e_sig] * _ratio_prod(pyr, tables.e_num, tables.e_den)
    signed = v[tables.ev_idx] * tables.ev_sign
    return jax.ops.segment_sum(
        signed, tables.ev_tgt, num_segments=tables.state_size,
        indices_are_sorted=True,
    )


def make_dy_dt(compiled: CompiledProblem, dtype=jnp.float64, jit=True):
    """Builds a jitted ``p -> dp/dt`` closure for a compiled problem."""
    tables = device_tables(compiled, dtype=dtype)
    fn = partial(dy_dt_from_tables, tables)
    return jax.jit(fn) if jit else fn


def make_batched_dy_dt(compiled: CompiledProblem, dtype=jnp.float64):
    """Vmapped variant: maps ``[B, A**k] -> [B, A**k]`` (ensemble axis)."""
    tables = device_tables(compiled, dtype=dtype)
    return jax.jit(jax.vmap(partial(dy_dt_from_tables, tables)))
