"""The runtime dy/dt kernel: levelized gather → product → segment-sum.

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

The event ratio products are evaluated over the shared **prefix tree** of
factor chains (`tree.py`): one ratio gather and one parent multiply per
tree node instead of re-walking every event's full chain — a ~5× cut in
gather traffic for the deep-branching problems (ex4: 79M → 13M gathers
per RHS). The padded-chain kernel is kept (``kernel="chains"``) as the
structure-independent cross-check.

Everything composes with `jax.vmap` (ensembles of SPDs) and with sharding
of the event axis (`parallel/sharding.py`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..markov import guarded_ratio as _ratio
from ..markov import guarded_ratio_prod as _ratio_prod
from ..markov import pyramid
from .compile import CompiledDualProblem, CompiledProblem
from . import tree as tree_mod


@dataclasses.dataclass(frozen=True)
class DeviceLevel:
    num: jax.Array
    den: jax.Array
    parent: jax.Array
    ev_node: jax.Array


@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """CompiledProblem arrays resident on device (tree form)."""

    size_a: int
    cl_k: int
    num_signatures: int
    state_size: int
    w_num: jax.Array
    w_den: jax.Array
    w_const: jax.Array
    pair_world: jax.Array
    pair_sig: jax.Array
    levels: tuple[DeviceLevel, ...]
    e_sig: jax.Array  # [E] signature id, in level-grouped event order
    ev_idx: jax.Array
    ev_sign: jax.Array
    ev_tgt: jax.Array
    dual: bool = False


def device_tables(compiled: CompiledProblem,
                  dtype=jnp.float64) -> DeviceTables:
    one_slot = compiled.pyramid_size - 1
    tr = tree_mod.build_tree(
        compiled.e_num, compiled.e_den, one_slot, compiled.pyramid_size
    )
    tgt_orig, tgt_adj = tree_mod.recover_targets(
        compiled.num_events, compiled.ev_idx, compiled.ev_sign,
        compiled.ev_tgt,
    )
    order = tr.event_order
    ev_idx, ev_sign, ev_tgt = tree_mod.sorted_scatter(
        tgt_orig[order], tgt_adj[order]
    )
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
        levels=tuple(
            DeviceLevel(
                num=as_i32(lv.num), den=as_i32(lv.den),
                parent=as_i32(lv.parent), ev_node=as_i32(lv.ev_node),
            )
            for lv in tr.levels
        ),
        e_sig=as_i32(np.asarray(compiled.e_sig)[order]),
        ev_idx=as_i32(ev_idx),
        ev_sign=jnp.asarray(ev_sign, dtype=dtype),
        ev_tgt=as_i32(ev_tgt),
        dual=isinstance(compiled, CompiledDualProblem),
    )


def _build_pyramid(tables, p, dtype):
    """Marginal pyramid for the kernel: one pyramid in the shared-SPD
    case, or [prog pyramid | data pyramid | 1-slot] for dual-SPD tables
    (indices were offset at compile time, `compile_problem_dual`)."""
    if not tables.dual:
        return pyramid(p.astype(dtype), tables.size_a, tables.cl_k)
    half = tables.size_a ** tables.cl_k
    pyr_p = pyramid(p[:half].astype(dtype), tables.size_a, tables.cl_k)
    pyr_d = pyramid(p[half:].astype(dtype), tables.size_a, tables.cl_k)
    return jnp.concatenate([pyr_p[:-1], pyr_d[:-1], pyr_p[-1:]])


def _signature_weights(tables, pyr):
    """Stages 1-2: world weights summed per revealed-window signature."""
    w = tables.w_const * _ratio_prod(pyr, tables.w_num, tables.w_den)
    return jax.ops.segment_sum(
        w[tables.pair_world], tables.pair_sig,
        num_segments=tables.num_signatures,
    )


def dy_dt_from_tables(tables: DeviceTables, p: jax.Array) -> jax.Array:
    """Pure function mapping an SPD vector to its time derivative."""
    dtype = tables.w_const.dtype
    pyr = _build_pyramid(tables, p, dtype)
    s = _signature_weights(tables, pyr)
    # Stage 3: event values via the levelized prefix tree.
    ev_vals = []
    vals = None
    for lv in tables.levels:
        r = _ratio(pyr[lv.num], pyr[lv.den])
        vals = r if vals is None else r * vals[lv.parent]
        ev_vals.append(vals[lv.ev_node])
    v = jnp.concatenate(ev_vals) * s[tables.e_sig]
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


# --- Padded-chain kernel (cross-check / sharded path) ------------------------


@dataclasses.dataclass(frozen=True)
class ChainTables:
    """CompiledProblem arrays resident on device, padded-chain form."""

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
    dual: bool = False


def chain_tables(compiled: CompiledProblem,
                 dtype=jnp.float64) -> ChainTables:
    as_i32 = partial(jnp.asarray, dtype=jnp.int32)
    return ChainTables(
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
        dual=isinstance(compiled, CompiledDualProblem),
    )


def dy_dt_from_chain_tables(tables: ChainTables, p: jax.Array) -> jax.Array:
    """Chain-walking variant of :func:`dy_dt_from_tables` (cross-check)."""
    dtype = tables.w_const.dtype
    pyr = _build_pyramid(tables, p, dtype)
    s = _signature_weights(tables, pyr)
    v = s[tables.e_sig] * _ratio_prod(pyr, tables.e_num, tables.e_den)
    signed = v[tables.ev_idx] * tables.ev_sign
    return jax.ops.segment_sum(
        signed, tables.ev_tgt, num_segments=tables.state_size,
        indices_are_sorted=True,
    )


def make_chain_dy_dt(compiled: CompiledProblem, dtype=jnp.float64, jit=True):
    tables = chain_tables(compiled, dtype=dtype)
    fn = partial(dy_dt_from_chain_tables, tables)
    return jax.jit(fn) if jit else fn


def make_dual_dy_dt(compiled, dtype=jnp.float64, jit=True):
    """Builds ``(p_prog, p_data) -> (dy_prog, dy_data)`` for a
    :class:`compile.CompiledDualProblem` (separate per-tape SPDs)."""
    tables = device_tables(compiled, dtype=dtype)
    half = compiled.size_a**compiled.cl_k

    def fn(p_prog, p_data):
        dy = dy_dt_from_tables(
            tables, jnp.concatenate([jnp.asarray(p_prog).ravel(),
                                     jnp.asarray(p_data).ravel()]))
        return dy[:half], dy[half:]

    return jax.jit(fn) if jit else fn
