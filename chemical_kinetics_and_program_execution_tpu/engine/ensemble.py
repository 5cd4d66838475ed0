"""Ensemble mode: step millions of concrete tapes in lockstep.

The exact engine (`compile.py` + `rhs.py`) evolves the *distribution* of
window contents. This module provides the complementary Monte-Carlo view
the BASELINE north star asks for: a batch of concrete (program, data)
tape rings stepped by the reaction rule, compiled so that XLA sees
dense, divergence-free batches.

The key compile-time object is the **transition table**. Every reaction
rule reads a bounded window around its site; enumeration
(`engine/enumerate.py`) yields every execution path with its revealed
cells and choose-weight product. For each possible *content* of the
combined read window (one table row), the compatible paths form a
probability distribution over outcomes (their choose products sum to 1).
One reaction event then costs, per tape: gather the window cells →
radix-rank them → look up the row's cumulative outcome distribution →
sample with one uniform → scatter back the (few) changed cells. No
control flow, no divergence — a pure gather/lookup/scatter kernel that
`vmap`/`shard_map` scale to 10^7 tapes.

Time normalisation matches the exact engine's semantics (the rule fires
once per site per unit time, `tape_multiverse.scm` docstring at
:348-360): one event at one site advances time by 1/num_sites.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

from ..utils import config
from . import dsl, enumerate as enum_mod

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@dataclasses.dataclass(frozen=True)
class TransitionTable:
    """Dense per-window-content outcome table for one reaction rule."""

    tag: str
    size_a: int
    # Read-window offsets, inclusive: program tape cells site+p_lo..site+p_hi,
    # data tape cells site+d_lo..site+d_hi.
    p_lo: int
    p_hi: int
    d_lo: int
    d_hi: int
    out_cum: np.ndarray  # [rows, M] float64, cumulative outcome probs
    out_world: np.ndarray  # [rows, M] int32, outcome index
    wr_mask: np.ndarray  # [W, n_cells] bool, does outcome write this cell
    wr_val: np.ndarray  # [W, n_cells] int32, written symbol

    @property
    def n_p(self) -> int:
        return self.p_hi - self.p_lo + 1

    @property
    def n_d(self) -> int:
        return self.d_hi - self.d_lo + 1

    @property
    def n_cells(self) -> int:
        return self.n_p + self.n_d

    @property
    def num_rows(self) -> int:
        return self.size_a**self.n_cells

    @property
    def span(self) -> int:
        """Conservative conflict radius: events at site distance > span
        touch disjoint cells on both tapes."""
        return max(self.p_hi - self.p_lo, self.d_hi - self.d_lo) + 1

    def summary(self) -> str:
        return (
            f"{self.tag}: window P[{self.p_lo}..{self.p_hi}] "
            f"D[{self.d_lo}..{self.d_hi}] -> {self.num_rows} rows x "
            f"{self.out_cum.shape[1]} outcomes, "
            f"{len(self.wr_mask)} distinct writes"
        )


def compile_transition_table(tag: str, *, max_rows: int = 5_000_000,
                             max_worlds: int | None = None
                             ) -> TransitionTable:
    """Builds the dense transition table for a registered problem."""
    problem = dsl.get_problem(tag)
    size_a = problem.size_a
    # Branch structure is cl_k-independent; cl_k=2 keeps reveal-factor
    # bookkeeping (unused here) minimal.
    worlds = [w for w in enum_mod.enumerate_worlds(
        problem, 2, max_worlds=max_worlds) if w.const > 0.0]

    p_lo = min((-w.tape_cells[0][0] for w in worlds), default=0)
    p_hi = max((len(w.tape_cells[0][1]) - w.tape_cells[0][0] - 1
                for w in worlds), default=-1)
    d_lo = min((-w.tape_cells[1][0] for w in worlds), default=0)
    d_hi = max((len(w.tape_cells[1][1]) - w.tape_cells[1][0] - 1
                for w in worlds), default=-1)
    p_lo, p_hi = min(p_lo, 0), max(p_hi, 0)
    d_lo, d_hi = min(d_lo, 0), max(d_hi, 0)
    n_p = p_hi - p_lo + 1
    n_cells = n_p + (d_hi - d_lo + 1)
    num_rows = size_a**n_cells
    if num_rows > max_rows:
        raise ValueError(
            f"Problem {tag!r} reads a {n_cells}-cell window -> "
            f"{num_rows} table rows > max_rows={max_rows}."
        )
    pv = size_a ** np.arange(n_cells - 1, -1, -1)  # radix place values

    # Deduplicate write specs (many worlds share the same write set).
    wr_specs: dict[tuple, int] = {}
    wr_mask_list: list[np.ndarray] = []
    wr_val_list: list[np.ndarray] = []

    row_chunks, world_chunks, const_chunks, order_chunks = [], [], [], []
    for n_world, w in enumerate(worlds):
        fixed_cells, fixed_vals = [], []
        mask = np.zeros(n_cells, bool)
        val = np.zeros(n_cells, np.int32)
        for t, (lo, base) in enumerate(((p_lo, 0), (d_lo, n_p))):
            l_len, orig, adj = w.tape_cells[t]
            for i, (o, a) in enumerate(zip(orig, adj)):
                cell = base + (i - l_len) - lo
                fixed_cells.append(cell)
                fixed_vals.append(o)
                if o != a:
                    mask[cell] = True
                    val[cell] = a
        key = (tuple(np.flatnonzero(mask)), tuple(val[mask]))
        if key not in wr_specs:
            wr_specs[key] = len(wr_mask_list)
            wr_mask_list.append(mask)
            wr_val_list.append(val)
        spec = wr_specs[key]

        free = np.setdiff1d(np.arange(n_cells), np.asarray(fixed_cells))
        base_rank = int(np.asarray(fixed_vals) @ pv[np.asarray(
            fixed_cells, dtype=np.int64)]) if fixed_cells else 0
        if free.size:
            grids = np.meshgrid(*([np.arange(size_a)] * free.size),
                                indexing="ij")
            combos = np.stack([g.ravel() for g in grids], axis=1)
            rows = base_rank + combos @ pv[free]
        else:
            rows = np.array([base_rank], dtype=np.int64)
        row_chunks.append(rows)
        world_chunks.append(np.full(rows.shape, spec, np.int32))
        const_chunks.append(np.full(rows.shape, w.const))
        order_chunks.append(np.full(rows.shape, n_world, np.int64))

    all_rows = np.concatenate(row_chunks)
    all_specs = np.concatenate(world_chunks)
    all_consts = np.concatenate(const_chunks)
    all_order = np.concatenate(order_chunks)

    # Validate total probability per row before padding.
    totals = np.zeros(num_rows)
    np.add.at(totals, all_rows, all_consts)
    if not np.allclose(totals, 1.0, atol=1e-9):
        bad = int(np.argmax(np.abs(totals - 1.0)))
        raise AssertionError(
            f"Outcome probabilities for {tag!r} row {bad} sum to "
            f"{totals[bad]}, not 1 — enumeration is inconsistent."
        )

    # Group by row (stable in decision-tree order).
    perm = np.lexsort((all_order, all_rows))
    all_rows, all_specs, all_consts = (
        all_rows[perm], all_specs[perm], all_consts[perm]
    )
    counts = np.bincount(all_rows, minlength=num_rows)
    m = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(all_rows)) - starts[all_rows]

    out_cum = np.ones((num_rows, m), np.float64)
    out_world = np.zeros((num_rows, m), np.int32)
    prob = np.zeros((num_rows, m), np.float64)
    prob[all_rows, slot] = all_consts
    out_world[all_rows, slot] = all_specs
    cum = np.cumsum(prob, axis=1)
    # Pad trailing slots by repeating the last outcome with cum 1 so a
    # uniform draw always lands on a valid slot.
    filled = slot_mask = np.arange(m)[None, :] < counts[:, None]
    out_cum[:] = np.where(filled, cum, 1.0)
    last = np.maximum(counts - 1, 0)
    out_world = np.where(
        slot_mask, out_world, out_world[np.arange(num_rows), last][:, None]
    )
    out_cum[np.arange(num_rows), last] = 1.0  # exact top, guard fp drift

    if config.IS_DEBUG:
        print(f"[ckpe] transition table {tag}: rows={num_rows} m={m} "
              f"writes={len(wr_mask_list)}")

    return TransitionTable(
        tag=tag, size_a=size_a, p_lo=p_lo, p_hi=p_hi, d_lo=d_lo, d_hi=d_hi,
        out_cum=out_cum, out_world=out_world,
        wr_mask=np.stack(wr_mask_list), wr_val=np.stack(wr_val_list),
    )


# --- Runtime kernel ----------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("p_offs", "d_offs", "pv", "out_cum", "out_world",
                 "wr_mask", "wr_val"),
    meta_fields=("size_a", "span"),
)
@dataclasses.dataclass(frozen=True)
class DeviceTable:
    size_a: int
    p_offs: jax.Array  # [n_p] window offsets
    d_offs: jax.Array  # [n_d]
    pv: jax.Array  # [n_cells] radix place values (int32)
    out_cum: jax.Array
    out_world: jax.Array
    wr_mask: jax.Array
    wr_val: jax.Array
    span: int


def device_table(table: TransitionTable) -> DeviceTable:
    n_cells = table.n_cells
    pv = table.size_a ** np.arange(n_cells - 1, -1, -1)
    return DeviceTable(
        size_a=table.size_a,
        p_offs=jnp.arange(table.p_lo, table.p_hi + 1, dtype=jnp.int32),
        d_offs=jnp.arange(table.d_lo, table.d_hi + 1, dtype=jnp.int32),
        pv=jnp.asarray(pv, dtype=jnp.int32),
        out_cum=jnp.asarray(table.out_cum),
        out_world=jnp.asarray(table.out_world),
        wr_mask=jnp.asarray(table.wr_mask),
        wr_val=jnp.asarray(table.wr_val, dtype=jnp.int32),
        span=table.span,
    )


def _apply_events(dt: DeviceTable, ptape, dtape, sites, uniforms):
    """Applies one round of parallel reaction events to a single replica.

    Events whose windows could overlap an earlier-indexed event's window
    are dropped (the sequential-order hazard, same policy as the
    Metropolis kernel in `models/ferromagnet.py`); with sites ≪ tape
    length the drop rate is negligible and unbiased.
    """
    n = ptape.shape[0]
    cells_p = ptape[(sites[:, None] + dt.p_offs) % n]
    cells_d = dtape[(sites[:, None] + dt.d_offs) % n]
    cells = jnp.concatenate([cells_p, cells_d], axis=1)  # [E, n_cells]
    rows = (cells * dt.pv).sum(axis=1)

    cum = dt.out_cum[rows]  # [E, M]
    k = (uniforms[:, None] > cum).sum(axis=1)
    k = jnp.minimum(k, cum.shape[1] - 1)
    spec = dt.out_world[rows, k]
    mask = dt.wr_mask[spec]  # [E, n_cells] bool
    vals = dt.wr_val[spec]

    d = jnp.abs(sites[:, None] - sites[None, :])
    d = jnp.minimum(d, n - d)
    conflicted = jnp.tril(d <= 2 * dt.span, k=-1).any(axis=1)
    apply = ~conflicted

    n_p = dt.p_offs.shape[0]
    delta_p = jnp.where(mask[:, :n_p] & apply[:, None],
                        vals[:, :n_p] - cells_p, 0)
    delta_d = jnp.where(mask[:, n_p:] & apply[:, None],
                        vals[:, n_p:] - cells_d, 0)
    ptape = ptape.at[(sites[:, None] + dt.p_offs) % n].add(delta_p)
    dtape = dtape.at[(sites[:, None] + dt.d_offs) % n].add(delta_d)
    transitions = apply.sum()
    return ptape, dtape, transitions


@partial(jax.jit, static_argnums=(3,))
def run_ensemble(key, tapes, dtable: DeviceTable, steps_events: tuple):
    """Advances a batch of tape pairs.

    Time semantics: the exact engine's rule fires as a rate-1 Poisson
    process per site. One round applies at most one event per (separated)
    site, so a round with ``a`` applied events out of ``L`` sites
    corresponds to a Poisson window of length ``dt = -ln(1 - a/L)``
    (the window in which the expected number of distinct fired sites is
    ``a``). Same-site repeat firings *within* one round are not
    represented — an O(dt²) effect per round; keep events_per_step ≲ 5%
    of the tape length where that matters.

    Args:
      key: PRNG key.
      tapes: (ptape [B, L] int32, dtape [B, L] int32).
      dtable: compiled device table (pytree).
      steps_events: (num_steps, events_per_step), static.

    Returns:
      ((ptape, dtape), (applied [num_steps] summed over replicas,
      time [num_steps] cumulative, averaged over replicas)).
    """
    num_steps, events = steps_events
    ptape, dtape = tapes
    B, L = ptape.shape

    def one_replica(key, pt, dti):
        def step(carry, k):
            pt, dti = carry
            k1, k2 = jax.random.split(k)
            sites = jax.random.randint(k1, (events,), 0, L)
            uniforms = jax.random.uniform(k2, (events,),
                                          dtype=jnp.float64)
            pt, dti, n_applied = _apply_events(
                dtable, pt, dti, sites, uniforms)
            dt = -jnp.log1p(-n_applied / L)
            return (pt, dti), (n_applied, dt)

        keys = jax.random.split(key, num_steps)
        (pt, dti), (n_applied, dts) = jax.lax.scan(step, (pt, dti), keys)
        return pt, dti, n_applied, jnp.cumsum(dts)

    keys = jax.random.split(key, B)
    pt, dti, n_applied, times = jax.vmap(one_replica)(keys, ptape, dtape)
    return (pt, dti), (n_applied.sum(axis=0), times.mean(axis=0))


def window_counts(tape, size_a: int, cl_k: int):
    """Empirical SPD estimate from a batch of tapes: normalised counts of
    every length-cl_k window (circular). Shape [size_a**cl_k]."""
    tape = jnp.asarray(tape)
    if tape.ndim == 1:
        tape = tape[None]
    B, L = tape.shape
    rank = jnp.zeros((B, L), jnp.int32)
    for j in range(cl_k):
        rank = rank * size_a + jnp.roll(tape, -j, axis=1)
    counts = jax.vmap(
        lambda r: jnp.zeros(size_a**cl_k, jnp.int32).at[r].add(1)
    )(rank).sum(axis=0)
    return counts / (B * L)


def sample_tapes_from_spd(key, spd, size_a: int, cl_k: int,
                          batch: int, length: int):
    """Draws tape rings whose window statistics follow an SPD: symbols
    are generated by the SPD's order-(cl_k-1) Markov chain (conditional
    next-symbol probabilities, `markov.mpp_from_spd`)."""
    from ..markov import mpp_from_spd

    mpp = jnp.asarray(
        mpp_from_spd(np.asarray(spd).reshape([size_a] * cl_k))
    ).reshape(size_a ** (cl_k - 1), size_a)
    marg = jnp.asarray(
        np.asarray(spd, dtype=np.float64).reshape(
            size_a ** (cl_k - 1), size_a).sum(axis=1)
    )
    k0, k1 = jax.random.split(jnp.asarray(key))
    ctx0 = jax.random.choice(
        k0, size_a ** (cl_k - 1), (batch,), p=marg / marg.sum()
    )

    def gen(carry, k):
        ctx = carry
        sym = jax.vmap(
            lambda c, kk: jax.random.choice(kk, size_a, p=mpp[c])
        )(ctx, jax.random.split(k, batch))
        ctx = (ctx * size_a + sym) % (size_a ** (cl_k - 1))
        return ctx, sym

    _, syms = jax.lax.scan(gen, ctx0, jax.random.split(k1, length))
    return syms.T.astype(jnp.int32)  # [batch, length]
