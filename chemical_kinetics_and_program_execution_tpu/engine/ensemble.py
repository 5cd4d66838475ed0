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
import functools
import math
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


def _window_bounds(worlds):
    """Inclusive read-window extents (p_lo, p_hi, d_lo, d_hi) over all
    execution paths' revealed cells."""
    p_lo = min(min((-w.tape_cells[0][0] for w in worlds), default=0), 0)
    p_hi = max(max((len(w.tape_cells[0][1]) - w.tape_cells[0][0] - 1
                    for w in worlds), default=-1), 0)
    d_lo = min(min((-w.tape_cells[1][0] for w in worlds), default=0), 0)
    d_hi = max(max((len(w.tape_cells[1][1]) - w.tape_cells[1][0] - 1
                    for w in worlds), default=-1), 0)
    return p_lo, p_hi, d_lo, d_hi


def _world_window_info(w, n_cells, n_p, p_lo, d_lo):
    """One world's revealed cells and write set over the combined window.

    Returns (fixed_cells, fixed_vals, write_mask, write_vals): the cells
    the path revealed with their original symbols, and the cells it
    changed with the adjusted symbols.
    """
    fixed_cells, fixed_vals = [], []
    mask = np.zeros(n_cells, bool)
    val = np.zeros(n_cells, np.int32)
    for t, (lo, base) in enumerate(((p_lo, 0), (d_lo, n_p))):
        l_len, orig, adj = w.tape_cells[t]
        for i, (o, adj_v) in enumerate(zip(orig, adj)):
            cell = base + (i - l_len) - lo
            fixed_cells.append(cell)
            fixed_vals.append(o)
            if o != adj_v:
                mask[cell] = True
                val[cell] = adj_v
    return fixed_cells, fixed_vals, mask, val


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

    p_lo, p_hi, d_lo, d_hi = _window_bounds(worlds)
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
        fixed_cells, fixed_vals, mask, val = _world_window_info(
            w, n_cells, n_p, p_lo, d_lo)
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


# --- Decision machine: gather-free outcome resolution ------------------------
#
# The transition table resolves outcomes with device gathers
# (`out_cum[rows]`, `out_world[rows, k]`, `wr_mask[spec]`), which dominate
# the round cost on TPU (~20 of 25 ms at 1M events: gathers serialise).
# The rule's *decision tree* is tiny (tens of nodes), so the same function
# evaluates gather-free as a vectorized FSM: one masked transition per
# internal node (branch index = a window cell for reveals, an
# inverse-CDF threshold count for chooses, with the uniform renormalised
# into the chosen branch — exactly the table's lexicographic cumulative
# sampling).
#
# Two compile-time compressions keep the walk cheap on the VPU:
#   * identical subtrees are hash-consed into a DAG (shared
#     continuations are the norm in these rules: ex5 59 -> 26 nodes),
#     so the per-element pass count is the number of *unique* subtrees;
#   * per-branch child ids and leaf write-spec ids ride little-endian
#     fields of int32 words (variable shifts on int32 are native VPU
#     ops; int64 is emulated as 2x32 on TPU).


@dataclasses.dataclass(frozen=True)
class _Reveal:
    node_id: int
    cell: int  # column in the combined window-cell tensor
    child_words: tuple[int, ...]  # per-branch child ids (0 = leaf)
    spec_words: tuple[int, ...]   # per-branch leaf spec ids


@dataclasses.dataclass(frozen=True)
class _Choose:
    node_id: int
    probs: tuple[float, ...]
    child_words: tuple[int, ...]
    spec_words: tuple[int, ...]


_SPEC_BITS = 6  # up to 63 write specs


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("p_offs", "d_offs"),
    meta_fields=("tag", "size_a", "span", "p_lo", "d_lo", "n_p", "n_d",
                 "nodes", "root", "n_states", "bits", "wr_words",
                 "num_specs", "wr_bits"),
)
@dataclasses.dataclass(frozen=True)
class DeviceMachine:
    """Compiled decision DAG (static metadata + window offsets)."""

    tag: str
    size_a: int
    p_lo: int
    d_lo: int
    n_p: int
    n_d: int
    span: int
    p_offs: jax.Array
    d_offs: jax.Array
    nodes: tuple  # _Reveal/_Choose in topological order (parents first)
    root: int     # initial FSM state (0 iff the rule never branches)
    n_states: int
    bits: int     # field width of child/spec words
    # Per-cell write words: wr_bits-wide field s =
    # (writes?<<(wr_bits-1) | symbol) for write-spec s, 31//wr_bits
    # fields per int32 word (wr_bits = 5 whenever size_a <= 16 — the
    # historical fixed packing; wider alphabets widen the field, round
    # 3's fast-path-cliff removal).
    wr_words: tuple[tuple[int, ...], ...]
    num_specs: int
    wr_bits: int = 5

    @property
    def n_cells(self) -> int:
        return self.n_p + self.n_d


def _pack_fields(vals, bits):
    """Packs ints little-endian into int32 words, 31//bits per word."""
    per = 31 // bits
    words = []
    for w in range((len(vals) + per - 1) // per):
        word = 0
        for f in range(per):
            i = w * per + f
            if i < len(vals):
                word |= int(vals[i]) << (bits * f)
        words.append(word)
    return tuple(words)


def compile_decision_machine(tag: str, *, max_worlds: int | None = None
                             ) -> DeviceMachine:
    """Compiles a rule's decision tree to the gather-free FSM DAG."""
    problem = dsl.get_problem(tag)
    size_a = problem.size_a
    worlds = enum_mod.enumerate_worlds(problem, 2, max_worlds=max_worlds)

    p_lo, p_hi, d_lo, d_hi = _window_bounds(worlds)
    n_p = p_hi - p_lo + 1
    n_d = d_hi - d_lo + 1
    n_cells = n_p + n_d

    # Deduplicated write specs (same construction as the table compiler).
    wr_specs: dict[tuple, int] = {}
    wr_mask_list: list[np.ndarray] = []
    wr_val_list: list[np.ndarray] = []
    leaf_spec: dict[tuple[int, ...], int] = {}
    for w in worlds:
        _, _, mask, val = _world_window_info(w, n_cells, n_p, p_lo, d_lo)
        key = (tuple(np.flatnonzero(mask)), tuple(val[mask]))
        if key not in wr_specs:
            wr_specs[key] = len(wr_mask_list)
            wr_mask_list.append(mask)
            wr_val_list.append(val)
        leaf_spec[w.decisions] = wr_specs[key]
    num_specs = len(wr_mask_list)

    # Trie over decision sequences (meta consistent across shared
    # prefixes because replay is deterministic).
    trie: dict = {"children": {}, "meta": None}
    for w in worlds:
        cur = trie
        for depth, v in enumerate(w.decisions):
            cur["meta"] = w.decision_meta[depth]
            cur = cur["children"].setdefault(
                v, {"children": {}, "meta": None})
        cur["spec"] = leaf_spec[w.decisions]

    # Hash-cons identical subtrees into a DAG: a node is identified by
    # its (meta, ordered child signatures); shared continuations collapse
    # to one FSM state each.
    canon: dict = {}

    def intern(node):
        if node["meta"] is None:
            return ("leaf", node.get("spec", 0))
        meta = node["meta"]
        arity = size_a if meta[0] == "reveal" else len(meta[1])
        kids = tuple(intern(node["children"][b]) for b in range(arity))
        sig = (repr(meta), kids)
        if sig not in canon:
            canon[sig] = (meta, kids)
        return ("node", sig)

    root_ref = intern(trie)
    if root_ref[0] == "leaf":  # rule makes no reads/choices at all
        raise ValueError(f"{tag!r}: rule has no decision points.")

    # Topological order, parents before children (every edge deepens).
    order: list = []
    seen: set = set()

    def topo(ref):
        kind, payload = ref
        if kind != "node" or payload in seen:
            return
        seen.add(payload)
        for k in canon[payload][1]:
            topo(k)
        order.append(payload)

    topo(root_ref)
    order.reverse()
    ids = {sig: i + 1 for i, sig in enumerate(order)}  # 0 = terminal
    n_states = len(order) + 1
    # Field width: child ids AND spec ids share the packed words, so
    # both must fit. No hard cap below 30 bits (round 3: the old 6-bit
    # spec / 15-bit state ceilings silently demoted rules like ex6-lite
    # — 85 specs — to the gather-heavy table); the select cascade in
    # `_unpack_field` just grows with the word count.
    bits = max(_SPEC_BITS, num_specs.bit_length(),
               (n_states - 1).bit_length())
    if bits > 30:
        raise ValueError(
            f"{tag!r}: {n_states} FSM states / {num_specs} specs "
            "exceed the int32 field packing; use the transition table."
        )

    nodes: list = []
    for sig in order:
        meta, kids = canon[sig]
        child_ids = [0 if k[0] == "leaf" else ids[k[1]] for k in kids]
        kid_specs = [k[1] if k[0] == "leaf" else 0 for k in kids]
        child_words = _pack_fields(child_ids, bits)
        spec_words = _pack_fields(kid_specs, bits)
        if meta[0] == "reveal":
            _, data_tape, index = meta
            cell = (n_p + index - d_lo) if data_tape else (index - p_lo)
            nodes.append(_Reveal(ids[sig], cell, child_words, spec_words))
        else:
            nodes.append(_Choose(ids[sig], tuple(meta[1]), child_words,
                                 spec_words))

    # Per-cell write words: (writes << sym_bits | symbol) fields. The
    # historical packing is 5-bit fields (4-bit symbols); alphabets
    # past 16 widen the field instead of erroring out (round 3).
    sym_bits = max(4, (size_a - 1).bit_length())
    wr_bits = sym_bits + 1
    wr_words = tuple(
        _pack_fields(
            [int(wr_mask_list[s][c]) << sym_bits
             | int(wr_val_list[s][c])
             for s in range(num_specs)], wr_bits)
        for c in range(n_cells)
    )

    return DeviceMachine(
        tag=tag,
        size_a=size_a,
        p_lo=p_lo,
        d_lo=d_lo,
        n_p=n_p,
        n_d=n_d,
        span=max(p_hi - p_lo, d_hi - d_lo) + 1,
        p_offs=jnp.arange(p_lo, p_hi + 1, dtype=jnp.int32),
        d_offs=jnp.arange(d_lo, d_hi + 1, dtype=jnp.int32),
        nodes=tuple(nodes),
        root=ids[order[0]],
        n_states=n_states,
        bits=bits,
        wr_words=wr_words,
        num_specs=num_specs,
        wr_bits=wr_bits,
    )


def _unpack_field(words, widx, shift_amt, bits):
    """Selects words[widx] >> shift_amt & mask via a native int32 chain."""
    v = jnp.right_shift(jnp.int32(words[0]), shift_amt)
    for wi in range(1, len(words)):
        v = jnp.where(widx == wi,
                      jnp.right_shift(jnp.int32(words[wi]), shift_amt), v)
    return v & ((1 << bits) - 1)


def _choose_sampling_dist(probs, tau: float):
    """Static per-node sampling distribution q ∝ p^tau (support of p) and
    per-branch importance increments log p − log q.

    tau = 1 recovers q = p (increments identically 0: sampling the true
    outcome distribution needs no weight correction); tau = 0 explores
    every nonzero-probability branch uniformly, the closest sampled
    analogue of the exact engine's branch-everything enumeration.
    """
    p = np.asarray(probs, dtype=np.float64)
    if tau == 1.0:
        # q = p EXACTLY (no renormalisation): keeps the increments
        # identically zero and the sampling walk bit-identical to the
        # tau-free ensemble path (p from the compiled table sums to 1
        # only to ~1 ulp; dividing by that sum would perturb every
        # cum/width and accrue O(1e-16) spurious weight per choose).
        return p, np.zeros_like(p)
    q = np.where(p > 0, np.power(np.maximum(p, 1e-300), tau), 0.0)
    q = q / q.sum()
    delta = np.where(
        p > 0,
        np.log(np.maximum(p, 1e-300)) - np.log(np.maximum(q, 1e-300)),
        0.0,
    )
    return q, delta


def _machine_specs_planes(dm: DeviceMachine, cells, uniforms, *,
                          tau: float = 1.0, want_logp: bool = False):
    """Vectorized FSM walk over per-cell planes -> write spec.

    ``cells`` is a sequence of n_cells arrays of identical shape (one
    plane per window cell). Equivalent to the table's row lookup +
    cumulative outcome sampling (the uniform is renormalised into each
    chosen branch, which is the inverse-CDF of the joint outcome
    distribution in decision order — the exact order the table's
    cumulative rows use).

    With ``tau`` != 1 the choose branches are sampled from the tempered
    distribution q ∝ p^tau instead of p; with ``want_logp`` the walk
    additionally returns the importance log-weight increment
    log p(path) − log q(path) of the sampled decision path (a float32
    plane; identically zero at tau=1). Both knobs serve the weighted
    frontier (`run_weighted_frontier_blocked`); the ensemble hot path
    uses the defaults.

    Dispatches to the level-synchronous walk (one packed transition
    table per tree depth — fewer VPU ops than the per-node masked
    cascade; bit-identical, `tests/test_ensemble.py::
    test_leveled_walk_matches_node_walk`); the per-node formulation
    below survives as the cross-check implementation.
    """
    return _machine_specs_planes_leveled(dm, cells, uniforms, tau=tau,
                                         want_logp=want_logp)


def wr_field_host(words, s, wr_bits: int = 5):
    """Host-side decode of one cell's packed write field(s).

    ``words`` is a `DeviceMachine.wr_words[c]` tuple, ``s`` a spec
    index (or numpy array of them). Returns ``(writes?, symbol)``
    numpy arrays — the one decode shared by every host consumer
    (`ops/thermo`, `bitslice` truth tables) so the field width lives
    in exactly one place.
    """
    per = 31 // wr_bits
    w = np.asarray(words, np.int64)
    f = (w[np.asarray(s) // per] >> (wr_bits * (np.asarray(s) % per))
         ) & ((1 << wr_bits) - 1)
    return (f >> (wr_bits - 1)) == 1, f & ((1 << (wr_bits - 1)) - 1)


def _int_dtype_for(n: int):
    """Narrowest of int8/int16/int32 holding values in [0, n]."""
    return (jnp.int8 if n <= 127
            else jnp.int16 if n <= 32767 else jnp.int32)


def _machine_specs_planes_nodes(dm: DeviceMachine, cells, uniforms, *,
                                tau: float = 1.0, want_logp: bool = False):
    """Per-node masked-cascade FSM walk (reference formulation)."""
    bits = dm.bits
    fields = 31 // bits
    sdt = _int_dtype_for(dm.n_states - 1)
    spdt = _int_dtype_for(dm.num_specs - 1)
    state = jnp.full(cells[0].shape, dm.root, sdt)
    spec = jnp.zeros(cells[0].shape, spdt)
    logp = jnp.zeros(cells[0].shape, jnp.float32) if want_logp else None
    u = uniforms
    for node in dm.nodes:
        mask = state == node.node_id
        if isinstance(node, _Reveal):
            b = cells[node.cell].astype(jnp.int32)
        else:
            q, delta = _choose_sampling_dist(node.probs, tau)
            cum = np.cumsum(q)
            b = jnp.zeros(state.shape, jnp.int32)
            lo = jnp.zeros_like(u)
            width = jnp.full_like(u, max(q[0], 1e-30))
            dsel = (jnp.full(state.shape, np.float32(delta[0]), jnp.float32)
                    if want_logp else None)
            for j in range(1, len(q)):
                sel = u >= cum[j - 1]
                b = jnp.where(sel, jnp.int32(j), b)
                lo = jnp.where(sel, cum[j - 1], lo)
                width = jnp.where(sel, max(q[j], 1e-30), width)
                if want_logp:
                    dsel = jnp.where(sel, np.float32(delta[j]), dsel)
            u = jnp.where(mask, (u - lo) / width, u)
            if want_logp:
                logp = jnp.where(mask, logp + dsel, logp)
        shift_amt = bits * (b % fields)
        widx = b // fields
        child = _unpack_field(node.child_words, widx, shift_amt, bits)
        nspec = _unpack_field(node.spec_words, widx, shift_amt, bits)
        state = jnp.where(mask, child.astype(sdt), state)
        spec = jnp.where(mask, nspec.astype(spdt), spec)
    return (spec, logp) if want_logp else spec


@dataclasses.dataclass(frozen=True)
class _Level:
    """One depth of the leveled FSM (host-side static plan).

    Live states at this level carry value ``num_specs + local_id``;
    values below ``num_specs`` are terminal and ARE the write spec.
    """

    cell_groups: tuple  # ((cell, lo), ...) ascending contiguous local-id
    #                     ranges of reveal nodes reading `cell`
    chooses: tuple      # ((local_id, probs), ...)
    max_deg: int
    bits: int           # field width of trans_words entries
    trans_words: tuple  # packed: idx = local_id * max_deg + branch
    n_nodes: int        # live nodes at this level


def _level_plan(dm: DeviceMachine):
    return _build_level_plan(dm.nodes, dm.root, dm.num_specs, dm.size_a,
                             dm.bits)


@functools.lru_cache(maxsize=None)
def _build_level_plan(nodes, root, num_specs, size_a, bits):
    """Levels the decision DAG for the level-synchronous walk.

    BFS from the root with STRICT leveling: a hash-consed node reachable
    at several depths is duplicated per depth (each occurrence gets its
    own local id), so after ℓ steps every site's state lives in level
    ℓ's table or is terminal. Within a level, reveal nodes are grouped
    contiguously by read cell (branch selection = a couple of range
    compares instead of a per-node mask) and choose nodes go last.
    """
    by_id = {n.node_id: n for n in nodes}
    fields = 31 // bits

    def branches(n):
        deg = len(n.probs) if isinstance(n, _Choose) else size_a
        out = []
        for b in range(deg):
            child = (int(n.child_words[b // fields])
                     >> (bits * (b % fields))) & ((1 << bits) - 1)
            spec = (int(n.spec_words[b // fields])
                    >> (bits * (b % fields))) & ((1 << bits) - 1)
            out.append((child, spec))
        return out

    levels = [[root]]
    while True:
        nxt: list = []
        seen: set = set()
        for nid in levels[-1]:
            for child, _ in branches(by_id[nid]):
                if child and child not in seen:
                    seen.add(child)
                    nxt.append(child)
        if not nxt:
            break
        # Reveals grouped by cell (ascending), chooses last GROUPED BY
        # DISTRIBUTION (same-probs choose nodes contiguous, so the walk
        # samples each distinct distribution once per level and applies
        # it with one range compare — wide rules can carry hundreds of
        # hash-consed choose nodes that all share one distribution);
        # ties broken by node id for determinism.
        nxt.sort(key=lambda i: (
            (0, by_id[i].cell, ()) if isinstance(by_id[i], _Reveal)
            else (1, 0, tuple(by_id[i].probs)), i))
        levels.append(nxt)

    plan = []
    for d, lvl in enumerate(levels):
        loc_next = ({nid: j for j, nid in enumerate(levels[d + 1])}
                    if d + 1 < len(levels) else {})
        max_deg = max(len(by_id[i].probs) if isinstance(by_id[i], _Choose)
                      else size_a for i in lvl)
        vals = []
        cell_groups: list = []
        chooses: list = []
        for j, nid in enumerate(lvl):
            n = by_id[nid]
            if isinstance(n, _Reveal):
                if not cell_groups or cell_groups[-1][0] != n.cell:
                    cell_groups.append((n.cell, j))
            else:
                chooses.append((j, n.probs))
            row = [spec if child == 0 else num_specs + loc_next[child]
                   for child, spec in branches(n)]
            vals.extend(row + [0] * (max_deg - len(row)))
        lbits = max(1, (num_specs + len(loc_next) - 1).bit_length())
        plan.append(_Level(
            cell_groups=tuple(cell_groups),
            chooses=tuple(chooses),
            max_deg=max_deg,
            bits=lbits,
            trans_words=_pack_fields(vals, lbits),
            n_nodes=len(lvl),
        ))
    return tuple(plan)


def _machine_specs_planes_leveled(dm: DeviceMachine, cells, uniforms, *,
                                  tau: float = 1.0,
                                  want_logp: bool = False):
    """Level-synchronous FSM walk: one packed transition table per tree
    depth, terminal states encode the write spec directly.

    Bit-identical to `_machine_specs_planes_nodes` (same branch values,
    same uniform renormalisation ops in the same per-site order; the
    only difference is how the static transition data is packed).
    Reveal-heavy machines save most of the per-node mask/select work:
    a level costs ~1 table unpack regardless of how many nodes share
    the depth.
    """
    S = dm.num_specs
    shape = cells[0].shape
    state = jnp.full(shape, S, jnp.int32)  # root is local id 0
    u = uniforms
    logp = jnp.zeros(shape, jnp.float32) if want_logp else None
    for lv in _level_plan(dm):
        if lv.cell_groups:
            b = cells[lv.cell_groups[0][0]].astype(jnp.int32)
            for cell, lo in lv.cell_groups[1:]:
                b = jnp.where(state >= S + lo,
                              cells[cell].astype(jnp.int32), b)
        else:
            b = jnp.zeros(shape, jnp.int32)
        # Same-distribution choose nodes are CONTIGUOUS in local id
        # (`_build_level_plan`'s sort), so each distinct distribution is
        # sampled once and applied with one range mask — member-wise
        # math identical to the per-node loop (a member sits at exactly
        # one node; bb/lo_/width depend only on u and the shared
        # distribution), but wide rules with hundreds of hash-consed
        # choose continuations pay O(distinct distributions) where-
        # cascades instead of O(nodes) (round 3: fuzz-wide-specs has
        # 144 choose nodes, ONE distribution).
        g = 0
        while g < len(lv.chooses):
            id_lo, probs = lv.chooses[g]
            h = g + 1
            while (h < len(lv.chooses)
                   and lv.chooses[h][1] == probs
                   and lv.chooses[h][0] == lv.chooses[h - 1][0] + 1):
                h += 1
            id_hi = lv.chooses[h - 1][0]
            if id_lo == id_hi:
                mask = state == S + id_lo
            else:
                mask = ((state >= S + id_lo) & (state <= S + id_hi))
            g = h
            q, delta = _choose_sampling_dist(probs, tau)
            cum = np.cumsum(q)
            bb = jnp.zeros(shape, jnp.int32)
            lo_ = jnp.zeros_like(u)
            width = jnp.full_like(u, max(q[0], 1e-30))
            dsel = (jnp.full(shape, np.float32(delta[0]), jnp.float32)
                    if want_logp else None)
            for j in range(1, len(q)):
                sel = u >= cum[j - 1]
                bb = jnp.where(sel, jnp.int32(j), bb)
                lo_ = jnp.where(sel, cum[j - 1], lo_)
                width = jnp.where(sel, max(q[j], 1e-30), width)
                if want_logp:
                    dsel = jnp.where(sel, np.float32(delta[j]), dsel)
            b = jnp.where(mask, bb, b)
            u = jnp.where(mask, (u - lo_) / width, u)
            if want_logp:
                logp = jnp.where(mask, logp + dsel, logp)
        idx = jnp.maximum(state - S, 0) * lv.max_deg + b
        fields = 31 // lv.bits
        nxt = _unpack_field(lv.trans_words, idx // fields,
                            lv.bits * (idx % fields), lv.bits)
        state = jnp.where(state >= S, nxt, state)
    spec = state.astype(_int_dtype_for(dm.num_specs - 1))
    return (spec, logp) if want_logp else spec


def _machine_writes_planes(dm: DeviceMachine, spec, cells):
    """Applies write specs to per-cell planes via bit-unpacking.

    Returns the list of new planes (same dtypes as the inputs).
    """
    wb = dm.wr_bits
    per = 31 // wb
    spec32 = spec.astype(jnp.int32)
    shift_amt = wb * (spec32 % per)
    widx = spec32 // per
    outs = []
    for c in range(dm.n_cells):
        f = _unpack_field(dm.wr_words[c], widx, shift_amt, wb)
        writes = jnp.right_shift(f, wb - 1) == 1
        val = (f & ((1 << (wb - 1)) - 1)).astype(cells[c].dtype)
        outs.append(jnp.where(writes, val, cells[c]))
    return outs


def _machine_specs(dm: DeviceMachine, cells, uniforms):
    """AoS wrapper of :func:`_machine_specs_planes` (cells [..., n])."""
    return _machine_specs_planes(
        dm, [cells[..., c] for c in range(dm.n_cells)], uniforms)


def _machine_writes(dm: DeviceMachine, spec, cells):
    """AoS wrapper of :func:`_machine_writes_planes`; returns [..., n]."""
    outs = _machine_writes_planes(
        dm, spec, [cells[..., c] for c in range(dm.n_cells)])
    return jnp.stack(outs, axis=-1)


# --- Runtime kernel ----------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("p_offs", "d_offs", "pv", "out_cum", "out_world",
                 "wr_mask", "wr_val", "wr_words"),
    meta_fields=("size_a", "span", "p_lo", "d_lo", "n_wr_words"),
)
@dataclasses.dataclass(frozen=True)
class DeviceTable:
    size_a: int
    p_lo: int
    d_lo: int
    p_offs: jax.Array  # [n_p] window offsets
    d_offs: jax.Array  # [n_d]
    pv: jax.Array  # [n_cells] radix place values (int32)
    out_cum: jax.Array
    out_world: jax.Array
    wr_mask: jax.Array
    wr_val: jax.Array
    span: int
    # Packed write decode (see run_weighted_frontier._write_decode):
    # wr_words[c, w] holds specs 6w..6w+5's (writes?<<4 | symbol) as
    # 5-bit fields for cell c; n_wr_words == 0 disables the packing
    # (too many specs, or symbols beyond 4 bits).
    wr_words: jax.Array | None = None
    n_wr_words: int = 0


def device_table(table: TransitionTable, dtype=None) -> DeviceTable:
    """Moves a transition table to device.

    ``dtype`` sets the cumulative-probability precision (default
    float64). float32 halves the lookup bandwidth and avoids f64
    emulation on TPU; outcome probabilities below ~1e-7 then lose
    resolution, which is fine for throughput runs and MC statistics.
    """
    n_cells = table.n_cells
    pv = table.size_a ** np.arange(n_cells - 1, -1, -1)
    # Packed write-decode words (gather-free write application in the
    # weighted frontier): 5-bit (writes?<<4 | symbol) fields, 6 per
    # int32 word. Disabled when the spec table is too large for a short
    # select chain or symbols exceed 4 bits.
    wm = np.asarray(table.wr_mask)
    wv = np.asarray(table.wr_val)
    n_spec = wm.shape[0]
    n_words = (n_spec + 5) // 6
    wr_words = None
    if n_words <= 8 and table.size_a <= 15:
        packed = np.zeros((n_cells, n_words), np.int64)
        for c in range(n_cells):
            for s in range(n_spec):
                field = (int(wm[s, c]) << 4) | (int(wv[s, c]) & 15)
                packed[c, s // 6] |= field << (5 * (s % 6))
        wr_words = jnp.asarray(packed.astype(np.int32))
    else:
        n_words = 0
    return DeviceTable(
        size_a=table.size_a,
        p_lo=table.p_lo,
        d_lo=table.d_lo,
        p_offs=jnp.arange(table.p_lo, table.p_hi + 1, dtype=jnp.int32),
        d_offs=jnp.arange(table.d_lo, table.d_hi + 1, dtype=jnp.int32),
        pv=jnp.asarray(pv, dtype=jnp.int32),
        out_cum=jnp.asarray(table.out_cum, dtype=dtype),
        out_world=jnp.asarray(table.out_world),
        wr_mask=jnp.asarray(table.wr_mask),
        wr_val=jnp.asarray(table.wr_val, dtype=jnp.int32),
        span=table.span,
        wr_words=wr_words,
        n_wr_words=n_words,
    )


def _apply_events(dt: DeviceTable, ptape, dtape, sites, uniforms):
    """Applies one round of parallel reaction events to a single replica.

    Events whose windows could overlap an earlier-indexed event's window
    are dropped (the sequential-order hazard, same policy as the
    Metropolis kernel in `models/ferromagnet.py`); with sites ≪ tape
    length the drop rate is negligible and unbiased.

    This is the scatter/gather formulation — exact for arbitrary site
    sets, but XLA lowers the tape scatters serially on TPU; the hot path
    is `_apply_lattice_round` below. Kept for the serial-semantics mode
    (1 event per round) and as the cross-check for the lattice kernel.
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


def _roll_cols(x, shift):
    """Circular left-shift of every row by a common (traced) shift.

    Lowered as dense slices — never a gather. One shared shift per
    round keeps the data movement at memcpy bandwidth; per-replica
    shifts would turn the roll into a 16M-element gather (measured 50x
    slower on TPU).
    """
    L = x.shape[1]
    shift = shift % L
    doubled = jnp.concatenate([x, x], axis=1)
    return jax.lax.dynamic_slice_in_dim(doubled, shift, L, axis=1)


def _apply_lattice_round(dt: DeviceTable, ptape, dtape, shift, uniforms):
    """One stratified round on the whole batch, with dense tape access.

    Sites form a randomly shifted lattice: ``site_e = r + e * stride``
    (one site per stride block, common shift r per round, shared by the
    whole batch). Rolling the tape by ``-(r + lo)`` and reshaping to
    [E, stride] puts every event's read/write window at STATIC columns
    of its own row — reads are a contiguous block slice, writes a
    static block update. No gathers or scatters touch the tape, which
    is what makes this the TPU hot path (XLA lowers tape scatters
    serially; dense rolls and reshapes are full-bandwidth vector ops).

    Within a round sites are ≥ stride apart (> 2·span enforced by the
    caller), so no event can see another's writes — identical semantics
    to serialized application, with zero conflict drops. Site marginals
    stay uniform because r is uniform per round; only same-site repeat
    firings within one round are unrepresented, as with the scatter
    formulation (see `run_ensemble` time accounting). Sites in one
    stride-residue class fire together (and, with the shared shift,
    across replicas too), so fluctuation statistics have an effective
    sample count of ~stride classes per round rather than B·L sites;
    contents and outcome draws remain fully independent.

    Args:
      ptape, dtape: [B, L] int32.
      shift: scalar int32 round shift r.
      uniforms: [B, E] outcome-sampling uniforms.
    Returns updated (ptape, dtape).
    """
    B, L = ptape.shape
    E = uniforms.shape[1]
    stride = L // E
    n_p = dt.p_offs.shape[0]
    n_d = dt.d_offs.shape[0]
    p_lo = dt.p_lo
    d_lo = dt.d_lo

    # Roll so that window cell `lo` of every lattice site lands at
    # column 0 of its block.
    rp = _roll_cols(ptape, shift + p_lo).reshape(B, E, stride)
    rd = _roll_cols(dtape, shift + d_lo).reshape(B, E, stride)
    cells_p = rp[:, :, :n_p]
    cells_d = rd[:, :, :n_d]
    cells = jnp.concatenate([cells_p, cells_d], axis=-1)  # [B, E, n]
    rows = (cells * dt.pv).sum(axis=-1)

    cum = dt.out_cum[rows]  # [B, E, M]
    k = (uniforms[..., None] > cum).sum(axis=-1)
    k = jnp.minimum(k, cum.shape[-1] - 1)
    spec = dt.out_world[rows, k]
    mask = dt.wr_mask[spec]  # [B, E, n]
    vals = dt.wr_val[spec]

    new_p = jnp.where(mask[..., :n_p], vals[..., :n_p], cells_p)
    new_d = jnp.where(mask[..., n_p:], vals[..., n_p:], cells_d)
    rp = rp.at[:, :, :n_p].set(new_p)
    rd = rd.at[:, :, :n_d].set(new_d)
    ptape = _roll_cols(rp.reshape(B, L), -(shift + p_lo))
    dtape = _roll_cols(rd.reshape(B, L), -(shift + d_lo))
    return ptape, dtape


def _apply_lattice_round_fsm(dm: DeviceMachine, ptape, dtape, shift,
                             uniforms):
    """Gather-free twin of :func:`_apply_lattice_round` on a
    :class:`DeviceMachine`: same dense roll/reshape tape access, with
    outcome resolution and writes as vectorized FSM/bit ops.

    This is the any-shift reference formulation; the hot path is the
    roll-free plane round (:func:`_apply_plane_round_fsm`)."""
    B, L = ptape.shape
    E = uniforms.shape[1]
    stride = L // E
    rp = _roll_cols(ptape, shift + dm.p_lo).reshape(B, E, stride)
    rd = _roll_cols(dtape, shift + dm.d_lo).reshape(B, E, stride)
    cells = jnp.concatenate(
        [rp[:, :, :dm.n_p], rd[:, :, :dm.n_d]], axis=-1)
    spec = _machine_specs(dm, cells, uniforms)
    new_cells = _machine_writes(dm, spec, cells)
    rp = rp.at[:, :, :dm.n_p].set(new_cells[..., :dm.n_p])
    rd = rd.at[:, :, :dm.n_d].set(new_cells[..., dm.n_p:])
    ptape = _roll_cols(rp.reshape(B, L), -(shift + dm.p_lo))
    dtape = _roll_cols(rd.reshape(B, L), -(shift + dm.d_lo))
    return ptape, dtape


# --- Plane (struct-of-planes) rounds: the roll-free TPU hot path --------------
#
# Storing the tape as `stride` planes (plane c = columns c::stride, each
# [B, E]) makes a lattice round touch ONLY the window cells: site k of a
# round with phase s sits at flat column s + k*stride; its window cell j
# lives in plane (s+lo+j) mod stride at element k + (s+lo+j)//stride —
# a static plane pick plus a static ±1 circular shift along the site
# axis, chosen by a `lax.switch` over the stride phases. The full-tape
# rolls of the reference formulation (4 per round, the dominant memory
# traffic) vanish entirely; untouched planes flow through the round as
# unmodified buffers. Restricting the phase to [0, stride) is exact:
# the site *set* {s + k*stride} only depends on s mod stride, so a
# uniform draw over [0, stride) gives the same site-marginal statistics
# as a uniform draw over the whole tape. For s < stride the plane round
# is bit-identical to `_apply_lattice_round_fsm` at the same uniforms.

_MAX_PLANE_STRIDE = 64  # switch branches per round; guards compile size


@jax.tree_util.register_pytree_node_class
class PlaneState:
    """Opaque plane-resident ensemble state (device tape representation).

    `run_ensemble(..., keep_planes=True)` returns one, and accepts one
    in place of the ``(ptape, dtape)`` tuple, so snapshot-style callers
    (step N rounds, measure, step N more) skip the per-call
    tape<->plane conversion: at the config-5 geometry (B=10⁷, L=32)
    the conversion dominates the ~0.87 s per-call constant vs a 268 µs
    round (RESULTS.md bench methodology). Decode with :meth:`tapes`
    when sites are needed; the state is only valid for calls with the
    same machine bit-width and ``(L // events)`` stride it was packed
    for (checked at trace time).

    ``kind`` is ``"bits"`` (uint32 bit-plane words, the bit-sliced
    round's layout) or ``"fsm"`` (stacked int8 symbol planes).
    """

    def __init__(self, kind, pbp, dbp, *, nb, transpose, batch, length):
        self.kind = kind
        self.pbp = pbp
        self.dbp = dbp
        self.nb = nb
        self.transpose = transpose
        self.batch = batch
        self.length = length

    @property
    def stride(self):
        return self.pbp.shape[0]

    def tapes(self):
        """Decodes back to (ptape, dtape) int32 [B, L] arrays."""
        from . import bitslice as bs
        if self.kind == "bits":
            return (bs.bitplanes_to_tapes(
                        self.pbp, transpose=self.transpose)
                    .astype(jnp.int32),
                    bs.bitplanes_to_tapes(
                        self.dbp, transpose=self.transpose)
                    .astype(jnp.int32))
        return (_planes_to_tape(tuple(self.pbp)).astype(jnp.int32),
                _planes_to_tape(tuple(self.dbp)).astype(jnp.int32))

    def tree_flatten(self):
        return ((self.pbp, self.dbp),
                (self.kind, self.nb, self.transpose, self.batch,
                 self.length))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, nb, transpose, batch, length = aux
        return cls(kind, *children, nb=nb, transpose=transpose,
                   batch=batch, length=length)


def _tape_to_planes(tape, stride):
    return tuple(tape[:, c::stride] for c in range(stride))


def _planes_to_tape(planes):
    B = planes[0].shape[0]
    return jnp.stack(planes, axis=-1).reshape(B, -1)


def _plane_coords(dm: DeviceMachine, stride):
    """Static (plane, site-shift) coordinates of every window cell for
    every phase: coords[phase] = [(tape, plane, extra), ...] in cell
    order (p cells then d cells)."""
    coords = []
    for phase in range(stride):
        row = []
        for tape, lo, n in ((0, dm.p_lo, dm.n_p), (1, dm.d_lo, dm.n_d)):
            for j in range(n):
                a = phase + lo + j
                row.append((tape, a % stride, a // stride))
        coords.append(row)
    return coords


def _apply_plane_round_fsm(dm: DeviceMachine, p_planes, d_planes, shift,
                           uniforms, *, tau: float = 1.0,
                           want_logp: bool = False, site_axis: int = 1):
    """One stratified round on plane-stored tapes; shift in [0, stride).

    Returns the updated (p_planes, d_planes) tuples; with ``want_logp``
    additionally the per-member importance log-weight increment (the sum
    of log p − log q over the round's sampled choose branches, float32
    [B]) — see :func:`_machine_specs_planes`.

    ``site_axis`` names the plane axis indexing the lattice sites. The
    ensemble stores planes as [B, E] (site_axis=1) — E is large there,
    filling the TPU lane tile. The weighted frontier has few sites per
    member (E≈2) and stores planes transposed [E, K] (site_axis=0) so
    the huge member axis rides the 128-lane minor dimension instead —
    measured 30x on the blocked frontier at K=1e6.
    """
    stride = len(p_planes)
    coords = _plane_coords(dm, stride)

    def read_branch(phase):
        def body(p_planes, d_planes):
            cells = []
            for tape, c, extra in coords[phase]:
                x = (p_planes if tape == 0 else d_planes)[c]
                if extra:
                    x = jnp.roll(x, -extra, axis=site_axis)
                cells.append(x)
            return tuple(cells)
        return body

    def write_branch(phase):
        def body(p_planes, d_planes, new):
            outs = (list(p_planes), list(d_planes))
            for i, (tape, c, extra) in enumerate(coords[phase]):
                v = new[i]
                if extra:
                    v = jnp.roll(v, extra, axis=site_axis)
                outs[tape][c] = v
            return tuple(outs[0]), tuple(outs[1])
        return body

    cells = jax.lax.switch(
        shift, [read_branch(s) for s in range(stride)], p_planes, d_planes)
    if want_logp:
        spec, logp = _machine_specs_planes(dm, cells, uniforms, tau=tau,
                                           want_logp=True)
    else:
        spec = _machine_specs_planes(dm, cells, uniforms, tau=tau)
    new = _machine_writes_planes(dm, spec, list(cells))
    p_planes, d_planes = jax.lax.switch(
        shift, [write_branch(s) for s in range(stride)],
        p_planes, d_planes, tuple(new))
    if want_logp:
        return p_planes, d_planes, logp.sum(axis=site_axis)
    return p_planes, d_planes


def _apply_plane_round_fsm_stacked(dm: DeviceMachine, p_st, d_st, shift,
                                   uniforms, *, tau: float = 1.0,
                                   want_logp: bool = False,
                                   site_axis: int = 1):
    """One stratified round on STACKED plane tapes ([stride, ...]).

    Same math as :func:`_apply_plane_round_fsm` — bit-identical at equal
    (shift, uniforms) (`tests/test_ensemble.py::
    test_stacked_plane_round_matches_tuple`) — but different data
    movement: the dynamic phase selects each window cell's plane with
    `dynamic_index_in_dim`/`dynamic_update_index_in_dim`, so only the
    n_cells touched planes move per round. The tuple formulation's
    16-way `lax.switch` copies the WHOLE plane set through both switch
    boundaries when the shift is dynamic: measured 1.73 ms vs 0.67 ms
    per round at the bench geometry (probes/round_decompose.py), which
    was ~60% of the ensemble round spent on copies.

    ``site_axis`` indexes the lattice-site axis OF ONE PLANE (ensemble
    planes are [B, E] -> 1; transposed frontier planes [E, K] -> 0).
    """
    stride = p_st.shape[0]
    tapes_meta = ((p_st, dm.p_lo, dm.n_p), (d_st, dm.d_lo, dm.n_d))
    cells, locs = [], []
    for st, lo, n in tapes_meta:
        for j in range(n):
            off = lo + j
            a = shift + off
            c = jnp.mod(a, stride)
            x = jax.lax.dynamic_index_in_dim(st, c, 0, keepdims=False)
            if off == 0:
                e = None  # shift in [0, stride) => never spills
            else:
                e = jnp.floor_divide(a, stride)  # in {-1, 0, 1}
                x = jnp.roll(x, -e, axis=site_axis)
            cells.append(x)
            locs.append((c, e))
    cells = tuple(cells)
    if want_logp:
        spec, logp = _machine_specs_planes(dm, cells, uniforms, tau=tau,
                                           want_logp=True)
    else:
        spec = _machine_specs_planes(dm, cells, uniforms, tau=tau)
    new = _machine_writes_planes(dm, spec, list(cells))
    outs = [p_st, d_st]
    k = 0
    for t, (st, lo, n) in enumerate(tapes_meta):
        for j in range(n):
            c, e = locs[k]
            v = new[k]
            if e is not None:
                v = jnp.roll(v, e, axis=site_axis)
            outs[t] = jax.lax.dynamic_update_index_in_dim(
                outs[t], v.astype(outs[t].dtype), c, 0)
            k += 1
    if want_logp:
        return outs[0], outs[1], logp.sum(axis=site_axis)
    return outs[0], outs[1]


def _roll_rows(tape, shifts):
    """Per-member circular roll: out[b, i] = tape[b, (i+shifts[b]) % L]."""
    B, L = tape.shape
    idx = (jnp.arange(L)[None, :] + shifts[:, None]) % L
    return jnp.take_along_axis(tape, idx, axis=1)


def _check_round_geometry(L: int, events: int, span: int) -> None:
    """Round-lattice geometry gate shared by `run_ensemble` and
    `first_passage_times`. ``events`` must divide L. At E=1 a round
    fires a SINGLE site per member — nothing to conflict with — so the
    only requirement is that the rule's window fits the ring (wide
    rules on master-equation-sized rings, e.g. ex3 at L=5). At E>1 the
    stratified lattice sites must sit > 2·span apart so no event can
    see another's writes within a round."""
    if L % events:
        raise ValueError(f"events_per_step={events} must divide L={L}")
    if events == 1:
        if span > L:
            raise ValueError(
                f"window span {span} exceeds tape length {L}")
    elif L // events <= 2 * span:
        raise ValueError(
            f"stride {L // events} too small for window span {span}; "
            "lower events_per_step")


def _rbg_bits(k, shape):
    """TPU-fast random bit-planes via the raw XLA RngBitGenerator op.

    The sampling-circuit paths draw ``n_choose_levels * rand_bits``
    uint32 planes per round; with threefry (`jax.random.bits`) that
    draw is ~42% of the whole ex4 round. The hardware generator is
    ~1.8x faster at the plane shapes (probes/rng_cost.py: 0.444 ->
    0.254 ms/round for [72,512,256] on v5e). The state is derived from
    the per-round threefry key (tiled to 4 words), so rounds stay
    independently seeded and the draw is deterministic given the key on
    a fixed backend — all the sampling path promises, since it is
    statistically (not bitwise) gated against the FSM walk
    (`tests/test_ensemble.py::test_sampling_circuit_branch_law`).
    """
    data = k if jnp.issubdtype(k.dtype, jnp.integer) \
        else jax.random.key_data(k)
    state = jnp.tile(jnp.ravel(data).astype(jnp.uint32), 4)[:4]
    return jax.lax.rng_bit_generator(state, shape, dtype=jnp.uint32)[1]


@partial(jax.jit, static_argnums=(3,),
         static_argnames=("independent_sites", "bitslice",
                          "keep_planes"))
def run_ensemble(key, tapes, dtable: DeviceTable, steps_events: tuple,
                 *, independent_sites: bool = False,
                 bitslice: bool | None = None,
                 keep_planes: bool = False):
    """Advances a batch of tape pairs with stratified lattice rounds.

    Each round fires the rule at E sites per replica arranged as a
    randomly shifted lattice: dense tape access, no conflicts, every
    event applies. With a :class:`DeviceMachine` the tapes are stored
    as `stride` int8 planes and stepped by the roll-free plane round
    (`_apply_plane_round_fsm`); a :class:`DeviceTable` uses the rolled
    gather round (`_apply_lattice_round`).

    Time semantics: the exact engine's rule fires as a rate-1 Poisson
    process per site. A round applies one event at each of E distinct
    sites, which corresponds to a Poisson window of length
    ``dt = -ln(1 - E/L)`` (the window in which the expected number of
    distinct fired sites is E). Same-site repeat firings *within* one
    round are not represented — an O(dt²) effect per round; keep
    events_per_step ≲ 5% of the tape length where that matters.

    Args:
      key: PRNG key.
      tapes: (ptape [B, L] int32, dtape [B, L] int32).
      dtable: compiled device table (pytree).
      steps_events: (num_steps, events_per_step), static.
        events_per_step must divide L; at E>1 additionally
        L/E > 2·window span (at E=1 one site fires per round, so only
        span ≤ L is required — wide rules on master-sized rings).

    ``bitslice`` selects the bit-sliced boolean-circuit round for
    choose-free machines (32 sites per int32 lane, `engine/bitslice.py`)
    — bit-identical tapes to the FSM round at the same key. ``None``
    (default) auto-enables it when eligible; ``False`` forces the FSM
    round; ``True`` raises if the machine or geometry is ineligible.

    ``independent_sites=True`` draws the lattice phase PER MEMBER
    (one delta-composed take_along_axis roll per tape per round)
    instead of the
    default common-random-sites design. Per-member marginals are
    identical either way; the difference is cross-member statistics:
    with shared sites, observables tied to RARE tape patterns have a
    heavy-tailed per-key law (measured on a fuzz rule at L=12: 88% of
    100 12-round site sequences carry exactly zero p(111) against an
    exact 4.8e-3, while the across-key mean stays exact —
    `probes/shared_site_tail.py`), so few-key estimates of rare
    structures can read hard zero. Use the independent mode (or many
    keys) when measuring rare patterns; the shared mode is the
    dense-data-path hot kernel.

    ``keep_planes=True`` returns a :class:`PlaneState` in place of the
    tape tuple, and ``tapes`` may be a :class:`PlaneState` from a
    previous call — together they amortise the per-call tape<->plane
    conversion across a snapshot loop (valid for the plane paths only:
    bit-sliced and FSM-plane rounds, not ``independent_sites`` or
    transition tables).

    Returns:
      ((ptape, dtape) — or a PlaneState under ``keep_planes`` —,
      (applied [num_steps] summed over replicas,
      time [num_steps] cumulative)).
    """
    num_steps, events = steps_events
    in_state = isinstance(tapes, PlaneState)
    if in_state:
        B, L = tapes.batch, tapes.length
    else:
        ptape, dtape = tapes
        B, L = ptape.shape
    _check_round_geometry(L, events, dtable.span)

    is_machine = isinstance(dtable, DeviceMachine)
    u_dtype = jnp.float32 if is_machine else dtable.out_cum.dtype
    stride = L // events
    use_planes = (is_machine and stride <= _MAX_PLANE_STRIDE
                  and not independent_sites)
    keys = jax.random.split(key, num_steps)

    from . import bitslice as bs

    eligible = (use_planes and B % 32 == 0
                and (bs.machine_is_bitsliceable(dtable)
                     or bs.machine_is_sampleable(dtable)))
    use_bitslice = bitslice is not False and eligible and (
        bitslice or bs.circuit_cpu_ok(dtable))
    if bitslice and not use_bitslice:
        raise ValueError(
            "bitslice=True needs a plane-eligible machine "
            f"and B % 32 == 0 (got B={B}, "
            f"machine={getattr(dtable, 'tag', dtable)!r})")
    if in_state:
        # A packed state pins the path it was packed for.
        if tapes.kind == "bits" and not use_bitslice:
            raise ValueError(
                "PlaneState packed for the bit-sliced round, but this "
                "call resolves to a different path (bitslice="
                f"{bitslice}, eligible={eligible})")
        if tapes.kind == "fsm":
            if not use_planes:
                raise ValueError(
                    "PlaneState packed for the FSM plane round needs a "
                    "plane-eligible call (machine, stride <= "
                    f"{_MAX_PLANE_STRIDE}, not independent_sites)")
            use_bitslice = False
        if tapes.stride != stride:
            raise ValueError(
                f"PlaneState stride {tapes.stride} != L//events = "
                f"{stride}: pack and continuation calls must use the "
                "same events_per_step")
    if (keep_planes or in_state) and not (use_planes or use_bitslice):
        raise ValueError(
            "keep_planes/PlaneState need a plane-path call (machine, "
            "stride <= 64, not independent_sites)")

    if use_bitslice:
        # Hottest path: the round as a bit-sliced boolean circuit, 32
        # sites per int32 lane. Choose-free machines run the monolithic
        # round circuit; there the k2 subkey is split but unused,
        # matching the FSM path where the uniforms it would seed are
        # dead code — so the shift stream, and therefore the tapes, are
        # bit-identical between the two paths. Choose-ful machines run
        # the layered SAMPLING circuit: k2 seeds rand_bits fresh random
        # bit-planes per choose level (same joint branch law as the
        # FSM's renormalised-uniform cascade to 2^-24, different
        # stream — statistically gated, not bitwise).
        if bs.machine_is_bitsliceable(dtable):
            circ = bs.compile_round_circuit(dtable)
        else:
            circ = bs.compile_sampling_circuit(dtable)
        n_rand = circ[3]
        # Put the larger of (events, packed members) on the 128-lane
        # axis — tiny-E geometries (config 5: L=32, E=2) transpose, the
        # same reason the weighted frontier stores its planes [E, K].
        transpose = events < B // 32
        if transpose:
            # 2-D [E, W] or 3-D [E, S, P] by tile-padding cost — the
            # 3-D split keeps both tiled dims dense at tiny E
            # (config 5) without regressing dense-2-D geometries
            # (headline). See bitslice.transposed_word_shape.
            wshape = bs.transposed_word_shape(events, B // 32)
            site_axis = -len(wshape)
        else:
            wshape = (B // 32, events)
            site_axis = -1

        def step(carry, k):
            pbp, dbp = carry
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, stride, dtype=jnp.int32)
            rand = (_rbg_bits(k2, (n_rand,) + wshape)
                    if n_rand else None)
            pbp, dbp = bs.apply_round_bitsliced(dtable, circ, pbp, dbp,
                                                shift,
                                                site_axis=site_axis,
                                                rand_words=rand)
            return (pbp, dbp), None

        nb = circ[2]
        if in_state:
            if tapes.nb != nb or tapes.transpose != transpose:
                raise ValueError(
                    f"PlaneState layout (nb={tapes.nb}, transpose="
                    f"{tapes.transpose}) does not match this call "
                    f"(nb={nb}, transpose={transpose})")
            carry = (tapes.pbp, tapes.dbp)
        else:
            carry = (bs.tapes_to_bitplanes(ptape, stride, nb,
                                           transpose=transpose),
                     bs.tapes_to_bitplanes(dtape, stride, nb,
                                           transpose=transpose))
        (pbp, dbp), _ = jax.lax.scan(step, carry, keys)
        if keep_planes:
            out = PlaneState("bits", pbp, dbp, nb=nb,
                             transpose=transpose, batch=B, length=L)
        else:
            ptape = bs.bitplanes_to_tapes(pbp, transpose=transpose)
            dtape = bs.bitplanes_to_tapes(dbp, transpose=transpose)
    elif use_planes:
        # Hot path: plane-stored int8 tapes, roll-free rounds, phase
        # drawn over [0, stride) (site-set equivalent to a full-tape
        # shift; see the plane-round commentary above).
        def step(carry, k):
            pp, dd = carry
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, stride, dtype=jnp.int32)
            uniforms = jax.random.uniform(k2, (B, events), dtype=u_dtype)
            pp, dd = _apply_plane_round_fsm_stacked(dtable, pp, dd, shift,
                                                    uniforms)
            return (pp, dd), None

        if in_state:
            carry = (tapes.pbp, tapes.dbp)
        else:
            carry = (jnp.stack(_tape_to_planes(ptape.astype(jnp.int8),
                                               stride)),
                     jnp.stack(_tape_to_planes(dtape.astype(jnp.int8),
                                               stride)))
        (pp, dd), _ = jax.lax.scan(step, carry, keys)
        if keep_planes:
            out = PlaneState("fsm", pp, dd, nb=0, transpose=False,
                             batch=B, length=L)
        else:
            ptape = _planes_to_tape(tuple(pp)).astype(jnp.int32)
            dtape = _planes_to_tape(tuple(dd)).astype(jnp.int32)
    else:
        round_fn = _apply_lattice_round_fsm if is_machine \
            else _apply_lattice_round

        def step(carry, k):
            pt, dti, phase = carry
            k1, k2 = jax.random.split(k)
            uniforms = jax.random.uniform(k2, (B, events), dtype=u_dtype)
            if independent_sites:
                # Per-member phase: keep each member ROLLED so its own
                # lattice sits at phase 0 across rounds — one delta
                # gather per tape per round (the final unroll happens
                # once, after the scan) instead of a roll/unroll pair.
                shifts = jax.random.randint(k1, (B,), 0, L,
                                            dtype=jnp.int32)
                delta = (shifts - phase) % L
                pt = _roll_rows(pt, delta)
                dti = _roll_rows(dti, delta)
                pt, dti = round_fn(dtable, pt, dti,
                                   jnp.int32(0), uniforms)
                phase = shifts
            else:
                shift = jax.random.randint(k1, (), 0, L,
                                           dtype=jnp.int32)
                pt, dti = round_fn(dtable, pt, dti, shift, uniforms)
            return (pt, dti, phase), None

        carry = (ptape, dtape)
        if is_machine:
            # Symbols fit int8; narrow tapes halve the bandwidth of the
            # rolls and FSM passes that dominate the round.
            carry = tuple(t.astype(jnp.int8) for t in carry)
        # Key-derived zero: keeps the phase carry device-varying under
        # shard_map (scan-vma type check) with bit-identical unsharded
        # streams — same trick as `bff._run_ensemble_bff`.
        carry = carry + (jnp.zeros((B,), jnp.int32)
                         + (keys[0].sum() * 0).astype(jnp.int32),)
        (ptape, dtape, phase), _ = jax.lax.scan(step, carry, keys)
        if independent_sites:
            ptape = _roll_rows(ptape, -phase)
            dtape = _roll_rows(dtape, -phase)
        if is_machine:
            ptape = ptape.astype(jnp.int32)
            dtape = dtape.astype(jnp.int32)
    applied = jnp.full((num_steps,), B * events, jnp.int64)
    dt_round = -jnp.log1p(-events / L)
    times = dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)
    return (out if keep_planes else (ptape, dtape)), (applied, times)


def contains_pattern(tape, pattern):
    """[B] bool: does ``pattern`` occur anywhere on each ring tape?"""
    tape = jnp.asarray(tape)
    pattern = tuple(int(s) for s in pattern)
    hit = jnp.ones(tape.shape, bool)
    for i, s in enumerate(pattern):
        hit = hit & (jnp.roll(tape, -i, axis=-1) == s)
    return hit.any(axis=-1)


def first_passage_times(key, tapes, dm, pattern, plan, *,
                        data_tape: bool = True):
    """Per-member first time ``pattern`` appears anywhere on the tape.

    First-passage questions ("when does this motif first assemble?")
    are unposable in the exact engine — the closure ODE evolves the
    MEAN window distribution, which cannot distinguish 'pattern present
    somewhere by t' from its occupancy at t. The concrete-tape ensemble
    answers them directly: evolve B independent rings under the
    stratified lockstep dynamics (`run_ensemble` semantics and time
    calibration, dt = −log(1 − E/L) per round) and record, per member,
    the first round whose post-state contains the pattern on the chosen
    tape. Resolution is one round; members that never hit within the
    plan report ``inf``.

    Args:
      key: PRNG key.
      tapes: (ptape [B, L] int, dtape [B, L] int) initial rings.
      dm: compiled :class:`DeviceMachine`.
      pattern: symbol-index sequence to detect (circularly).
      plan: static (max_rounds, events_per_round); events must divide
        L; at E>1 additionally L/events > 2·span (E=1 needs only
        span ≤ L).
      data_tape: search the data tape (True) or the program tape.

    Returns:
      (t_hit [B] float64 — ``inf`` if unhit, hit [B] bool,
      (ptape, dtape) final tapes).
    """
    max_rounds, events = plan
    ptape, dtape = tapes
    B, L = ptape.shape
    _check_round_geometry(L, events, dm.span)
    dt_round = -math.log1p(-events / L)
    pt = jnp.asarray(ptape).astype(jnp.int8)
    dt_ = jnp.asarray(dtape).astype(jnp.int8)

    def round_step(carry, inp):
        pt, dt_, t_hit = carry
        k, t_now = inp
        k1, k2 = jax.random.split(k)
        shift = jax.random.randint(k1, (), 0, L, dtype=jnp.int32)
        uniforms = jax.random.uniform(k2, (B, events), dtype=jnp.float32)
        pt, dt_ = _apply_lattice_round_fsm(dm, pt, dt_, shift, uniforms)
        present = contains_pattern(dt_ if data_tape else pt, pattern)
        t_hit = jnp.where(present & jnp.isinf(t_hit), t_now, t_hit)
        return (pt, dt_, t_hit), None

    t0_hit = jnp.where(
        contains_pattern(dt_ if data_tape else pt, pattern),
        0.0, jnp.inf)
    times = dt_round * jnp.arange(1, max_rounds + 1, dtype=jnp.float64)
    (pt, dt_, t_hit), _ = jax.lax.scan(
        round_step, (pt, dt_, t0_hit),
        (jax.random.split(key, max_rounds), times))
    return t_hit, jnp.isfinite(t_hit), (pt.astype(jnp.int32),
                                        dt_.astype(jnp.int32))


# --- Merge-by-key: collapse duplicate frontier configurations ----------------
#
# Beam/frontier members are *paths* through the reaction multiverse;
# distinct paths routinely reconverge to the same tape configuration.
# Without merging, duplicates occupy multiple slots and silently shrink
# the effective frontier width (the same redundancy that stage-2
# signature dedup removes in the exact engine, `compile.py`). Members
# are keyed by a 64-bit content hash of both tapes; collisions
# (~K²/2⁶⁴ per merge, ≈5e-6 at K=1e7) would merge two distinct
# configurations — negligible against the beam's own pruning bias.


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _content_hash(columns, bits: int = 8):
    """64-bit FNV-1a-style hash over per-member symbol columns.

    ``columns`` is an iterable of same-shape int arrays (one tape cell
    each, member-aligned); the fold order is part of the key and must be
    identical for members to compare equal.

    ``bits`` bounds the symbol values (2**bits). Cells are first packed
    ``28//bits`` per int32 word with native shifts, and only the packed
    words enter the (emulated, ~10x costlier) uint64 multiply fold —
    e.g. at bits=4 a 64-cell tape pair costs 10 u64 multiplies instead
    of 64.
    """
    per = max(1, 28 // bits)
    cols = list(columns)
    h = jnp.full(cols[0].shape, _FNV_OFFSET)
    for w0 in range(0, len(cols), per):
        word = cols[w0].astype(jnp.int32) + 1
        for c in cols[w0 + 1:w0 + per]:
            word = (word << bits) | c.astype(jnp.int32)
        h = (h ^ word.astype(jnp.uint64)) * _FNV_PRIME
    return h


def _merge_stats(h, lw):
    """Groups members by content hash and logsumexp-merges weights.

    Sort-free: a power-of-two scatter hash table (≥ 2K buckets) elects
    one winner per bucket (min member index); a member joins the
    winner's group only when their full 64-bit hashes match, so a bucket
    collision between distinct configurations can never merge them — it
    merely postpones that pair's merge (callers salt the hash per block,
    re-rolling bucket assignments). Chosen over sort-and-segment because
    TPU sort lowerings compile ~100x slower on this backend (measured:
    36 s for one 1e5 argsort) while scatters compile in seconds.

    Returns (grp [K] member index of each member's group representative,
    merged_lw [K] group log-weight at rep positions (-inf elsewhere),
    is_rep [K] bool, n_groups).
    """
    K = h.shape[0]
    n_buckets = 1 << (2 * K - 1).bit_length()
    idx = jnp.arange(K, dtype=jnp.int32)
    b = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    winner = jnp.full((n_buckets,), K, jnp.int32).at[b].min(idx)
    cand = winner[b]  # < K: every queried bucket holds at least its owner
    grp = jnp.where(h[cand] == h, cand, idx)
    # Group logsumexp under a GLOBAL max shift: one cheap reduction
    # instead of a per-group scatter-max (TPU scatters with colliding
    # indices serialise — measured ~80 ms per scatter at K=1e6, and
    # this saves one of the three). Members far below the global max
    # underflow exactly as in any logsumexp; they carry no mass.
    finite = jnp.isfinite(lw)
    m = jnp.max(jnp.where(finite, lw, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    gsum = jnp.zeros((K,), lw.dtype).at[grp].add(
        jnp.where(finite, jnp.exp(lw - m), 0.0))
    merged_lw = jnp.where(
        gsum > 0.0, m + jnp.log(jnp.maximum(gsum, 1e-300)), -jnp.inf)
    is_rep = grp == idx
    return grp, merged_lw, is_rep, is_rep.sum()


def _merge_weights_inplace(h, lw):
    """Weight-only merge for the per-step beam: each duplicate group's
    total weight moves to one representative slot; the other slots drop
    to -inf, so the next top-k ranking backfills them with genuinely
    distinct children instead of redundant copies. No tape data moves.
    """
    _, merged_lw, is_rep, _ = _merge_stats(h, lw)
    return jnp.where(is_rep, merged_lw, -jnp.inf)


def _merge_resample(key, h, lw):
    """Merge duplicates, then reallocate all K slots across the unique
    configurations by systematic resampling proportional to merged
    weight, splitting each configuration's weight over its slots.

    Weight-preserving: a configuration given m ≥ 1 slots carries exactly
    its merged weight (m slots of w/m); configurations with merged
    weight ≥ 1/K always survive (systematic resampling guarantees
    m ≥ ⌊K·w⌋). This is the frontier's top-k pruning: freed duplicate
    slots flow to the heaviest configurations (whose future branch
    outcomes then get proportionally more exploration), and
    configurations far below 1/K weight lose their slot.

    Returns (parent [K] member index per new slot, new_lw [K],
    n_groups).
    """
    K = h.shape[0]
    k_salt, k_u = jax.random.split(key)
    # Per-call salt re-rolls hash-table bucket assignments (equality is
    # preserved: xor + odd multiply are bijections mod 2^64), so a
    # bucket collision only defers a merge by one block.
    salt = jax.random.bits(k_salt, (), jnp.uint32).astype(jnp.uint64)
    hh = (h ^ salt) * _FNV_PRIME
    _, merged_lw, is_rep, n_groups = _merge_stats(hh, lw)
    lse = jax.scipy.special.logsumexp(merged_lw)
    w = jnp.exp(merged_lw - lse)  # zeros off-rep
    cum = jnp.cumsum(w)
    cum = cum / cum[-1]
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    f = jnp.floor(K * cum - u)
    m = (f - jnp.concatenate([jnp.full((1,), -1.0), f[:-1]])).astype(
        jnp.int32)  # multiplicities per member index, sum == K
    # Slot -> member assignment: member i owns slots
    # [cumsum(m)[i-1], cumsum(m)[i]). A boundary scatter + cumsum
    # (equivalent to searchsorted(cumsum(m), arange(K), "right"), which
    # compiles far slower on the TPU backend).
    bounds = jnp.cumsum(m)[:-1]
    parent = jnp.cumsum(
        jnp.zeros((K,), jnp.int32).at[bounds].add(1, mode="drop"))
    parent = jnp.minimum(parent, K - 1)
    new_lw = merged_lw[parent] - jnp.log(jnp.maximum(m[parent], 1))
    return parent, new_lw, n_groups


# --- Position-space merge/resample (round-5) -------------------------------
#
# Small single-op jits: the blocked merge runs them as a HOST-STAGED
# sequence. Two measured facts force this shape (probes/merge_prefixes,
# merge_microops, /tmp stage decomposition, K=1e7, 2026-08-21):
# (a) XLA:TPU fuses random-access ops (scatter/gather) with their
#     producer chains into programs that run 5-50x slower than the
#     same ops on materialized inputs (two fused ops: 208 ms vs
#     67 + 33; five: 1.5 s) — so ops must be COMPILED separately;
# (b) dispatches are async and queue on device, so an 11-op staged
#     chain pays ONE sync round-trip, not 11 dispatch floors.

_j_sort_pairs = jax.jit(lambda h, i: jax.lax.sort((h, i), num_keys=1))
_j_take = jax.jit(lambda x, p: x[p])
_j_lse = jax.jit(jax.scipy.special.logsumexp)
_j_norm_exp = jax.jit(lambda ws, lse: jnp.where(
    jnp.isfinite(ws), jnp.exp(ws - lse), 0.0))
_j_cumsum = jax.jit(jnp.cumsum)
_j_cum_norm = jax.jit(lambda cum: cum / cum[-1])
_j_n_unique = jax.jit(lambda hs: 1 + (hs[1:] != hs[:-1]).sum(
    dtype=jnp.int32))
# One jit per op — a round-5 consolidation attempt (lse + exp + cumsum
# + multiplicities in one jit) recompiled for 210 s and SIGSEGV'd the
# AOT helper at K=1e7: even elementwise+scan chains are unsafe to fuse
# on this backend. Keep the ops separate.
_j_mult_pos = jax.jit(
    lambda cumn, u, K: (
        jnp.floor(K * cumn - u)
        - jnp.concatenate([jnp.full((1,), -1.0),
                           jnp.floor(K * cumn - u)[:-1]])
    ).astype(jnp.int32),
    static_argnums=(2,))
_j_slot_pos = jax.jit(
    lambda mult, K: jnp.minimum(
        jnp.cumsum(jnp.zeros((K,), jnp.int32).at[
            jnp.cumsum(mult)[:-1]].add(1, mode="drop")), K - 1),
    static_argnums=(1,))
_j_full_lw = jax.jit(
    lambda lse, K: jnp.full((K,), lse - np.log(K)),
    static_argnums=(1,))


def _merge_resample_positions(key, h, lw):
    """Position-space systematic resample with EQUAL slot weights —
    the round-5 blocked-merge engine. Returns ``(parent [K],
    new_lw [K], n_unique)`` like `_merge_resample`.

    Sorting members by content hash makes every duplicate group a
    CONTIGUOUS run, so member-level systematic resampling over the
    sorted cumulative weights allocates each group exactly the slots
    group-level systematic would (the group owns a contiguous
    cum-interval; slots land in it in proportion to the group's TOTAL
    mass — merging becomes implicit adjacency, no group-id arrays, no
    per-group scatters). Slot weights are EQUAL (total/K, the textbook
    SMC convention): totals are preserved exactly; a group's realized
    total differs from its merged weight by < total/K (systematic
    guarantees |m_g - K·ŵ_g| < 1). At tau=1 — uniform weights, the
    benched configuration — this coincides with the old w/m scheme
    exactly up to slot identity within a duplicate group.

    Why not the hash-table or group-sorted formulations: the staged
    decomposition measured the group machinery itself as the cost —
    the per-group f64 unique-scatter alone was 1.25 s at K=1e7, the
    bucket election + fused group-sum 1.4-1.8 s — while every op this
    formulation keeps (sort 70 ms, gathers 99-177 ms, cumsums ~76 ms)
    is cheap. Measured end-to-end in `probes/merge_positions.py`.

    ``n_unique`` is EXACT (distinct sorted hashes) — the hash-table
    variant overcounts by deferred bucket collisions.
    """
    K = h.shape[0]
    _, k_u = jax.random.split(key)
    idx = jnp.arange(K, dtype=jnp.int32)
    hs, perm = _j_sort_pairs(h, idx)
    ws = _j_take(lw, perm)
    lse = _j_lse(lw)
    e = _j_norm_exp(ws, lse)
    cumn = _j_cum_norm(_j_cumsum(e))
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    mult = _j_mult_pos(cumn, u, K)
    slot_pos = _j_slot_pos(mult, K)
    parent = _j_take(perm, slot_pos)
    new_lw = _j_full_lw(lse, K)
    return parent, new_lw, _j_n_unique(hs)


def _merge_resample_sorted(key, h, lw):
    """Sort-based twin of :func:`_merge_resample` — same contract
    (parent [K], new_lw [K], n_groups), different internal order.

    Round-5 re-measurement overturned the round-2 sort exclusion: at
    K=1e7 `jax.lax.sort` of (u64, i32) runs in 70 ms on this backend
    (the 36 s figure was COMPILE time at an unrepresentative 1e5 shape;
    compiles cache per shape), while the hash-table election inside
    `_merge_stats` costs ~1.4 s fused (`probes/scatter_floor_1e7.py`,
    `probes/merge_microops.py`). This formulation sorts members by
    content hash, finds group boundaries by neighbor compare, group-
    logsumexps via one cumsum + boundary differences, and performs the
    same systematic slot resampling in GROUP-sorted order. All scatters
    are unique-index (one end/start per group, measured at the
    dispatch floor); no salt is needed because sorting groups equal
    hashes exactly — there are no bucket collisions to defer.

    Statistically equivalent to `_merge_resample` (identical merged
    weights; the systematic resample visits groups in hash order
    instead of member order, so slot assignments differ stream-wise).
    Invariants gated by
    `tests/test_ensemble.py::test_merge_resample_sorted_invariants`.
    """
    K = h.shape[0]
    _, k_u = jax.random.split(key)
    idx = jnp.arange(K, dtype=jnp.int32)
    hs, perm = jax.lax.sort((h, idx), num_keys=1)
    ws = lw[perm]
    neq = hs[1:] != hs[:-1]
    start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    gid = jnp.cumsum(start.astype(jnp.int32)) - 1  # [K] sorted-pos -> g
    n_groups = gid[-1] + 1
    # Group logsumexp under the same GLOBAL max shift as _merge_stats.
    finite = jnp.isfinite(ws)
    m = jnp.max(jnp.where(finite, ws, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ce = jnp.cumsum(jnp.where(finite, jnp.exp(ws - m), 0.0))
    drop = jnp.int32(K)  # masked scatters: unique per-group slots
    end_ce = jnp.zeros((K,), ce.dtype).at[
        jnp.where(is_end, gid, drop)].set(ce, mode="drop",
                                          unique_indices=True)
    # Pad mask: entries past n_groups hold 0 - end_ce[n_groups-1] after
    # the difference; zero them so the resampling cumsum stays monotone.
    gsum = jnp.where(
        idx < n_groups,
        end_ce - jnp.concatenate(
            [jnp.zeros((1,), ce.dtype), end_ce[:-1]]),
        0.0)  # [K] per-group mass
    # First sorted member of each group -> an original member index
    # whose content represents the group.
    pos_start = jnp.zeros((K,), jnp.int32).at[
        jnp.where(start, gid, drop)].set(idx, mode="drop",
                                         unique_indices=True)
    orig_first = perm[pos_start]
    # Systematic slot resampling over groups (gsum is zero past
    # n_groups, so the trailing pad draws no slots).
    cum = jnp.cumsum(gsum)
    cum = cum / cum[-1]
    u = jnp.clip(jax.random.uniform(k_u, (), jnp.float64),
                 1e-12, 1.0 - 1e-12)
    f = jnp.floor(K * cum - u)
    mult = (f - jnp.concatenate([jnp.full((1,), -1.0), f[:-1]])
            ).astype(jnp.int32)  # [K] slots per group, sum == K
    bounds = jnp.cumsum(mult)[:-1]
    slot_gid = jnp.cumsum(
        jnp.zeros((K,), jnp.int32).at[bounds].add(1, mode="drop"))
    slot_gid = jnp.minimum(slot_gid, K - 1)
    parent = orig_first[slot_gid]
    new_lw = (m + jnp.log(jnp.maximum(gsum[slot_gid], 1e-300))
              - jnp.log(jnp.maximum(mult[slot_gid], 1)))
    new_lw = jnp.where(gsum[slot_gid] > 0.0, new_lw, -jnp.inf)
    return parent, new_lw, n_groups


@partial(jax.jit, static_argnums=(4, 5, 6))
def run_weighted_frontier(key, tapes, logw, dtable: DeviceTable,
                          num_steps: int, top_k: int,
                          merge_every: int = 0):
    """Weighted-frontier mode with top-k pruning (BASELINE config 5).

    Tracks K weighted tape configurations as an explicit frontier over
    the reaction multiverse: each step fires the rule at one random
    site, *branches* every configuration into all table outcomes
    (instead of sampling one), and keeps the top-k children by weight
    globally. A beam-search-style approximation of the full
    distribution evolution — the exact SPD engine (`rhs.py`) is the
    unpruned reference.

    The firing site is shared by all members (common random sites):
    each member's site marginal is still uniform, so per-member window
    statistics are unchanged; only the joint site exploration across
    members is correlated, trading a little cross-member diversity for
    a dense data path. The shared site turns the per-member window
    gathers into one tape roll plus *static* column slices — measured
    ~100× faster than the independent-site take_along_axis/scatter
    formulation, whose dynamic per-row gathers dominated the step.

    Candidate weights are ranked *before* materialising child tapes, so
    the working set stays at K tapes (children = gather parent rows +
    static-slice write), never K×M. Outcome log-probabilities come from
    a precomputed table (hoisted out of the scan), and weights are only
    max-shifted inside the scan — the single logsumexp normalisation
    happens once at the end.

    Args:
      key: PRNG key.
      tapes: (ptape [K, L] int, dtape [K, L] int) initial frontier.
      logw: [K] float64 log-weights (normalised or not).
      dtable: compiled device table.
      num_steps: static; each step advances time by 1/L.
      top_k: static; must equal K (the frontier width is fixed).
      merge_every: static; if > 0, every merge_every steps duplicate
        configurations are merged by content key (logsumexp of their
        weights into one representative slot, the rest dropped to -inf)
        so the next top-k ranking backfills the freed slots with
        genuinely distinct children — restoring the effective beam
        width. Only meaningful for branching tables (M > 1; a
        deterministic beam has no ranking to backfill through).

    Returns:
      ((ptape, dtape), logw) after num_steps; exp(logw) sums to 1.
    """
    ptape, dtape = tapes
    K, L = ptape.shape
    if top_k != K:
        raise ValueError(
            f"top_k={top_k} must equal the frontier width K={K} (the "
            "frontier is fixed-width; children replace parents 1:1)"
        )
    if dtable.size_a > 127:
        raise ValueError(
            f"size_a={dtable.size_a} exceeds the frontier's int8 tape "
            "layout (symbols must fit int8)"
        )
    M = dtable.out_cum.shape[1]
    n_p = dtable.p_offs.shape[0]
    n_d = dtable.d_offs.shape[0]
    in_dtype = ptape.dtype
    # Internal layout: int8 (symbols fit; quarters the bandwidth) and
    # TRANSPOSED [L, K] — the member axis rides the 128-lane tile, so
    # rolls, window slices, and write-back are full-lane ops (measured
    # 2.1x over [K, L] even with the minor-axis parent gather).
    pt_t = ptape.astype(jnp.int8).T
    dt_t = dtape.astype(jnp.int8).T

    # Static row layout after rolling the window start to row 0: both
    # tapes roll by the same amount (their relative alignment is
    # physical), so the p-window occupies rows [p_lo-lo, ...) and the
    # d-window [d_lo-lo, ...).
    lo = min(dtable.p_lo, dtable.d_lo)
    pc = dtable.p_lo - lo
    dc = dtable.d_lo - lo
    if max(pc + n_p, dc + n_d) > L:
        raise ValueError(f"window span exceeds tape length {L}")

    probs = jnp.diff(dtable.out_cum, axis=1, prepend=0.0)
    out_log = jnp.where(probs > 0,
                        jnp.log(jnp.maximum(probs, 1e-300)), -jnp.inf)

    # Write decode: per-member [K] gathers from the tiny [S, n_cells]
    # wr_mask/wr_val tables are a known TPU pathology (the same one the
    # ensemble's decision machine eliminates). When `device_table`
    # packed each cell's (writes?<<4 | symbol) as 5-bit word fields,
    # decode with shifts + selects — measured 1.26x on the branching
    # beam. Gather fallback otherwise.
    n_words = dtable.n_wr_words

    def _write_decode(spec, par_p, par_d):
        """New window rows after applying spec's writes to the parents."""
        if not n_words:
            mask = dtable.wr_mask[spec]  # [K, n_cells]
            vals = dtable.wr_val[spec].astype(jnp.int8)
            return (jnp.where(mask[:, :n_p].T, vals[:, :n_p].T, par_p),
                    jnp.where(mask[:, n_p:].T, vals[:, n_p:].T, par_d))
        spec32 = spec.astype(jnp.int32)
        sh = 5 * (spec32 % 6)
        wi = spec32 // 6

        def decode(c):
            f = jnp.right_shift(dtable.wr_words[c, 0], sh)
            for w in range(1, n_words):
                f = jnp.where(
                    wi == w,
                    jnp.right_shift(dtable.wr_words[c, w], sh), f)
            return f & 31

        new_p = [jnp.where(decode(c) >= 16,
                           (decode(c) & 15).astype(jnp.int8), par_p[c])
                 for c in range(n_p)]
        new_d = [jnp.where(decode(n_p + c) >= 16,
                           (decode(n_p + c) & 15).astype(jnp.int8),
                           par_d[c])
                 for c in range(n_d)]
        return jnp.stack(new_p), jnp.stack(new_d)

    def step(carry, xs):
        k, i = xs
        pt, dti, lw, shift_acc = carry  # pt/dti [L, K] int8
        site = jax.random.randint(k, (), 0, L, dtype=jnp.int32)
        roll = -(site + lo)
        pt = jnp.roll(pt, roll, axis=0)
        dti = jnp.roll(dti, roll, axis=0)

        cells_p = pt[pc:pc + n_p].astype(jnp.int32)  # [n_p, K]
        cells_d = dti[dc:dc + n_d].astype(jnp.int32)
        cells = jnp.concatenate([cells_p, cells_d], axis=0)
        rows = (cells * dtable.pv[:, None]).sum(axis=0)  # [K]

        child_lw = lw[:, None] + out_log[rows]  # [K, M]
        if M == 1:
            # Deterministic rules (one outcome per window): no branching,
            # so ranking is a pure permutation — skip the sort and the
            # parent gather entirely. Also avoids XLA's minutes-long
            # compile of a full f64 top_k sort network.
            top_lw = child_lw[:, 0]
            top_lw = top_lw - jnp.max(top_lw)
            spec = dtable.out_world[rows, 0]
            par_p = cells_p.astype(jnp.int8)
            par_d = cells_d.astype(jnp.int8)
        else:
            top_lw, top_idx = jax.lax.top_k(child_lw.reshape(-1), top_k)
            parent = top_idx // M
            slot = top_idx % M
            rows = rows[parent]
            spec = dtable.out_world[rows, slot]
            par_p = cells_p[:, parent].astype(jnp.int8)
            par_d = cells_d[:, parent].astype(jnp.int8)
            pt = pt[:, parent]
            dti = dti[:, parent]
            top_lw = top_lw - top_lw[0]
        new_cells_p, new_cells_d = _write_decode(spec, par_p, par_d)
        pt = pt.at[pc:pc + n_p].set(new_cells_p)
        dti = dti.at[dc:dc + n_d].set(new_cells_d)

        if merge_every and M > 1:
            def merged(lw_in):
                hh = _content_hash(
                    [pt[j] for j in range(L)] + [dti[j] for j in range(L)])
                return _merge_weights_inplace(hh, lw_in)

            top_lw = jax.lax.cond(
                i % merge_every == merge_every - 1, merged,
                lambda lw_in: lw_in, top_lw)

        # Normalisation is deferred: the max-shift above keeps
        # magnitudes bounded; one logsumexp runs after the scan.
        return (pt, dti, top_lw, (shift_acc + roll) % L), None

    keys = jax.random.split(key, num_steps)
    # The zero is derived from a data input so its manual-axes varying
    # type matches the loop-updated value under shard_map (island-mode
    # sharding folds the device index into `key`, making every
    # key-derived value device-varying).
    shift_acc0 = jnp.int32(0) * pt_t[0, 0].astype(jnp.int32)
    (pt_t, dt_t, logw, shift_acc), _ = jax.lax.scan(
        step, (pt_t, dt_t, logw, shift_acc0),
        (keys, jnp.arange(num_steps)))
    # Undo the accumulated rotation so absolute tape positions match the
    # unrolled formulation, and normalise the weights once.
    ptape = jnp.roll(pt_t, -shift_acc, axis=0).T.astype(in_dtype)
    dtape = jnp.roll(dt_t, -shift_acc, axis=0).T.astype(in_dtype)
    logw = logw - jax.scipy.special.logsumexp(logw)
    return (ptape, dtape), logw


@partial(jax.jit, static_argnames=("rounds", "tau", "bitslice"))
def _blocked_rounds(key, pp, dd, lw, dm: DeviceMachine, *,
                    rounds: int, tau: float,
                    bitslice: bool | None = None):
    """One block of stratified rounds on transposed planes [E, K].

    ``key`` is split INSIDE the jit: on the tunnelled backend every
    host-side op (even a PRNG split) is a separate ~100 ms remote
    dispatch, so the block loop must touch the device exactly twice per
    block (this call + the merge).

    Bit-sliced rounds (`engine/bitslice.py`, 32 members per uint32 word
    on the lane axis) auto-engage whenever the importance log-weight
    increments are identically zero, so ``lw`` passes through
    untouched: choose-free machines at any tau (round circuit,
    bit-identical to the FSM path at the same key —
    `tests/test_ensemble.py::test_blocked_rounds_bitsliced_matches_fsm`)
    and choose-ful machines at tau=1 (sampling circuit, q = p exactly;
    same branch law as the FSM cascade to 2^-24, different stream —
    statistically gated). tau < 1 tempering keeps the FSM walk.
    """
    from . import bitslice as bs

    stride = len(pp)
    E, K = pp[0].shape
    bs_free = bs.machine_is_bitsliceable(dm)
    use_bs = (bitslice is not False and K % 32 == 0
              and (bs_free
                   or (tau == 1.0 and bs.machine_is_sampleable(dm))))
    if bitslice and not use_bs:
        raise ValueError(
            "bitslice=True needs K % 32 == 0 and a choose-free machine "
            "(any tau) or a sampleable machine at tau=1")
    # Auto never hands XLA:CPU a multi-minute circuit compile (wide
    # sampling circuits reach ~7k ops); bitslice=True overrides.
    use_bs = use_bs and (bool(bitslice) or bs.circuit_cpu_ok(dm))

    if use_bs:
        circ = (bs.compile_round_circuit(dm) if bs_free
                else bs.compile_sampling_circuit(dm))
        n_rand = circ[3]
        pbw = bs.stacked_planes_to_bitwords(jnp.stack(pp), circ[2])
        dbw = bs.stacked_planes_to_bitwords(jnp.stack(dd), circ[2])
        wshape = bs.transposed_word_shape(E, K // 32)
        site_axis = -len(wshape)

        def round_step(carry, k):
            pbw, dbw = carry
            k1, k2 = jax.random.split(k)
            shift = jax.random.randint(k1, (), 0, stride,
                                       dtype=jnp.int32)
            rand = (_rbg_bits(k2, (n_rand,) + wshape)
                    if n_rand else None)
            pbw, dbw = bs.apply_round_bitsliced(dm, circ, pbw, dbw,
                                                shift,
                                                site_axis=site_axis,
                                                rand_words=rand)
            return (pbw, dbw), None

        (pbw, dbw), _ = jax.lax.scan(round_step, (pbw, dbw),
                                     jax.random.split(key, rounds))
        return (tuple(bs.bitwords_to_stacked_planes(pbw)),
                tuple(bs.bitwords_to_stacked_planes(dbw)), lw)

    def round_step(carry, k):
        pp, dd, lw = carry
        k1, k2 = jax.random.split(k)
        shift = jax.random.randint(k1, (), 0, stride, dtype=jnp.int32)
        uniforms = jax.random.uniform(k2, (E, K), dtype=jnp.float32)
        if tau == 1.0:
            # q = p exactly, so the importance increments are
            # IDENTICALLY zero (`_choose_sampling_dist`) — skip the
            # logp plumbing. Besides the saved where-chains this
            # sidesteps an XLA:CPU "Unknown MLIR failure" that the
            # constant-folded zero-increment graph triggers on wide
            # machines (fuzz-wide-specs, 199 specs — round 3; the
            # tau<1 graph with real increments compiles fine).
            pp, dd = _apply_plane_round_fsm_stacked(
                dm, pp, dd, shift, uniforms, tau=tau, site_axis=0)
        else:
            pp, dd, dlp = _apply_plane_round_fsm_stacked(
                dm, pp, dd, shift, uniforms, tau=tau, want_logp=True,
                site_axis=0)
            lw = lw + dlp.astype(lw.dtype)
        return (pp, dd, lw), None

    (pp, dd, lw), _ = jax.lax.scan(
        round_step, (jnp.stack(pp), jnp.stack(dd), lw),
        jax.random.split(key, rounds))
    return tuple(pp), tuple(dd), lw


def _gather_plane_columns(planes, parent):
    """Parent-gather of transposed planes ([E, K] x stride) via a
    packed MAJOR-axis row gather.

    The direct per-plane minor-axis gather ``pl[:, parent]`` lowers
    pathologically on this backend — measured 3.0 s at the K=10^7
    frontier (59% of the whole merge, `probes/merge_decompose.py`,
    round 4): an arbitrary-index gather along the 128-lane axis of 32
    separate int8 arrays. Packing all cells member-major ([K, n] via
    one dense transpose), 4 int8 fields per int32 word, turns it into
    ONE row gather over [K, n/4] int32 — the layout gathers are built
    for — plus two dense transposes. Bit-exact (symbols < 256).
    """
    stride = len(planes)
    E, K = planes[0].shape
    st = jnp.stack(planes)                      # [stride, E, K] int8
    n = stride * E
    pad = (-n) % 4
    t = st.reshape(n, K).T                      # [K, n]
    if pad:
        t = jnp.concatenate(
            [t, jnp.zeros((K, pad), t.dtype)], axis=1)
    # Mask each widened field: a negative int8 cell would sign-extend
    # and corrupt all four lanes of the packed word. With the mask the
    # pack/unpack pair is a bijection on ALL int8 values (negatives
    # round-trip via their unsigned alias), so no symbol-range
    # assumption is load-bearing (round-4 advisor).
    t4 = t.reshape(K, (n + pad) // 4, 4).astype(jnp.int32) & 0xFF
    words = (t4[..., 0] | (t4[..., 1] << 8)
             | (t4[..., 2] << 16) | (t4[..., 3] << 24))
    g = jnp.take(words, parent, axis=0)         # [K, n/4] row gather
    cells = jnp.stack([(g >> (8 * i)) & 0xFF for i in range(4)],
                      axis=-1).reshape(K, n + pad)
    back = cells[:, :n].T.reshape(stride, E, K).astype(planes[0].dtype)
    return tuple(back[c] for c in range(stride))


@jax.jit
def _gather_planes_pair(pp, dd, parent):
    """Jitted program+data packed parent-gather (host-loop callers)."""
    return _gather_planes_pair_packed(pp, dd, parent)


def _pack_planes_words(planes):
    """[stride x [E, K] int8] -> [K, n/4] int32 packed member-major
    words (the `_gather_plane_columns` packing, factored out so the
    program and data tapes can ride ONE row gather)."""
    stride = len(planes)
    E, K = planes[0].shape
    st = jnp.stack(planes)
    n = stride * E
    pad = (-n) % 4
    t = st.reshape(n, K).T
    if pad:
        t = jnp.concatenate([t, jnp.zeros((K, pad), t.dtype)], axis=1)
    t4 = t.reshape(K, (n + pad) // 4, 4).astype(jnp.int32) & 0xFF
    return (t4[..., 0] | (t4[..., 1] << 8)
            | (t4[..., 2] << 16) | (t4[..., 3] << 24))


def _unpack_planes_words(g, stride, E, dtype):
    """Inverse of :func:`_pack_planes_words` (drops the pad)."""
    K = g.shape[0]
    n = stride * E
    cells = jnp.stack([(g >> (8 * i)) & 0xFF for i in range(4)],
                      axis=-1).reshape(K, g.shape[1] * 4)
    back = cells[:, :n].T.reshape(stride, E, K).astype(dtype)
    return tuple(back[c] for c in range(stride))


def _gather_planes_pair_packed(pp, dd, parent):
    """Parent-gather of BOTH tapes' planes as ONE [K, 2n/4] row gather.

    `_gather_plane_columns` made the merge gather a packed row gather
    (round 4, 3.0 s -> 0.68 s at K=1e7); gather cost on this backend is
    per-ROW (flat 1e7-element gathers run at the ~26 ms dispatch floor
    while [K, 8] row gathers cost ~0.68 s — `probes/merge_microops.py`),
    so concatenating the program and data words halves the row count
    versus two separate gathers. Bit-exact with the per-tape path.
    """
    stride = len(pp)
    E, K = pp[0].shape
    wp = _pack_planes_words(pp)
    wd = _pack_planes_words(dd)
    both = jnp.concatenate([wp, wd], axis=1)
    g = jnp.take(both, parent, axis=0)
    W = wp.shape[1]
    return (_unpack_planes_words(g[:, :W], stride, E, pp[0].dtype),
            _unpack_planes_words(g[:, W:], stride, E, dd[0].dtype))


# Above this member count the blocked merge switches from the fused
# hash-table program to the host-staged position-space pipeline.
# Measured at bench geometry (probes/merge_positions.py, 2026-08-21):
# K=1e6 fused 264 ms vs staged 310 ms (per-jit host overhead x11 ops
# dominates at this size); K=1e7 fused 2849 ms vs staged 1080 ms (the
# fused program's scatter/gather+producer fusions serialise -
# probes/merge_prefixes.py). At tau=1 (uniform weights - the benched
# configuration) the two schemes allocate identically, so the
# threshold changes implementation, not statistics; at tau<1 the
# staged path is the textbook equal-weight SMC resample while the
# fused path keeps the w/m split (see _merge_resample_positions).
_MERGE_STAGED_MIN_K = 4_000_000

_hash4_j = jax.jit(lambda cols: _content_hash(cols, bits=4))
_gather_pair_j = jax.jit(lambda pp, dd, par: (
    _gather_plane_columns(pp, par), _gather_plane_columns(dd, par)))
_sub_max_j = jax.jit(lambda lw: lw - jnp.max(lw))


@jax.jit
def _blocked_merge_fused(key, pp, dd, lw):
    """Merge-by-key + systematic slot resampling on transposed planes
    (fused hash-table program — the K < `_MERGE_STAGED_MIN_K` path)."""
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = _content_hash(cols, bits=4)  # machine symbols are < 16
    parent, new_lw, n_unique = _merge_resample(key, h, lw)
    pp = _gather_plane_columns(pp, parent)
    dd = _gather_plane_columns(dd, parent)
    return pp, dd, new_lw - jnp.max(new_lw), n_unique


def _blocked_merge_staged(key, pp, dd, lw):
    """Host-staged position-space merge (K ≥ `_MERGE_STAGED_MIN_K`).

    Each op is its own cached jit; dispatches queue asynchronously so
    the chain pays one sync, and — the load-bearing property — XLA
    never fuses the random-access ops with their producers (measured
    2.6x the fused program's speed at K=1e7, 2848 → 1080 ms;
    `probes/merge_positions.py`)."""
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = _hash4_j(cols)
    parent, new_lw, n_unique = _merge_resample_positions(key, h, lw)
    pp, dd = _gather_pair_j(pp, dd, parent)
    return pp, dd, _sub_max_j(new_lw), n_unique


def _blocked_merge(key, pp, dd, lw):
    """Merge-by-key + systematic slot resampling on transposed planes;
    implementation picked by member count (see `_MERGE_STAGED_MIN_K`)."""
    if lw.shape[0] >= _MERGE_STAGED_MIN_K:
        return _blocked_merge_staged(key, pp, dd, lw)
    return _blocked_merge_fused(key, pp, dd, lw)


@partial(jax.jit, static_argnames=("stride",))
def _to_planes_t(tape, *, stride):
    """[K, L] int tape -> transposed planes ([E, K] int8 x stride) via
    ONE dense 3-D transpose (plane c = columns c::stride =
    reshape[K, E, stride] slice) — per-plane strided slices + tiny
    transposes lowered pathologically on this backend."""
    K, L = tape.shape
    t3 = tape.astype(jnp.int8).reshape(K, L // stride, stride)
    t3 = jnp.transpose(t3, (2, 1, 0))  # [stride, E, K]
    return tuple(t3[c] for c in range(stride))


@jax.jit
def _from_planes_t(planes):
    t3 = jnp.stack(planes, axis=0)  # [stride, E, K]
    K = t3.shape[2]
    return jnp.transpose(t3, (2, 1, 0)).reshape(K, -1)


def _validate_blocked_plan(dm: DeviceMachine, L: int, plan: tuple,
                           tau: float) -> None:
    """Shared gate for the blocked frontier and its sharded twin:
    lattice geometry (disjoint read/write windows), plane-stride bound,
    hash field width, and tau range. A stride ≤ 2·span would silently
    corrupt the dynamics (overlapping windows at adjacent sites), so
    every entry point must pass through here."""
    _, _, events = plan
    if L % events:
        raise ValueError(f"events_per_round={events} must divide L={L}")
    stride = L // events
    if stride <= 2 * dm.span:
        raise ValueError(
            f"stride {stride} too small for window span {dm.span}; "
            "lower events_per_round"
        )
    if stride > _MAX_PLANE_STRIDE:
        raise ValueError(
            f"stride {stride} exceeds _MAX_PLANE_STRIDE="
            f"{_MAX_PLANE_STRIDE}; raise events_per_round"
        )
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau={tau} must be in (0, 1]")
    if dm.size_a > 16:
        # The merge key packs symbols into 4-bit fields (values 0-15,
        # `_blocked_merge`); wider alphabets would alias distinct
        # configurations and silently conflate them at the merge.
        raise ValueError(
            f"size_a={dm.size_a} exceeds the blocked frontier's 4-bit "
            "merge-key fields (max 16 symbols); use the per-step "
            "run_weighted_frontier"
        )


def run_weighted_frontier_blocked(key, tapes, logw, dm: DeviceMachine,
                                  plan: tuple, *, tau: float = 1.0,
                                  bitslice: bool | None = None):
    """Blocked weighted frontier: stratified multi-site rounds between
    re-ranks, with merge-by-key and weight-proportional slot resampling.

    The per-step frontier (:func:`run_weighted_frontier`) pays one
    global top-k sort plus a full parent gather per tape transition.
    This mode amortises all selection work over whole blocks of
    transitions, using the same stratified-lattice rounds as the
    2.4e9-transitions/s ensemble engine (`_apply_plane_round_fsm`):

    * Each **round** fires the rule at E well-separated lattice sites
      per member (disjoint read/write windows — dense plane access, no
      gathers). At every choose the member samples ONE branch from the
      tempered distribution q ∝ p^tau and multiplies its weight by the
      importance ratio p/q (``tau=1``: sample the true outcome law,
      weights untouched; ``tau→0``: near-uniform branch exploration,
      closest to the exact engine's branch-everything semantics). The
      weighted empirical measure Σ w·δ(tape) is unbiased for the
      multiverse distribution at every tau — the knob trades variance
      between head (tau=1) and tail (tau<1) of the branch tree.
    * Each **block** (``rounds`` rounds) ends with merge-by-key +
      systematic resampling (`_merge_resample`): duplicate
      configurations logsumexp-merge into one slot, and all K slots are
      re-dealt proportionally to merged weight (weight split over
      copies). Heavy configurations get more slots — i.e. more
      independent branch exploration — and configurations far below
      1/K weight are pruned. One sort + one tape gather per
      ``rounds × E`` transitions instead of per transition.

    Compared to the per-step beam the estimator is stochastic rather
    than exhaustive-per-site, but it is *unbiased* (the beam is not),
    and `tests/test_ensemble.py` checks both track the exact SPD.

    Args:
      key: PRNG key.
      tapes: (ptape [K, L] int, dtape [K, L] int) initial frontier.
      logw: [K] float64 log-weights.
      dm: compiled :class:`DeviceMachine` (the FSM form — since round
        3's adaptive packing this covers wide rules too: >63 write
        specs, >15-symbol alphabets, >2^15 states all compile, so
        "table-only" rules are rules whose WORLD ENUMERATION is
        infeasible, not a packing artifact).
      plan: static (num_blocks, rounds_per_block, events_per_round);
        events_per_round must divide L with L/events > 2·span.
      tau: static branch-sampling temperature in (0, 1].
      bitslice: None (auto — engage the bit-sliced round/sampling
        circuit when eligible and, on CPU backends, small enough to
        compile in CI time), True (force; raises if the machine is
        ineligible), False (keep the FSM walk). See `_blocked_rounds`.

    Returns:
      ((ptape, dtape), logw, n_unique [num_blocks]) — exp(logw) sums
      to 1; n_unique counts distinct configurations at each merge.
    """
    num_blocks, rounds, events = plan
    if not isinstance(dm, DeviceMachine):
        raise TypeError(
            "run_weighted_frontier_blocked needs a DeviceMachine "
            "(compile_decision_machine); table-only rules use "
            "run_weighted_frontier"
        )
    ptape, dtape = tapes
    K, L = ptape.shape
    _validate_blocked_plan(dm, L, plan, tau)
    stride = L // events
    in_dtype = ptape.dtype

    # Planes stored TRANSPOSED [E, K]: the frontier has few sites per
    # member (E = events, typically 2) but millions of members, so the
    # member axis must ride the 128-lane minor tile. The block loop runs
    # on the HOST over three small cached jits (rounds scan / merge /
    # layout) rather than one fused program: this backend's remote
    # compiler takes minutes on the fused scan-of-scans while the pieces
    # compile in seconds and run at full speed (dispatches are async, so
    # the ~10 host round-trips per call cost microseconds each).
    pp = _to_planes_t(jnp.asarray(ptape), stride=stride)
    dd = _to_planes_t(jnp.asarray(dtape), stride=stride)
    lw = jnp.asarray(logw, jnp.float64)

    # ONE device op derives every block's keys; the rows cross to the
    # host so the loop below issues no further RNG dispatches (each
    # host-side op is a full remote round-trip on the TPU tunnel —
    # measured ~250 ms each, which dominated the first cut of this
    # loop at 530 ms/block against ~1 ms of actual kernel time).
    block_keys = np.asarray(jax.random.split(key, 2 * num_blocks))

    n_unique = []
    for b in range(num_blocks):
        pp, dd, lw = _blocked_rounds(
            block_keys[2 * b], pp, dd, lw, dm, rounds=rounds, tau=tau,
            bitslice=bitslice)
        pp, dd, lw, nu = _blocked_merge(block_keys[2 * b + 1], pp, dd, lw)
        n_unique.append(nu)

    ptape = _from_planes_t(pp).astype(in_dtype)
    dtape = _from_planes_t(dd).astype(in_dtype)
    lw = lw - jax.scipy.special.logsumexp(lw)
    return (ptape, dtape), lw, jnp.stack(n_unique)


@jax.jit
def _blocked_merge_flagged(key, pp, dd, lw, flag):
    """`_blocked_merge` with a per-member path FLAG folded into the
    merge key. Hit status is a PATH functional, not a state functional:
    merging an already-hit member into an unhit one (or vice versa)
    would corrupt any estimator built on the flag, so members merge
    only when tape content AND flag agree — the weighted-ensemble
    clone/prune rule."""
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)] + \
           [flag.astype(jnp.int8)]
    h = _content_hash(cols, bits=4)
    parent, new_lw, n_unique = _merge_resample(key, h, lw)
    pp = _gather_plane_columns(pp, parent)
    dd = _gather_plane_columns(dd, parent)
    return pp, dd, new_lw - jnp.max(new_lw), flag[parent], n_unique


def _blocked_merge_equal(key, pp, dd, lw):
    """Content-merge + systematic resample with EQUAL slot weights
    (total/K each) on an absolute log scale — the textbook SMC
    resampling step, for the absorbing first-passage estimator.

    `_merge_resample`'s w/m slot weights implement the frontier's
    deliberate beam pruning: configurations that draw zero slots LOSE
    their weight, so the resampled measure is biased toward heavy
    configurations (documented top-k semantics). That is correct for
    the beam engine but wrong for an unbiased flux estimator — and the
    self-normalized ratio flux/(flux+live) is itself biased once the
    total-weight distribution goes heavy-tailed (measured: E[Σw] = 1
    but sample totals 0.02–1.8 after 128 tempered rounds, so the ratio
    overweights low-total realizations and overestimates flux ~2x).
    Equal-weight resampling preserves the TOTAL live weight exactly
    (Σ new = Σ old, E[new measure] = old measure), which makes the
    ABSOLUTE flux accumulator an unbiased martingale estimator of
    P(hit) and resets the live ESS to K. Slots with lw = -inf
    (absorbed members) carry zero weight and recycle."""
    E = pp[0].shape[0]
    cols = [pl[e] for pl in pp for e in range(E)] + \
           [pl[e] for pl in dd for e in range(E)]
    h = _content_hash(cols, bits=4)
    parent, _, n_unique = _merge_resample(key, h, lw)
    K = lw.shape[0]
    new_lw = jnp.full(
        (K,), jax.scipy.special.logsumexp(lw) - jnp.log(K), lw.dtype)
    pp = _gather_plane_columns(pp, parent)
    dd = _gather_plane_columns(dd, parent)
    return pp, dd, new_lw, n_unique


def _blocked_rounds_ess_adaptive(key, pp, dd, lw, flux_lw, dm, pattern,
                                 *, rounds: int, tau: float,
                                 data_tape: bool, check_every: int,
                                 ess_frac: float):
    """One block of rounds with ABSORBING hits and ESS-TRIGGERED
    intra-block resampling (round-5: act on the collapsed-ESS
    diagnostic instead of just reporting it).

    Two failure modes compound over long tempered horizons: (a) at
    tau < 1 every choose accumulates an importance increment, so the
    weight variance grows exponentially with the event count and the
    self-normalized estimator degenerates when resampling only happens
    at block boundaries (measured ESS → ~1 over 512 rounds); (b) plain
    weight-proportional resampling PRUNES the hit lineages themselves —
    on branch-suppressed targets the hit paths carry small weights
    (q > p along the path), so the flux estimate stays biased low even
    with ESS held high (measured 2–10x low). Fix for (b): hits ABSORB —
    each sub-block, members whose tape contains the pattern move their
    weight into a scalar log-flux accumulator and drop to lw = -inf
    (their slot recycles at the next resample), so recorded flux can
    never be resampled away; this is `weighted_first_passage_binned`'s
    absorb boundary, device-resident. Fix for (a): after each
    ``check_every``-round sub-block the live-weight ESS 1/Σŵ² is
    computed on device and, when it falls below ``ess_frac * K``, the
    TOTAL-preserving equal-weight merge/systematic-resample
    (`_blocked_merge_equal` — textbook SMC, not the beam's pruning
    resample) fires immediately via `lax.cond`. The whole loop is ONE
    `lax.scan` (single device dispatch per block, the tunnelled-backend
    rule of `_blocked_rounds`). All weights stay on one ABSOLUTE log
    scale with initial total 1, so P(hit by t) = exp(flux_lw) is the
    unbiased martingale estimator (exact-oracle-gated at tau=0.5:
    `tests/test_ensemble.py::test_tempered_first_passage_ess_adaptive`).

    Returns ``(pp, dd, lw, flux_lw, n_merges)``.
    """
    if rounds % check_every:
        raise ValueError(
            f"rounds={rounds} not divisible by check_every={check_every}")
    K = lw.shape[0]

    def sub(carry, k):
        pp, dd, lw, flux_lw, n_merges = carry
        k1, k2 = jax.random.split(k)
        pp, dd, lw = _blocked_rounds(k1, pp, dd, lw, dm,
                                     rounds=check_every, tau=tau)
        tape_now = _from_planes_t(dd if data_tape else pp)
        hit = contains_pattern(tape_now, pattern)
        hit_lse = jax.scipy.special.logsumexp(
            jnp.where(hit, lw, -jnp.inf))
        flux_lw = jnp.logaddexp(flux_lw, hit_lse)
        lw = jnp.where(hit, -jnp.inf, lw)
        den = jax.scipy.special.logsumexp(lw)
        ess = jnp.exp(2.0 * den - jax.scipy.special.logsumexp(2.0 * lw))
        trigger = (ess < ess_frac * K) & jnp.isfinite(den)

        def do_merge(op):
            k2, pp, dd, lw = op
            pp, dd, lw, _ = _blocked_merge_equal(k2, pp, dd, lw)
            return pp, dd, lw

        def skip(op):
            _, pp, dd, lw = op
            return pp, dd, lw

        pp, dd, lw = jax.lax.cond(
            trigger, do_merge, skip, (k2, pp, dd, lw))
        return (pp, dd, lw, flux_lw,
                n_merges + trigger.astype(jnp.int32)), None

    (pp, dd, lw, flux_lw, n_merges), _ = jax.lax.scan(
        sub, (pp, dd, lw, flux_lw, jnp.int32(0)),
        jax.random.split(key, rounds // check_every))
    return pp, dd, lw, flux_lw, n_merges


def weighted_first_passage(key, tapes, logw, dm: DeviceMachine, pattern,
                           plan: tuple, *, tau: float = 1.0,
                           data_tape: bool = True,
                           ess_frac: float = 0.0,
                           check_every: int = 0):
    """Weighted-ensemble first-passage estimation on the blocked
    frontier: survival probabilities S(t_b) = P(pattern has not yet
    appeared) at every block boundary, with importance weights.

    This is the Weighted Ensemble scheme on this engine's machinery:
    dynamics are the stratified sampled-branching rounds of
    :func:`run_weighted_frontier_blocked` (at ``tau`` < 1 the chooses
    are sampled from the tempered law q ∝ p^tau with exact importance
    reweighting — rare BRANCH decisions get explored more often while
    the estimator stays unbiased), and the per-block merge/systematic
    resample is the weight-preserving clone/prune step. The hit flag
    rides the merge key (`_blocked_merge_flagged`), so members merge
    only within equal hit status — required because hit status is a
    path property.

    Detection resolution is one BLOCK (hits that appear and vanish
    within a block are missed; shrink ``rounds_per_block`` where that
    matters — `first_passage_times` checks every round at tau=1).

    **Long-horizon tempering needs ``ess_frac``.** Tempering reweights
    EVERY choose, so the importance-weight variance grows exponentially
    with the event count and the self-normalized survival estimator
    degenerates when merges only happen at block boundaries (measured
    on ex2, K=4096, ~500 events/member: tau=1 estimates P(hit)=4.2e-3
    at 12% relative spread across seeds, while tau=0.7 and 0.5 with
    block-cadence-only merging return 10–20x low with ~100% spread —
    the classic collapsed-ESS signature). Passing ``ess_frac > 0``
    (with a sub-block size ``check_every`` dividing ``rounds``)
    activates ESS-TRIGGERED intra-block resampling
    (`_blocked_rounds_ess_adaptive`): whenever the device-side ESS
    falls below ``ess_frac * K``, the weight-preserving
    merge/systematic-resample fires mid-block, keeping the walker
    population equalized before the weights collapse — the standard
    weighted-ensemble resampling control, here as a `lax.cond` inside
    the block scan so the dispatch count per block is unchanged.
    Turned-green gate:
    `tests/test_ensemble.py::test_tempered_first_passage_ess_adaptive`.
    The ``ess`` diagnostic returned per block still makes any residual
    collapse visible.

    Returns ``(survival [num_blocks], ess [num_blocks],
    t_blocks [num_blocks], (ptape, dtape), logw, hit,
    n_unique [num_blocks])`` — ``n_unique`` is the per-block count of
    distinct (tape, hit-flag) members after the merge, the
    frontier-collapse diagnostic complementing ``ess`` (same as
    :func:`run_weighted_frontier_blocked`'s). With ``ess_frac > 0``,
    hits ABSORB (weight frozen into a flux accumulator at detection,
    `_blocked_rounds_ess_adaptive`): ``hit`` then marks absorbed
    slots (lw = -inf; their tape content has kept evolving and is not
    the hit configuration), and ``ess``/``n_unique`` describe the live
    population only.
    """
    num_blocks, rounds, events = plan
    ptape, dtape = tapes
    K, L = ptape.shape
    _validate_blocked_plan(dm, L, plan, tau)
    stride = L // events
    in_dtype = ptape.dtype

    pp = _to_planes_t(jnp.asarray(ptape), stride=stride)
    dd = _to_planes_t(jnp.asarray(dtape), stride=stride)
    lw = jnp.asarray(logw, jnp.float64)
    hit = contains_pattern(
        jnp.asarray(dtape if data_tape else ptape), pattern)

    @jax.jit
    def survival_and_ess(lw, hit):
        num = jax.scipy.special.logsumexp(jnp.where(hit, -jnp.inf, lw))
        den = jax.scipy.special.logsumexp(lw)
        # Effective sample size 1/Σ ŵ² of the normalized weights — the
        # importance-sampling degeneracy diagnostic.
        ess = jnp.exp(2.0 * den
                      - jax.scipy.special.logsumexp(2.0 * lw))
        return jnp.exp(num - den), ess

    if ess_frac > 0.0 and not check_every:
        raise ValueError("ess_frac > 0 needs check_every > 0")

    block_keys = np.asarray(jax.random.split(key, 2 * num_blocks))
    surv, esses, n_unique = [], [], []
    if ess_frac > 0.0:
        # Absorbing mode: normalize to total weight 1 (the absolute
        # flux estimator's reference scale), then initial hits move
        # their weight to the flux accumulator immediately (same t=0
        # freeze as the binned harness) and `hit` marks ABSORBED slots
        # from here on.
        lw = lw - jax.scipy.special.logsumexp(lw)
        flux_lw = jax.scipy.special.logsumexp(
            jnp.where(hit, lw, -jnp.inf))
        lw = jnp.where(hit, -jnp.inf, lw)
        for b in range(num_blocks):
            pp, dd, lw, flux_lw, _ = _blocked_rounds_ess_adaptive(
                block_keys[2 * b], pp, dd, lw, flux_lw, dm, pattern,
                rounds=rounds, tau=tau, data_tape=data_tape,
                check_every=check_every, ess_frac=ess_frac)
            den = jax.scipy.special.logsumexp(lw)
            # ABSOLUTE flux estimator (initial Σw = 1): unbiased
            # martingale, unlike the self-normalized ratio (see
            # `_blocked_merge_equal`). Clipped: flux is a.s. ≤ total
            # in expectation but single realizations can overshoot 1.
            surv.append(jnp.maximum(1.0 - jnp.exp(flux_lw), 0.0))
            esses.append(jnp.exp(
                2.0 * den - jax.scipy.special.logsumexp(2.0 * lw)))
            if bool(jnp.isfinite(den)):  # all-absorbed: nothing to merge
                pp, dd, lw, nu = _blocked_merge_equal(
                    block_keys[2 * b + 1], pp, dd, lw)
            else:
                nu = jnp.int32(0)
            n_unique.append(nu)
        hit = ~jnp.isfinite(lw)
    else:
        for b in range(num_blocks):
            pp, dd, lw = _blocked_rounds(
                block_keys[2 * b], pp, dd, lw, dm, rounds=rounds,
                tau=tau)
            tape_now = _from_planes_t(dd if data_tape else pp)
            hit = hit | contains_pattern(tape_now, pattern)
            s, e = survival_and_ess(lw, hit)
            surv.append(s)
            esses.append(e)
            pp, dd, lw, hit, nu = _blocked_merge_flagged(
                block_keys[2 * b + 1], pp, dd, lw, hit)
            n_unique.append(nu)

    dt_round = -math.log1p(-events / L)
    t_blocks = dt_round * rounds * np.arange(1, num_blocks + 1)
    ptape = _from_planes_t(pp).astype(in_dtype)
    dtape = _from_planes_t(dd).astype(in_dtype)
    den = jax.scipy.special.logsumexp(lw)
    lw = jnp.where(jnp.isfinite(den), lw - den, lw)  # all-absorbed: keep
    return (jnp.stack(surv), jnp.stack(esses), t_blocks,
            (ptape, dtape), lw, hit, jnp.stack(n_unique))


def pattern_progress(tape, pattern):
    """[B] longest matched PREFIX of ``pattern`` anywhere on each ring
    (cyclic) — the default progress coordinate for
    :func:`weighted_first_passage_binned`: value ``len(pattern)``
    means the full pattern is present (`contains_pattern` true)."""
    tape = jnp.asarray(tape)
    pattern = tuple(int(s) for s in pattern)
    ok = jnp.ones(tape.shape, bool)
    best = jnp.zeros(tape.shape[0], jnp.int32)
    for j, s in enumerate(pattern):
        ok = ok & (jnp.roll(tape, -j, axis=-1) == s)
        best = jnp.maximum(
            best, jnp.where(ok.any(axis=-1), jnp.int32(j + 1), 0))
    return best


def weighted_first_passage_binned(key, tapes, logw, dm: DeviceMachine,
                                  pattern, plan: tuple, *,
                                  tau: float = 1.0,
                                  data_tape: bool = True,
                                  q_fn=None, q_target: int | None = None,
                                  split: bool = True, seed: int = 0,
                                  rounds_fn=None):
    """Weighted-ensemble SPLITTING on a progress coordinate for
    STATE-rare first-passage targets on decision-machine rules.

    :func:`weighted_first_passage` enriches branch-rare events (tau
    tempering) but gives state-rare ones — a motif that needs many
    individually-likely events to assemble — no mechanism beyond
    merge dedup. This is the classic WE splitting scheme
    (Huber & Kim 1996) that `soup_we.we_emergence` provides for the
    BFF engine, ported to the blocked DM frontier: after each block,
    live walkers are binned by a progress coordinate (default:
    :func:`pattern_progress`, the longest matched prefix of
    ``pattern``), each occupied bin is systematically resampled to its
    slot allocation with the bin's total weight preserved (extra slots
    to the leading edge), and walkers that reach ``q_target``
    contribute their weight to the first-passage flux and are frozen
    out (survival mode, directly comparable to brute force).
    ``split=False`` disables the resampling — plain Monte Carlo in the
    same harness, the unbiasedness reference
    (`tests/test_ensemble.py::test_we_binned_first_passage_unbiased`).

    The block dynamics are the same jitted stratified rounds as
    :func:`weighted_first_passage` (host loop over cached device
    blocks — the WE control flow is host-side numpy like `soup_we`,
    one [K] transfer per block). tau < 1 composes: the tempered branch
    weights multiply into the walker weights before binning.

    ``rounds_fn`` swaps the block dynamics for a drop-in replacement
    with the `_blocked_rounds` calling convention ``fn(key, pp, dd,
    lw) -> (pp, dd, lw)`` — the multi-chip hook: pass
    `parallel.sharding.make_sharded_blocked_rounds(dm, mesh, rounds,
    tau=tau)` to advance the walker axis island-sharded over a device
    mesh while this harness's WE control stays host-global (gated
    bit-identically vs a per-island host loop,
    `tests/test_sharding.py::test_we_binned_on_sharded_rounds`).

    Returns ``(survival [num_blocks], t_blocks, occupancy [num_blocks],
    q_max [num_blocks])``.
    """
    from .soup_we import _systematic

    num_blocks, rounds, events = plan
    ptape, dtape = tapes
    K, L = ptape.shape
    _validate_blocked_plan(dm, L, plan, tau)
    stride = L // events
    if q_fn is None:
        q_fn = lambda t: pattern_progress(t, pattern)  # noqa: E731
        q_tgt = len(tuple(pattern))
    else:
        if q_target is None:
            raise ValueError("custom q_fn needs an explicit q_target")
        q_tgt = q_target
    rng = np.random.default_rng(seed)

    pp = _to_planes_t(jnp.asarray(ptape), stride=stride)
    dd = _to_planes_t(jnp.asarray(dtape), stride=stride)
    w = np.exp(np.asarray(logw, np.float64))
    live = np.ones(K, bool)
    block_keys = np.asarray(jax.random.split(key, num_blocks))

    dt_round = -math.log1p(-events / L)
    survival = np.zeros(num_blocks)
    occupancy = np.zeros(num_blocks, np.int64)
    q_best = np.zeros(num_blocks, np.int64)
    cum_flux = 0.0

    # Walkers born at the target absorb at t=0 (frozen out, their
    # weight in the flux immediately) — same boundary convention as
    # `soup_we.we_emergence`'s absorb; without the freeze they would
    # re-hit in block 0 and double-count.
    q = np.asarray(q_fn(jnp.asarray(dtape if data_tape else ptape)))
    born = live & (q >= q_tgt)
    cum_flux += w[born].sum()
    w[born] = 0.0
    live[born] = False

    for b in range(num_blocks):
        lw_dev = jnp.asarray(np.log(np.maximum(w, 1e-300)))
        if rounds_fn is None:
            pp, dd, lw_dev = _blocked_rounds(
                block_keys[b], pp, dd, lw_dev, dm, rounds=rounds,
                tau=tau)
        else:
            pp, dd, lw_dev = rounds_fn(jnp.asarray(block_keys[b]),
                                       pp, dd, lw_dev)
        if tau != 1.0:
            w = np.where(live, np.exp(np.asarray(lw_dev)), 0.0)
        tape_now = _from_planes_t(dd if data_tape else pp)
        q = np.asarray(q_fn(tape_now))
        q_best[b] = int(q[live].max()) if live.any() else 0
        hit = live & (q >= q_tgt)
        cum_flux += w[hit].sum()
        w[hit] = 0.0
        live[hit] = False
        survival[b] = 1.0 - cum_flux
        if split and live.any():
            qb = np.minimum(q, q_tgt - 1)
            vals = np.unique(qb[live])
            n_occ = len(vals)
            base = K // n_occ
            extra = K - base * n_occ
            parent = np.zeros(K, np.int64)
            new_w = np.zeros(K)
            pos = 0
            for vi, v in enumerate(vals):
                n_v = base + (1 if vi >= n_occ - extra else 0)
                sel = np.flatnonzero(live & (qb == v))
                src, sw = _systematic(sel, w[sel], n_v, rng)
                parent[pos:pos + n_v] = src
                new_w[pos:pos + n_v] = sw
                pos += n_v
            assert pos == K
            # Same [E, K]-planes parent-gather shape as the blocked
            # merge: the per-plane minor-axis gather pl[:, pidx] was
            # measured ~3 s-class at large K on this backend — reuse
            # the packed row gather (round-4 advisor).
            pidx = jnp.asarray(parent, jnp.int32)
            pp, dd = _gather_planes_pair(pp, dd, pidx)
            w = new_w
            live = w > 0.0
            occupancy[b] = n_occ
        else:
            occupancy[b] = (len(np.unique(
                np.minimum(q, q_tgt - 1)[live])) if live.any() else 0)
        if not live.any():
            survival[b + 1:] = survival[b]
            break
    t_blocks = dt_round * rounds * np.arange(1, num_blocks + 1)
    return survival, t_blocks, occupancy, q_best


def weighted_window_counts(tape, weights, size_a: int, cl_k: int):
    """Weighted empirical SPD from a frontier: Σ_b w_b · counts_b / L."""
    tape = jnp.asarray(tape)
    B, L = tape.shape
    rank = jnp.zeros((B, L), jnp.int32)
    for j in range(cl_k):
        rank = rank * size_a + jnp.roll(tape, -j, axis=1)
    per = jax.vmap(
        lambda r: jnp.zeros(size_a**cl_k, jnp.float64).at[r].add(1.0)
    )(rank)
    w = jnp.asarray(weights)
    w = w / w.sum()
    return (per * w[:, None]).sum(axis=0) / L


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
                          batch: int, length: int, *, ring: bool = True):
    """Draws tape rings whose window statistics follow an SPD: symbols
    are generated by the SPD's order-(cl_k-1) Markov chain (conditional
    next-symbol probabilities, `markov.mpp_from_spd`).

    With ``ring=True`` (the default) the chain is sampled as a circular
    Markov BRIDGE: each step's distribution is reweighted by the
    transfer-matrix bridge factor ``T^(r-1)[next_ctx, ctx0]`` (r symbols
    remaining), so the sequence provably closes its own starting context
    and every window — including the ``cl_k-1`` windows crossing the
    seam — reads Markov-consistent statistics. A plain linear chain laid
    on a ring (``ring=False``, the pre-bridge behaviour) has a junction
    discontinuity whose spurious windows dominate RARE window
    probabilities: measured on the ex2 p0 (p_pair=1/250), the seam
    inflated p(DUD) estimates by ~1e-4 absolute — order 50% of the
    early-time signal (`examples/ex2_ensemble_crosscheck.py`). The
    bridge's residual bias (π- vs trace-weighting of the start context)
    decays with the chain's spectral gap to the power ``length`` —
    negligible at any practical tape length.
    """
    from ..markov import mpp_from_spd

    n_ctx = size_a ** (cl_k - 1)
    mpp_np = np.asarray(
        mpp_from_spd(np.asarray(spd).reshape([size_a] * cl_k)),
        dtype=np.float64,
    ).reshape(n_ctx, size_a)
    marg_np = np.asarray(spd, dtype=np.float64).reshape(
        n_ctx, size_a).sum(axis=1)
    mpp = jnp.asarray(mpp_np)
    k0, k1 = jax.random.split(jnp.asarray(key))

    if ring:
        # The bridge factor T^r[c, ctx0] is only ever read at the batch's
        # sampled start contexts, so instead of materialising every power
        # of the [n_ctx, n_ctx] context transition matrix (quadratic in
        # n_ctx — ~44 GB at size_a=10, cl_k=5), recurse its COLUMNS for
        # the unique starts: V_r[c, j] = T^r[c, u_j] via the row-sparse
        # step V_r[c] = Σ_s mpp[c, s]·V_{r-1}[nctx[c, s]] (T has size_a
        # nonzeros per row, so no dense T is built either). Columns of
        # an ergodic chain flatten to a c-independent constant at the
        # mixing time; a flat bridge cancels in the per-step
        # normalisation, so storage stops there: [R, n_ctx, n_unique]
        # with R ≤ min(length, mixing time).
        nctx_np = (np.arange(n_ctx)[:, None] * size_a
                   + np.arange(size_a)[None, :]) % n_ctx
        ctx0 = jax.random.choice(
            k0, n_ctx, (batch,), p=jnp.asarray(marg_np / marg_np.sum())
        )
        u_starts, inv = np.unique(np.asarray(ctx0), return_inverse=True)
        n_u = len(u_starts)
        v = np.zeros((n_ctx, n_u))
        v[u_starts, np.arange(n_u)] = 1.0
        cols = []  # cols[r][c, j] = T^r[c, u_j]
        flat_tol = 1e-13
        for _ in range(length):
            cols.append(v)
            v = np.einsum("cs,csj->cj", mpp_np, v[nctx_np])
            vmax = v.max(axis=0)
            if np.all(vmax - v.min(axis=0) <= flat_tol * vmax):
                break  # columns mixed: flat bridge from here on
        n_kept = len(cols)
        if n_kept == length:
            # Never mixed within the horizon: verify every sampled start
            # can close its cycle (feas_j = T^length[u_j, u_j] > 0); a
            # periodic/reducible corner falls back to the linear chain,
            # matching the dense-powers formulation's diag gate.
            feas = np.array([
                float(mpp_np[u] @ cols[-1][nctx_np[u], j])
                for j, u in enumerate(u_starts)])
            if np.any(feas <= 0):
                return sample_tapes_from_spd(key, spd, size_a, cl_k,
                                             batch, length, ring=False)
        V = jnp.asarray(np.stack(cols))  # [n_kept, n_ctx, n_u]
        nctx_t = jnp.asarray(nctx_np)
        inv_t = jnp.asarray(inv)

        def gen(carry, inp):
            ctx, i = carry, inp
            k, r_left = i
            # P(s | ctx, close at ctx0) ∝ mpp[ctx, s] · T^(r-1)[nctx, ctx0]
            rr = r_left - 1
            bridge = V[jnp.minimum(rr, n_kept - 1)][
                nctx_t[ctx], inv_t[:, None]]
            bridge = jnp.where(rr >= n_kept, 1.0, bridge)
            probs = mpp[ctx] * bridge
            probs = probs / probs.sum(axis=1, keepdims=True)
            sym = jax.vmap(
                lambda p, kk: jax.random.choice(kk, size_a, p=p)
            )(probs, jax.random.split(k, batch))
            return nctx_t[ctx, sym], sym

        _, syms = jax.lax.scan(
            gen, ctx0,
            (jax.random.split(k1, length),
             jnp.arange(length, 0, -1)))
        return syms.T.astype(jnp.int32)  # [batch, length]

    ctx0 = jax.random.choice(
        k0, n_ctx, (batch,), p=jnp.asarray(marg_np / marg_np.sum())
    )

    def gen(carry, k):
        ctx = carry
        sym = jax.vmap(
            lambda c, kk: jax.random.choice(kk, size_a, p=mpp[c])
        )(ctx, jax.random.split(k, batch))
        ctx = (ctx * size_a + sym) % n_ctx
        return ctx, sym

    _, syms = jax.lax.scan(gen, ctx0, jax.random.split(k1, length))
    return syms.T.astype(jnp.int32)  # [batch, length]
