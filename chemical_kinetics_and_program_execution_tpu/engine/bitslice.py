"""Bit-sliced rounds: 32 tape sites per int32 lane for choose-free rules.

The ensemble's FSM walk is VPU-op-bound (probes/round_decompose.py:
~0.06 ms per DAG level on a [16384, 256] site plane, far from the HBM
roofline). For a CHOOSE-FREE rule the per-site round is a pure boolean
function of the window's cell bits — no uniforms, no sampling — so it
can be evaluated as a bit-sliced boolean circuit: pack 32 sites' k-th
symbol bit into one int32 word and evaluate the circuit once per word,
amortising every VPU op over 32 sites.

Host side, the decision DAG (`ensemble._level_plan`) is replayed over
every window content to produce the exact truth table
window bits -> new window bits (write decode folded in), which is then
synthesised into a hash-consed mux-tree boolean DAG (a BDD in circuit
form, split in rule read order so the FSM's prefix sharing collapses
the tree). Device side the circuit runs on `[n_bits, B//32, E]` uint32
bit planes per stride phase — the same stacked-plane geometry as
`ensemble._apply_plane_round_fsm_stacked`, with the site axis last so
spill rolls stay whole-array rolls.

Bit-exactness: a choose-free machine consumes no uniforms, so the
bit-sliced ensemble path reproduces the plane-FSM path's tapes BIT FOR
BIT at the same PRNG key (`tests/test_ensemble.py::
test_bitsliced_ensemble_matches_fsm`). Rules with `choose` nodes keep
the FSM walk (they need the renormalised uniform cascade).

Reference parity: this accelerates the same object as the reference's
per-site rule firing (`tape_multiverse.scm:348-360` time semantics);
the formulation (bit-slicing over VPU lanes) is TPU-native.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# --------------------------------------------------------------------------
# Circuit IR: hash-consed boolean DAG over input bit variables.
# --------------------------------------------------------------------------

_CONST0 = ("const", 0, 0)
_CONST1 = ("const", 1, 0)


class _Builder:
    """Hash-consing gate builder with constant folding."""

    def __init__(self, n_in: int):
        self.ops: list[tuple] = []
        self._cache: dict[tuple, int] = {}
        self.c0 = self._emit(_CONST0)
        self.c1 = self._emit(_CONST1)
        self.inputs = [self._emit(("in", i, 0)) for i in range(n_in)]

    def _emit(self, op: tuple) -> int:
        got = self._cache.get(op)
        if got is not None:
            return got
        self.ops.append(op)
        idx = len(self.ops) - 1
        self._cache[op] = idx
        return idx

    def gate(self, kind: str, a: int, b: int = 0) -> int:
        if kind == "not":
            if a == self.c0:
                return self.c1
            if a == self.c1:
                return self.c0
            if self.ops[a][0] == "not":
                return self.ops[a][1]
            return self._emit(("not", a, 0))
        if a > b:
            a, b = b, a
        if a == b:
            return a if kind != "xor" else self.c0
        if kind == "and":
            if a == self.c0:
                return self.c0
            if a == self.c1:
                return b
        elif kind == "or":
            if a == self.c0:
                return b
            if a == self.c1:
                return self.c1
        elif kind == "xor":
            if a == self.c0:
                return b
            if a == self.c1:
                return self.gate("not", b)
        return self._emit((kind, a, b))

    def mux(self, s: int, hi: int, lo: int) -> int:
        """s ? hi : lo  (3 gates worst case)."""
        if hi == lo:
            return hi
        if s == self.c1:
            return hi
        if s == self.c0:
            return lo
        if hi == self.c1 and lo == self.c0:
            return s
        if hi == self.c0 and lo == self.c1:
            return self.gate("not", s)
        return self.gate("xor", lo, self.gate("and", s,
                                              self.gate("xor", hi, lo)))


def _dce_compact(ops, outputs, n_win):
    """Dead-code-eliminates the DAG and compacts random input planes.

    Drops every gate unreachable from ``outputs`` and renumbers random
    input variables (ids >= ``n_win``) to a dense range so callers draw
    ONLY the referenced planes. XLA's own DCE already skips dead gate
    *evaluations*, but it cannot shrink the single
    ``rng_bit_generator`` call that materialises the full
    ``n_choose_levels * rand_bits`` plane stack — and e.g. ex4's two
    50/50 chooses fold their comparators to one MSB each, leaving 26 of
    72 declared planes live. Since every random plane is an iid uniform
    bit-plane, re-binding which physical draw feeds which comparator
    preserves the sampled law exactly (the sampling path's parity gate
    is statistical, not bitwise). Window inputs (< n_win) keep their
    ids: `apply_round_bitsliced` binds them positionally.
    """
    reach: set = set()
    stack = list(outputs)
    while stack:
        i = stack.pop()
        if i in reach:
            continue
        reach.add(i)
        kind, a, b = ops[i]
        if kind in ("and", "or", "xor"):
            stack.append(a)
            stack.append(b)
        elif kind == "not":
            stack.append(a)
    used_rand = sorted({ops[i][1] for i in reach
                        if ops[i][0] == "in" and ops[i][1] >= n_win})
    rmap = {a: n_win + r for r, a in enumerate(used_rand)}
    new_ops: list = []
    idx: dict = {}
    for i, (kind, a, b) in enumerate(ops):
        if i not in reach:
            continue
        if kind == "in":
            op = ("in", rmap.get(a, a), 0)
        elif kind == "const":
            op = (kind, a, b)
        elif kind == "not":
            op = ("not", idx[a], 0)
        else:
            op = (kind, idx[a], idx[b])
        idx[i] = len(new_ops)
        new_ops.append(op)
    return (tuple(new_ops), tuple(idx[o] for o in outputs),
            len(used_rand))


def _synth_bit(builder: _Builder, table: np.ndarray, memo: dict) -> int:
    """Synthesises one output bit's truth table into the circuit.

    ``table`` has length 2^k; its index LSB is the NEXT variable to
    split on (variable n_in - k), so recursion order = variable 0
    first — variable 0 is the first-read cell's low bit, which mirrors
    the decision DAG's prefix sharing and keeps the BDD small. A
    length-2^k subtable always covers the same trailing variable set,
    so memoising on raw bytes is sound.
    """
    key = table.tobytes()
    got = memo.get(key)
    if got is not None:
        return got
    if table.all():
        r = builder.c1
    elif not table.any():
        r = builder.c0
    else:
        n_in = len(builder.inputs)
        var = n_in - int(np.log2(len(table)))
        lo = _synth_bit(builder, np.ascontiguousarray(table[::2]), memo)
        hi = _synth_bit(builder, np.ascontiguousarray(table[1::2]), memo)
        r = builder.mux(builder.inputs[var], hi, lo)
    memo[key] = r
    return r


def _synth_over(builder: _Builder, table: np.ndarray, sel_nodes,
                memo: dict) -> int:
    """Synthesises a truth table over an explicit selector-node list.

    ``table`` has length 2^len(sel_nodes); index bit d (LSB first) is
    sel_nodes[d]. Unlike :func:`_synth_bit` the selectors may be ANY
    circuit nodes (e.g. previously computed state bits), which is what
    the layered sampling synthesis needs. ``memo`` must be scoped to
    one (table-space, sel_nodes) family — key on (depth, bytes).
    """
    def rec(t, d):
        key = (d, t.tobytes())
        got = memo.get(key)
        if got is not None:
            return got
        if t.all():
            r = builder.c1
        elif not t.any():
            r = builder.c0
        else:
            lo = rec(np.ascontiguousarray(t[::2]), d + 1)
            hi = rec(np.ascontiguousarray(t[1::2]), d + 1)
            r = builder.mux(sel_nodes[d], hi, lo)
        memo[key] = r
        return r

    return rec(table, 0)


def _less_than_const(builder: _Builder, r_bits, threshold: int) -> int:
    """Circuit for (r < threshold), r given LSB-first, ~2 gates/bit."""
    nbits = len(r_bits)
    if threshold <= 0:
        return builder.c0
    if threshold >= (1 << nbits):
        return builder.c1
    lt = builder.c0
    eq = builder.c1
    for i in reversed(range(nbits)):
        t_i = (threshold >> i) & 1
        if t_i:
            lt = builder.gate("or", lt,
                              builder.gate("and", eq,
                                           builder.gate("not", r_bits[i])))
            eq = builder.gate("and", eq, r_bits[i])
        else:
            eq = builder.gate("and", eq,
                              builder.gate("not", r_bits[i]))
    return lt


# --------------------------------------------------------------------------
# Truth table of one round event from the compiled machine.
# --------------------------------------------------------------------------

_MAX_IN_BITS = 22  # 4M-row truth table (~seconds host-side, cached);
#                    beyond this fall back to the FSM walk


# Largest circuit the CPU backend may compile on AUTO paths (XLA:CPU's
# fusion duplication + per-fusion LLVM codegen makes multi-thousand-op
# circuits multi-minute compiles — measured on the 7.9k-op faithful
# BFF circuit, >9 min, and now reachable by WIDE sampling circuits too:
# fuzz-wide-specs compiles to ~7k ops). TPU compiles these whole in
# tens of seconds, so the limit is CPU-only; forcing bitslice=True
# overrides it.
CPU_MAX_CIRCUIT_OPS = 2000


def circuit_cpu_ok(dm) -> bool:
    """Auto-path gate: is this machine's circuit CI-compilable on the
    CPU backend? (Always true on accelerators.)"""
    if jax.default_backend() != "cpu":
        return True
    circ = (compile_round_circuit(dm) if machine_is_bitsliceable(dm)
            else compile_sampling_circuit(dm))
    return len(circ[0]) <= CPU_MAX_CIRCUIT_OPS


def machine_is_bitsliceable(dm) -> bool:
    """Choose-free and small enough to tabulate exhaustively."""
    from . import ensemble as ens

    if any(isinstance(n, ens._Choose) for n in dm.nodes):
        return False
    nb = max(1, (dm.size_a - 1).bit_length())
    return dm.n_cells * nb <= _MAX_IN_BITS


def _event_truth_tables(dm):
    """[n_cells * nb] boolean tables: new window bits over window bits.

    Replays the leveled FSM + write decode (the exact device math of
    `ensemble._machine_specs_planes_leveled` / `_machine_writes_planes`)
    over every input bit pattern. Patterns whose cell bits decode above
    size_a - 1 are clamped — they never occur on real tapes, and the
    clamp maximises subtable sharing.
    """
    from . import ensemble as ens

    nb = max(1, (dm.size_a - 1).bit_length())
    n_in = dm.n_cells * nb
    pats = np.arange(1 << n_in, dtype=np.int64)
    cellv = [np.minimum((pats >> (c * nb)) & ((1 << nb) - 1),
                        dm.size_a - 1)
             for c in range(dm.n_cells)]

    S = dm.num_specs
    state = np.full(pats.shape, S, np.int64)
    for lv in ens._level_plan(dm):
        assert not lv.chooses
        b = cellv[lv.cell_groups[0][0]]
        for cell, lo in lv.cell_groups[1:]:
            b = np.where(state >= S + lo, cellv[cell], b)
        idx = np.maximum(state - S, 0) * lv.max_deg + b
        fields = 31 // lv.bits
        words = np.asarray(lv.trans_words, np.int64)
        nxt = (words[idx // fields] >> (lv.bits * (idx % fields))) \
            & ((1 << lv.bits) - 1)
        state = np.where(state >= S, nxt, state)
    spec = state

    tables = []
    for c in range(dm.n_cells):
        wmask, wval = ens.wr_field_host(dm.wr_words[c], spec,
                                        dm.wr_bits)
        new_c = np.where(wmask, wval, cellv[c])
        for k in range(nb):
            tables.append(((new_c >> k) & 1).astype(bool))
    return tables, n_in, nb


@functools.lru_cache(maxsize=None)
def _compile_circuit(nodes, root, num_specs, size_a, bits, wr_words,
                     n_p, n_d, p_lo, d_lo, span, tag, wr_bits=5):
    """(ops, outputs, nb): the round circuit for a hashable machine key."""
    from . import ensemble as ens

    dm = ens.DeviceMachine(
        tag=tag, size_a=size_a, p_lo=p_lo, d_lo=d_lo, n_p=n_p, n_d=n_d,
        span=span, p_offs=jnp.arange(1), d_offs=jnp.arange(1),
        nodes=nodes, root=root, n_states=0, bits=bits,
        wr_words=wr_words, num_specs=num_specs, wr_bits=wr_bits)
    tables, n_in, nb = _event_truth_tables(dm)
    builder = _Builder(n_in)
    memo: dict = {}
    outputs = tuple(_synth_bit(builder, t, memo) for t in tables)
    ops, outputs, _ = _dce_compact(builder.ops, outputs, n_in)
    if config.IS_DEBUG:
        n_gates = sum(op[0] in ("and", "or", "xor", "not")
                      for op in ops)
        print(f"[bitslice] {tag}: {n_in} in-bits -> "
              f"{len(outputs)} out-bits, {n_gates} gates")
    return ops, outputs, nb, 0


def compile_round_circuit(dm):
    return _compile_circuit(dm.nodes, dm.root, dm.num_specs, dm.size_a,
                            dm.bits, dm.wr_words, dm.n_p, dm.n_d,
                            dm.p_lo, dm.d_lo, dm.span, dm.tag,
                            dm.wr_bits)


# --------------------------------------------------------------------------
# Sampling circuits: choose-ful machines at tau = 1.
# --------------------------------------------------------------------------

_RAND_BITS = 24  # branch-probability resolution 2^-24 ~ 6e-8, the same
#                  order as the FSM path's float32 uniform cascade

_MAX_SEL_BITS = 20  # per-level truth-table cap (2^20 rows host-side)


def _choose_dist_groups(chooses):
    """Consecutive same-distribution runs of a level's choose nodes.

    `ensemble._build_level_plan` sorts same-probs chooses contiguously,
    so one sampled branch word serves every node of a run (a member
    sits at exactly one node — sharing the branch bits changes nothing
    member-wise, the same argument as the FSM walk's grouped
    cascades). Returns ``[(probs, [local ids...]), ...]``.
    """
    groups: list = []
    for j, probs in chooses:
        if groups and groups[-1][0] == probs:
            groups[-1][1].append(j)
        else:
            groups.append((probs, [j]))
    return groups


def machine_is_sampleable(dm) -> bool:
    """Can the layered sampling circuit handle this machine (tau=1)?

    The whole-level tables need every per-level selector space (state
    bits + distinct read cells + branch bits PER DISTINCT DISTRIBUTION
    — wide rules carry hundreds of hash-consed choose continuations
    that share one distribution, round 3) to stay tabulable; levels
    past that fall back to the SPLIT synthesis (round 4 — one
    sub-table per cell/distribution group, see
    `_compile_sampling_circuit`), whose units only ever select over
    (state bits + one cell or one branch word). No choose-free
    requirement — that's the point.
    """
    from . import ensemble as ens

    nb = max(1, (dm.size_a - 1).bit_length())
    plan = ens._level_plan(dm)
    S = dm.num_specs
    sb = max(S - 1, *(S + lv.n_nodes - 1 for lv in plan)).bit_length()
    whole_ok = all(
        (sb + len(lv.cell_groups) * nb
         + sum(max(1, (len(p) - 1).bit_length())
               for p, _ in _choose_dist_groups(lv.chooses)))
        <= _MAX_SEL_BITS for lv in plan)
    if whole_ok:
        return sb + nb <= _MAX_SEL_BITS
    # Split path: sb widens to hold the intermediate OFF + next ids;
    # each unit selects over sb + max(nb, widest branch word).
    sizes = [lv.n_nodes for lv in plan] + [0]
    sb_split = max(S - 1, *(S + sizes[i] + sizes[i + 1] - 1
                            for i in range(len(plan)))).bit_length()
    w_max = max((max(1, (len(p) - 1).bit_length())
                 for lv in plan
                 for p, _ in _choose_dist_groups(lv.chooses)),
                default=1)
    return sb_split + max(nb, w_max) <= _MAX_SEL_BITS


@functools.lru_cache(maxsize=None)
def _compile_sampling_circuit(nodes, root, num_specs, size_a, bits,
                              wr_words, n_p, n_d, p_lo, d_lo, span, tag,
                              rand_bits, wr_bits=5, force_split=False):
    """Layered circuit for ONE event of a choose-ful machine at tau=1.

    Inputs: window cell bits (n_cells*nb) followed by ``rand_bits``
    fresh random bits PER CHOOSE LEVEL. Every choose node samples its
    branch by comparing the level's random word against the integer
    thresholds round(cumsum(p)·2^rand_bits) — exact to 2^-rand_bits,
    one independent uniform per decision depth (the FSM path instead
    renormalises one uniform through the cascade: same joint law,
    different stream, so parity is STATISTICAL, not bitwise —
    `tests/test_ensemble.py::test_sampling_circuit_branch_law`).

    The FSM state is carried as sb-bit circuit values between levels;
    each level is one truth table over (state bits, the level's
    distinct read-cell bits, its choose-branch bits), synthesised with
    the level's transition table; terminal values < num_specs pass
    through and finally index the per-cell write tables.

    Levels whose whole-table selector space exceeds ``_MAX_SEL_BITS``
    (many DISTINCT read cells at one depth — e.g. ex6-mini-bff-lite's
    level 2 reads 5 cells: 28 bits, a 268M-row table) switch the whole
    machine to the SPLIT synthesis (round 4): one sub-table per cell
    group / distribution group — each state reads exactly ONE cell, so
    the cross product the whole-level table enumerates is structurally
    unnecessary. Earlier units write next-level ids at offset
    ``OFF = S + n_this`` (so not-yet-processed this-level ids cannot
    collide with next-level ids); the LAST unit writes direct ``S +
    next`` ids and folds the OFF remap. Bit-identical to the unsplit
    circuit where both apply (same rand consumption, same tables —
    `tests/test_ensemble.py::test_sampling_circuit_split_matches_unsplit`).
    ``force_split=True`` forces the split path for that gate.

    Returns (ops, outputs, nb, n_rand_inputs).
    """
    from . import ensemble as ens

    dm = ens.DeviceMachine(
        tag=tag, size_a=size_a, p_lo=p_lo, d_lo=d_lo, n_p=n_p, n_d=n_d,
        span=span, p_offs=jnp.arange(1), d_offs=jnp.arange(1),
        nodes=nodes, root=root, n_states=0, bits=bits,
        wr_words=wr_words, num_specs=num_specs, wr_bits=wr_bits)
    plan = ens._level_plan(dm)
    nb = max(1, (size_a - 1).bit_length())
    n_cells = n_p + n_d
    S = num_specs
    sb = max(S - 1, *(S + lv.n_nodes - 1 for lv in plan)).bit_length()

    def _whole_level_sel_bits(lv):
        return (sb + len(lv.cell_groups) * nb
                + sum(max(1, (len(p) - 1).bit_length())
                      for p, _ in _choose_dist_groups(lv.chooses)))

    split_mode = force_split or any(
        _whole_level_sel_bits(lv) > _MAX_SEL_BITS for lv in plan)
    if split_mode:
        # sb must also hold the intermediate OFF + next ids.
        sizes = [lv.n_nodes for lv in plan] + [0]
        sb = max(S - 1, *(S + sizes[i] + sizes[i + 1] - 1
                          for i in range(len(plan)))).bit_length()

    n_choose_levels = sum(1 for lv in plan if lv.chooses)
    n_rand = n_choose_levels * rand_bits
    builder = _Builder(n_cells * nb + n_rand)
    win = builder.inputs[:n_cells * nb]
    rnd = builder.inputs[n_cells * nb:]

    def const_bits(v, width):
        return [builder.c1 if (v >> k) & 1 else builder.c0
                for k in range(width)]

    def unpack_vals(lv):
        fields = 31 // lv.bits
        words = np.asarray(lv.trans_words, np.int64)
        i = np.arange(lv.n_nodes * lv.max_deg)
        return (words[i // fields] >> (lv.bits * (i % fields))) \
            & ((1 << lv.bits) - 1)

    state_bits = const_bits(S, sb)  # root is local id 0
    rand_used = 0
    for lv in plan:
        vals = unpack_vals(lv)
        # Per-local-node read source: reveal locals [0, first-choose)
        # take cells from the ascending groups; chooses carry their
        # explicit local ids.
        choose_locals = {j for j, _ in lv.chooses}
        cell_of = {}
        for g, (cell, lo) in enumerate(lv.cell_groups):
            hi = (lv.cell_groups[g + 1][1] if g + 1 < len(lv.cell_groups)
                  else lv.n_nodes)
            for j in range(lo, hi):
                if j not in choose_locals:
                    cell_of[j] = cell

        # Branch bits per DISTINCT DISTRIBUTION from this level's
        # random word (same-probs choose nodes are contiguous by the
        # level sort and share thresholds, hence branch bits — a
        # member occupies exactly one node, so sharing is member-wise
        # identical; round 3, the wide-rule enabler).
        dist_groups = _choose_dist_groups(lv.chooses)
        branch_nodes = []
        branch_widths = []
        if lv.chooses:
            r_bits = rnd[rand_used * rand_bits:(rand_used + 1)
                         * rand_bits]
            rand_used += 1
            for probs, _locals in dist_groups:
                q, _ = _choose_dist(probs)
                cum = np.cumsum(q)
                ges = [builder.gate(
                    "not", _less_than_const(
                        builder, r_bits,
                        int(round(float(c) * (1 << rand_bits)))))
                    for c in cum[:-1]]
                w = max(1, (len(q) - 1).bit_length())
                bbits = []
                for k in range(w):
                    # index m = Σ ge_j with thermometer ge (monotone):
                    # bit k of m flips exactly when m crosses a
                    # multiple of 2^k, so it is the XOR of ge_j over
                    # j ≡ 0 (mod 2^k).
                    x = builder.c0
                    for j, ge in enumerate(ges, start=1):
                        if j % (1 << k) == 0:
                            x = builder.gate("xor", x, ge)
                    bbits.append(x)
                branch_nodes.append(bbits)
                branch_widths.append(w)

        if split_mode:
            # One sub-table per cell group / distribution group (see
            # the docstring). Units partition the level's local ids;
            # their tables pass states outside their range through.
            n_this = lv.n_nodes
            off = S + n_this
            first_choose = (min(choose_locals) if choose_locals
                            else lv.n_nodes)
            units = []
            for g, (cell, lo) in enumerate(lv.cell_groups):
                hi = (lv.cell_groups[g + 1][1]
                      if g + 1 < len(lv.cell_groups) else first_choose)
                if hi > lo:
                    units.append(("cell", cell, range(lo, hi), None))
            for (probs, locs), bbits, w in zip(dist_groups,
                                               branch_nodes,
                                               branch_widths):
                units.append(("dist", probs, locs, bbits))
            for u_i, (kind, a1, js, bbits) in enumerate(units):
                last = u_i == len(units) - 1
                if kind == "cell":
                    ext = win[a1 * nb:(a1 + 1) * nb]
                    clamp = size_a - 1
                else:
                    ext = bbits
                    clamp = len(a1) - 1
                sel = list(state_bits) + list(ext)
                if len(sel) > _MAX_SEL_BITS:
                    # Mirror the unsplit branch's guard: without it a
                    # machine whose state+one-extension width exceeds
                    # the cap would attempt a 2^len(sel) host table and
                    # die in an allocation instead of loudly
                    # (round-4 advisor).
                    raise ValueError(
                        f"{tag!r}: split-unit selector space "
                        f"{len(sel)} bits exceeds {_MAX_SEL_BITS}")
                idx = np.arange(1 << len(sel), dtype=np.int64)
                v = idx & ((1 << sb) - 1)
                bval = np.minimum((idx >> sb) & ((1 << len(ext)) - 1),
                                  clamp)
                nxt = v.copy()
                if last:
                    nxt = np.where(v >= off, v - n_this, nxt)
                for j in js:
                    row = vals[j * lv.max_deg + bval]
                    enc = np.where(row < S, row,
                                   row if last else row + n_this)
                    nxt = np.where(v == S + j, enc, nxt)
                memo: dict = {}
                state_bits = [
                    _synth_over(builder,
                                ((nxt >> k) & 1).astype(bool), sel,
                                memo)
                    for k in range(sb)]
            continue

        # Selector space: state bits, distinct cell bits, branch bits.
        sel = list(state_bits)
        for cell, _ in lv.cell_groups:
            sel += win[cell * nb:(cell + 1) * nb]
        for bbits in branch_nodes:
            sel += bbits
        n_sel = len(sel)
        if n_sel > _MAX_SEL_BITS:
            raise ValueError(
                f"{tag!r}: level selector space {n_sel} bits exceeds "
                f"{_MAX_SEL_BITS}")
        idx = np.arange(1 << n_sel, dtype=np.int64)
        pos = 0
        v = (idx >> pos) & ((1 << sb) - 1)
        pos += sb
        cellval = {}
        for cell, _ in lv.cell_groups:
            cellval[cell] = np.minimum((idx >> pos) & ((1 << nb) - 1),
                                       size_a - 1)
            pos += nb
        branchval = {}
        for (probs, locs), w in zip(dist_groups, branch_widths):
            bv = np.minimum((idx >> pos) & ((1 << w) - 1),
                            len(probs) - 1)
            for j in locs:
                branchval[j] = bv
            pos += w

        nxt = v.copy()
        for j in range(lv.n_nodes):
            b = (branchval[j] if j in choose_locals
                 else cellval[cell_of[j]])
            nxt = np.where(v == S + j, vals[j * lv.max_deg + b], nxt)
        memo: dict = {}
        state_bits = [
            _synth_over(builder, ((nxt >> k) & 1).astype(bool), sel,
                        memo)
            for k in range(sb)]

    # Write decode: spec = final state (< S by construction).
    outputs = []
    for c in range(n_cells):
        sel = list(state_bits) + list(win[c * nb:(c + 1) * nb])
        idx = np.arange(1 << (sb + nb), dtype=np.int64)
        v = np.minimum(idx & ((1 << sb) - 1), S - 1)
        cv = np.minimum((idx >> sb) & ((1 << nb) - 1), size_a - 1)
        wmask, wval = ens.wr_field_host(wr_words[c], v, wr_bits)
        new_c = np.where(wmask, wval, cv)
        memo = {}
        for k in range(nb):
            outputs.append(_synth_over(
                builder, ((new_c >> k) & 1).astype(bool), sel, memo))

    ops, outputs, n_rand_used = _dce_compact(
        builder.ops, tuple(outputs), n_cells * nb)
    if config.IS_DEBUG:
        n_gates = sum(op[0] in ("and", "or", "xor", "not")
                      for op in ops)
        print(f"[bitslice] {tag} (sampling): {n_cells * nb}+"
              f"{n_rand_used} in-bits (of {n_rand} declared) -> "
              f"{len(outputs)} out-bits, {n_gates} gates")
    return ops, outputs, nb, n_rand_used


def _choose_dist(probs):
    from . import ensemble as ens
    return ens._choose_sampling_dist(probs, 1.0)


def compile_sampling_circuit(dm, *, rand_bits: int = _RAND_BITS,
                             force_split: bool = False):
    return _compile_sampling_circuit(
        dm.nodes, dm.root, dm.num_specs, dm.size_a, dm.bits,
        dm.wr_words, dm.n_p, dm.n_d, dm.p_lo, dm.d_lo, dm.span, dm.tag,
        rand_bits, dm.wr_bits, force_split)


# --------------------------------------------------------------------------
# Device: bit-plane packing + the bit-sliced round.
# --------------------------------------------------------------------------

_ALL_ONES = 0xFFFFFFFF


def _eval_circuit(ops, outputs, in_words, shape):
    """Evaluates the DAG on uint32 words; returns one word per output."""
    vals: list = []
    for kind, a, b in ops:
        if kind == "const":
            vals.append(_ALL_ONES if a else 0)  # python ints broadcast
        elif kind == "in":
            vals.append(in_words[a])
        elif kind == "not":
            vals.append(~vals[a] if not isinstance(vals[a], int)
                        else vals[a] ^ _ALL_ONES)
        elif kind == "and":
            vals.append(vals[a] & vals[b])
        elif kind == "or":
            vals.append(vals[a] | vals[b])
        else:
            vals.append(vals[a] ^ vals[b])
    outs = []
    for o in outputs:
        v = vals[o]
        if isinstance(v, int):
            v = jnp.full(shape, v, jnp.uint32)
        outs.append(v)
    return outs


def transposed_word_shape(E: int, W: int) -> tuple[int, ...]:
    """Word-array shape for the transposed layout: [E, W] or [E, S, P].

    TPU tiles pad the two MINOR dims (second-minor to 8 sublanes,
    minor to 128 lanes). The 2-D transposed layout [E, W] pads E -> 8,
    so a tiny-E geometry burns 8/E of every gate op (config 5's E=2
    measured ~4x below the VPU rate of the dense headline geometry).
    When W factors as S*P with both tile dims near-dense, store 3-D
    [E, S, P]: BOTH minor dims are member-derived and dense, E leads
    untiled, and the site roll by e moves whole tiles along the major
    axis. Chosen by measured-cost comparison, so already-dense
    geometries (headline: E=256, W=512) keep the 2-D layout — a flat
    E*W fold was tried instead and REJECTED: the long dynamic flat
    rolls cost 3.3x on the headline (RESULTS.md, commit ad6c7e1).
    """
    def pad(n, t):
        return -(-n // t) * t / n

    best, best_cost = (E, W), pad(E, 8) * pad(W, 128)
    s = 1
    while s * s <= W:
        if W % s == 0:
            for S in (s, W // s):
                cost = pad(S, 8) * pad(W // S, 128)
                if cost < best_cost - 1e-12:
                    best, best_cost = (E, S, W // S), cost
        s += 1
    return best


def tapes_to_bitplanes(tape, stride, nb, *, transpose: bool = False):
    """[B, L] int tape -> uint32 bit-plane words, 32 members per word.

    Straight layout (``transpose=False``): [stride, nb, B//32, E] —
    the site (event) axis rides the 128 lanes; right for E >= 128.
    Transposed layout: [stride, nb, *transposed_word_shape(E, B//32)]
    — the packed member axis rides the lanes; right for tiny-E
    geometries (BASELINE config 5's L=32, E=2 would waste 126 of 128
    lanes in the straight layout, the same reason the weighted
    frontier stores its planes [E, K]).
    Either way bit k of a word packs 32 consecutive members' k-th
    symbol bit, so site-axis rolls stay whole-array rolls.
    """
    from . import ensemble as ens

    B, L = tape.shape
    E = L // stride
    if B % 32:
        raise ValueError(f"bit-sliced path needs B % 32 == 0, got {B}")
    rows = []
    # Per-plane/per-bit packing keeps the peak intermediate small (the
    # one-shot all-plane int32 version OOMed at the 10^7-member
    # config-5 geometry). The transposed branch works on tape.T so that
    # every intermediate keeps the big member axis minor — tiny-E
    # intermediates would be tile-padded ~64x, which made a straight-
    # layout pack of the config-5 geometry slower than 450 rounds.
    if transpose:
        tT = tape.astype(jnp.int8).T  # [L, B]
        lanes = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        for c in range(stride):
            p = tT[c::stride]  # [E, B]
            bits = []
            for k in range(nb):
                b = ((p >> k) & 1).astype(jnp.uint32)
                bits.append((b.reshape(E, B // 32, 32)
                             << lanes).sum(-1, dtype=jnp.uint32))
            rows.append(jnp.stack(bits))
        wshape = transposed_word_shape(E, B // 32)
        return jnp.stack(rows).reshape(stride, nb, *wshape)
    planes = ens._tape_to_planes(tape.astype(jnp.int8), stride)
    lanes = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    for p in planes:
        bits = []
        for k in range(nb):
            b = ((p >> k) & 1).astype(jnp.uint32)
            bits.append((b.reshape(B // 32, 32, E)
                         << lanes).sum(axis=1, dtype=jnp.uint32))
        rows.append(jnp.stack(bits))
    return jnp.stack(rows)  # [stride, nb, B//32, E]


def bitplanes_to_tapes(bp, *, transpose: bool = False):
    """Inverse of :func:`tapes_to_bitplanes` -> [B, L] int32."""
    from . import ensemble as ens

    stride, nb = bp.shape[:2]
    if transpose:
        if bp.ndim == 5:  # 3-D [E, S, P] word layout -> flatten to [E, W]
            bp = bp.reshape(*bp.shape[:3], -1)
        E, Bw = bp.shape[2:]
        lanes = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        rows = []
        for s in range(stride):
            sym = None
            for k in range(nb):
                bits = ((bp[s, k][:, :, None] >> lanes) & 1) \
                    .astype(jnp.int8)
                b = (bits << k).reshape(E, Bw * 32)
                sym = b if sym is None else sym | b
            rows.append(sym)
        # [stride, E, B] -> [E, stride, B] -> [L, B] (site = e*stride+s
        # is plane s's column e, matching _tape_to_planes) -> [B, L].
        tT = jnp.stack(rows).transpose(1, 0, 2).reshape(-1, Bw * 32)
        return tT.T.astype(jnp.int32)
    lanes = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    planes = []
    for s in range(stride):
        sym = None
        for k in range(nb):
            w = bp[s, k]
            bits = ((w[:, None, :] >> lanes) & 1).astype(jnp.int8)
            b = (bits << k).reshape(-1, w.shape[-1])
            sym = b if sym is None else sym | b
        planes.append(sym.astype(jnp.int32))
    return ens._planes_to_tape(tuple(planes))


def stacked_planes_to_bitwords(st, nb):
    """[stride, E, K] int8 stacked planes ->
    [stride, nb, *transposed_word_shape(E, K//32)] uint32 words
    (members packed 32/word on the minor axis — the transposed
    frontier layout). Packs per plane so the peak intermediate is one
    [E, K] uint32 (a one-shot all-plane uint32 reshape is 2.5 GB at
    the K=10^7 config-5 frontier — OOM)."""
    stride, E, K = st.shape
    if K % 32:
        raise ValueError(f"bit-sliced planes need K % 32 == 0, got {K}")
    lanes = jnp.arange(32, dtype=jnp.uint32)
    rows = []
    for s in range(stride):
        bits = []
        for k in range(nb):
            b = ((st[s] >> k) & 1).astype(jnp.uint32)
            bits.append((b.reshape(E, K // 32, 32)
                         << lanes).sum(-1, dtype=jnp.uint32))
        rows.append(jnp.stack(bits))
    wshape = transposed_word_shape(E, K // 32)
    return jnp.stack(rows).reshape(stride, nb, *wshape)


def bitwords_to_stacked_planes(bw):
    """Inverse of :func:`stacked_planes_to_bitwords` -> [stride, E, K]
    int8."""
    if bw.ndim == 5:  # 3-D [E, S, P] word layout -> flatten to [E, W]
        bw = bw.reshape(*bw.shape[:3], -1)
    stride, nb, E, Kw = bw.shape
    lanes = jnp.arange(32, dtype=jnp.uint32)
    rows = []
    for s in range(stride):
        sym = None
        for k in range(nb):
            bits = ((bw[s, k][..., None] >> lanes) & 1).astype(jnp.int8)
            b = (bits << k).reshape(E, Kw * 32)
            sym = b if sym is None else sym | b
        rows.append(sym)
    return jnp.stack(rows)


def apply_round_bitsliced(dm, circ, p_bp, d_bp, shift, *,
                          site_axis: int = -1, rand_words=None):
    """One stratified round on bit-plane tapes.

    Same window-cell selection as the stacked plane round
    (`ensemble._apply_plane_round_fsm_stacked`): plane index
    mod/floordiv arithmetic on the dynamic shift, spill planes rolled
    ±1 along the site axis (-1 for the straight layout, -2 for the 2-D
    transposed one, -3 for the 3-D [E, S, P] transposed one — callers
    pass ``-len(wshape)`` = `-(bp.ndim - 2)` for transposed layouts).
    ``rand_words`` ([n_rand, *word_shape] uint32) feeds a sampling
    circuit's random input bits (choose-ful machines at tau=1); pass
    None for a choose-free round circuit.
    """
    ops, outputs, nb, n_rand = circ
    stride = p_bp.shape[0]
    tapes_meta = ((p_bp, dm.p_lo, dm.n_p), (d_bp, dm.d_lo, dm.n_d))
    in_words: list = []
    locs: list = []
    for bp, lo, n in tapes_meta:
        for j in range(n):
            off = lo + j
            a = shift + off
            c = jnp.mod(a, stride)
            x = jax.lax.dynamic_index_in_dim(bp, c, 0, keepdims=False)
            if off == 0:
                e = None
            else:
                e = jnp.floor_divide(a, stride)
                x = jnp.roll(x, -e, axis=site_axis)
            for k in range(nb):
                in_words.append(x[k])
            locs.append((c, e))
    shape = in_words[0].shape
    if n_rand:
        in_words += [rand_words[i] for i in range(n_rand)]
    new_bits = _eval_circuit(ops, outputs, in_words, shape)
    outs = [p_bp, d_bp]
    k = 0
    for t, (bp, lo, n) in enumerate(tapes_meta):
        for j in range(n):
            c, e = locs[k]
            v = jnp.stack(new_bits[k * nb:(k + 1) * nb])
            if e is not None:
                v = jnp.roll(v, e, axis=site_axis)
            outs[t] = jax.lax.dynamic_update_index_in_dim(
                outs[t], v, c, 0)
            k += 1
    return outs[0], outs[1]
