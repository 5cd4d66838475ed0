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


# --------------------------------------------------------------------------
# Truth table of one round event from the compiled machine.
# --------------------------------------------------------------------------

_MAX_IN_BITS = 22  # 4M-row truth table (~seconds host-side, cached);
#                    beyond this fall back to the FSM walk


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
        w = np.asarray(dm.wr_words[c], np.int64)
        f = (w[spec // 6] >> (5 * (spec % 6))) & 31
        new_c = np.where((f >> 4) == 1, f & 15, cellv[c])
        for k in range(nb):
            tables.append(((new_c >> k) & 1).astype(bool))
    return tables, n_in, nb


@functools.lru_cache(maxsize=None)
def _compile_circuit(nodes, root, num_specs, size_a, bits, wr_words,
                     n_p, n_d, p_lo, d_lo, span, tag):
    """(ops, outputs, nb): the round circuit for a hashable machine key."""
    from . import ensemble as ens

    dm = ens.DeviceMachine(
        tag=tag, size_a=size_a, p_lo=p_lo, d_lo=d_lo, n_p=n_p, n_d=n_d,
        span=span, p_offs=jnp.arange(1), d_offs=jnp.arange(1),
        nodes=nodes, root=root, n_states=0, bits=bits,
        wr_words=wr_words, num_specs=num_specs)
    tables, n_in, nb = _event_truth_tables(dm)
    builder = _Builder(n_in)
    memo: dict = {}
    outputs = tuple(_synth_bit(builder, t, memo) for t in tables)
    if config.IS_DEBUG:
        n_gates = sum(op[0] in ("and", "or", "xor", "not")
                      for op in builder.ops)
        print(f"[bitslice] {tag}: {n_in} in-bits -> "
              f"{len(outputs)} out-bits, {n_gates} gates")
    return tuple(builder.ops), outputs, nb


def compile_round_circuit(dm):
    return _compile_circuit(dm.nodes, dm.root, dm.num_specs, dm.size_a,
                            dm.bits, dm.wr_words, dm.n_p, dm.n_d,
                            dm.p_lo, dm.d_lo, dm.span, dm.tag)


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


def tapes_to_bitplanes(tape, stride, nb, *, transpose: bool = False):
    """[B, L] int tape -> uint32 bit-plane words, 32 members per word.

    Straight layout (``transpose=False``): [stride, nb, B//32, E] —
    the site (event) axis rides the 128 lanes; right for E >= 128.
    Transposed layout: [stride, nb, E, B//32] — the packed member axis
    rides the lanes; right for tiny-E geometries (BASELINE config 5's
    L=32, E=2 would waste 126 of 128 lanes in the straight layout, the
    same reason the weighted frontier stores its planes [E, K]).
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
        return jnp.stack(rows)  # [stride, nb, E, B//32]
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
    """[stride, E, K] int8 stacked planes -> [stride, nb, E, K//32]
    uint32 words (members packed 32/word on the minor axis — the
    transposed frontier layout)."""
    stride, E, K = st.shape
    if K % 32:
        raise ValueError(f"bit-sliced planes need K % 32 == 0, got {K}")
    lanes = jnp.arange(32, dtype=jnp.uint32)
    out = []
    for k in range(nb):
        b = ((st >> k) & 1).astype(jnp.uint32)
        out.append((b.reshape(stride, E, K // 32, 32)
                    << lanes).sum(-1, dtype=jnp.uint32))
    return jnp.stack(out, axis=1)


def bitwords_to_stacked_planes(bw):
    """Inverse of :func:`stacked_planes_to_bitwords` -> [stride, E, K]
    int8."""
    stride, nb, E, Kw = bw.shape
    lanes = jnp.arange(32, dtype=jnp.uint32)
    sym = None
    for k in range(nb):
        bits = ((bw[:, k][..., None] >> lanes) & 1).astype(jnp.int8)
        b = (bits << k).reshape(stride, E, Kw * 32)
        sym = b if sym is None else sym | b
    return sym


def apply_round_bitsliced(dm, circ, p_bp, d_bp, shift, *,
                          site_axis: int = -1):
    """One stratified round on bit-plane tapes (choose-free machines).

    Same window-cell selection as the stacked plane round
    (`ensemble._apply_plane_round_fsm_stacked`): plane index
    mod/floordiv arithmetic on the dynamic shift, spill planes rolled
    ±1 along the site axis (-1 for the straight layout, -2 for the
    transposed one).
    """
    ops, outputs, nb = circ
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
