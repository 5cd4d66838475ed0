"""Bit-sliced boolean-circuit rounds for the mini-BFF interpreter.

`bff.bff_fire` executes the register machine as ``fuel`` unrolled steps
of int8/int32 select cascades — measured VPU-select-bound at full lane
occupancy (RESULTS.md "bff interpreter": 1.83e8 site events/s, far from
the 6e10-class rates of the FSM/bit-sliced rounds). This module applies
the `engine/bitslice.py` methodology to the interpreter itself: the
whole fuel-step program — opcode fetch, bracket-scan mode FSM, head
moves, the data write — is synthesised ONCE per machine into a
hash-consed boolean DAG over the window's cell BITS, then evaluated on
uint32 bit-plane words packing 32 ensemble members per lane element, so
every gate op is amortised over 32 sites.

Unlike the decision-machine circuits, the BFF window is far too wide to
tabulate exhaustively (the faithful rule reads 50 cells x 4 bits — a
2^200-row truth table), so the circuit is built STRUCTURALLY:

- Registers are kept ONE-HOT over their reachable ranges: after i
  steps ``pc`` lies in [-i, i] (and shares i's parity — it moves by
  exactly +-1 every step), ``d0`` in [-i, i], ``d1`` in
  ``d1_start +- i``, ``mode`` in [-i, i]. One-hot position planes turn
  every fetch into an AND/OR reduction and every head move into a
  3-gate neighbour mux — no comparators, no adders — and the builder's
  constant folding prunes the unreachable positions automatically
  (step 0 costs nothing: all registers are constants).
- Cell reads (`bff.bff_fire`'s ``_sel``) become
  ``OR_pos(H_pos & cell_bit)`` over the head's reachable positions.
- The +-1 mod-size_a arithmetic of plus/minus is synthesised from a
  16-row truth table over the read value's 4 bits (`_synth_over`).
- The per-step write is a masked mux into the (versioned) cell-bit
  nodes; hash-consing shares everything the language's structure
  repeats across steps.

Semantics are the EXACT math of `bff.bff_fire` (itself validated
against the host DSL rule and the master-equation oracles —
`tests/test_bff.py`), and the round driver consumes the PRNG stream
identically to `bff._run_ensemble_bff`'s scan, so the resulting tapes —
and the per-round executed-opcode totals, emitted as one-hot circuit
outputs and popcounted on device — are BIT-IDENTICAL to the int8 scan
path at the same key (`tests/test_bff_bitslice.py`).

Reference parity: accelerates the repaired `problems.scm:529-629`
register machine on concrete tapes; the formulation is TPU-native.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils import config

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from .bff import BffMachine  # noqa: E402
from .bitslice import (  # noqa: E402
    CPU_MAX_CIRCUIT_OPS, _Builder, _dce_compact, _eval_circuit,
    _synth_over, bitplanes_to_tapes, tapes_to_bitplanes,
    transposed_word_shape)
from .ensemble import _check_round_geometry  # noqa: E402


def _mod_shift(b: _Builder, valbits, delta: int, size_a: int):
    """Bit nodes of ``(val + delta) % size_a`` over ``valbits`` (LSB
    first). Rows decoding above size_a-1 clamp (never occur on valid
    tapes; the clamp maximises subtable sharing, same convention as
    `bitslice._event_truth_tables`)."""
    nb = len(valbits)
    tab = np.zeros(1 << nb, dtype=np.int64)
    for v in range(1 << nb):
        tab[v] = (min(v, size_a - 1) + delta) % size_a
    memo: dict = {}
    return [_synth_over(b, ((tab >> k) & 1).astype(bool), valbits, memo)
            for k in range(nb)]


@functools.lru_cache(maxsize=None)
def compile_bff_circuit(mach: BffMachine):
    """(ops, outputs, nb, 0): the one-round circuit of a BFF machine.

    Inputs: window cell bits, LSB-first per cell — program cells
    p_lo..p_hi then data cells d_lo..d_hi for two-tape machines, just
    the combined data window for self-modifying ones. Outputs: the
    post-event data-cell bits (n_d * nb), followed by ``size_a * 4``
    BIT-SERIAL COUNTER planes — per opcode, the 4-bit count of fuel
    steps that fetched it (in-circuit ripple adders over the per-step
    one-hots; fuel ≤ 15 fits 4 bits, asserted). Device side the totals
    are recovered as Σ_k 2^k·popcount(counter bit k) — bit-identical
    to the scan path's executed-opcode observable, at 48 output planes
    instead of the raw fuel×size_a = 120 one-hots of the first cut
    (measured ~15% of the round was count-plane traffic+reduction).
    The tuple layout matches `bitslice` circuits so `_eval_circuit`
    and `_dce_compact` are shared.
    """
    A = mach.size_a
    nb = max(1, (A - 1).bit_length())
    n_p = 0 if mach.self_modifying else mach.n_p
    b = _Builder((n_p + mach.n_d) * nb)

    if mach.self_modifying:
        d_cells = [list(b.inputs[c * nb:(c + 1) * nb])
                   for c in range(mach.n_d)]
        p_cells = d_cells  # live alias: opcode fetch sees this step's
        #                    writes at the NEXT step's decode
        p_lo = mach.d_lo
    else:
        p_cells = [list(b.inputs[c * nb:(c + 1) * nb])
                   for c in range(n_p)]
        d_cells = [list(b.inputs[(n_p + c) * nb:(n_p + c + 1) * nb])
                   for c in range(mach.n_d)]
        p_lo = mach.p_lo

    NOT = lambda x: b.gate("not", x)

    def AND(*xs):
        r = b.c1
        for x in xs:
            r = b.gate("and", r, x)
        return r

    def OR(*xs):
        r = b.c0
        for x in xs:
            r = b.gate("or", r, x)
        return r

    def eq_const(bits, v: int):
        return AND(*[bit if (v >> k) & 1 else NOT(bit)
                     for k, bit in enumerate(bits)])

    def eq_value(bits, v: int):
        """``value == v`` for a tape-cell value: patterns >= size_a
        never occur on valid tapes, so the cube only needs the minimal
        literal subset that separates ``v`` from the other CARE values
        (round-5 circuit shrink; e.g. at A=12, ``== 11`` needs 3
        literals, not 4). Brute-force over the 2^nb subsets — nb <= 4."""
        best = None
        for mask in range(1 << nb):
            if all(((u ^ v) & mask) != 0 for u in range(A) if u != v):
                if best is None or bin(mask).count("1") < \
                        bin(best).count("1"):
                    best = mask
        lits = [bits[k] if (v >> k) & 1 else NOT(bits[k])
                for k in range(nb) if (best >> k) & 1]
        return AND(*lits) if lits else b.c1

    def sel_onehot(H: dict, cells, lo: int):
        """[nb] value bits of the cell under a one-hot head."""
        out = [b.c0] * nb
        for pos in sorted(H):
            cell = cells[pos - lo]
            for k in range(nb):
                out[k] = b.gate("or", out[k],
                                b.gate("and", H[pos], cell[k]))
        return out

    # One-hot register planes; missing key == constant 0 (unreachable).
    Hpc = {0: b.c1}
    Hd0 = {0: b.c1}
    Hd1 = {mach.d1_start: b.c1}
    Hm = {0: b.c1}
    assert mach.fuel <= 15, "4-bit op counters"
    op_hots = [[] for _ in range(A)]  # per-step fetch one-hots

    def popcount4(hots):
        """4 LSB-first bits of ``sum(hots)`` via a 3:2 compressor tree
        — same output bits as the round-3 per-step ripple adders at
        about half the gates (round-5 shrink: full adder = 5 gates
        with the a^b term shared between sum and majority)."""
        buckets = {0: list(hots)}
        out = []
        for w in range(4):
            cur = buckets.get(w, [])
            while len(cur) >= 3:
                x, y, z2 = cur.pop(), cur.pop(), cur.pop()
                t = b.gate("xor", x, y)
                cur.append(b.gate("xor", t, z2))
                buckets.setdefault(w + 1, []).append(
                    b.gate("or", b.gate("and", x, y),
                           b.gate("and", z2, t)))
            if len(cur) == 2:
                x, y = cur
                cur = [b.gate("xor", x, y)]
                buckets.setdefault(w + 1, []).append(
                    b.gate("and", x, y))
            out.append(cur[0] if cur else b.c0)
        return out

    for step in range(mach.fuel):
        opb = sel_onehot(Hpc, p_cells, p_lo)
        for a in range(A):
            op_hots[a].append(eq_value(opb, a))
        is_lt, is_gt = eq_value(opb, mach.lt), eq_value(opb, mach.gt)
        is_cl, is_cr = eq_value(opb, mach.cl), eq_value(opb, mach.cr)
        is_minus = eq_value(opb, mach.minus)
        is_plus = eq_value(opb, mach.plus)
        is_dot = eq_value(opb, mach.dot)
        is_comma = eq_value(opb, mach.comma)
        is_bl, is_br = eq_value(opb, mach.bl), eq_value(opb, mach.br)

        d0v = sel_onehot(Hd0, d_cells, mach.d_lo)
        d1v = sel_onehot(Hd1, d_cells, mach.d_lo)
        z = eq_const(d0v, mach.zero)
        nz = NOT(z)
        ex = Hm.get(0, b.c0)

        # --- data write (uses the PRE-move heads; execute mode only:
        # plus/minus/comma write at d0, dot at d1). XOR-delta form
        # (round-5 circuit shrink): the value ALREADY at the write
        # target is d1v for dot and d0v otherwise, so the change is a
        # per-step shared 4-bit delta = wv ^ old_at_head and each
        # touched position costs 2 gates/bit (AND+XOR) instead of a
        # 3-gate mux — the write block was 45% of the circuit.
        w_at_d0 = AND(ex, OR(is_plus, is_minus, is_comma))
        w_at_d1 = AND(ex, is_dot)
        inc = _mod_shift(b, d0v, +1, A)
        dec = _mod_shift(b, d0v, -1, A)
        wv = [b.mux(is_plus, inc[k],
                    b.mux(is_minus, dec[k],
                          b.mux(is_dot, d0v[k], d1v[k])))
              for k in range(nb)]
        oldv = [b.mux(is_dot, d1v[k], d0v[k]) for k in range(nb)]
        delta = [b.gate("xor", wv[k], oldv[k]) for k in range(nb)]
        for pos in sorted(set(Hd0) | set(Hd1)):
            wr = OR(AND(Hd0.get(pos, b.c0), w_at_d0),
                    AND(Hd1.get(pos, b.c0), w_at_d1))
            old = d_cells[pos - mach.d_lo]
            d_cells[pos - mach.d_lo] = [
                b.gate("xor", old[k], b.gate("and", wr, delta[k]))
                for k in range(nb)]

        if step == mach.fuel - 1:
            break  # register updates after the last fetch are dead code

        # --- mode one-hot update. For mode != 0 the two scan regions
        # share one rule: mode' = mode + is_bl - is_br (the l_done /
        # r_done "-> 0" specials coincide with it at mode = -+1). From
        # mode 0: '[' on zero -> +1, ']' on nonzero -> -1, else stay.
        stay = AND(NOT(is_bl), NOT(is_br))
        trig_p = AND(ex, is_bl, z)
        trig_m = AND(ex, is_br, nz)
        newHm = {}
        for m in range(-(step + 1), step + 2):
            acc = []
            if m == 0:
                if -1 in Hm:
                    acc.append(AND(Hm[-1], is_bl))
                if 1 in Hm:
                    acc.append(AND(Hm[1], is_br))
                if 0 in Hm:
                    acc.append(AND(Hm[0], NOT(OR(AND(is_bl, z),
                                                 AND(is_br, nz)))))
            else:
                if m - 1 in Hm and m - 1 != 0:
                    acc.append(AND(Hm[m - 1], is_bl))
                if m + 1 in Hm and m + 1 != 0:
                    acc.append(AND(Hm[m + 1], is_br))
                if m in Hm:
                    acc.append(AND(Hm[m], stay))
                if m == 1:
                    acc.append(trig_p)
                if m == -1:
                    acc.append(trig_m)
            v = OR(*acc)
            if v != b.c0:
                newHm[m] = v

        # --- pc one-hot update: pc moves by exactly +-1 every step;
        # it steps BACK only when scanning left (and not just done) or
        # when executing ']' on a nonzero cell.
        in_l = OR(*[Hm[m] for m in Hm if m < 0])
        l_done = AND(Hm.get(-1, b.c0), is_bl)
        back = OR(AND(in_l, NOT(l_done)), AND(ex, is_br, nz))
        newHpc = {}
        for p in range(-(step + 1), step + 2):
            v = b.mux(back, Hpc.get(p + 1, b.c0), Hpc.get(p - 1, b.c0))
            if v != b.c0:
                newHpc[p] = v

        # --- head one-hot updates (execute mode only) ---
        def move(H, mR, mL):
            st = NOT(OR(mR, mL))
            new = {}
            for p in range(min(H) - 1, max(H) + 2):
                acc = []
                if p - 1 in H:
                    acc.append(AND(H[p - 1], mR))
                if p + 1 in H:
                    acc.append(AND(H[p + 1], mL))
                if p in H:
                    acc.append(AND(H[p], st))
                v = OR(*acc)
                if v != b.c0:
                    new[p] = v
            return new

        Hd0 = move(Hd0, AND(ex, is_gt), AND(ex, is_lt))
        Hd1 = move(Hd1, AND(ex, is_cr), AND(ex, is_cl))
        Hm = newHm
        Hpc = newHpc

    outputs = [bit for cell in d_cells for bit in cell]
    for a in range(A):
        outputs.extend(popcount4(op_hots[a]))
    ops, outputs, _ = _dce_compact(b.ops, tuple(outputs),
                                   (n_p + mach.n_d) * nb)
    if config.IS_DEBUG:
        n_gates = sum(op[0] in ("and", "or", "xor", "not") for op in ops)
        print(f"[bff_bitslice] {mach.tag}: {(n_p + mach.n_d) * nb} "
              f"in-bits -> {len(outputs)} out-bits, {n_gates} gates")
    return ops, outputs, nb, 0


def apply_bff_round_bitsliced(mach: BffMachine, circ, p_bp, d_bp, shift,
                              *, stride: int, site_axis: int = -1):
    """One stratified round on bit-plane tapes.

    Same plane mod/floordiv cell selection as
    `bitslice.apply_round_bitsliced`, except (a) ``shift`` ranges over
    the FULL tape [0, L) — matching `bff._run_ensemble_bff`'s stream
    bit for bit — so even the offset-0 cell may spill and every cell
    gets the dynamic site-axis roll, and (b) only the DATA planes are
    written back (the program ring is read-only in this language;
    self-modifying machines pass ``p_bp=None`` and the one window
    carries both roles).

    Returns ``(d_bp, op_count_words)`` where the latter is the list of
    ``size_a * 4`` bit-serial counter word planes appended by
    `compile_bff_circuit` (weighted popcount recovers the
    executed-opcode totals).
    """
    # Per-cell extraction/write-back, NOT batched: a round-4 experiment
    # replaced the ~50 dynamic_index+roll pairs with one take over the
    # slot axis + two whole-block rolls + a select (and the write-back
    # with one scatter) — bit-identical, but MEASURED 1.7x SLOWER on
    # the TPU (321.9 vs ~190 us/round, bench_bff 2026-08-20): the
    # gathered [n_cells, nb, *wshape] blocks materialise ~26 MB x 3
    # copies per round where XLA fuses each per-cell chain into the
    # first gate level that consumes it. Reverted; kept as a note so
    # the next reader does not redo it.
    ops, outputs, nb, _ = circ
    metas = []
    if not mach.self_modifying:
        metas.append((p_bp, mach.p_lo, mach.n_p))
    metas.append((d_bp, mach.d_lo, mach.n_d))
    in_words: list = []
    locs_d: list = []
    for bp, lo, n in metas:
        for j in range(n):
            a = shift + lo + j
            c = jnp.mod(a, stride)
            e = jnp.floor_divide(a, stride)
            x = jax.lax.dynamic_index_in_dim(bp, c, 0, keepdims=False)
            x = jnp.roll(x, -e, axis=site_axis)
            for k in range(nb):
                in_words.append(x[k])
            if bp is d_bp:
                locs_d.append((c, e))
    shape = in_words[0].shape
    new_bits = _eval_circuit(ops, outputs, in_words, shape)
    for j in range(mach.n_d):
        c, e = locs_d[j]
        v = jnp.stack(new_bits[j * nb:(j + 1) * nb])
        v = jnp.roll(v, e, axis=site_axis)
        d_bp = jax.lax.dynamic_update_index_in_dim(d_bp, v, c, 0)
    return d_bp, new_bits[mach.n_d * nb:]


def bff_bitslice_eligible(mach: BffMachine, B: int, *,
                          independent_sites: bool = False,
                          mutation_rate: float = 0.0,
                          lineage: bool = False) -> bool:
    """Can the bit-sliced round replace the int8 scan for this call?

    Per-member lattice phases, background mutation, and int32 lineage
    rings all operate on quantities that do not bit-plane cheaply
    (per-member rolls, uniform symbol resampling, wide provenance ids)
    — those calls keep the scan. Everything else is covered, and
    covered bit-identically.
    """
    return (B % 32 == 0 and not independent_sites
            and float(mutation_rate) == 0.0 and not lineage)


def run_ensemble_bff_bitsliced(key, ts, mach: BffMachine,
                               steps_events: tuple):
    """Bit-sliced twin of `bff._run_ensemble_bff` (mutation-free,
    common-random-sites calls): same key discipline, same round shift
    stream, bit-identical tapes AND executed-opcode totals.

    ``ts`` is the tape tuple — (ptape, dtape) int32 [B, L] for
    two-tape machines, (tape,) for self-modifying ones. Returns
    ``(ts, (op_totals [num_steps, size_a] int64, times))``.
    """
    return _run_bitsliced_jit(key, tuple(ts), mach, tuple(steps_events))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _run_bitsliced_jit(key, ts, mach, steps_events):
    num_steps, events = steps_events
    B, L = ts[0].shape
    _check_round_geometry(L, events, mach.span)
    stride = L // events
    circ = compile_bff_circuit(mach)
    nb = circ[2]
    # Put the larger of (events, packed members) on the 128-lane axis —
    # same layout policy as `ensemble.run_ensemble`'s bit-sliced path.
    transpose = events < B // 32
    if transpose:
        wshape = transposed_word_shape(events, B // 32)
        site_axis = -len(wshape)
    else:
        wshape = (B // 32, events)
        site_axis = -1
    keys = jax.random.split(key, num_steps)
    bps = tuple(tapes_to_bitplanes(t, stride, nb, transpose=transpose)
                for t in ts)

    def step(bps, k):
        # Identical draw to the scan path (full-tape shift; the k2
        # split of the mutating path never happens at mu=0 there
        # either), so the site lattices — and therefore the tapes —
        # are bit-identical.
        shift = jax.random.randint(k, (), 0, L, dtype=jnp.int32)
        if mach.self_modifying:
            d_bp, oh = apply_bff_round_bitsliced(
                mach, circ, None, bps[0], shift, stride=stride,
                site_axis=site_axis)
            new = (d_bp,)
        else:
            d_bp, oh = apply_bff_round_bitsliced(
                mach, circ, bps[0], bps[1], shift, stride=stride,
                site_axis=site_axis)
            new = (bps[0], d_bp)
        pc = jax.lax.population_count(jnp.stack(oh)) \
            .sum(axis=tuple(range(1, len(wshape) + 1)), dtype=jnp.int64) \
            .reshape(mach.size_a, 4)
        counts = (pc << jnp.arange(4, dtype=jnp.int64)).sum(axis=1)
        return new, counts

    bps, op_totals = jax.lax.scan(step, bps, keys)
    ts = tuple(bitplanes_to_tapes(bp, transpose=transpose)
               for bp in bps)
    dt_round = -jnp.log1p(-events / L)
    times = dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)
    return ts, (op_totals, times)
