"""Device interpreter for the mini-BFF register-machine family (ex6).

The reference registers `ex6-mini-bff` (`problems.scm:529-629`) but its
form is defective and no example exercises it (SURVEY §2.3); this repo's
repaired rule (`models/problems._ex6_rule`) is *faithful-parameter
unenumerable*: every tape reveal splits the multiverse 12 ways, so the
exact engine can only run it pruned (`examples/ex6_mini_bff.py`,
measured un-enumerated mass).

On CONCRETE tapes the same rule is deterministic: every branch of the
register machine recurses exactly once per budget unit and all
branching is on read symbols, so firing one site is `fuel` unrolled
steps of pure vectorized select logic — no decision tree, no choose
sampling, no enumeration. This module compiles that interpreter, making
the tape ensemble the one engine that executes the FULL, un-pruned
mini-BFF language at scale.

Machine state per site (mirroring the rule's loop variables): program
counter offset ``pc``, data heads ``d0``/``d1``, bracket scan mode
``mode`` (<0: scanning left for the |mode|-th '[', >0: scanning right
for the mode-th ']', 0: executing). Offsets after ``i`` steps are
bounded by ``i``, so a static window of ``2*fuel-1`` program cells and
``(d1_start + 2*fuel - 1)``-reach data cells covers every read and
write; the program tape is never written.

Validated bit-exactly against the host DSL rule itself
(`master.enumerate_pair_outcomes` on random windows, faithful + lite
parameters), against the decision-machine FSM round on the enumerable
lite variant, and against a conditioned-on-program master equation
(`master.build_conditioned_ring_generator`) — see `tests/test_bff.py`.

SELF-MODIFYING variants (`ex6-mini-bff-self[-lite]`, beyond
reference): opcodes and data share ONE ring, so writes land in the
instruction stream — 'dot' copies the cell under d0 to d1_start cells
downstream, i.e. code copies code. The interpreter handles this by
fetching each step's opcode from the live data window (a write at
step i changes what step i+1 decodes); the exact oracle is then the
plain single-ring master equation (`master.build_ring_generator`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import dsl
from .ensemble import _check_round_geometry, _roll_cols, _roll_rows


@dataclasses.dataclass(frozen=True)
class BffMachine:
    """Static interpreter metadata for one registered BFF-family rule.

    Hashable (all-int fields) so jitted entry points can close over it
    as a static argument.
    """

    tag: str
    fuel: int
    d1_start: int
    size_a: int
    # Window extents (inclusive offsets relative to the firing site).
    p_lo: int
    p_hi: int
    d_lo: int
    d_hi: int
    # Opcode symbol indices.
    lt: int
    gt: int
    cl: int
    cr: int
    minus: int
    plus: int
    dot: int
    comma: int
    bl: int
    br: int
    zero: int
    # Single-tape machine: opcodes are fetched from the DATA cells, so
    # writes land in the instruction stream (self-modifying code). The
    # p_* extents then equal the d_* extents and the program-tape
    # arguments of the entry points are dropped.
    self_modifying: bool = False

    @property
    def n_p(self) -> int:
        return self.p_hi - self.p_lo + 1

    @property
    def n_d(self) -> int:
        return self.d_hi - self.d_lo + 1

    @property
    def span(self) -> int:
        """Conflict radius, same convention as `DeviceTable.span`."""
        return max(self.p_hi - self.p_lo, self.d_hi - self.d_lo) + 1

    def summary(self) -> str:
        if self.self_modifying:
            return (f"{self.tag}: fuel {self.fuel}, heads "
                    f"{self.d1_start} apart, SELF-MODIFYING, window "
                    f"[{self.d_lo}..{self.d_hi}]")
        return (f"{self.tag}: fuel {self.fuel}, heads {self.d1_start} "
                f"apart, window P[{self.p_lo}..{self.p_hi}] "
                f"D[{self.d_lo}..{self.d_hi}]")


def compile_bff(tag: str) -> BffMachine:
    """Compiles a registered BFF-family problem to interpreter metadata.

    The problem must carry the ``native_ex6 = (fuel, d1_start)``
    attribute on its rule (set by `models/problems` for the faithful
    and lite registrations) — the declaration that it IS the mini-BFF
    register machine, whose semantics this interpreter hard-codes.
    """
    problem = dsl.get_problem(tag)
    meta = getattr(problem.rule, "native_ex6", None)
    self_meta = getattr(problem.rule, "native_ex6_self", None)
    if meta is None and self_meta is None:
        raise ValueError(
            f"{tag!r} is not a mini-BFF-family rule (no native_ex6 "
            "declaration); use compile_decision_machine / "
            "compile_transition_table for general rules.")
    fuel, d1_start = meta if meta is not None else self_meta
    # After i executed ops every head has moved at most i cells, and
    # the op at step i is read before the move — so reads/writes reach
    # at most fuel-1 cells from each head's start.
    r = fuel - 1
    idx = problem.symbol_index
    if self_meta is not None:
        # One combined window: pc stays in [-r, r], d0 in [-r, r], d1
        # in [d1_start - r, d1_start + r], all on the same ring.
        lo = min(-r, d1_start - r)
        hi = max(r, d1_start + r)
        p_lo, p_hi, d_lo, d_hi = lo, hi, lo, hi
    else:
        p_lo, p_hi = -r, r
        d_lo, d_hi = min(-r, d1_start - r), max(r, d1_start + r)
    return BffMachine(
        tag=tag, fuel=fuel, d1_start=d1_start, size_a=problem.size_a,
        p_lo=p_lo, p_hi=p_hi, d_lo=d_lo, d_hi=d_hi,
        lt=idx("lt"), gt=idx("gt"), cl=idx("cl"), cr=idx("cr"),
        minus=idx("minus"), plus=idx("plus"), dot=idx("dot"),
        comma=idx("comma"), bl=idx("bl"), br=idx("br"),
        zero=idx("zero"), self_modifying=self_meta is not None,
    )


def _sel(cells, idx):
    """Gather-free dynamic pick along the (small) last window axis:
    one-hot mask + sum, the same trick as the ensemble FSM kernels."""
    n = cells.shape[-1]
    oh = jnp.arange(n, dtype=jnp.int32) == idx[..., None]
    # dtype pinned: under x64 an integer sum() promotes to int64, which
    # would ripple into an int64 write-back scatter on the int32 tape.
    return jnp.where(oh, cells, 0).sum(axis=-1, dtype=jnp.int32)


def bff_fire(mach: BffMachine, p_cells, d_cells, prov_cells=None):
    """Fires the register machine once at offset 0 of every window.

    Args:
      mach: static machine metadata.
      p_cells: [..., n_p] int program window (offsets p_lo..p_hi).
        MUST be None for self-modifying machines — opcodes are then
        fetched from ``d_cells``, so writes feed back into fetches.
      d_cells: [..., n_d] int data window (offsets d_lo..d_hi).
      prov_cells: optional [..., n_d] int32 LINEAGE window threaded
        through the same execution: a copy op ('dot'/'comma') also
        copies the source cell's provenance id to the destination,
        while 'plus'/'minus' mutate content in place and KEEP the
        lineage (point mutation). Provenance never feeds back into
        execution, so the content trajectory is bit-identical with or
        without it.

    Returns:
      (new_d_cells, op_counts) — the data window after the event (the
      program tape is read-only in this language; for self-modifying
      machines the one window carries both roles) and [..., size_a]
      int32 per-site counts of executed opcodes (scan-mode reads
      count toward the symbol read; useful as an execution-mix
      observable, nearly free to compute). With ``prov_cells`` the
      result is (new_d_cells, new_prov_cells, op_counts).
    """
    if mach.self_modifying != (p_cells is None):
        raise ValueError(
            "self-modifying machines take p_cells=None (opcodes fetch "
            "from d_cells); two-tape machines require a program window")
    shape = d_cells.shape[:-1]
    i32 = jnp.int32
    # Cell dtype is preserved (int8 fast path / int32): the ensemble
    # round loop is HBM-bound on the per-step window rewrites, so the
    # scan runs tapes as int8 (symbols < 12 are exact) and only the
    # register vectors live in int32. Selects still reduce to int32
    # (`_sel` pins the sum dtype); writes cast back to the cell dtype
    # so no step promotes the window arrays.
    d_cells = jnp.asarray(d_cells)
    cdt = d_cells.dtype
    if p_cells is not None:
        p_cells = jnp.asarray(p_cells, cdt)
    pc = jnp.zeros(shape, i32)
    d0 = jnp.zeros(shape, i32)
    d1 = jnp.full(shape, mach.d1_start, i32)
    mode = jnp.zeros(shape, i32)
    op_counts = jnp.zeros(shape + (mach.size_a,), i32)
    A = mach.size_a

    for _ in range(mach.fuel):
        # Opcode fetch: from the (frozen) program window, or — for
        # self-modifying machines — from the live data window, so a
        # write at step i can change the op decoded at step i+1.
        op = (_sel(d_cells, pc - mach.d_lo) if mach.self_modifying
              else _sel(p_cells, pc - mach.p_lo))
        op_counts = op_counts + (
            jnp.arange(A, dtype=i32) == op[..., None]).astype(i32)
        in_l = mode < 0
        in_r = mode > 0
        ex = mode == 0
        is_bl = op == mach.bl
        is_br = op == mach.br

        # Scan left for the |mode|-th '[' (problems.py loop, mode < 0).
        l_done = is_bl & (mode == -1)
        mode_l = jnp.where(
            l_done, 0,
            mode + is_bl.astype(i32) - is_br.astype(i32))
        pc_l = pc + jnp.where(l_done, 1, -1)

        # Scan right for the mode-th ']' (mode > 0).
        r_done = is_br & (mode == 1)
        mode_r = jnp.where(
            r_done, 0,
            mode - is_br.astype(i32) + is_bl.astype(i32))
        pc_r = pc + 1

        # Execute (mode == 0).
        d0v = _sel(d_cells, d0 - mach.d_lo)
        d1v = _sel(d_cells, d1 - mach.d_lo)
        z = d0v == mach.zero
        is_lt = op == mach.lt
        is_gt = op == mach.gt
        is_cl = op == mach.cl
        is_cr = op == mach.cr
        is_plus = op == mach.plus
        is_minus = op == mach.minus
        is_dot = op == mach.dot
        is_comma = op == mach.comma
        mode_e = jnp.where(is_bl & z, 1, jnp.where(is_br & ~z, -1, 0))
        pc_e = pc + jnp.where(is_br & ~z, -1, 1)
        d0_e = d0 + is_gt.astype(i32) - is_lt.astype(i32)
        d1_e = d1 + is_cr.astype(i32) - is_cl.astype(i32)

        # Data-tape write (execute mode only; the only mutation in the
        # language): plus/minus/comma write at d0, dot writes at d1.
        w_en = ex & (is_plus | is_minus | is_dot | is_comma)
        w_idx = jnp.where(is_dot, d1, d0)
        w_val = jnp.where(
            is_plus, (d0v + 1) % A,
            jnp.where(is_minus, (d0v - 1) % A,
                      jnp.where(is_dot, d0v, d1v)))
        oh = (jnp.arange(mach.n_d, dtype=i32)
              == (w_idx - mach.d_lo)[..., None]) & w_en[..., None]
        if prov_cells is not None:
            # Lineage flows only along copies: dot carries prov(d0) to
            # d1, comma carries prov(d1) to d0; plus/minus keep the
            # destination's lineage (in-place point mutation). Read the
            # source prov BEFORE the content write of this step (prov
            # and content update together, so ordering is consistent).
            pv = jnp.where(is_dot, _sel(prov_cells, d0 - mach.d_lo),
                           _sel(prov_cells, d1 - mach.d_lo))
            ohp = oh & (is_dot | is_comma)[..., None]
            prov_cells = jnp.where(ohp, pv[..., None], prov_cells)
        d_cells = jnp.where(oh, w_val.astype(cdt)[..., None], d_cells)

        pc = jnp.where(in_l, pc_l, jnp.where(in_r, pc_r, pc_e))
        mode = jnp.where(in_l, mode_l, jnp.where(in_r, mode_r, mode_e))
        d0 = jnp.where(ex, d0_e, d0)
        d1 = jnp.where(ex, d1_e, d1)

    if prov_cells is not None:
        return d_cells, prov_cells, op_counts
    return d_cells, op_counts


def apply_bff_round(mach: BffMachine, ptape, dtape, shift, *,
                    events: int, want_op_counts: bool = False):
    """One stratified lattice round of BFF events on the whole batch.

    Same dense roll/reshape tape access as
    `ensemble._apply_lattice_round` (sites form a randomly shifted
    lattice, stride > 2*span so events are conflict-free), with the
    outcome resolution replaced by the unrolled register-machine
    interpreter. The program tape is read-only, so only the data tape
    is written back.

    Args:
      ptape, dtape: [B, L] int32 ring tapes.
      shift: scalar int32 round shift.
      events: static sites per member per round (must divide L).
    Returns:
      (ptape, dtape) — ptape passed through unchanged — plus, when
      ``want_op_counts``, the [size_a] int64 executed-opcode totals of
      the round.
    """
    B, L = ptape.shape
    stride = L // events
    rp = _roll_cols(ptape, shift + mach.p_lo).reshape(B, events, stride)
    rd = _roll_cols(dtape, shift + mach.d_lo).reshape(B, events, stride)
    new_d, ops = bff_fire(mach, rp[:, :, :mach.n_p], rd[:, :, :mach.n_d])
    rd = rd.at[:, :, :mach.n_d].set(new_d)
    dtape = _roll_cols(rd.reshape(B, L), -(shift + mach.d_lo))
    if want_op_counts:
        return ptape, dtape, ops.sum(axis=(0, 1), dtype=jnp.int64)
    return ptape, dtape


def apply_bff_self_round(mach: BffMachine, tape, shift, *,
                         events: int, want_op_counts: bool = False,
                         prov=None):
    """Single-tape twin of :func:`apply_bff_round` for self-modifying
    machines: the one ring carries opcodes AND data, so the round's
    write-back goes to the same tape the interpreter fetched from
    (fetch/write interleaving *within* an event is handled inside
    `bff_fire`; *across* events the stride > 2*span lattice keeps
    windows disjoint, so order is immaterial). An optional ``prov``
    [B, L] lineage ring rides through the same window extraction."""
    B, L = tape.shape
    stride = L // events
    rd = _roll_cols(tape, shift + mach.d_lo).reshape(B, events, stride)
    if prov is not None:
        rp = _roll_cols(prov, shift + mach.d_lo).reshape(
            B, events, stride)
        new_d, new_p, ops = bff_fire(mach, None, rd[:, :, :mach.n_d],
                                     rp[:, :, :mach.n_d])
        rp = rp.at[:, :, :mach.n_d].set(new_p)
        prov = _roll_cols(rp.reshape(B, L), -(shift + mach.d_lo))
    else:
        new_d, ops = bff_fire(mach, None, rd[:, :, :mach.n_d])
    rd = rd.at[:, :, :mach.n_d].set(new_d)
    tape = _roll_cols(rd.reshape(B, L), -(shift + mach.d_lo))
    out = (tape,) if prov is None else (tape, prov)
    if want_op_counts:
        return (*out, ops.sum(axis=(0, 1), dtype=jnp.int64))
    return out[0] if prov is None else out


def run_ensemble_bff(key, tapes, mach: BffMachine, steps_events: tuple,
                     *, independent_sites: bool = False,
                     mutation_rate: float = 0.0, prov=None,
                     engine: str = "auto"):
    """Advances a batch of tape pairs under the BFF interpreter.

    The `run_ensemble` contract (stratified lattice rounds, Poisson
    time calibration dt = -ln(1 - E/L) per round, common random sites;
    ``independent_sites=True`` draws the lattice phase per member for
    rare-pattern statistics, same tradeoff as `run_ensemble`) with the
    decision machine replaced by the register-machine interpreter —
    the path for rules whose decision trees cannot be enumerated at
    all.

    Args:
      key: PRNG key.
      tapes: (ptape [B, L] int32, dtape [B, L] int32) ring tapes — or
        a single [B, L] tape for self-modifying machines.
      mach: compiled :class:`BffMachine` (static).
      steps_events: static (num_steps, events_per_step).
      mutation_rate: SELF-MODIFYING machines only — after each round,
        every cell is independently resampled uniformly over the
        alphabet with this probability (the background thermal noise
        of the computational-soup literature; effective flip rate is
        ``mutation_rate * (1 - 1/size_a)``). The per-round kernel is
        then exactly ``M(q) @ (I + Q/L)`` with M the product of
        single-site resampling matrices — gateable against the master
        equation with no discretisation allowance (`tests/test_bff.py`).
        Must be a concrete Python float; the rate is a traced operand
        (one compile covers a whole sweep) while only the on/off state
        is static, keeping mutation_rate=0 bit-identical to the
        streams the committed artifacts used.
      prov: SELF-MODIFYING machines only — optional [B, L] int32
        LINEAGE ring threaded through execution (see :func:`bff_fire`:
        copies carry the source cell's provenance id, point mutations
        keep it, background mutation stamps -1 "de novo"). The content
        trajectory is bit-identical with or without it. When given,
        the returned tape is ``(tape, prov)``.
      engine: ``"auto"`` (default) runs the bit-sliced boolean-circuit
        interpreter (`bff_bitslice`, 32 members per int32 lane) when
        the call is eligible — B % 32 == 0, common random sites, no
        mutation, no lineage, and (on the CPU backend only) a circuit
        within `bff_bitslice.CPU_MAX_CIRCUIT_OPS` — and the int8
        select-cascade scan otherwise; the two paths are BIT-IDENTICAL
        in tapes and op totals at the same key
        (`tests/test_bff_bitslice.py`; the faithful rule's identity is
        gated on TPU by `bench.py`). ``"scan"`` / ``"bitslice"`` force
        a path (the latter raises on ineligible calls and ignores the
        CPU circuit-size limit).

    Returns:
      ((ptape, dtape), (op_totals [num_steps, size_a] int64 executed
      opcodes per round, times [num_steps] cumulative)) — a single
      tape (or ``(tape, prov)`` with lineage) in place of the pair for
      self-modifying machines.
    """
    mu = float(mutation_rate)
    if (mu or prov is not None) and not mach.self_modifying:
        raise ValueError(
            "mutation_rate / prov are only defined for self-modifying "
            "machines (the two-tape rule's program ring is read-only "
            "by construction; mutating it would break the "
            "conditioned-on-program oracle semantics)")
    if mach.self_modifying:
        ts = (tapes,) if prov is None else (tapes, prov)
    else:
        ts = tuple(tapes)
    if engine not in ("auto", "scan", "bitslice"):
        raise ValueError(f"unknown engine {engine!r}; "
                         "expected 'auto', 'scan' or 'bitslice'")
    if engine != "scan":
        from . import bff_bitslice as bbs

        eligible = bbs.bff_bitslice_eligible(
            mach, ts[0].shape[0], independent_sites=independent_sites,
            mutation_rate=mu, lineage=prov is not None)
        if engine == "bitslice" and not eligible:
            raise ValueError(
                "engine='bitslice' needs B % 32 == 0, common random "
                "sites, mutation_rate=0 and no lineage ring "
                f"(got B={ts[0].shape[0]}, independent_sites="
                f"{independent_sites}, mutation_rate={mu}, "
                f"lineage={prov is not None})")
        if eligible and engine == "auto":
            # XLA:CPU's per-fusion LLVM codegen blows up on the big
            # circuits (the faithful rule's 7.9k-op round compiles in
            # ~25 s on TPU but >9 MINUTES on the CPU backend, measured
            # round-3 — fusion duplication shreds the hash-consed
            # sharing into ~300k HLO ops / 300+ LLVM kernels; barriers
            # don't help). auto therefore keeps the scan on CPU unless
            # the circuit is CI-small; `engine="bitslice"` overrides.
            eligible = (jax.default_backend() != "cpu"
                        or len(bbs.compile_bff_circuit(mach)[0])
                        <= bbs.CPU_MAX_CIRCUIT_OPS)
        if eligible:
            out, aux = bbs.run_ensemble_bff_bitsliced(
                key, ts, mach, steps_events)
            if mach.self_modifying:
                return out[0], aux
            return out, aux
    out, aux = _run_ensemble_bff(
        key, ts, mach, steps_events, jnp.float64(mu),
        independent_sites=independent_sites, mutate_on=bool(mu),
        lineage=prov is not None)
    if mach.self_modifying and prov is None:
        return out[0], aux
    return out, aux


@partial(jax.jit, static_argnums=(2, 3),
         static_argnames=("independent_sites", "mutate_on", "lineage"))
def _run_ensemble_bff(key, ts, mach, steps_events, mutation_rate, *,
                      independent_sites, mutate_on, lineage=False):
    """Shared scan body of :func:`run_ensemble_bff`: ``ts`` is a tuple
    of ring tapes — (ptape, dtape) for two-tape machines, (tape,) or
    (tape, prov) for self-modifying ones — so the phase/roll
    bookkeeping and time calibration exist exactly once."""
    num_steps, events = steps_events
    B, L = ts[0].shape
    _check_round_geometry(L, events, mach.span)
    keys = jax.random.split(key, num_steps)

    def apply_round(ts, shift):
        if mach.self_modifying:
            if lineage:
                t_, p_, ops = apply_bff_self_round(
                    mach, ts[0], shift, events=events,
                    want_op_counts=True, prov=ts[1])
                return (t_, p_), ops
            t_, ops = apply_bff_self_round(mach, ts[0], shift,
                                           events=events,
                                           want_op_counts=True)
            return (t_,), ops
        pt, dt_, ops = apply_bff_round(mach, ts[0], ts[1], shift,
                                       events=events,
                                       want_op_counts=True)
        return (pt, dt_), ops

    def step(carry, k):
        ts, phase = carry
        if mutate_on:
            # Split only when mutating so mutation_rate=0 stays
            # bit-identical to the stream the committed artifacts used.
            k, km = jax.random.split(k)
        if independent_sites:
            # Per-member phase, kept rolled across rounds (one delta
            # gather per tape per round; unroll once after the scan) —
            # the same trick as `run_ensemble`.
            shifts = jax.random.randint(k, (B,), 0, L, dtype=jnp.int32)
            delta = (shifts - phase) % L
            ts = tuple(_roll_rows(t, delta) for t in ts)
            ts, ops = apply_round(ts, jnp.int32(0))
            phase = shifts
        else:
            shift = jax.random.randint(k, (), 0, L, dtype=jnp.int32)
            ts, ops = apply_round(ts, shift)
        if mutate_on:
            # Uniform resampling AFTER the round's rule events: each
            # cell independently replaced with a uniform symbol with
            # probability mutation_rate (so the exact per-round kernel
            # composes as M(q) @ (I + Q/L), in that order). A mutated
            # cell's lineage breaks: its provenance becomes -1.
            ku, kv = jax.random.split(km)
            hit = jax.random.uniform(ku, (B, L)) < mutation_rate
            vals = jax.random.randint(kv, (B, L), 0, mach.size_a,
                                      dtype=jnp.int32)
            new_t = jnp.where(hit, vals.astype(ts[0].dtype), ts[0])
            ts = ((new_t, jnp.where(hit, jnp.int32(-1), ts[1]))
                  if lineage else (new_t,))
        return (ts, phase), ops

    # The phase carry derives its (always-zero) value from the key so
    # its type is device-varying under shard_map — a literal zeros()
    # is cross-device invariant and the scan body's key-derived phase
    # update then fails the carry type check (scan-vma). Unsharded
    # streams are bit-identical: the added term is exactly 0.
    phase0 = (jnp.zeros((B,), jnp.int32)
              + (keys[0].sum() * 0).astype(jnp.int32))
    # Symbol tapes run the scan as int8 (alphabet < 12 fits exactly):
    # the round loop is HBM-bound on the per-step window rewrites, so
    # the narrower dtype cuts its dominant traffic 4x (measured 2026-
    # 08-20, RESULTS.md "bff interpreter"); `bff_fire` preserves the
    # cell dtype throughout, and the int32 API reappears below. The
    # lineage ring (self+prov mode) must STAY int32 — provenance ids
    # range over B*L.
    if mach.size_a > 127:
        raise ValueError(
            f"BFF scan int8 fast path requires size_a <= 127 "
            f"(got {mach.size_a}); symbols would wrap silently")
    is_prov = lambda j: lineage and j == len(ts) - 1
    carry = (tuple(jnp.asarray(t).astype(
                 jnp.int32 if is_prov(j) else jnp.int8)
                 for j, t in enumerate(ts)),
             phase0)
    (ts, phase), op_totals = jax.lax.scan(step, carry, keys)
    if independent_sites:
        ts = tuple(_roll_rows(t, -phase) for t in ts)
    ts = tuple(t.astype(jnp.int32) for t in ts)
    dt_round = -jnp.log1p(-events / L)
    times = dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)
    return ts, (op_totals, times)
