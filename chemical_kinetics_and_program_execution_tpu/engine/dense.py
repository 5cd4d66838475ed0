"""Dense transfer-matrix RHS engine — the TPU-native window sweep.

The reference's accumulation recursion `lr-rec-extend-1`
(`tape_multiverse.scm:1249-1401`) walks, for every terminal world, every
length-cl_k reading frame overlapping a changed cell, weighting each
probabilistic extension by a marginal ratio and scatter-adding ±weight at
the original/adjusted window ranks. Materialised naively that is millions
of gather/scatter events per RHS call (ex4 cl_k=5: 11.8M) — pathological
on TPU, where scatters serialise.

This module exploits three structural facts to make the sweep *dense*:

1. **The ratio tables are dense reshapes of the marginal pyramid.** Every
   factor the recursion uses is one of
       left-extend/shift:  R_le[j][f] = g(lv[j][f],   lv[j-1][f mod A^(j-1)])
       right-extend:       R_re[w]    = g(lv[k][w],   lv[k-1][w div A])
   with ``g(n, d) = n > 0 ? n / max(n, d) : 0`` (the reference's noise
   guard, `tape_multiverse.scm:560-562, 1263-1269`) — computed for ALL
   indices at once as a tile/repeat + elementwise divide. No gathers.

2. **The sweep is a transfer-matrix contraction.** For one revealed-window
   signature, the set of weights over all frames at a given sweep position
   is a vector U over window ranks; one sweep step is
   ``U' = (reshape-sum drop the exited digit) · R`` — a dense broadcast
   multiply plus an axis reduction. Frames inconsistent with the revealed
   digits carry exactly 0 and propagate 0, so full-size dense vectors give
   bit-exact sparse semantics.

3. **The ±scatter is a constant shift.** An emission subtracts U at the
   original window rank and adds it at the adjusted rank; the two differ
   by substituting fixed adjusted digits at fixed positions — a constant
   rank offset Δ on the whole support. Hence
   ``dy ± : dy - U + roll(U, Δ)`` — two dense vector ops, no scatter.

The per-problem "program" is a tiny list of per-signature
:class:`SigPlan` objects (tens of entries); the runtime is a few hundred
fused elementwise ops over [A^k] vectors. Event tables, gathers, and
segment-sums are gone entirely; compile time drops from minutes (11.8M
event expansion) to milliseconds.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..markov import (
    guarded_ratio,
    guarded_ratio_prod,
    pyramid,
    pyramid_offsets,
)
from . import dsl, enumerate as enum_mod

# State size above which lane-hostile emissions (trailing axis < one
# 128-lane tile) switch from 3-D sub-slice adds to flat masked rolls —
# see the layout guard in `_apply_group.emit`.
_ROLL_EMIT_MIN_STATE = 1_000_000


@dataclasses.dataclass(frozen=True)
class SigPlan:
    """Static sweep metadata for one revealed-window signature."""

    sid: int  # index into the signature-weight vector
    length: int  # revealed length L0
    orig: tuple[int, ...]  # revealed original digits (left→right)
    adj: tuple[int, ...]  # adjusted digits
    tape: int = 0  # dual-SPD mode: which tape's pyramid/dy half (0=prog)


@dataclasses.dataclass
class DenseProgram:
    tag: str
    size_a: int
    cl_k: int
    pyramid_size: int
    num_signatures: int
    # Stage 1-2: per-world factor chains (tiny: tens to hundreds of rows).
    w_num: np.ndarray
    w_den: np.ndarray
    w_const: np.ndarray
    pair_world: np.ndarray
    pair_sig: np.ndarray
    plans: tuple[SigPlan, ...]
    # Mass accounting over ALL enumerated worlds (incl. no-change ones):
    # Σ weights == 1 for a complete multiverse; < 1 when pruned.
    m_num: np.ndarray | None = None
    m_den: np.ndarray | None = None
    m_const: np.ndarray | None = None
    pruned: bool = False
    # Dual-SPD mode (`compile_dense_dual`): separate program/data tape
    # distributions; the state is [p_prog | p_data] and factor indices
    # were offset into the concatenated per-tape pyramid.
    dual: bool = False

    @property
    def state_size(self) -> int:
        n = self.size_a**self.cl_k
        return 2 * n if self.dual else n

    @property
    def num_worlds(self) -> int:
        return len(self.w_const)

    def summary(self) -> str:
        return (
            f"{self.tag}[A={self.size_a},k={self.cl_k}]: "
            f"{self.num_worlds} worlds, {self.num_signatures} signatures "
            f"(dense transfer-matrix program)"
        )


def _digits(x: int, n: int, a: int) -> tuple[int, ...]:
    return tuple((x // a**i) % a for i in range(n - 1, -1, -1))


def _rank(digits, a: int) -> int:
    r = 0
    for d in digits:
        r = r * a + d
    return r


def compile_dense(tag: str, cl_k: int, *,
                  max_worlds: int | None = None,
                  p_ref=None, prune_threshold: float = 0.0) -> DenseProgram:
    """Compiles a problem to its dense transfer-matrix program.

    For rules whose multiverse is too deep to enumerate exactly
    (ex6-mini-bff at faithful parameters), pass a reference distribution
    ``p_ref`` and a ``prune_threshold``: execution paths whose weight
    under ``p_ref`` drops below the threshold are skipped (bounding
    enumeration), kept paths stay exact, and the resulting program
    carries mass-accounting tables so the runtime kernel can report the
    *measured* un-enumerated mass ``1 - Σ live weights(p)`` per call
    (north-star "frontier expansion with top-k pruning", exact flavour).
    """
    problem = dsl.get_problem(tag)
    size_a = problem.size_a
    _, pyr_total = pyramid_offsets(size_a, cl_k)
    one_slot = pyr_total - 1

    guide = None
    if prune_threshold > 0.0:
        if p_ref is None:
            p_ref = np.full(size_a**cl_k, 1.0 / size_a**cl_k)
        guide = enum_mod.BeamGuide(p_ref, size_a, cl_k, prune_threshold)
    worlds = enum_mod.enumerate_worlds(problem, cl_k,
                                       max_worlds=max_worlds, guide=guide)
    from .compile import _pad_chains, collect_signatures

    live, sig_ids, pair_world, pair_sig = collect_signatures(worlds)

    w_num, w_den = _pad_chains([w.factors for w in live], one_slot)
    w_const = np.array([w.const for w in live], dtype=np.float64)

    plans = tuple(
        SigPlan(
            sid=sid,
            length=length,
            orig=_digits(io, length, size_a),
            adj=_digits(ia, length, size_a),
        )
        for (io, ia, length), sid in sig_ids.items()
    )
    m_num = m_den = m_const = None
    if guide is not None:
        m_num, m_den = _pad_chains([w.factors for w in worlds], one_slot)
        m_const = np.array([w.const for w in worlds], dtype=np.float64)
    return DenseProgram(
        tag=tag,
        size_a=size_a,
        cl_k=cl_k,
        pyramid_size=pyr_total,
        num_signatures=len(sig_ids),
        w_num=w_num,
        w_den=w_den,
        w_const=w_const,
        pair_world=np.asarray(pair_world, dtype=np.int32),
        pair_sig=np.asarray(pair_sig, dtype=np.int32),
        plans=plans,
        m_num=m_num,
        m_den=m_den,
        m_const=m_const,
        pruned=guide is not None,
    )


def compile_dense_dual(tag: str, cl_k: int, *,
                       max_worlds: int | None = None) -> DenseProgram:
    """Dense program with SEPARATE program/data tape SPDs.

    Same generalization as `compile.compile_problem_dual` (the reference
    shares one distribution between both tapes,
    `tape_multiverse.scm:441-442, 1424-1443`): world factor chains are
    offset into a per-tape concatenated pyramid, and each signature plan
    carries its tape so the sweep uses that tape's ratio tables and
    emits into that tape's dy/dt half. Exact consistency oracle at
    p_prog == p_data is tested in `tests/test_dual.py`.
    """
    problem = dsl.get_problem(tag)
    size_a = problem.size_a
    _, pyr_total = pyramid_offsets(size_a, cl_k)
    half = pyr_total - 1
    one_slot = 2 * half

    worlds = enum_mod.enumerate_worlds(problem, cl_k,
                                       max_worlds=max_worlds)
    from .compile import collect_signatures_dual

    (live, sig_ids, pair_world, pair_sig,
     w_num, w_den, w_const) = collect_signatures_dual(
        tag, worlds, half, one_slot)

    plans = tuple(
        SigPlan(
            sid=sid,
            length=length,
            orig=_digits(io, length, size_a),
            adj=_digits(ia, length, size_a),
            tape=ti,
        )
        for ((ti, (io, ia, length)), sid) in sig_ids.items()
    )
    return DenseProgram(
        tag=tag,
        size_a=size_a,
        cl_k=cl_k,
        pyramid_size=one_slot + 1,
        num_signatures=len(sig_ids),
        w_num=w_num,
        w_den=w_den,
        w_const=w_const,
        pair_world=np.asarray(pair_world, dtype=np.int32),
        pair_sig=np.asarray(pair_sig, dtype=np.int32),
        plans=plans,
        dual=True,
    )


def _emit_sub_ranks(plan: SigPlan, s0: int, k: int, a: int
                    ) -> tuple[int, int]:
    """(orig, adj) ranks of the revealed digit run inside the window
    starting at tape cell ``s0``."""
    q_lo = max(0, s0)
    q_hi = min(plan.length - 1, s0 + k - 1)
    return (_rank(plan.orig[q_lo:q_hi + 1], a),
            _rank(plan.adj[q_lo:q_hi + 1], a))


def _sweep_meta(l0: int, changed: tuple[int, ...], k: int
                ) -> tuple[int, int, list[int]]:
    """(m_l, m_r, emission window starts) for one (L0, changed) shape."""
    base = min(l0, k)
    m_l = base - 1 - changed[0]
    m_r = k - l0 + changed[-1]
    s0s = [base - k - m for m in range(0, m_l + 1)]
    s0s += [l0 + m - k for m in range(1, m_r + 1)]
    return m_l, m_r, s0s


def _group_plans(plans, a: int, k: int):
    """Groups signatures that can share one sweep.

    Signatures with the same (revealed length, changed positions) walk
    identical sweep schedules, and their weight tensors can share the
    dense transfer steps because their supports are disjoint slices.
    The one hazard: at an emission step, two members whose *in-window*
    original digits coincide would mix mass in the extraction slice —
    allowed only if their adjusted digits coincide too (then it is one
    merged emission); otherwise they are split into separate groups.
    """
    from collections import defaultdict

    by_key = defaultdict(list)
    for p in plans:
        ch = tuple(q for q in range(p.length) if p.orig[q] != p.adj[q])
        # Dual-SPD plans additionally key on the tape: members of one
        # group share ratio tables and a dy/dt half.
        by_key[(p.tape, p.length, ch)].append(p)

    groups = []
    for (_, l0, ch), members in by_key.items():
        _, _, s0s = _sweep_meta(l0, ch, k)
        placed: list[dict] = []
        for p in members:
            subs = [_emit_sub_ranks(p, s0, k, a) for s0 in s0s]
            for g in placed:
                if all(g["maps"][i].get(o_s, a_s) == a_s
                       for i, (o_s, a_s) in enumerate(subs)):
                    g["members"].append(p)
                    for i, (o_s, a_s) in enumerate(subs):
                        g["maps"][i][o_s] = a_s
                    break
            else:
                placed.append({
                    "members": [p],
                    "maps": [{o_s: a_s} for (o_s, a_s) in subs],
                })
        for g in placed:
            groups.append((l0, ch, tuple(g["members"])))
    return groups


def _apply_group(dy, l0, changed, members, w_vec, r_le, r_re,
                 a: int, k: int, dtype):
    """Adds one signature group's shared window sweep into ``dy``.

    Mirrors the control structure of `accumulate.Expander` /
    `lr-rec-extend-1`: left-extend the frame to length k (phase A),
    emit + left-shift while a changed cell stays in frame (phase C),
    and right-extend from every (k-1)-context while a changed cell
    stays in context (phase B) — one dense sweep for the whole group
    (supports are disjoint and transfer steps are linear), with
    per-member ±emissions as static sub-slice gathers/scatter-adds.
    """
    m_l, m_r, _ = _sweep_meta(l0, changed, k)
    base = min(l0, k)

    def emit(dy, t, s0):
        q_lo = max(0, s0)
        q_hi = min(l0 - 1, s0 + k - 1)
        c_lo = q_lo - s0  # window coord of the revealed-run start
        run = q_hi - q_lo + 1
        hi = a**c_lo
        lo = a ** (k - c_lo - run)
        # Unique (orig, adj) run ranks: members merged by _group_plans
        # share their whole emission, so one slice moves their sum.
        pairs = sorted({_emit_sub_ranks(m, s0, k, a) for m in members})
        if a**k >= _ROLL_EMIT_MIN_STATE:
            # Large-state layout guard: the 3-D sub-slice form below
            # materialises [hi, A^run, lo] temporaries whose trailing
            # axis is (8,128)-tile padded — at lo ∈ {1, a} that is a
            # ~14x HBM expansion per emission, which is what broke the
            # ex4 cl_k=7 stepper (16 GB OOM, overlays-dominated), and
            # measured 2-5x slower than a flat masked roll at EVERY lo
            # on the 43M-dim cl_k=8 state (probes/clk8_rhs_decompose.py,
            # round 5). Emit with flat masked rolls instead: the run
            # digits of each support are selected by an iota comparison
            # and moved by a constant rank offset — all 1-D [A^k] ops,
            # no padding. Supports are disjoint, so pairs sharing one
            # rank delta OR their masks and ride a single roll (round-5
            # measurement: 14.4 -> 5.7 ms per 4-pair emission).
            dig = (jax.lax.iota(jnp.int32, a**k) // lo) % (a**run)
            by_delta: dict[int, list[int]] = {}
            for o_s, a_s in pairs:
                by_delta.setdefault(a_s - o_s, []).append(o_s)
            for d, os_ in sorted(by_delta.items()):
                m0 = dig == os_[0]
                for o in os_[1:]:
                    m0 = m0 | (dig == o)
                sub = jnp.where(m0, t, jnp.zeros((), dtype))
                dy = dy - sub + jnp.roll(sub, d * lo)
            return dy
        o_subs = np.array([x[0] for x in pairs])
        a_subs = np.array([x[1] for x in pairs])
        t3 = t.reshape(hi, a**run, lo)
        sub = t3[:, o_subs, :]
        d3 = dy.reshape(hi, a**run, lo)
        d3 = d3.at[:, o_subs, :].add(-sub).at[:, a_subs, :].add(sub)
        return d3.reshape(-1)

    def onehot_sum(size, ranks):
        return jnp.zeros(size, dtype).at[np.array(ranks)].add(w_vec)

    if l0 <= k:
        if l0 <= k - 1:
            v = onehot_sum(a**l0, [_rank(m.orig, a) for m in members])
            for j in range(l0 + 1, k):
                v = r_le[j] * jnp.tile(v, a)
            ctx = v  # [A^(k-1)] right-sweep start (all k-1 frames)
            uk = r_le[k] * jnp.tile(v, a)
        else:  # l0 == k
            uk = onehot_sum(a**k, [_rank(m.orig, a) for m in members])
            ctx = onehot_sum(a ** (k - 1),
                             [_rank(m.orig[1:], a) for m in members])
    else:  # l0 > k: revealed region longer than the frame
        # Interior emissions at fully revealed windows (no factors),
        # `tape_multiverse.scm` ln>cl_k branch. Duplicate ranks are fine:
        # each member scatters its own weight.
        for j in range(1, l0 - k + 1):
            if any(j <= q <= j + k - 1 for q in changed):
                o_r = np.array([_rank(m.orig[j:j + k], a) for m in members])
                a_r = np.array([_rank(m.adj[j:j + k], a) for m in members])
                dy = dy.at[o_r].add(-w_vec).at[a_r].add(w_vec)
        uk = onehot_sum(a**k, [_rank(m.orig[:k], a) for m in members])
        ctx = onehot_sum(a ** (k - 1),
                         [_rank(m.orig[l0 - k + 1:], a) for m in members])

    # Phase C: emit the length-k frame, then left-shift while changed.
    um = uk
    for m in range(0, m_l + 1):
        if m > 0:
            c = um.reshape(a ** (k - 1), a).sum(-1)
            um = r_le[k] * jnp.tile(c, a)
        dy = emit(dy, um, base - k - m)

    # Phase B: right-extend while a changed cell stays in context.
    n1 = a ** (k - 1)
    for m in range(1, m_r + 1):
        t = jnp.repeat(ctx, a) * r_re
        dy = emit(dy, t, l0 + m - k)
        if m < m_r:
            if a**k >= _ROLL_EMIT_MIN_STATE:
                # Leading-digit reduce as contiguous slice adds: the
                # [a, A^(k-1)] reshape-sum relayouts into (8,128)-tile
                # padded form at large state (measured ~10 ms/step
                # slower at cl_k=8, probes/clk8_rhs_decompose.py).
                c = t[:n1]
                for d in range(1, a):
                    c = c + t[d * n1:(d + 1) * n1]
                ctx = c
            else:
                ctx = t.reshape(a, n1).sum(0)
    return dy


def _levels(p, a: int, k: int):
    """Marginal levels lv[j] (first-j-symbols marginals) of one SPD."""
    lv = [None] * (k + 1)
    lv[k] = p
    for j in range(k - 1, -1, -1):
        lv[j] = lv[j + 1].reshape(a**j, a).sum(-1)
    return lv


def _ratio_tables(lv, a: int, k: int):
    """Dense guarded ratio tables, one per level, plus right-extend."""
    r_le = [None] * (k + 1)
    for j in range(1, k + 1):
        r_le[j] = guarded_ratio(lv[j], jnp.tile(lv[j - 1], a))
    r_re = guarded_ratio(lv[k], jnp.repeat(lv[k - 1], a))
    return r_le, r_re


def dy_dt_dense(prog: DenseProgram, tables, p: jax.Array) -> jax.Array:
    """Pure dense dy/dt: no gathers or scatters outside the tiny
    world-chain stage. For dual programs ``p`` is ``[p_prog | p_data]``
    and the result is the concatenated per-tape derivative."""
    w_num, w_den, w_const, pair_world, pair_sig = tables
    dtype = w_const.dtype
    a, k = prog.size_a, prog.cl_k
    p = p.astype(dtype).reshape(-1)

    if prog.dual:
        n = a**k
        per_tape = [_levels(p[:n], a, k), _levels(p[n:], a, k)]
        pyr = jnp.concatenate(
            [lv[j] for lv in per_tape for j in range(k, -1, -1)]
            + [jnp.ones(1, dtype)]
        )
    else:
        per_tape = [_levels(p, a, k)]
        pyr = jnp.concatenate(
            [per_tape[0][j] for j in range(k, -1, -1)]
            + [jnp.ones(1, dtype)]
        )

    # Stages 1-2: world weights -> signature weights (tiny).
    wv = w_const * guarded_ratio_prod(pyr, w_num, w_den)
    s = jax.ops.segment_sum(
        wv[pair_world], pair_sig, num_segments=prog.num_signatures
    )

    ratios = [_ratio_tables(lv, a, k) for lv in per_tape]
    dys = [jnp.zeros(a**k, dtype) for _ in per_tape]
    for l0, changed, members in _group_plans(prog.plans, a, k):
        ti = members[0].tape
        sids = jnp.asarray([m.sid for m in members], jnp.int32)
        r_le, r_re = ratios[ti]
        dys[ti] = _apply_group(dys[ti], l0, changed, members, s[sids],
                               r_le, r_re, a, k, dtype)
    return jnp.concatenate(dys) if prog.dual else dys[0]


def make_dense_dy_dt_streamed(prog: DenseProgram, dtype=jnp.float64):
    """Group-streamed dense RHS: one jit call per signature group, the
    accumulator DONATED between calls — caps peak HBM at a single
    group's working set.

    The one-fused-graph form (`make_dense_dy_dt`) holds many groups'
    sweep intermediates live at once; at ex4 cl_k=8 (43,046,721-dim
    f64 state) XLA's buffer assignment wants ~22 GB against 16 GB HBM
    and the compile fails (RESULTS "ex4 at cl_k=8"). Streaming trades
    ~1 host dispatch per group (groups are few: ex4 has 8) for a peak
    of [dy + ratio tables + one group's temporaries] ≈ 2.6 GB at
    cl_k=8 — measured per-group budgets in RESULTS (round 3), where
    this form gives the first single-chip cl_k=8 RHS.

    Returns ``fn(p) -> dy`` (host-loop function, NOT jittable as a
    whole — use inside host-stepped integrators) plus the list of
    per-group compiled callables' memory analyses via
    ``fn.group_memory`` after the first call. Single-tape programs
    only (the dual pair at this scale is off any single chip).
    """
    if prog.dual:
        raise ValueError("streamed RHS supports single-tape programs")
    a, k = prog.size_a, prog.cl_k
    tables = (
        jnp.asarray(prog.w_num, jnp.int32),
        jnp.asarray(prog.w_den, jnp.int32),
        jnp.asarray(prog.w_const, dtype),
        jnp.asarray(prog.pair_world, jnp.int32),
        jnp.asarray(prog.pair_sig, jnp.int32),
    )

    @jax.jit
    def prep(p):
        w_num, w_den, w_const, pair_world, pair_sig = tables
        p = p.astype(dtype).reshape(-1)
        lv = _levels(p, a, k)
        pyr = jnp.concatenate(
            [lv[j] for j in range(k, -1, -1)] + [jnp.ones(1, dtype)])
        wv = w_const * guarded_ratio_prod(pyr, w_num, w_den)
        s = jax.ops.segment_sum(wv[pair_world], pair_sig,
                                num_segments=prog.num_signatures)
        r_le, r_re = _ratio_tables(lv, a, k)
        return s, tuple(r_le[1:]), r_re

    group_fns = []
    for l0, changed, members in _group_plans(prog.plans, a, k):
        sids = jnp.asarray([m.sid for m in members], jnp.int32)

        def gfn(dy, s, rle, rre, *, _l0=l0, _ch=changed, _ms=members,
                _sids=sids):
            r_le = [None] + list(rle)
            return _apply_group(dy, _l0, _ch, _ms, s[_sids], r_le,
                                rre, a, k, dtype)

        group_fns.append(jax.jit(gfn, donate_argnums=0))

    def fn(p):
        s, rle, rre = prep(p)
        dy = jnp.zeros(a**k, dtype)
        for g in group_fns:
            dy = g(dy, s, rle, rre)
        return dy

    fn.group_fns = group_fns
    fn.prep = prep
    return fn


def make_dense_dy_dt(prog: DenseProgram, dtype=jnp.float64, jit=True,
                     with_mass: bool = False):
    """Builds a jitted ``p -> dp/dt`` closure from a dense program.

    ``with_mass=True`` (pruned programs) returns ``p -> (dp/dt, mass)``
    where ``mass`` is the total weight of the enumerated worlds under
    ``p`` — exactly 1 for a complete multiverse, so ``1 - mass`` is the
    measured weight loss of the pruning at this ``p``.
    """
    tables = (
        jnp.asarray(prog.w_num, jnp.int32),
        jnp.asarray(prog.w_den, jnp.int32),
        jnp.asarray(prog.w_const, dtype),
        jnp.asarray(prog.pair_world, jnp.int32),
        jnp.asarray(prog.pair_sig, jnp.int32),
    )
    if not with_mass:
        fn = partial(dy_dt_dense, prog, tables)
        return jax.jit(fn) if jit else fn
    if prog.m_num is None:
        raise ValueError(
            "Program has no mass tables; compile with prune_threshold>0."
        )
    m_num = jnp.asarray(prog.m_num, jnp.int32)
    m_den = jnp.asarray(prog.m_den, jnp.int32)
    m_const = jnp.asarray(prog.m_const, dtype)

    def fn(p):
        dy = dy_dt_dense(prog, tables, p)
        pyr = pyramid(p.astype(dtype).reshape(-1), prog.size_a, prog.cl_k)
        mass = jnp.sum(m_const * guarded_ratio_prod(pyr, m_num, m_den))
        return dy, mass

    return jax.jit(fn) if jit else fn
