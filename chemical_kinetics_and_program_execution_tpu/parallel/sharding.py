"""Sharded dy/dt: event tables split across devices, psum over ICI.

The compiled event axis (`compile.py`) is embarrassingly shardable: each
device holds a contiguous slice of the event tables, computes a partial
dy/dt over its slice, and the full derivative is a `psum` over the "ev"
mesh axis. Worlds/signatures (stages 1–2) are tiny and replicated. The
ensemble axis ("batch") shards independent SPD vectors.

This is the TPU-native replacement for a distributed communication backend
the reference never had (SURVEY §5.8): a single-controller JAX program over
a `jax.sharding.Mesh` with XLA collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..markov import guarded_ratio_prod as _ratio_prod
from ..markov import pyramid
from ..engine.compile import CompiledProblem

try:  # JAX >= 0.6 exposes shard_map at top level.
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@dataclasses.dataclass
class ShardedTables:
    """Per-device event-table slices, stacked along a leading shard axis."""

    size_a: int
    cl_k: int
    num_signatures: int
    state_size: int
    # Replicated (small).
    w_num: np.ndarray
    w_den: np.ndarray
    w_const: np.ndarray
    pair_world: np.ndarray
    pair_sig: np.ndarray
    # Sharded: leading axis = shard index.
    e_num: np.ndarray  # [n, Eloc, Le]
    e_den: np.ndarray
    e_sig: np.ndarray  # [n, Eloc]
    ev_idx: np.ndarray  # [n, 2*Eloc]
    ev_sign: np.ndarray
    ev_tgt: np.ndarray


def shard_event_tables(compiled: CompiledProblem,
                       num_shards: int) -> ShardedTables:
    """Splits the event axis into ``num_shards`` contiguous padded slices,
    rebuilding each slice's pre-sorted signed scatter locally."""
    E = compiled.num_events
    e_loc = -(-max(E, 1) // num_shards)
    one_slot = compiled.pyramid_size - 1
    le = compiled.e_num.shape[1]

    e_num = np.full((num_shards, e_loc, le), one_slot, np.int32)
    e_den = np.full((num_shards, e_loc, le), one_slot, np.int32)
    e_sig = np.zeros((num_shards, e_loc), np.int32)
    ev_idx = np.zeros((num_shards, 2 * e_loc), np.int32)
    ev_sign = np.zeros((num_shards, 2 * e_loc), np.float64)
    ev_tgt = np.zeros((num_shards, 2 * e_loc), np.int32)

    # Recover per-event (minus, plus) targets from the global sorted scatter.
    tgt_adj = np.zeros(E, np.int64)
    tgt_orig = np.zeros(E, np.int64)
    plus_mask = compiled.ev_sign > 0
    tgt_adj[compiled.ev_idx[plus_mask]] = compiled.ev_tgt[plus_mask]
    tgt_orig[compiled.ev_idx[~plus_mask]] = compiled.ev_tgt[~plus_mask]

    for s in range(num_shards):
        lo, hi = s * e_loc, min((s + 1) * e_loc, E)
        n = hi - lo
        if n <= 0:
            continue
        e_num[s, :n] = compiled.e_num[lo:hi]
        e_den[s, :n] = compiled.e_den[lo:hi]
        e_sig[s, :n] = compiled.e_sig[lo:hi]
        loc_tgt = np.concatenate([tgt_adj[lo:hi], tgt_orig[lo:hi]])
        loc_sign = np.concatenate([np.ones(n), -np.ones(n)])
        loc_idx = np.concatenate([np.arange(n), np.arange(n)])
        order = np.argsort(loc_tgt, kind="stable")
        ev_idx[s, : 2 * n] = loc_idx[order]
        ev_sign[s, : 2 * n] = loc_sign[order]
        ev_tgt[s, : 2 * n] = loc_tgt[order]
        # Padding rows keep sign 0 → contribute nothing.

    return ShardedTables(
        size_a=compiled.size_a,
        cl_k=compiled.cl_k,
        num_signatures=compiled.num_signatures,
        state_size=compiled.state_size,
        w_num=compiled.w_num,
        w_den=compiled.w_den,
        w_const=compiled.w_const,
        pair_world=compiled.pair_world,
        pair_sig=compiled.pair_sig,
        e_num=e_num,
        e_den=e_den,
        e_sig=e_sig,
        ev_idx=ev_idx,
        ev_sign=ev_sign,
        ev_tgt=ev_tgt,
    )


def make_sharded_dy_dt(compiled: CompiledProblem, mesh: jax.sharding.Mesh,
                       dtype=jnp.float64):
    """Builds ``p_batch -> dp/dt_batch`` over a ("batch", "ev") mesh.

    ``p_batch`` has shape ``[B, A**k]`` with ``B`` divisible by the batch
    axis size; event tables are sharded over the "ev" axis and partial
    derivatives `psum`-reduced.
    """
    from ..engine.compile import CompiledDualProblem

    if isinstance(compiled, CompiledDualProblem):
        raise ValueError(
            "make_sharded_dy_dt shards the single-SPD event tables; "
            "dual-SPD programs build one shared pyramid per tape and are "
            "not supported here. Use make_sharded_dense_dy_dt with a "
            "dense dual program (engine.dense.compile_dense_dual) for "
            "state-axis sharding, or the unsharded dual kernels."
        )
    n_ev = mesh.shape["ev"]
    st = shard_event_tables(compiled, n_ev)

    repl = {
        "w_num": jnp.asarray(st.w_num),
        "w_den": jnp.asarray(st.w_den),
        "w_const": jnp.asarray(st.w_const, dtype),
        "pair_world": jnp.asarray(st.pair_world),
        "pair_sig": jnp.asarray(st.pair_sig),
    }
    shrd = {
        "e_num": jnp.asarray(st.e_num),
        "e_den": jnp.asarray(st.e_den),
        "e_sig": jnp.asarray(st.e_sig),
        "ev_idx": jnp.asarray(st.ev_idx),
        "ev_sign": jnp.asarray(st.ev_sign, dtype),
        "ev_tgt": jnp.asarray(st.ev_tgt),
    }

    def one_p(p, repl, shrd):
        pyr = pyramid(p.astype(dtype), st.size_a, st.cl_k)
        w = repl["w_const"] * _ratio_prod(pyr, repl["w_num"], repl["w_den"])
        s = jax.ops.segment_sum(
            w[repl["pair_world"]], repl["pair_sig"],
            num_segments=st.num_signatures,
        )
        v = s[shrd["e_sig"]] * _ratio_prod(pyr, shrd["e_num"], shrd["e_den"])
        signed = v[shrd["ev_idx"]] * shrd["ev_sign"]
        dy_part = jax.ops.segment_sum(
            signed, shrd["ev_tgt"], num_segments=st.state_size,
            indices_are_sorted=True,
        )
        return jax.lax.psum(dy_part, "ev")

    def local_fn(p_local, repl, shrd):
        # shard_map gives the local "ev" slice with a leading length-1 axis.
        shrd = {k: v[0] for k, v in shrd.items()}
        return jax.vmap(lambda p: one_p(p, repl, shrd))(p_local)

    shrd_specs = {k: P("ev") for k in shrd}
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("batch"), P(), shrd_specs),
        out_specs=P("batch"),
    )
    return jax.jit(lambda p_batch: fn(p_batch, repl, shrd))


def make_sharded_dense_dy_dt(prog, mesh: jax.sharding.Mesh,
                             dtype=jnp.float64):
    """Dense-engine dy/dt with the **window-rank (state) axis sharded**.

    ``p_batch`` has shape ``[B, A**k]``; the batch axis is data-parallel
    over the mesh's "batch" axis and the state axis is sharded over "ev"
    (SURVEY §5.7: partitioning the window-rank dimension and its marginal
    pyramid). The dense transfer-matrix kernel is pure reshapes,
    reductions, rolls, and elementwise ops, so GSPMD partitions it
    automatically: rolls lower to collective-permutes over ICI, marginal
    reductions to all-reduces — no hand-written collectives needed. This
    is the path to state sizes beyond one device's HBM (ex4var2:
    A=10, k=5 -> 100,000-dim state).

    Non-divisible geometries (e.g. ex5's 3125-dim state on 8 devices)
    are padded to the next shardable size: the jitted program's in/out
    arrays carry ``ceil(S/n)*n`` columns (zero tail), so the state axis
    ALWAYS shards — never a silent replication fallback. The returned
    callable accepts and returns the exact ``[B, S]`` shape (padding and
    slicing at the boundary); callers that want to keep the carry
    device-resident in the padded layout can pass ``[B, padded_size]``
    directly (the ``padded_size`` attribute on the returned function).
    """
    from ..engine import dense as dense_mod

    fn = dense_mod.make_dense_dy_dt(prog, dtype=dtype, jit=False)
    n_state = mesh.shape["ev"]
    S = prog.state_size
    s_pad = -(-S // n_state) * n_state
    sharding = jax.sharding.NamedSharding(mesh, P("batch", "ev"))
    if s_pad == S:
        core = jax.jit(
            jax.vmap(fn), in_shardings=sharding, out_shardings=sharding
        )

        def wrapper0(p_batch):
            # device_put is a no-op when the layout already matches;
            # see the mismatched-committed-sharding note below.
            return core(jax.device_put(jnp.asarray(p_batch), sharding))

        wrapper0.padded_size = S
        return wrapper0

    @partial(jax.jit, in_shardings=sharding, out_shardings=sharding)
    def padded(p_pad):
        dy = jax.vmap(fn)(p_pad[:, :S])
        return jnp.pad(dy, ((0, 0), (0, s_pad - S)))

    def wrapper(p_batch):
        p_batch = jnp.asarray(p_batch)
        if p_batch.shape[-1] == s_pad:
            return padded(p_batch)
        if p_batch.shape[-1] != S:
            raise ValueError(
                f"state axis {p_batch.shape[-1]} matches neither "
                f"state_size={S} nor padded_size={s_pad}"
            )
        # device_put, not bare pad: inputs derived from previous
        # sharded OUTPUTS (RK stages, host-stepped trajectories) carry
        # a committed sharding that jnp.pad propagates as replicated,
        # and jit with explicit in_shardings REJECTS a mismatched
        # committed layout rather than resharding (round 3: the cl_k=5
        # sharded RK trajectory test). Explicit placement makes any
        # input layout acceptable at the cost XLA would pay anyway.
        return padded(jax.device_put(
            jnp.pad(p_batch, ((0, 0), (0, s_pad - S))),
            sharding))[:, :S]

    wrapper.padded_size = s_pad
    return wrapper


def make_sharded_dense_dy_dt_streamed(prog, mesh: jax.sharding.Mesh,
                                      dtype=jnp.float64):
    """Group-STREAMED dense RHS with the state axis sharded — the
    composition of the two cl_k=8 mechanisms (round-4 verdict #8).

    `dense.make_dense_dy_dt_streamed` crosses the single-chip HBM wall
    by evaluating one signature group per jit call with the accumulator
    donated; `make_sharded_dense_dy_dt` crosses it by GSPMD-splitting
    the window-rank axis over the mesh. This composes them: each
    per-group call is itself a sharded program (state axis split over
    EVERY mesh device, accumulator donated between calls), so a future
    k9-class state can both stream groups AND spread each group's
    working set over a slice. The flat state vector is padded to the
    next multiple of the device count (zero tail) so the state axis
    always shards; full-size ratio tables (levels k and the
    right-extend table) are padded+sharded alongside, smaller pyramid
    levels stay replicated (≤ 1/A of the state each).

    Bit-parity with the FUSED single-device form is CI-gated at cl_k=4
    (`tests/test_sharding.py::test_sharded_streamed_dense_matches_fused`);
    the 8-device dryrun runs it as mode 10 (`__graft_entry__.py`).
    """
    from ..engine import dense as dense_mod

    if prog.dual:
        raise ValueError("streamed RHS supports single-tape programs")
    a, k = prog.size_a, prog.cl_k
    S = prog.state_size
    n_dev = mesh.size
    s_pad = -(-S // n_dev) * n_dev
    axes = tuple(mesh.axis_names)
    shard = jax.sharding.NamedSharding(mesh, P(axes))
    repl = jax.sharding.NamedSharding(mesh, P())

    tables = (
        jnp.asarray(prog.w_num, jnp.int32),
        jnp.asarray(prog.w_den, jnp.int32),
        jnp.asarray(prog.w_const, dtype),
        jnp.asarray(prog.pair_world, jnp.int32),
        jnp.asarray(prog.pair_sig, jnp.int32),
    )

    prep_out_shardings = (repl, tuple([repl] * (k - 1)), shard, shard)

    @partial(jax.jit, in_shardings=shard,
             out_shardings=prep_out_shardings)
    def prep(p_pad):
        w_num, w_den, w_const, pair_world, pair_sig = tables
        p = p_pad[:S].astype(dtype)
        lv = dense_mod._levels(p, a, k)
        pyr = jnp.concatenate(
            [lv[j] for j in range(k, -1, -1)] + [jnp.ones(1, dtype)])
        wv = w_const * _ratio_prod(pyr, w_num, w_den)
        s = jax.ops.segment_sum(wv[pair_world], pair_sig,
                                num_segments=prog.num_signatures)
        r_le, r_re = dense_mod._ratio_tables(lv, a, k)
        pad = (0, s_pad - S)
        return (s, tuple(r_le[1:k]), jnp.pad(r_le[k], pad),
                jnp.pad(r_re, pad))

    group_fns = []
    for l0, changed, members in dense_mod._group_plans(prog.plans, a, k):
        sids = jnp.asarray([m.sid for m in members], jnp.int32)

        def gfn(dy_pad, s, rle_small, rlek_pad, rre_pad, *, _l0=l0,
                _ch=changed, _ms=members, _sids=sids):
            r_le = [None] + list(rle_small) + [rlek_pad[:S]]
            dy = dense_mod._apply_group(
                dy_pad[:S], _l0, _ch, _ms, s[_sids], r_le,
                rre_pad[:S], a, k, dtype)
            return jnp.pad(dy, (0, s_pad - S))

        group_fns.append(jax.jit(
            gfn, donate_argnums=0,
            in_shardings=(shard, repl, tuple([repl] * (k - 1)), shard,
                          shard),
            out_shardings=shard))

    def fn(p):
        p = jnp.asarray(p)
        if p.shape[-1] == S:
            p = jnp.pad(p, (0, s_pad - S))
        elif p.shape[-1] != s_pad:
            raise ValueError(
                f"state axis {p.shape[-1]} matches neither "
                f"state_size={S} nor padded_size={s_pad}")
        p = jax.device_put(p, shard)
        s, rle_small, rlek_pad, rre_pad = prep(p)
        dy = jax.device_put(jnp.zeros(s_pad, dtype), shard)
        for g in group_fns:
            dy = g(dy, s, rle_small, rlek_pad, rre_pad)
        return dy[:S]

    fn.group_fns = group_fns
    fn.prep = prep
    fn.padded_size = s_pad
    return fn


def make_sharded_frontier_blocked(dm, mesh: jax.sharding.Mesh,
                                  plan: tuple, k_local: int,
                                  tau: float = 1.0,
                                  bitslice: bool | None = None):
    """Island-mode sharded BLOCKED frontier (the fast frontier).

    Same distribution strategy as :func:`make_sharded_frontier` — the
    member axis splits over every mesh device, each island evolving
    independently (zero ICI traffic; the island-vs-global estimator
    trade is quantified in DESIGN.md) — but each island runs the
    blocked merge-resample frontier
    (`ensemble.run_weighted_frontier_blocked` semantics). Key
    derivation matches the single-chip host driver exactly, so each
    island's result is bit-comparable to a standalone
    ``run_weighted_frontier_blocked(fold_in(key, island_index), ...)``.

    Returns ``fn(key, (ptape, dtape), logw) -> ((ptape, dtape), logw,
    n_unique [n_devices, num_blocks])`` over global arrays whose
    leading axis is ``n_devices * k_local``; each island's weights
    renormalise to mass 1.

    ``bitslice`` forwards to `ensemble._blocked_rounds`: True forces
    the bit-sliced round/sampling circuit on every island (the wide
    machines' fast path — requires k_local % 32 == 0), None auto-
    selects, False keeps the FSM walk.
    """
    from ..engine import ensemble as ensemble_mod

    num_blocks, rounds, events = plan
    axes = tuple(mesh.shape.keys())
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))

    def local(key, pt, dtp, lw):
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(key, idx)
        K, L = pt.shape
        stride = L // events
        pp = ensemble_mod._to_planes_t(pt, stride=stride)
        dd = ensemble_mod._to_planes_t(dtp, stride=stride)
        block_keys = jax.random.split(k, 2 * num_blocks).reshape(
            num_blocks, 2, 2)

        def block(carry, kb):
            pp, dd, lw = carry
            pp, dd, lw = ensemble_mod._blocked_rounds(
                kb[0], pp, dd, lw, dm, rounds=rounds, tau=tau,
                bitslice=bitslice)
            pp, dd, lw, nu = ensemble_mod._blocked_merge(
                kb[1], pp, dd, lw)
            return (pp, dd, lw), nu

        (pp, dd, lw), nu = jax.lax.scan(block, (pp, dd, lw), block_keys)
        pt = ensemble_mod._from_planes_t(pp)
        dtp = ensemble_mod._from_planes_t(dd)
        lw = lw - jax.scipy.special.logsumexp(lw)
        return pt, dtp, lw, nu[None]

    spec = P(axes)
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
    )

    @jax.jit
    def fn(key, tapes, logw):
        pt, dtp = tapes
        if pt.shape[0] != n_dev * k_local:
            raise ValueError(
                f"frontier size {pt.shape[0]} != n_devices*k_local "
                f"= {n_dev * k_local}"
            )
        # Same gates as the single-chip entry point (lattice geometry,
        # plane stride, merge-key width, tau) — a span violation would
        # silently corrupt every island's dynamics.
        ensemble_mod._validate_blocked_plan(dm, pt.shape[1], plan, tau)
        p, d, w, nu = mapped(key, pt.astype(jnp.int8),
                             dtp.astype(jnp.int8), logw)
        return (p.astype(pt.dtype), d.astype(dtp.dtype)), w, nu

    return fn


def make_sharded_blocked_rounds(dm, mesh: jax.sharding.Mesh,
                                rounds: int, *, tau: float = 1.0,
                                bitslice: bool | None = None):
    """Island-sharded block dynamics for the host-controlled WE
    harnesses (`ensemble.weighted_first_passage_binned`'s
    ``rounds_fn`` hook — the multi-chip path for the round-3 binned
    splitting instrument).

    The WE control flow (binning by progress coordinate, systematic
    slot resampling, flux accounting) is GLOBAL host-side numpy — one
    [K] transfer per block, exactly like the single-chip harness and
    `soup_we.we_emergence` — so only the block's stratified rounds
    shard: the walker axis splits over every mesh device and each
    island advances its slice with `ensemble._blocked_rounds` under a
    per-island folded key (same derivation as
    :func:`make_sharded_frontier_blocked`, so island ``i`` is
    bit-identical to a standalone ``_blocked_rounds(fold_in(key, i),
    ...)`` on the same slice —
    `tests/test_sharding.py::test_sharded_blocked_rounds_island_parity`).
    The post-block parent gather (`pl[:, pidx]`) crosses islands; GSPMD
    inserts the collective.

    Returns ``fn(key, pp, dd, lw) -> (pp, dd, lw)`` over transposed
    plane tuples ([E, K] per stride slot) whose member axis K is
    ``n_devices * k_local``.
    """
    from ..engine import ensemble as ensemble_mod

    axes = tuple(mesh.shape.keys())

    def local(key, p3, d3, lw):
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(key, idx)
        pp, dd, lw = ensemble_mod._blocked_rounds(
            k, tuple(p3), tuple(d3), lw, dm, rounds=rounds, tau=tau,
            bitslice=bitslice)
        return jnp.stack(pp), jnp.stack(dd), lw

    spec = P(None, None, axes)  # [stride, E, K]: shard the member axis
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), spec, spec, P(axes)),
        out_specs=(spec, spec, P(axes)),
    )

    @jax.jit
    def fn(key, pp, dd, lw):
        stride = len(pp)
        p3, d3, lw = mapped(key, jnp.stack(pp), jnp.stack(dd),
                            jnp.asarray(lw))
        return (tuple(p3[c] for c in range(stride)),
                tuple(d3[c] for c in range(stride)), lw)

    return fn


def make_sharded_frontier(dtable, mesh: jax.sharding.Mesh,
                          num_steps: int, top_k_local: int):
    """Island-mode sharded weighted frontier (distributed beam search).

    The frontier's member axis splits over every mesh device; each
    device runs an independent ``top_k_local`` beam
    (`ensemble.run_weighted_frontier`) seeded by folding its mesh index
    into the shared key. There is NO cross-island re-rank: a global
    top-k would need an all-gather of all candidate weights every step,
    serialising the beam on ICI latency, while independent islands are
    embarrassingly parallel and — like ensembled beam searches — give a
    lower-variance mixture estimator (each island renormalises to mass
    1; weight the islands uniformly when combining statistics, e.g. via
    `ensemble.weighted_window_counts` per island averaged).

    Returns ``fn(key, (ptape, dtape), logw) -> ((ptape, dtape), logw)``
    over global arrays whose leading axis is ``n_devices *
    top_k_local``.
    """
    from ..engine import ensemble as ensemble_mod

    axes = tuple(mesh.shape.keys())
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))

    def local(key, pt, dtp, lw):
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(key, idx)
        (p, d), w = ensemble_mod.run_weighted_frontier(
            k, (pt, dtp), lw, dtable, num_steps, top_k_local
        )
        return p, d, w

    spec = P(axes)
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), spec, spec, spec),
        out_specs=(spec, spec, spec),
    )

    @jax.jit
    def fn(key, tapes, logw):
        pt, dtp = tapes
        if pt.shape[0] != n_dev * top_k_local:
            raise ValueError(
                f"frontier size {pt.shape[0]} != n_devices*top_k_local "
                f"= {n_dev * top_k_local}"
            )
        p, d, w = mapped(key, pt, dtp, logw)
        return (p, d), w

    return fn


def _round_times(events, L, num_steps):
    """The ensemble engines' Poisson round-time calibration
    (dt = -ln(1 - E/L) per round), shared by the sharded wrappers."""
    dt_round = -jnp.log1p(-jnp.float64(events) / L)
    return dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)


def _island_batch_sharded(mesh, n_tapes, run_local):
    """Shared scaffold for batch-sharded island-key ensembles.

    Splits ``n_tapes`` ring-tape batches over every device of the
    mesh; each device folds its flat index into the key and calls
    ``run_local(folded_key, ts) -> (ts_out, aux)``, with ``aux``
    psum-reduced over the mesh (the only ICI traffic). Returns
    ``fn(key, ts) -> (ts_out, aux_global)`` plus the divisibility
    gate."""
    axes = tuple(mesh.shape.keys())
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))

    def local(key, *ts):
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(key, idx)
        ts_out, aux = run_local(k, ts)
        return (*ts_out, jax.lax.psum(aux, axes))

    spec = P(axes)
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(),) + (spec,) * n_tapes,
        out_specs=(spec,) * n_tapes + (P(),),
    )

    def fn(key, ts):
        if ts[0].shape[0] % n_dev:
            raise ValueError(
                f"batch {ts[0].shape[0]} does not divide over "
                f"{n_dev} devices")
        *ts_out, aux = mapped(key, *ts)
        return tuple(ts_out), aux

    return fn


def make_sharded_ensemble(dtable, mesh: jax.sharding.Mesh,
                          steps_events: tuple, *,
                          independent_sites: bool = False):
    """Batch-sharded tape ensemble — the headline engine's scale-out.

    The [B, L] tape-pair batch splits over EVERY device of the mesh
    (replicas are statistically independent, so the batch axis is the
    natural data-parallel axis — SURVEY §2.5 "ensemble parallelism");
    each device runs `ensemble.run_ensemble` on its B/n_devices rows
    with the shared machine tables replicated. The only ICI traffic is
    one `psum` of the per-round applied-event counters — the structural
    basis for linear scale-out of the single-chip headline rate (2.46e9
    transitions/s, RESULTS.md; multi-device throughput itself is
    unmeasured — this container exposes one chip).

    Key derivation folds the flat device index into the shared key, so
    shard i's tapes are bit-identical to a standalone
    ``run_ensemble(fold_in(key, i), local_rows, ...)`` — tested on the
    virtual 8-device mesh (`tests/test_sharding.py`).

    Returns ``fn(key, (ptape, dtape)) -> ((ptape, dtape),
    (applied [num_steps] global, times [num_steps]))`` over global
    arrays whose leading batch axis must divide by n_devices.
    """
    from ..engine import ensemble as ensemble_mod

    num_steps, events = steps_events

    def run_local(k, ts):
        out, (applied, _) = ensemble_mod.run_ensemble(
            k, ts, dtable, steps_events,
            independent_sites=independent_sites)
        return out, applied

    core = _island_batch_sharded(mesh, 2, run_local)

    @jax.jit
    def fn(key, tapes):
        (pt, dtp), applied = core(key, tuple(tapes))
        return (pt, dtp), (applied,
                           _round_times(events, pt.shape[1], num_steps))

    return fn


def make_sharded_ensemble_bff(mach, mesh: jax.sharding.Mesh,
                              steps_events: tuple, *,
                              independent_sites: bool = False,
                              mutation_rate: float = 0.0):
    """Batch-sharded BFF-interpreter ensemble (the soup's scale-out).

    The twin of :func:`make_sharded_ensemble` for the register-machine
    family (`engine/bff.py`), sharing its island-key scaffold: tape
    batches split over every mesh device; per-round executed-opcode
    totals are psum'd over ICI (the only inter-device traffic).
    Accepts the two-tape machines (pass ``(ptape, dtape)``) and the
    self-modifying ones (pass a single ``[B, L]`` tape, optionally
    with ``mutation_rate`` — the computational-soup control
    parameter). Per-shard results are bit-identical to standalone
    ``run_ensemble_bff(fold_in(key, device_index), ...)`` runs
    (`tests/test_sharding.py`).
    """
    from ..engine import bff as bff_mod

    num_steps, events = steps_events
    single = mach.self_modifying

    def run_local(k, ts):
        out, (ops, _) = bff_mod.run_ensemble_bff(
            k, ts[0] if single else ts, mach, steps_events,
            independent_sites=independent_sites,
            mutation_rate=mutation_rate)
        return ((out,) if single else out), ops

    core = _island_batch_sharded(mesh, 1 if single else 2, run_local)

    @jax.jit
    def fn(key, tapes):
        ts = (tapes,) if single else tuple(tapes)
        ts, ops = core(key, ts)
        times = _round_times(events, ts[0].shape[1], num_steps)
        return (ts[0] if single else ts), (ops, times)

    return fn
