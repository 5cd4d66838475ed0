"""Multi-device tests on the virtual 8-CPU mesh (SURVEY §4 last item)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def compiled():
    from chemical_kinetics_and_program_execution_tpu import compile_problem

    return compile_problem("ex2-ferromagnetic-chain", 5, use_cache=False)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(compiled):
    from chemical_kinetics_and_program_execution_tpu import make_dy_dt
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dy_dt,
    )

    mesh = make_mesh(n_batch=2, n_event=4)
    sharded = make_sharded_dy_dt(compiled, mesh)
    single = make_dy_dt(compiled)

    rng = np.random.RandomState(0)
    batch = np.stack(
        [rng.dirichlet(np.ones(compiled.state_size)) for _ in range(4)]
    )
    got = np.asarray(sharded(batch))
    want = np.stack([np.asarray(single(p)) for p in batch])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_dense_state_sharding_matches_single_ex4var2_geometry():
    """Window-rank (state-axis) sharding parity at the reference's
    largest geometry (ex4var2: size_a=10, cl_k=5, 100,000-dim state) on
    the virtual mesh — VERDICT round-1 item #5."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense("ex4var2-chemical-turing", 5)
    assert prog.state_size == 100_000
    mesh = make_mesh(n_batch=2, n_event=4)
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    single = dense.make_dense_dy_dt(prog)

    rng = np.random.RandomState(1)
    batch = np.stack(
        [rng.dirichlet(np.ones(prog.state_size)) for _ in range(2)]
    )
    got = np.asarray(sharded(batch))
    want = np.stack([np.asarray(single(p)) for p in batch])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_ensemble_batch_axis_shards_across_devices():
    """The lockstep tape ensemble is data-parallel over the mesh batch
    axis: a batch-sharded `run_ensemble` must produce the same tapes as
    the replicated run (GSPMD partitions the whole round; no collectives
    are needed because rounds touch only the replica's own tapes)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    mesh = make_mesh(n_batch=8, n_event=1)
    sharding = NamedSharding(mesh, P("batch", None))
    B, L = 16, 256
    key = jax.random.PRNGKey(3)
    pt = jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int32)
    dtp = jnp.zeros((B, L), jnp.int32)

    (want_p, want_d), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(4), (pt, dtp), dm, (3, 8))
    pt_s = jax.device_put(pt, sharding)
    dtp_s = jax.device_put(dtp, sharding)
    (got_p, got_d), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(4), (pt_s, dtp_s), dm, (3, 8))
    assert len(got_p.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


def test_sharded_event_axis_only(compiled):
    from chemical_kinetics_and_program_execution_tpu import make_dy_dt
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dy_dt,
    )

    mesh = make_mesh(n_batch=1, n_event=8)
    sharded = make_sharded_dy_dt(compiled, mesh)
    single = make_dy_dt(compiled)
    rng = np.random.RandomState(1)
    p = rng.dirichlet(np.ones(compiled.state_size))
    got = np.asarray(sharded(p[None]))[0]
    np.testing.assert_allclose(got, np.asarray(single(p)),
                               rtol=1e-12, atol=1e-15)


def test_island_frontier_matches_per_island_runs():
    """Island-mode sharded beam: every island must reproduce exactly
    what a standalone `run_weighted_frontier` produces with that
    island's folded key — sharding changes the schedule, not the
    math."""
    import math

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_frontier,
    )

    mesh = make_mesh(n_batch=2, n_event=4)
    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex2-ferromagnetic-chain"))
    k_loc, L, steps = 16, 32, 8
    n_dev = 8
    K = n_dev * k_loc
    key = jax.random.PRNGKey(5)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(6), np.full(8, 0.125), 2, 3, K, L)
    import jax.numpy as jnp
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(k_loc))

    fn = make_sharded_frontier(dtab, mesh, steps, k_loc)
    (pt_g, dt_g), lw_g = fn(key, (ptape, dtape), logw)

    # Per-island weights renormalise to 1.
    w = np.exp(np.asarray(lw_g)).reshape(n_dev, k_loc)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-9)

    for island in (0, 3, 7):
        sl = slice(island * k_loc, (island + 1) * k_loc)
        k_i = jax.random.fold_in(key, island)
        (p_i, d_i), lw_i = ensemble.run_weighted_frontier(
            k_i, (ptape[sl], dtape[sl]), logw[sl], dtab, steps, k_loc)
        np.testing.assert_array_equal(np.asarray(dt_g)[sl],
                                      np.asarray(d_i))
        np.testing.assert_allclose(np.asarray(lw_g)[sl],
                                   np.asarray(lw_i), rtol=1e-12)


def test_dense_state_sharding_non_divisible_pads_and_shards():
    """ex5's 3125-dim state does not divide 8 devices: the sharded dense
    RHS must pad to 3128 and actually shard the state axis (never the
    old silent replication fallback), and agree with the single-device
    kernel."""
    import jax
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense("ex5-msrtf-machine", 5)
    assert prog.state_size % 8 != 0
    mesh = make_mesh(n_batch=1, n_event=8)
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    assert sharded.padded_size == -(-prog.state_size // 8) * 8

    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(prog.state_size), size=2)
    got = np.asarray(sharded(p))
    ref_fn = dense.make_dense_dy_dt(prog)
    ref = np.stack([np.asarray(ref_fn(row)) for row in p])
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)

    # The padded path really shards: the jitted inner function's output
    # sharding splits the state axis over the "ev" mesh axis.
    import jax.numpy as jnp

    p_pad = jnp.pad(jnp.asarray(p), ((0, 0), (0, sharded.padded_size
                                              - prog.state_size)))
    out_pad = sharded(p_pad)
    spec = out_pad.sharding.spec
    assert tuple(spec) == ("batch", "ev")


def test_blocked_island_frontier_matches_per_island_runs():
    """Each island of the sharded BLOCKED frontier must be bit-identical
    to a standalone run_weighted_frontier_blocked seeded with
    fold_in(key, island_index) — the distribution adds devices, not
    semantics."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_frontier_blocked,
    )

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    mesh = make_mesh(n_batch=2, n_event=4)
    k_loc, L = 16, 32
    plan = (2, 2, 2)
    n_dev = 8
    fn = make_sharded_frontier_blocked(dm, mesh, plan, k_loc)

    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), np.full(8, 0.125), 2, 3, n_dev * k_loc, L)
    ptape = jnp.zeros((n_dev * k_loc, L), jnp.int32)
    lw0 = jnp.full((n_dev * k_loc,), -math.log(k_loc))
    key = jax.random.PRNGKey(9)
    (pt, dt), lw, nu = fn(key, (ptape, dtape), lw0)
    assert np.asarray(nu).shape == (n_dev, plan[0])

    for isl in (0, 3, 7):
        sl = slice(isl * k_loc, (isl + 1) * k_loc)
        (pt_i, dt_i), lw_i, nu_i = ensemble.run_weighted_frontier_blocked(
            jax.random.fold_in(key, isl),
            (ptape[sl], dtape[sl]),
            jnp.full((k_loc,), -math.log(k_loc)),
            dm, plan,
        )
        np.testing.assert_array_equal(np.asarray(pt[sl]),
                                      np.asarray(pt_i))
        np.testing.assert_array_equal(np.asarray(dt[sl]),
                                      np.asarray(dt_i))
        np.testing.assert_allclose(np.asarray(lw[sl]), np.asarray(lw_i),
                                   rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(nu[isl]),
                                      np.asarray(nu_i))


def test_sharded_dense_end_to_end_solve_matches_single_device():
    """Full SOLVE over the state-sharded dense RHS — the adaptive
    stepper's while_loop runs with the SPD (and its marginal pyramid)
    GSPMD-partitioned across the mesh, collectives inside the loop.
    This is the program shape a beyond-HBM solve (ex4 cl_k=8) runs on a
    real slice; parity here pins the whole chain, not just one RHS."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        chemical_turing_v2_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import (
        solve,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense("ex4var2-chemical-turing", 3)
    p0 = chemical_turing_v2_p0(3).ravel()
    ts = np.linspace(0.0, 5.0, 4)

    single = dense.make_dense_dy_dt(prog)
    want = np.asarray(solve(lambda y, t: single(y), p0, ts,
                            rtol=1e-9, atol=1e-12))

    mesh = make_mesh(n_batch=1, n_event=8)  # pure state-axis sharding
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    got = np.asarray(solve(lambda y, t: sharded(y[None])[0], p0, ts,
                           rtol=1e-9, atol=1e-12))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, rtol=1e-9)


def test_event_sharded_rejects_dual_programs():
    """make_sharded_dy_dt builds one shared pyramid; a dual-SPD compile
    must be rejected with a clear message, not a trace-time shape error."""
    from chemical_kinetics_and_program_execution_tpu.engine.compile import (
        compile_problem_dual,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dy_dt,
    )

    dual = compile_problem_dual("ex1-radioactive-decay", 3)
    mesh = make_mesh(n_batch=2, n_event=4)
    with pytest.raises(ValueError, match="dual-SPD"):
        make_sharded_dy_dt(dual, mesh)


def test_sharded_ensemble_matches_per_shard_runs():
    """make_sharded_ensemble (island-key scale-out of the headline
    engine) must give each device's rows bit-identical to a standalone
    run_ensemble seeded with fold_in(key, device_index) — and its
    psum'd applied-event counters must equal the sum of the standalone
    runs' counters."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_ensemble,
    )

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    mesh = make_mesh(n_batch=2, n_event=4)
    B, L, steps, events = 16, 256, 3, 8
    key = jax.random.PRNGKey(11)
    pt = jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int32)
    dtp = jnp.zeros((B, L), jnp.int32)

    fn = make_sharded_ensemble(dm, mesh, (steps, events))
    (got_p, got_d), (applied, times) = fn(jax.random.PRNGKey(12),
                                          (pt, dtp))
    got_p, got_d = np.asarray(got_p), np.asarray(got_d)

    b_loc = B // 8
    want_applied = np.zeros(steps, np.int64)
    for i in range(8):
        rows = slice(i * b_loc, (i + 1) * b_loc)
        (wp, wd), (ap, wt) = ensemble.run_ensemble(
            jax.random.fold_in(jax.random.PRNGKey(12), i),
            (pt[rows], dtp[rows]), dm, (steps, events))
        np.testing.assert_array_equal(got_p[rows], np.asarray(wp))
        np.testing.assert_array_equal(got_d[rows], np.asarray(wd))
        want_applied += np.asarray(ap, np.int64)
        np.testing.assert_allclose(np.asarray(times), np.asarray(wt),
                                   rtol=1e-15)
    np.testing.assert_array_equal(np.asarray(applied, np.int64),
                                  want_applied)

    with pytest.raises(ValueError, match="divide"):
        fn(jax.random.PRNGKey(0), (pt[:12], dtp[:12]))


def test_sharded_bff_ensemble_matches_per_shard_runs():
    """make_sharded_ensemble_bff parity: each device's rows (self-
    modifying machine, with mutation) bit-identical to standalone
    run_ensemble_bff(fold_in(key, device_index), ...), psum'd opcode
    totals equal to the per-shard sum; the two-tape machine path and
    the divisibility gate also covered."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import bff
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_ensemble_bff,
    )

    mesh = make_mesh(n_batch=2, n_event=4)
    B, L, steps, events = 16, 256, 2, 2
    key = jax.random.PRNGKey(21)

    # Self-modifying machine with mutation.
    ms = bff.compile_bff("ex6-mini-bff-self")
    tape = jax.random.randint(key, (B, L), 0, ms.size_a,
                              dtype=jnp.int32)
    fn = make_sharded_ensemble_bff(ms, mesh, (steps, events),
                                   mutation_rate=0.01)
    out, (ops, times) = fn(jax.random.PRNGKey(22), tape)
    out = np.asarray(out)
    b_loc = B // 8
    want_ops = np.zeros_like(np.asarray(ops))
    for i in range(8):
        rows = slice(i * b_loc, (i + 1) * b_loc)
        w, (op_i, wt) = bff.run_ensemble_bff(
            jax.random.fold_in(jax.random.PRNGKey(22), i), tape[rows],
            ms, (steps, events), mutation_rate=0.01)
        np.testing.assert_array_equal(out[rows], np.asarray(w))
        want_ops += np.asarray(op_i)
        np.testing.assert_allclose(np.asarray(times), np.asarray(wt),
                                   rtol=1e-15)
    np.testing.assert_array_equal(np.asarray(ops), want_ops)

    # Two-tape machine path.
    m2 = bff.compile_bff("ex6-mini-bff")
    pt = jax.random.randint(jax.random.fold_in(key, 9), (B, L), 0,
                            m2.size_a, dtype=jnp.int32)
    dtp = jnp.zeros((B, L), jnp.int32)
    fn2 = make_sharded_ensemble_bff(m2, mesh, (steps, events))
    (gp, gd), _ = fn2(jax.random.PRNGKey(23), (pt, dtp))
    gp, gd = np.asarray(gp), np.asarray(gd)
    for i in range(8):
        rows = slice(i * b_loc, (i + 1) * b_loc)
        (wp, wd), _ = bff.run_ensemble_bff(
            jax.random.fold_in(jax.random.PRNGKey(23), i),
            (pt[rows], dtp[rows]), m2, (steps, events))
        np.testing.assert_array_equal(gp[rows], np.asarray(wp))
        np.testing.assert_array_equal(gd[rows], np.asarray(wd))

    with pytest.raises(ValueError, match="divide"):
        fn(jax.random.PRNGKey(0), tape[:12])


def test_we_emergence_on_sharded_runner():
    """The WE harness accepts the batch-sharded soup runner: walkers
    split over the 8-device mesh, WE host logic unchanged. The sharded
    run's final emergence probability must agree with unsharded seeds
    at combined 6 sigma (streams differ — the sharded runner folds
    keys per device — so the gate is statistical, not bitwise)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        bff,
        soup_we,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_ensemble_bff,
    )

    m = bff.compile_bff("ex6-mini-bff-self")
    L, K, blocks, rounds, E = 256, 512, 6, 8, 4
    mesh = make_mesh(n_batch=8, n_event=1)
    runner = make_sharded_ensemble_bff(m, mesh, (rounds, E),
                                       independent_sites=True)

    def make_init(s):
        rng = np.random.default_rng(700 + s)
        return lambda n: rng.integers(0, m.size_a, (n, L),
                                      dtype=np.int32)

    r_sh = soup_we.we_emergence(jax.random.PRNGKey(1), m, make_init(0),
                                plan=(K, blocks, rounds, E),
                                q_target=7, runner=runner, seed=0)
    assert r_sh.survival[-1] < 1.0  # something emerged
    vals = []
    for s in range(3):
        r = soup_we.we_emergence(jax.random.PRNGKey(2 + s), m,
                                 make_init(1 + s),
                                 plan=(K, blocks, rounds, E),
                                 q_target=7, seed=1 + s)
        vals.append(1.0 - r.survival[-1])
    vals = np.asarray(vals)
    sem = max(float(vals.std(ddof=1) / np.sqrt(len(vals))), 5e-3)
    got = 1.0 - r_sh.survival[-1]
    assert abs(got - vals.mean()) < 6.0 * sem, (got, vals)


def test_sharded_dense_rk_trajectory_flagship_scale():
    """10-step fixed RK4 TRAJECTORY over the state-sharded dense RHS at
    the flagship ex4 cl_k=5 scale (59,049-dim SPD) — the program shape
    of the beyond-HBM cl_k=8 runs (VERDICT r3 #8), gated as a
    trajectory rather than a single RHS: conservation holds at every
    step and the endpoint matches the single-device RK4 bit-for-bit
    close (same arithmetic, different partitioning)."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense("ex4-chemical-turing", 5)
    p0 = np.full(prog.state_size, 1.0 / prog.state_size)
    dt, steps = 0.02, 10

    def rk4_traj(f):
        p = jnp.asarray(p0)
        sums = []
        for _ in range(steps):
            k1 = f(p)
            k2 = f(p + 0.5 * dt * k1)
            k3 = f(p + 0.5 * dt * k2)
            k4 = f(p + dt * k3)
            p = p + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            sums.append(float(jnp.sum(p)))
        return np.asarray(p), np.asarray(sums)

    single = dense.make_dense_dy_dt(prog)
    want, sums_w = rk4_traj(single)

    mesh = make_mesh(n_batch=1, n_event=8)
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    got, sums_g = rk4_traj(lambda y: sharded(y[None])[0])

    np.testing.assert_allclose(sums_g, 1.0, rtol=1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-16)


def test_wide_machine_sampling_circuit_blocked_frontier_sharded():
    """Round-3's wide-machine fast path on the mesh (round-3 verdict
    missing item #3, dryrun mode 8): the fuzz-wide-specs SAMPLING
    CIRCUIT (199 specs, ~7k gates — past every historical packing
    cliff) drives the island-sharded blocked frontier with
    bitslice=True forced, and every island is bit-identical to a
    standalone run_weighted_frontier_blocked with the same forcing."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import (
        bitslice as bs,
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_frontier_blocked,
    )

    dm = ensemble.compile_decision_machine("fuzz-wide-specs")
    assert dm.num_specs > 63  # past the round-2 spec-id cliff
    assert bs.machine_is_sampleable(dm)
    assert not bs.machine_is_bitsliceable(dm)  # has a choose: sampling
    mesh = make_mesh(n_batch=8, n_event=1)
    k_loc, L = 32, 32  # k_loc % 32 == 0: one uint32 word per island
    plan = (2, 2, 4)
    n_dev = 8
    fn = make_sharded_frontier_blocked(dm, mesh, plan, k_loc,
                                       bitslice=True)

    ptape = jnp.zeros((n_dev * k_loc, L), jnp.int32)
    dtape = jax.random.randint(jax.random.PRNGKey(0),
                               (n_dev * k_loc, L), 0, dm.size_a,
                               dtype=jnp.int32)
    lw0 = jnp.full((n_dev * k_loc,), -math.log(k_loc))
    key = jax.random.PRNGKey(11)
    (pt, dt), lw, nu = fn(key, (ptape, dtape), lw0)
    w_isl = np.exp(np.asarray(lw)).reshape(n_dev, k_loc).sum(axis=1)
    np.testing.assert_allclose(w_isl, 1.0, rtol=1e-9)

    for isl in (0, 5):
        sl = slice(isl * k_loc, (isl + 1) * k_loc)
        (pt_i, dt_i), lw_i, nu_i = ensemble.run_weighted_frontier_blocked(
            jax.random.fold_in(key, isl),
            (ptape[sl], dtape[sl]),
            jnp.full((k_loc,), -math.log(k_loc)),
            dm, plan, bitslice=True,
        )
        np.testing.assert_array_equal(np.asarray(pt[sl]),
                                      np.asarray(pt_i))
        np.testing.assert_array_equal(np.asarray(dt[sl]),
                                      np.asarray(dt_i))
        np.testing.assert_allclose(np.asarray(lw[sl]),
                                   np.asarray(lw_i), rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(nu[isl]),
                                      np.asarray(nu_i))


def test_sharded_blocked_rounds_island_parity():
    """make_sharded_blocked_rounds: island i's block dynamics are
    bit-identical to a standalone _blocked_rounds under
    fold_in(key, i) on the same walker slice."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_blocked_rounds,
    )

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    mesh = make_mesh(n_batch=8, n_event=1)
    n_dev, k_loc, L, events, rounds = 8, 32, 32, 4, 3
    K = n_dev * k_loc
    stride = L // events
    dtape = jax.random.randint(jax.random.PRNGKey(1), (K, L), 0, 2,
                               dtype=jnp.int32)
    ptape = jnp.zeros((K, L), jnp.int32)
    pp = ensemble._to_planes_t(ptape.astype(jnp.int8), stride=stride)
    dd = ensemble._to_planes_t(dtape.astype(jnp.int8), stride=stride)
    lw = jnp.zeros((K,), jnp.float64)

    fn = make_sharded_blocked_rounds(dm, mesh, rounds)
    key = jax.random.PRNGKey(5)
    gp, gd, glw = fn(key, pp, dd, lw)

    for isl in (0, 2, 7):
        sl = slice(isl * k_loc, (isl + 1) * k_loc)
        wp, wd, wlw = ensemble._blocked_rounds(
            jax.random.fold_in(key, isl),
            tuple(p[:, sl] for p in pp), tuple(d[:, sl] for d in dd),
            lw[sl], dm, rounds=rounds, tau=1.0)
        for c in range(stride):
            np.testing.assert_array_equal(np.asarray(gp[c][:, sl]),
                                          np.asarray(wp[c]))
            np.testing.assert_array_equal(np.asarray(gd[c][:, sl]),
                                          np.asarray(wd[c]))
        np.testing.assert_allclose(np.asarray(glw[sl]),
                                   np.asarray(wlw), rtol=1e-15)


def test_we_binned_on_sharded_rounds():
    """weighted_first_passage_binned through the sharded rounds_fn
    (dryrun mode 9): with the block dynamics replaced by
    make_sharded_blocked_rounds, the FULL harness output (survival,
    occupancy, best-progress trace) is bit-identical to the same
    harness driven by a host-side per-island emulation — the WE
    control flow is global and unchanged, so the mesh adds devices,
    not semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_blocked_rounds,
    )

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    mesh = make_mesh(n_batch=8, n_event=1)
    n_dev, k_loc, L, rounds = 8, 32, 32, 3
    K = n_dev * k_loc
    plan = (3, rounds, 4)
    pattern = (1, 1, 1, 1, 1, 1)  # 6 U's — state-rare target
    dtape = jax.random.randint(jax.random.PRNGKey(2), (K, L), 0, 2,
                               dtype=jnp.int32)
    ptape = jnp.zeros((K, L), jnp.int32)
    lw0 = jnp.full((K,), -np.log(K))

    sharded = make_sharded_blocked_rounds(dm, mesh, rounds)

    def host_islands(key, pp, dd, lw):
        outs = []
        for i in range(n_dev):
            sl = slice(i * k_loc, (i + 1) * k_loc)
            outs.append(ensemble._blocked_rounds(
                jax.random.fold_in(key, i),
                tuple(p[:, sl] for p in pp),
                tuple(d[:, sl] for d in dd),
                lw[sl], dm, rounds=rounds, tau=1.0))
        pp = tuple(jnp.concatenate([o[0][c] for o in outs], axis=1)
                   for c in range(len(pp)))
        dd = tuple(jnp.concatenate([o[1][c] for o in outs], axis=1)
                   for c in range(len(pp)))
        return pp, dd, jnp.concatenate([o[2] for o in outs])

    res_sh = ensemble.weighted_first_passage_binned(
        jax.random.PRNGKey(3), (ptape, dtape), lw0, dm, pattern, plan,
        rounds_fn=sharded, seed=0)
    res_host = ensemble.weighted_first_passage_binned(
        jax.random.PRNGKey(3), (ptape, dtape), lw0, dm, pattern, plan,
        rounds_fn=host_islands, seed=0)
    for a, b in zip(res_sh, res_host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-14)


def test_sharded_streamed_dense_matches_fused():
    """Mode-10 composition (round-4 verdict #8): the group-streamed
    dense RHS with the state axis GSPMD-sharded must reproduce the
    fused single-device dense RHS — per-group sharded evaluation with
    the donated padded accumulator, at the flagship rule's cl_k=4
    (state 6561 pads to 6568 over 8 devices, exercising the non-even
    padding path)."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt_streamed,
    )

    prog = dense.compile_dense("ex4-chemical-turing", 4)
    fused = dense.make_dense_dy_dt(prog)
    mesh = make_mesh(n_batch=2, n_event=4)
    streamed = make_sharded_dense_dy_dt_streamed(prog, mesh)

    rng = np.random.RandomState(11)
    p = rng.rand(prog.state_size)
    p /= p.sum()
    want = np.asarray(fused(p))
    got = np.asarray(streamed(p))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-18)
    # Padded-layout input (the device-resident carry form) agrees too.
    got_pad = np.asarray(streamed(jnp.pad(jnp.asarray(p),
                                          (0, streamed.padded_size
                                           - prog.state_size))))
    np.testing.assert_allclose(got_pad, want, rtol=1e-13, atol=1e-18)
