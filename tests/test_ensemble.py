"""Ensemble-mode tests: transition tables and lockstep tape stepping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chemical_kinetics_and_program_execution_tpu.engine import ensemble


@pytest.mark.parametrize("tag", [
    "ex1-radioactive-decay",
    "ex2-ferromagnetic-chain",
    "ex3-copolymerization",
    "ex5-msrtf-machine",
])
def test_transition_table_rows_are_distributions(tag):
    t = ensemble.compile_transition_table(tag)
    # Built-in validation raises if outcome probabilities don't sum to 1;
    # additionally the cumulative rows must be monotone and end exactly
    # at 1.
    assert (np.diff(t.out_cum, axis=1) >= -1e-15).all()
    np.testing.assert_array_equal(t.out_cum[:, -1], 1.0)
    assert t.out_world.max() < len(t.wr_mask)


def test_decay_table_semantics():
    t = ensemble.compile_transition_table("ex1-radioactive-decay")
    # Single data cell read; deterministic outcome per content.
    assert (t.d_lo, t.d_hi) == (0, 0)
    assert t.out_cum.shape[1] == 1
    # Rows where the data cell is B (=1) write A (=0); A-rows are inert.
    n_p = t.n_p
    for row in range(t.num_rows):
        digits = np.base_repr(row, 2).zfill(t.n_cells)
        d_val = int(digits[n_p])
        spec = t.out_world[row, 0]
        if d_val == 1:
            assert t.wr_mask[spec, n_p] and t.wr_val[spec, n_p] == 0
        else:
            assert not t.wr_mask[spec].any()


def test_serial_ensemble_matches_exponential_decay():
    t = ensemble.compile_transition_table("ex1-radioactive-decay")
    dt = ensemble.device_table(t)
    B, L = 64, 256
    tapes = (jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32))
    (_, dtape), (applied, times) = ensemble.run_ensemble(
        jax.random.PRNGKey(0), tapes, dt, (512, 1)
    )
    t_eff = float(np.asarray(times)[-1])
    p_b = float(np.asarray(dtape).mean())
    assert abs(p_b - np.exp(-t_eff)) < 4 * np.sqrt(
        np.exp(-t_eff) / (B * L)
    )


def test_parallel_rounds_match_low_density_decay():
    t = ensemble.compile_transition_table("ex1-radioactive-decay")
    dt = ensemble.device_table(t)
    B, L, E = 32, 2048, 64
    tapes = (jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32))
    (_, dtape), (applied, times) = ensemble.run_ensemble(
        jax.random.PRNGKey(1), tapes, dt, (40, E)  # ~3% density
    )
    t_eff = float(np.asarray(times)[-1])
    p_b = float(np.asarray(dtape).mean())
    expect = np.exp(-t_eff)
    # Lattice rounds fire whole residue classes together, so the
    # effective sample count is B * stride (independent classes), not
    # B * L sites.
    sigma = np.sqrt(expect * (1 - expect) / (B * (L // E)))
    assert abs(p_b - expect) < 0.05 * expect + 5 * sigma


def test_ensemble_ferromagnet_approaches_spd_dynamics():
    """Cross-engine check: the tape ensemble's window statistics follow
    the exact SPD ODE (loosely, at MC resolution)."""
    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

    cl_k = 3
    p0 = ferromagnet_p0(cl_k, p_pair=0.05, corrected=True).ravel()

    table = ensemble.compile_transition_table("ex2-ferromagnetic-chain")
    dtab = ensemble.device_table(table)
    B, L = 64, 2048
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(2), p0, 2, cl_k, B, L
    )
    ptape = jnp.zeros((B, L), jnp.int32)
    p_emp0 = np.asarray(ensemble.window_counts(dtape, 2, cl_k))
    np.testing.assert_allclose(p_emp0, p0, atol=0.02)

    (_, dtape), (_, times) = ensemble.run_ensemble(
        jax.random.PRNGKey(3), (ptape, dtape), dtab, (30, 64)
    )
    t_eff = float(np.asarray(times)[-1])
    p_emp = np.asarray(ensemble.window_counts(dtape, 2, cl_k))

    compiled = compile_problem("ex2-ferromagnetic-chain", cl_k)
    fn = make_dy_dt(compiled)
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0, t_eff, 5),
               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(p_emp, ys[-1], atol=0.02)


def test_lattice_round_matches_scatter_formulation():
    """One lattice round must equal the exact scatter/gather formulation
    at the same sites, and every event must apply (the `applied` count
    reported by `run_ensemble` asserts B*E — this is its witness)."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    table = ensemble.compile_transition_table("ex2-ferromagnetic-chain")
    dt = ensemble.device_table(table)
    L, E = 256, 8
    stride = L // E
    assert stride > 2 * dt.span
    rng = np.random.RandomState(0)
    ptape = jnp.asarray(rng.randint(0, 2, (1, L)), jnp.int32)
    dtape = jnp.asarray(rng.randint(0, 2, (1, L)), jnp.int32)
    shift = jnp.asarray(37, jnp.int32)
    uniforms = jnp.asarray(rng.rand(1, E))

    lp, ld = ensemble._apply_lattice_round(dt, ptape, dtape, shift, uniforms)

    sites = (int(shift) + np.arange(E) * stride) % L
    sp, sd, transitions = ensemble._apply_events(
        dt, ptape[0], dtape[0], jnp.asarray(sites, jnp.int32), uniforms[0]
    )
    assert int(transitions) == E  # stride-separated: nothing dropped
    np.testing.assert_array_equal(np.asarray(lp[0]), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(ld[0]), np.asarray(sd))


@pytest.mark.parametrize("tag", [
    "ex5-msrtf-machine",          # deterministic rule, 12 write specs
    "ex2-ferromagnetic-chain",    # choose-based branching
    "ex3-copolymerization",       # two tapes, multi-cell writes
    "ex4-chemical-turing",        # 9 symbols, nested chooses
])
def test_decision_machine_matches_table_round(tag):
    """The gather-free FSM kernel must reproduce the transition-table
    round bit-for-bit, including choose sampling (the renormalised
    uniform walk is the table's lexicographic inverse-CDF)."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    table = ensemble.compile_transition_table(tag)
    dt = ensemble.device_table(table)
    dm = ensemble.compile_decision_machine(tag)
    assert dm.span == table.span
    rng = np.random.RandomState(1)
    B, L, E = 4, 256, 8
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dtp = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    shift = jnp.asarray(13, jnp.int32)
    uniforms = jnp.asarray(rng.rand(B, E))
    want = ensemble._apply_lattice_round(dt, pt, dtp, shift, uniforms)
    got = ensemble._apply_lattice_round_fsm(dm, pt, dtp, shift, uniforms)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("tag", [
    "ex5-msrtf-machine",
    "ex2-ferromagnetic-chain",
    "ex4-chemical-turing",
])
@pytest.mark.parametrize("shift", [0, 5, 15])
def test_plane_round_matches_roll_round(tag, shift):
    """The roll-free plane round must be bit-identical to the rolled FSM
    round for any phase in [0, stride) at the same uniforms — including
    phases whose windows spill across block boundaries."""
    dm = ensemble.compile_decision_machine(tag)
    rng = np.random.RandomState(7)
    B, L, E = 4, 256, 16
    stride = L // E
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int8)
    dtp = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int8)
    uniforms = jnp.asarray(rng.rand(B, E), jnp.float32)
    s = jnp.asarray(shift, jnp.int32)
    want = ensemble._apply_lattice_round_fsm(dm, pt, dtp, s, uniforms)
    pp = ensemble._tape_to_planes(pt, stride)
    dd = ensemble._tape_to_planes(dtp, stride)
    gp, gd = ensemble._apply_plane_round_fsm(dm, pp, dd, s, uniforms)
    np.testing.assert_array_equal(
        np.asarray(ensemble._planes_to_tape(gp)), np.asarray(want[0]))
    np.testing.assert_array_equal(
        np.asarray(ensemble._planes_to_tape(gd)), np.asarray(want[1]))


@pytest.mark.parametrize("tag", [
    "ex5-msrtf-machine",
    "ex2-ferromagnetic-chain",
    "ex4-chemical-turing",
])
def test_stacked_plane_round_matches_tuple(tag):
    """The stacked-plane round (dynamic_index plane selection — the hot
    formulation since the switch-copy finding, probes/round_decompose.py)
    must be bit-identical to the tuple/switch round at every phase, for
    both the plain and the want_logp (frontier) variants."""
    dm = ensemble.compile_decision_machine(tag)
    rng = np.random.RandomState(11)
    B, L, E = 4, 256, 16
    stride = L // E
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int8)
    dtp = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int8)
    uniforms = jnp.asarray(rng.rand(B, E), jnp.float32)
    pp = ensemble._tape_to_planes(pt, stride)
    dd = ensemble._tape_to_planes(dtp, stride)
    pst, dst = jnp.stack(pp), jnp.stack(dd)
    for shift in range(stride):
        s = jnp.asarray(shift, jnp.int32)
        wp, wd = ensemble._apply_plane_round_fsm(dm, pp, dd, s, uniforms)
        gp, gd = ensemble._apply_plane_round_fsm_stacked(
            dm, pst, dst, s, uniforms)
        np.testing.assert_array_equal(np.asarray(gp),
                                      np.asarray(jnp.stack(wp)))
        np.testing.assert_array_equal(np.asarray(gd),
                                      np.asarray(jnp.stack(wd)))
        # want_logp variant (the blocked frontier's path), tau < 1 so
        # the increments are nonzero for branching rules.
        wp, wd, wl = ensemble._apply_plane_round_fsm(
            dm, pp, dd, s, uniforms, tau=0.5, want_logp=True)
        gp, gd, gl = ensemble._apply_plane_round_fsm_stacked(
            dm, pst, dst, s, uniforms, tau=0.5, want_logp=True)
        np.testing.assert_array_equal(np.asarray(gp),
                                      np.asarray(jnp.stack(wp)))
        np.testing.assert_array_equal(np.asarray(gd),
                                      np.asarray(jnp.stack(wd)))
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))


@pytest.mark.parametrize("tag", [
    "ex5-msrtf-machine",
    "ex2-ferromagnetic-chain",
    "ex4-chemical-turing",
    "ex3-copolymerization",
])
@pytest.mark.parametrize("tau,want_logp", [(1.0, False), (0.5, True)])
def test_leveled_walk_matches_node_walk(tag, tau, want_logp):
    """The level-synchronous walk (the hot formulation) must be
    bit-identical to the per-node masked cascade: same specs, same
    importance log-weights, on random window cells and uniforms."""
    dm = ensemble.compile_decision_machine(tag)
    rng = np.random.RandomState(7)
    shape = (64, 32)
    cells = tuple(jnp.asarray(rng.randint(0, dm.size_a, shape), jnp.int8)
                  for _ in range(dm.n_cells))
    u = jnp.asarray(rng.rand(*shape), jnp.float32)
    if want_logp:
        spec_n, logp_n = ensemble._machine_specs_planes_nodes(
            dm, cells, u, tau=tau, want_logp=True)
        spec_l, logp_l = ensemble._machine_specs_planes_leveled(
            dm, cells, u, tau=tau, want_logp=True)
        np.testing.assert_array_equal(np.asarray(logp_l),
                                      np.asarray(logp_n))
    else:
        spec_n = ensemble._machine_specs_planes_nodes(dm, cells, u,
                                                      tau=tau)
        spec_l = ensemble._machine_specs_planes_leveled(dm, cells, u,
                                                        tau=tau)
    np.testing.assert_array_equal(np.asarray(spec_l), np.asarray(spec_n))


def test_bitslice_eligibility():
    """Choose-free small-window machines bit-slice; choose-ful don't."""
    from chemical_kinetics_and_program_execution_tpu.engine import bitslice
    assert bitslice.machine_is_bitsliceable(
        ensemble.compile_decision_machine("ex5-msrtf-machine"))
    assert not bitslice.machine_is_bitsliceable(
        ensemble.compile_decision_machine("ex4-chemical-turing"))
    assert not bitslice.machine_is_bitsliceable(
        ensemble.compile_decision_machine("ex2-ferromagnetic-chain"))


def test_bitplane_roundtrip():
    from chemical_kinetics_and_program_execution_tpu.engine import bitslice
    rng = np.random.RandomState(5)
    t = jnp.asarray(rng.randint(0, 5, (96, 256)), jnp.int32)
    bp = bitslice.tapes_to_bitplanes(t, 16, 3)
    np.testing.assert_array_equal(
        np.asarray(bitslice.bitplanes_to_tapes(bp)), np.asarray(t))


def test_transposed_word_shape_cost_choice():
    """Dense 2-D geometries keep [E, W]; tiny-E geometries with a
    near-dense member-axis factorisation go 3-D [E, S, P]."""
    from chemical_kinetics_and_program_execution_tpu.engine import bitslice
    # Headline geometry: E=256 sublane-dense, W=512 lane-dense -> 2-D.
    assert bitslice.transposed_word_shape(256, 512) == (256, 512)
    # Config 5: E=2 pads 4x in 2-D; W=312500 splits near-dense.
    shape = bitslice.transposed_word_shape(2, 312500)
    assert len(shape) == 3 and shape[0] == 2
    assert shape[1] * shape[2] == 312500
    # W=1024 = 8*128 splits exactly dense.
    assert bitslice.transposed_word_shape(2, 1024) == (2, 8, 128)
    # Tiny W with no good split stays 2-D.
    assert bitslice.transposed_word_shape(2, 128) == (2, 128)


def test_bitplane_roundtrip_transposed_3d():
    """Round-trip through the 3-D [E, S, P] transposed word layout."""
    from chemical_kinetics_and_program_execution_tpu.engine import bitslice
    rng = np.random.RandomState(6)
    B, L, stride = 32768, 32, 16  # E=2, W=1024 -> (2, 8, 128)
    t = jnp.asarray(rng.randint(0, 3, (B, L)), jnp.int32)
    bp = bitslice.tapes_to_bitplanes(t, stride, 2, transpose=True)
    assert bp.shape == (stride, 2, 2, 8, 128)
    np.testing.assert_array_equal(
        np.asarray(bitslice.bitplanes_to_tapes(bp, transpose=True)),
        np.asarray(t))


def test_bitsliced_ensemble_matches_fsm():
    """The bit-sliced boolean-circuit round must reproduce the FSM
    plane round's tapes BIT FOR BIT at the same key (choose-free rules
    consume no uniforms, and the shift stream is shared)."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(13)
    B, L = 64, 256
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    key = jax.random.PRNGKey(99)
    (p1, d1), _ = ensemble.run_ensemble(key, (pt, dt), dm, (12, 16),
                                        bitslice=False)
    (p2, d2), _ = ensemble.run_ensemble(key, (pt, dt), dm, (12, 16),
                                        bitslice=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))


def test_bitsliced_ensemble_matches_fsm_transposed_layout():
    """Tiny-E geometry (config-5-like): the transposed word layout
    (members on the lane axis) must also be bit-identical to the FSM
    round."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(17)
    B, L, E = 4096, 32, 2
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    key = jax.random.PRNGKey(3)
    (p1, d1), _ = ensemble.run_ensemble(key, (pt, dt), dm, (8, E),
                                        bitslice=False)
    (p2, d2), _ = ensemble.run_ensemble(key, (pt, dt), dm, (8, E),
                                        bitslice=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))


def test_bitsliced_ensemble_matches_fsm_3d_layout():
    """Tiny-E geometry at a member count whose word axis splits dense
    (B=32768 -> W=1024 = 8x128): the 3-D [E, S, P] transposed layout
    must also be bit-identical to the FSM round."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(19)
    B, L, E = 32768, 32, 2
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    key = jax.random.PRNGKey(5)
    (p1, d1), _ = ensemble.run_ensemble(key, (pt, dt), dm, (8, E),
                                        bitslice=False)
    (p2, d2), _ = ensemble.run_ensemble(key, (pt, dt), dm, (8, E),
                                        bitslice=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))


def test_blocked_rounds_bitsliced_matches_fsm_3d_layout():
    """Blocked frontier rounds at a K whose word axis splits dense
    (K=32768 -> W=1024): 3-D layout bit-identical to the FSM rounds."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(29)
    K, L, E = 32768, 64, 4
    stride = L // E
    pt = jnp.asarray(rng.randint(0, dm.size_a, (K, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (K, L)), jnp.int32)
    pp = ensemble._to_planes_t(pt, stride=stride)
    dd = ensemble._to_planes_t(dt, stride=stride)
    lw = jnp.asarray(rng.randn(K))
    key = jax.random.PRNGKey(11)
    p1, d1, l1 = ensemble._blocked_rounds(key, pp, dd, lw, dm,
                                          rounds=4, tau=1.0,
                                          bitslice=False)
    p2, d2, l2 = ensemble._blocked_rounds(key, pp, dd, lw, dm,
                                          rounds=4, tau=1.0,
                                          bitslice=True)
    for a, b in zip(p1 + d1, p2 + d2):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))


def test_blocked_rounds_bitsliced_matches_fsm():
    """The blocked frontier's bit-sliced rounds (choose-free machines)
    must reproduce the FSM rounds' planes bit for bit, with the
    log-weights passing through untouched."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(23)
    K, L, E = 256, 64, 4
    stride = L // E
    pt = jnp.asarray(rng.randint(0, dm.size_a, (K, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (K, L)), jnp.int32)
    pp = ensemble._to_planes_t(pt, stride=stride)
    dd = ensemble._to_planes_t(dt, stride=stride)
    lw = jnp.asarray(rng.randn(K))
    key = jax.random.PRNGKey(7)
    p1, d1, l1 = ensemble._blocked_rounds(key, pp, dd, lw, dm,
                                          rounds=6, tau=1.0,
                                          bitslice=False)
    p2, d2, l2 = ensemble._blocked_rounds(key, pp, dd, lw, dm,
                                          rounds=6, tau=1.0,
                                          bitslice=True)
    for a, b in zip(p1 + d1, p2 + d2):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))


@pytest.mark.parametrize("tag", [
    "ex4-chemical-turing",
    "ex2-ferromagnetic-chain",
])
def test_sampling_circuit_branch_law(tag):
    """Choose-ful machines on the bit-sliced SAMPLING path (fresh
    24-bit integer uniform per choose level, comparator circuits) must
    reproduce the FSM path's dynamics: both sample the same multiverse
    law exactly, so their empirical window distributions agree at MC
    resolution. A branch-encoding or threshold bug would distort the
    branch probabilities grossly and trip the gate."""
    dm = ensemble.compile_decision_machine(tag)
    B, L, steps, E = 512, 1024, 20, 32
    rng = np.random.RandomState(31)
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    (pf, df), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(100), (pt, dt), dm, (steps, E),
        bitslice=False)
    (ps, ds), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(200), (pt, dt), dm, (steps, E),
        bitslice=True)
    n_eff = B * (L // E)  # independent residue classes, as in
    #                       test_parallel_rounds_match_low_density_decay
    for a, b in ((pf, ps), (df, ds)):
        ca = np.asarray(ensemble.window_counts(a, dm.size_a, 2))
        cb = np.asarray(ensemble.window_counts(b, dm.size_a, 2))
        pbar = 0.5 * (ca + cb)
        sigma = np.sqrt(2.0 * pbar * (1 - pbar) / n_eff)
        assert (np.abs(ca - cb) < 7 * sigma + 3e-3).all(), \
            f"max dev {np.abs(ca - cb).max():.4f}"


def test_plane_storage_roundtrip():
    rng = np.random.RandomState(3)
    t = jnp.asarray(rng.randint(0, 5, (3, 64)), jnp.int8)
    planes = ensemble._tape_to_planes(t, 16)
    assert len(planes) == 16 and planes[0].shape == (3, 4)
    np.testing.assert_array_equal(
        np.asarray(ensemble._planes_to_tape(planes)), np.asarray(t))


def test_run_ensemble_accepts_decision_machine():
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    pt = jnp.zeros((2, 128), jnp.int32)
    dtp = jnp.zeros((2, 128), jnp.int32)
    (pt2, _), (applied, times) = ensemble.run_ensemble(
        jax.random.PRNGKey(0), (pt, dtp), dm, (4, 8))
    assert int(np.asarray(applied).sum()) == 2 * 8 * 4
    assert np.asarray(times).shape == (4,)
    assert np.asarray(pt2).shape == (2, 128)


def test_weighted_frontier_tracks_exact_spd():
    """Top-k frontier mode (BASELINE config 5): the weighted window
    statistics must track the exact SPD ODE (beam-pruning bias allowed
    at a few % absolute)."""
    import math

    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

    cl_k = 3
    p0 = ferromagnet_p0(cl_k, p_pair=0.05, corrected=True).ravel()
    table = ensemble.compile_transition_table("ex2-ferromagnetic-chain")
    dtab = ensemble.device_table(table)
    K, L = 256, 128
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(2), p0, 2, cl_k, K, L
    )
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    (_, dtape), logw = ensemble.run_weighted_frontier(
        jax.random.PRNGKey(3), (ptape, dtape), logw, dtab, 2 * L, K
    )
    w = np.exp(np.asarray(logw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    ess = 1.0 / np.sum((w / w.sum()) ** 2)
    assert ess > K / 10  # pruning keeps the frontier diverse

    p_emp = np.asarray(
        ensemble.weighted_window_counts(dtape, w, 2, cl_k)
    )
    fn = make_dy_dt(compile_problem("ex2-ferromagnetic-chain", cl_k))
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0, 2.0, 3),
               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(p_emp, ys[-1], atol=0.04)


def test_window_counts_simple():
    tape = jnp.asarray([[0, 1, 0, 1]])
    counts = np.asarray(ensemble.window_counts(tape, 2, 2))
    np.testing.assert_allclose(counts, [0, 0.5, 0.5, 0])


def test_sample_tapes_from_spd_statistics():
    q = np.array([0.8, 0.2])
    spd = np.einsum("i,j->ij", q, q).ravel()
    tapes = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(4), spd, 2, 2, 16, 4096
    )
    counts = np.asarray(ensemble.window_counts(tapes, 2, 2))
    np.testing.assert_allclose(counts, spd, atol=0.01)


def test_weighted_frontier_deterministic_rule_keeps_uniform_weights():
    """ex5's transition table has one outcome per window (M=1): the
    frontier cannot branch, so the fast path (no top-k sort, no parent
    gather) must keep the weights exactly uniform while the tapes
    evolve."""
    import math

    table = ensemble.compile_transition_table("ex5-msrtf-machine")
    dtab = ensemble.device_table(table)
    assert dtab.out_cum.shape[1] == 1  # deterministic: M == 1
    K, L = 64, 32
    ptape = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0, 3,
                               dtype=jnp.int32)
    dtape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    (pt2, dt2), lw = ensemble.run_weighted_frontier(
        jax.random.PRNGKey(1), (ptape, dtape), logw, dtab, 20, K)
    np.testing.assert_allclose(np.asarray(lw), -math.log(K), rtol=1e-12)
    assert pt2.dtype == ptape.dtype
    # The S symbol (index 1) starts machines: data tape must have
    # changed somewhere across the ensemble.
    assert int(jnp.sum(jnp.abs(dt2))) > 0


def test_frontier_write_decode_paths_agree():
    """The packed-word write decode and the gather fallback must be
    bit-identical (the fallback serves spec tables too large to pack)."""
    import dataclasses
    import math

    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex2-ferromagnetic-chain"))
    assert dtab.n_wr_words > 0  # packed path active for ex2
    dtab_gather = dataclasses.replace(dtab, wr_words=None, n_wr_words=0)
    K, L, steps = 64, 32, 12
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), np.full(8, 0.125), 2, 3, K, L)
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    outs = []
    for tab in (dtab, dtab_gather):
        (pt, dt), lw = ensemble.run_weighted_frontier(
            jax.random.PRNGKey(1), (ptape, dtape), logw, tab, steps, K)
        outs.append((np.asarray(pt), np.asarray(dt), np.asarray(lw)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-13)


# --- Blocked weighted frontier (multi-site rounds + merge-by-key) -----------


def test_merge_stats_and_resample_core():
    """Unit check of the sort-free merge machinery on a hand-built
    frontier: members 0 and 2 share a key and must merge into member 0's
    group; resampling must preserve per-configuration mass."""
    h = jnp.asarray([7, 3, 7, 5], dtype=jnp.uint64)
    lw = jnp.log(jnp.asarray([0.1, 0.3, 0.2, 0.4]))
    grp, merged_lw, is_rep, n_groups = ensemble._merge_stats(h, lw)
    assert int(n_groups) == 3
    grp = np.asarray(grp)
    assert grp[0] == grp[2] == 0 and grp[1] == 1 and grp[3] == 3
    np.testing.assert_array_equal(np.asarray(is_rep),
                                  [True, True, False, True])
    merged = np.exp(np.asarray(merged_lw))
    np.testing.assert_allclose(merged[[0, 1, 3]], [0.3, 0.3, 0.4],
                               rtol=1e-12)
    assert merged[2] == 0.0  # non-rep slots carry -inf

    parent, new_lw, ng = ensemble._merge_resample(
        jax.random.PRNGKey(0), h, lw)
    assert int(ng) == 3
    parent, new_lw = np.asarray(parent), np.asarray(new_lw)
    # Weight-preserving: total mass 1; every slot points at a rep.
    np.testing.assert_allclose(np.exp(new_lw).sum(), 1.0, rtol=1e-8)
    assert set(parent) <= {0, 1, 3}
    # Per-configuration mass is preserved exactly for surviving configs.
    for rep_idx, w_cfg in ((0, 0.3), (1, 0.3), (3, 0.4)):
        mass = np.exp(new_lw)[parent == rep_idx].sum()
        if mass > 0:
            np.testing.assert_allclose(mass, w_cfg, rtol=1e-8)


def test_merge_resample_collision_defers_not_corrupts():
    """Distinct configurations that land in the same hash-table bucket
    must stay unmerged (each its own group) — a collision may only
    defer a merge, never conflate two configurations."""
    # Keys equal mod any power-of-two bucket count but different hashes.
    K = 4
    n_buckets = 1 << (2 * K - 1).bit_length()
    h = jnp.asarray([1, 1 + n_buckets * 3, 2, 3], dtype=jnp.uint64)
    lw = jnp.full((K,), -np.log(K))
    grp, merged_lw, is_rep, n_groups = ensemble._merge_stats(h, lw)
    assert int(n_groups) == K  # nothing merges
    np.testing.assert_allclose(np.exp(np.asarray(merged_lw)), 1.0 / K,
                               rtol=1e-12)


def test_merge_weights_inplace_moves_mass_to_one_rep():
    h = jnp.asarray([9, 9, 9, 2], dtype=jnp.uint64)
    lw = jnp.log(jnp.asarray([0.25, 0.25, 0.25, 0.25]))
    new_lw = np.asarray(ensemble._merge_weights_inplace(h, lw))
    finite = np.isfinite(new_lw)
    assert finite.sum() == 2  # one rep per distinct key
    np.testing.assert_allclose(np.exp(new_lw[finite]).sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(sorted(np.exp(new_lw[finite])), [0.25, 0.75],
                               rtol=1e-12)


def test_content_hash_distinguishes_and_matches():
    a = jnp.asarray([[0, 1, 2], [0, 1, 2], [2, 1, 0]], jnp.int8)
    h = np.asarray(ensemble._content_hash([a[:, j] for j in range(3)]))
    assert h[0] == h[1] and h[0] != h[2]


def test_blocked_frontier_merges_duplicate_configurations():
    """K slots holding 2 distinct tapes x 32 copies: a deterministic rule
    keeps them duplicated, so the first merge must find exactly 2 unique
    configurations and re-deal uniform slot weights (0.5 / 32 each)."""
    import math

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    K, L = 64, 32
    base = jax.random.randint(jax.random.PRNGKey(5), (2, L), 0, 3,
                              dtype=jnp.int32)
    pt = jnp.tile(base, (K // 2, 1))
    dt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K), jnp.float64)
    (pt2, dt2), lw2, nu = ensemble.run_weighted_frontier_blocked(
        jax.random.PRNGKey(2), (pt, dt), lw, dm, (1, 1, 2))
    assert int(np.asarray(nu)[0]) == 2
    np.testing.assert_allclose(np.exp(np.asarray(lw2)), 1.0 / K, rtol=1e-9)


def test_blocked_frontier_deterministic_rule_uniform_weights():
    """tau=1 sampling of a deterministic rule (every choose-free path has
    p=1): importance increments are identically zero, so distinct tapes
    keep exactly uniform weights through rounds and merges."""
    import math

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    K, L = 64, 32
    pt = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0, 3,
                            dtype=jnp.int32)
    dt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K), jnp.float64)
    (pt2, dt2), lw2, nu = ensemble.run_weighted_frontier_blocked(
        jax.random.PRNGKey(1), (pt, dt), lw, dm, (3, 4, 2))
    assert (np.asarray(nu) == K).all()  # random tapes stay distinct
    np.testing.assert_allclose(np.asarray(lw2), -math.log(K), rtol=1e-9)
    assert int(jnp.sum(jnp.abs(dt2))) > 0  # machines executed
    assert pt2.dtype == pt.dtype


@pytest.mark.parametrize("tau", [1.0, 0.5])
def test_blocked_frontier_tracks_exact_spd(tau):
    """The blocked frontier's weighted window statistics must track the
    exact SPD ODE as well as the per-step beam does (same 0.04 budget as
    test_weighted_frontier_tracks_exact_spd), at any sampling
    temperature — the tempered estimator is unbiased for every tau."""
    import math

    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

    cl_k = 3
    p0 = ferromagnet_p0(cl_k, p_pair=0.05, corrected=True).ravel()
    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    K, L = 256, 128
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(2), p0, 2, cl_k, K, L)
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    # t = 2.0: dt_round = -log1p(-E/L) per round; pick E=8, rounds such
    # that blocks*rounds*dt ~= 2.0.
    E = 8
    dt_round = -math.log1p(-E / L)
    rounds = 4
    blocks = max(1, round(2.0 / (dt_round * rounds)))
    (_, dtape2), lw, nu = ensemble.run_weighted_frontier_blocked(
        jax.random.PRNGKey(3), (ptape, dtape), logw, dm,
        (blocks, rounds, E), tau=tau)
    w = np.exp(np.asarray(lw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    ess = 1.0 / np.sum((w / w.sum()) ** 2)
    assert ess > K / 10

    p_emp = np.asarray(ensemble.weighted_window_counts(dtape2, w, 2, cl_k))
    fn = make_dy_dt(compile_problem("ex2-ferromagnetic-chain", cl_k))
    t_end = blocks * rounds * dt_round
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0, t_end, 3),
               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(p_emp, ys[-1], atol=0.04)


def test_per_step_frontier_merge_every_tightens_tracking():
    """merge_every > 0 restores effective beam width: duplicate slots
    drop to -inf and the next top-k backfills them with distinct
    children. The merged beam must stay at least as close to the exact
    SPD as the plain beam (allowing a small stochastic margin), and its
    weights must remain normalised."""
    import math

    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

    cl_k = 3
    p0 = ferromagnet_p0(cl_k, p_pair=0.05, corrected=True).ravel()
    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex2-ferromagnetic-chain"))
    K, L = 128, 64
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(2), p0, 2, cl_k, K, L)
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    steps = 2 * L

    fn = make_dy_dt(compile_problem("ex2-ferromagnetic-chain", cl_k))
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0, steps / L, 3),
               rtol=1e-8, atol=1e-10)

    errs = {}
    for me in (0, 4):
        (_, dt2), lw = ensemble.run_weighted_frontier(
            jax.random.PRNGKey(3), (ptape, dtape), logw, dtab, steps, K, me)
        w = np.exp(np.asarray(lw))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
        p_emp = np.asarray(ensemble.weighted_window_counts(dt2, w, 2, cl_k))
        errs[me] = np.abs(p_emp - np.asarray(ys[-1])).max()
    assert errs[4] <= errs[0] + 0.01
    assert errs[4] < 0.05


def test_frontier_rejects_wide_alphabet():
    import dataclasses
    import math

    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex2-ferromagnetic-chain"))
    wide = dataclasses.replace(dtab, size_a=200)
    K, L = 8, 32
    pt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K))
    with pytest.raises(ValueError, match="int8"):
        ensemble.run_weighted_frontier(
            jax.random.PRNGKey(0), (pt, pt), lw, wide, 2, K)


def test_per_step_merge_every_collapses_engineered_duplicates():
    """Direct mechanism check for merge_every: start the beam with every
    slot holding the SAME tape. Without merging, all K slots stay
    duplicates of one configuration forever (they branch identically and
    rank identically); with merge_every=1, after the first merge all
    mass sits in single representative slots and the -inf'd slots are
    backfilled by the next top-k with genuinely distinct children —
    so the final frontier must contain strictly more distinct tapes."""
    import math

    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex2-ferromagnetic-chain"))
    K, L, steps = 32, 32, 16
    one = jax.random.randint(jax.random.PRNGKey(0), (1, L), 0, 2,
                             dtype=jnp.int32)
    dtape = jnp.tile(one, (K, 1))
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))

    def distinct_tapes(dt2, w):
        rows = {tuple(np.asarray(r)) for r, wi in zip(dt2, w) if wi > 0}
        return len(rows)

    counts = {}
    for me in (0, 1):
        (_, dt2), lw = ensemble.run_weighted_frontier(
            jax.random.PRNGKey(3), (ptape, dtape), logw, dtab, steps,
            K, me)
        w = np.exp(np.asarray(lw))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
        counts[me] = distinct_tapes(np.asarray(dt2), w)
    assert counts[1] > counts[0], counts


def test_choose_sampling_dist_tau1_is_exact_identity():
    """At tau=1 the sampling distribution must be p EXACTLY (no
    renormalisation) with identically-zero importance increments, so the
    sampling walk stays bit-identical to the tau-free ensemble path even
    when the table's probs sum to 1 only within a few ulp."""
    p = np.array([0.3, 0.7 + 1e-16, 0.0])
    q, delta = ensemble._choose_sampling_dist(p, 1.0)
    assert (q == p).all()
    assert (delta == 0.0).all()
    # tau<1 still renormalises and reweights.
    q2, delta2 = ensemble._choose_sampling_dist(p, 0.5)
    np.testing.assert_allclose(q2.sum(), 1.0, rtol=1e-15)
    assert (delta2[:2] != 0.0).any()


def test_blocked_frontier_rejects_wide_alphabet():
    """The blocked frontier's merge key packs symbols into 4-bit fields;
    alphabets wider than 16 symbols must be rejected loudly (aliased
    hashes would silently conflate distinct configurations)."""
    import math

    from chemical_kinetics_and_program_execution_tpu.engine import dsl

    tag = "_test-wide-alphabet-17"
    if tag not in dsl.registered_problems():
        @dsl.register_problem(
            tag, symbols=tuple(f"W{i}" for i in range(17)))
        def rule(t):
            if t.get(False, 0) == 1:
                t.set(False, 0, 0)

    dm = ensemble.compile_decision_machine(tag)
    K, L = 8, 32
    pt = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -math.log(K), jnp.float64)
    with pytest.raises(ValueError, match="4-bit"):
        ensemble.run_weighted_frontier_blocked(
            jax.random.PRNGKey(0), (pt, pt), lw, dm, (1, 2, 2))


def test_sharded_blocked_frontier_validates_plan_and_dtype():
    """The sharded island twin must enforce the same plan gates as the
    single-chip entry point (span/stride violations silently corrupt
    dynamics) and hand back tapes in the caller's dtype."""
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_frontier_blocked,
    )
    import math

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    mesh = make_mesh(n_batch=2, n_event=4)
    k_loc, L = 4, 32
    n = 8 * k_loc
    pt = jnp.zeros((n, L), jnp.int32)
    lw = jnp.full((n,), -math.log(float(k_loc)), jnp.float64)

    # events=16 -> stride 2 <= 2*span: must raise, as single-chip does.
    bad = make_sharded_frontier_blocked(dm, mesh, (1, 2, 16), k_loc)
    with pytest.raises(ValueError, match="stride"):
        bad(jax.random.PRNGKey(0), (pt, pt), lw)

    good = make_sharded_frontier_blocked(dm, mesh, (1, 2, 2), k_loc)
    (p2, d2), w2, nu = good(jax.random.PRNGKey(0), (pt, pt), lw)
    assert p2.dtype == pt.dtype and d2.dtype == pt.dtype


def test_ring_bridge_sampling_has_no_seam_artifact():
    """Circular Markov-bridge tape sampling must keep windows crossing
    the wrap seam Markov-consistent. The ex2 pair p0 has EXACTLY zero
    single-U islands (p(DUD)=0); a linear chain laid on a ring fabricates
    them at the junction, the bridge must not."""
    from chemical_kinetics_and_program_execution_tpu import markov_tapes
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )

    p0 = ferromagnet_p0(5, p_pair=1 / 250).ravel()

    def p_dud(tapes):
        c = np.asarray(ensemble.window_counts(tapes, 2, 5))
        return float(np.squeeze(
            markov_tapes.seq_prob(c.reshape((2,) * 5), (0, 1, 0))[0]))

    key = jax.random.PRNGKey(0)
    ringed = ensemble.sample_tapes_from_spd(key, p0, 2, 5, 2048, 128)
    linear = ensemble.sample_tapes_from_spd(key, p0, 2, 5, 2048, 128,
                                            ring=False)
    assert p_dud(ringed) == 0.0
    assert p_dud(linear) > 1e-5  # the seam artifact the bridge removes
    # And the bulk window statistics still match the SPD.
    c = np.asarray(ensemble.window_counts(ringed, 2, 5))
    assert np.abs(c - p0).sum() < 0.02


def test_first_passage_matches_occupancy_for_monotone_pattern():
    """For ex1 radioactive decay, A-cells never revert, so 'pattern of
    A's present at t' is monotone in t and P(first-passage <= t) must
    equal the pattern-occupancy fraction at t — computed here through
    the INDEPENDENT run_ensemble code path with different seeds."""
    import math

    dm = ensemble.compile_decision_machine("ex1-radioactive-decay")
    B, L, E, rounds = 512, 64, 4, 24
    pattern = (0, 0, 0)
    pt0 = jnp.zeros((B, L), jnp.int32)
    dt0 = jnp.ones((B, L), jnp.int32)

    t_hit, hit, _ = ensemble.first_passage_times(
        jax.random.PRNGKey(0), (pt0, dt0), dm, pattern, (rounds, E))
    t_hit = np.asarray(t_hit)
    dt_round = -math.log1p(-E / L)

    # Occupancy at the half- and full-horizon times via run_ensemble.
    for r in (rounds // 2, rounds):
        t = r * dt_round
        (_, d2), _ = ensemble.run_ensemble(
            jax.random.PRNGKey(100 + r), (pt0, dt0), dm, (r, E))
        occ = float(np.asarray(
            ensemble.contains_pattern(d2, pattern)).mean())
        cdf = float((t_hit <= t + 1e-12).mean())
        # Monotone pattern: first-passage-by-t == present-at-t, up to
        # binomial noise of two independent 512-member ensembles.
        se = math.sqrt(occ * (1 - occ) / B + cdf * (1 - cdf) / B) + 1e-9
        assert abs(cdf - occ) < 5 * se + 0.01, (r, cdf, occ)


def test_first_passage_initial_hit_and_no_hit():
    dm = ensemble.compile_decision_machine("ex1-radioactive-decay")
    B, L = 8, 32
    pt0 = jnp.zeros((B, L), jnp.int32)
    # Tape already containing the pattern: t_hit = 0.
    d_with = jnp.zeros((B, L), jnp.int32)
    t_hit, hit, _ = ensemble.first_passage_times(
        jax.random.PRNGKey(0), (pt0, d_with), dm, (0, 0), (4, 2))
    assert (np.asarray(t_hit) == 0.0).all()
    # Pattern that can never form (symbol 1 never written): inf.
    d_without = jnp.zeros((B, L), jnp.int32)
    t_hit, hit, _ = ensemble.first_passage_times(
        jax.random.PRNGKey(0), (pt0, d_without), dm, (1, 1), (4, 2))
    assert not np.asarray(hit).any()
    assert np.isinf(np.asarray(t_hit)).all()


def test_weighted_first_passage_matches_unweighted_and_is_tau_invariant():
    """Weighted-ensemble first passage (blocked frontier + hit-flagged
    merge) must reproduce the brute-force per-member survival curve at
    tau=1 and matched check cadence, and stay unbiased at tau<1 (the
    importance weights exactly compensate the tempered branch law)."""
    import math

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )

    K, L, E, n_rounds = 2048, 64, 4, 24
    pattern = (1, 1, 1)
    p0 = ferromagnet_p0(4, p_pair=0.05, corrected=True).ravel()
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), p0, 2, 4, K, L)
    ptape = jnp.zeros((K, L), jnp.int8)
    lw0 = jnp.full((K,), -math.log(K), jnp.float64)

    # Brute force: per-round checks, independent seed.
    t_hit, _, _ = ensemble.first_passage_times(
        jax.random.PRNGKey(7), (ptape, dtape), dm, pattern,
        (n_rounds, E))
    t_hit = np.asarray(t_hit)

    # Weighted ensemble at matched cadence (1 round per block).
    surv = {}
    for tau in (1.0, 0.5):
        s, ess, t_blocks, _, _, _, n_uniq = ensemble.weighted_first_passage(
            jax.random.PRNGKey(8), (ptape, dtape), lw0, dm, pattern,
            (n_rounds, 1, E), tau=tau)
        surv[tau] = (np.asarray(s), t_blocks)
        if tau == 1.0:  # true branch law: weights stay uniform
            np.testing.assert_allclose(np.asarray(ess), K, rtol=1e-9)
        nu = np.asarray(n_uniq)
        assert nu.shape == (n_rounds,) and np.all((nu >= 1) & (nu <= K))

    s1, t_blocks = surv[1.0]
    for bi in (n_rounds // 2 - 1, n_rounds - 1):
        t_b = t_blocks[bi]
        s_bf = float((t_hit > t_b + 1e-12).mean())
        se = math.sqrt(max(s_bf * (1 - s_bf), 1e-4) / K)
        # Correlated members (shared sites) + resampling noise: allow a
        # generous multiple of the iid standard error.
        assert abs(float(s1[bi]) - s_bf) < 10 * se + 0.02, (
            bi, float(s1[bi]), s_bf)
        # tau-invariance: the tempered estimator targets the same S(t).
        s_t = float(surv[0.5][0][bi])
        assert abs(s_t - s_bf) < 10 * se + 0.05, (bi, s_t, s_bf)


def test_plane_state_continuation_bit_identical():
    """keep_planes/PlaneState continuation reproduces plain chained
    calls bit-for-bit (pack<->unpack is an exact roundtrip), for both
    the bit-sliced and the FSM plane rounds."""
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(3)
    B, L, E = 4096, 64, 4
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    k1, k2 = jax.random.PRNGKey(11), jax.random.PRNGKey(12)
    for flag in (True, False):
        (p_a, d_a), _ = ensemble.run_ensemble(k1, (pt, dt), dm, (6, E),
                                              bitslice=flag)
        (p_a, d_a), (app_a, t_a) = ensemble.run_ensemble(
            k2, (p_a, d_a), dm, (6, E), bitslice=flag)
        st, _ = ensemble.run_ensemble(k1, (pt, dt), dm, (6, E),
                                      bitslice=flag, keep_planes=True)
        assert isinstance(st, ensemble.PlaneState)
        assert st.kind == ("bits" if flag else "fsm")
        st, (app_b, t_b) = ensemble.run_ensemble(
            k2, st, dm, (6, E), bitslice=flag, keep_planes=True)
        p_b, d_b = st.tapes()
        np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_a))
        np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_a))
        np.testing.assert_array_equal(np.asarray(app_b),
                                      np.asarray(app_a))
        np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_a))
        # Mixed continuation: PlaneState in, decoded tapes out.
        st2, _ = ensemble.run_ensemble(k1, (pt, dt), dm, (6, E),
                                       bitslice=flag, keep_planes=True)
        (p_c, d_c), _ = ensemble.run_ensemble(k2, st2, dm, (6, E),
                                              bitslice=flag)
        np.testing.assert_array_equal(np.asarray(p_c), np.asarray(p_a))
        np.testing.assert_array_equal(np.asarray(d_c), np.asarray(d_a))


def test_plane_state_rejects_mismatched_calls():
    """PlaneState geometry/path mismatches fail loudly at trace time."""
    import pytest
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    rng = np.random.RandomState(4)
    B, L, E = 2048, 64, 4
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    key = jax.random.PRNGKey(5)
    st, _ = ensemble.run_ensemble(key, (pt, dt), dm, (2, E),
                                  keep_planes=True)
    with pytest.raises(ValueError, match="stride"):
        ensemble.run_ensemble(key, st, dm, (2, 2 * E))
    with pytest.raises(ValueError, match="bit-sliced"):
        ensemble.run_ensemble(key, st, dm, (2, E), bitslice=False)
    with pytest.raises(ValueError, match="plane"):
        ensemble.run_ensemble(key, (pt, dt), dm, (2, E),
                              independent_sites=True, keep_planes=True)


def test_we_binned_first_passage_unbiased_and_enriching():
    """WE splitting on the pattern-progress coordinate (round 3,
    `weighted_first_passage_binned`) must not bias the first-passage
    estimate — split ON vs OFF (plain Monte Carlo in the same harness)
    agree within combined 6 sigma across seeds, and the split run at K
    walkers matches a 10x-walker brute-force run within the same
    budget — while on a STATE-rare target (6 consecutive U from the
    all-D chain, individually-suppressed flips that must assemble) it
    resolves nonzero flux and pushes the leading edge where equal-K
    brute force sees nothing."""
    import math

    import jax

    dm = ensemble.compile_decision_machine("ex2-ferromagnetic-chain")
    K, L = 256, 64
    pat = (1,) * 8
    n_seeds = 4

    def run(split, s, k_walkers):
        kt = jax.random.fold_in(jax.random.PRNGKey(900), s)
        dtp = jax.random.randint(kt, (k_walkers, L), 0, 2,
                                 dtype=jnp.int32)
        pt = jnp.zeros((k_walkers, L), jnp.int32)
        lw = jnp.full((k_walkers,), -math.log(k_walkers))
        surv, tb, occ, qmax = ensemble.weighted_first_passage_binned(
            jax.random.PRNGKey(40 + 10 * s + split), (pt, dtp), lw, dm,
            pat, (8, 4, 8), split=split, seed=s)
        return 1.0 - surv[-1], qmax

    finals = {}
    for split in (True, False):
        finals[split] = np.asarray(
            [run(split, s, K)[0] for s in range(n_seeds)])
    sem = np.sqrt(finals[True].var(ddof=1) / n_seeds
                  + finals[False].var(ddof=1) / n_seeds + 1e-12)
    assert abs(finals[True].mean() - finals[False].mean()) < 6 * sem

    # 10x fewer walkers: the split estimate at K matches brute force
    # at 10K within the combined spread.
    brute10 = np.asarray([run(False, s, 10 * K)[0] for s in range(2)])
    sem10 = np.sqrt(finals[True].var(ddof=1) / n_seeds
                    + brute10.var(ddof=1) / 2 + 1e-12)
    assert abs(finals[True].mean() - brute10.mean()) < 6 * sem10

    # State-rare target: all-D start, 6-U motif (a single U flip is
    # e^-8-suppressed; six must assemble adjacently). Equal-K brute
    # force records zero flux and a stalled leading edge; splitting
    # climbs the staircase bin by bin and resolves a strictly
    # positive (if tiny) flux.
    rare = (1,) * 6
    Kr = 512
    pt0 = jnp.zeros((Kr, L), jnp.int32)
    lw0 = jnp.full((Kr,), -math.log(Kr))
    surv_s, _, _, qmax_s = ensemble.weighted_first_passage_binned(
        jax.random.PRNGKey(5), (pt0, jnp.zeros((Kr, L), jnp.int32)),
        lw0, dm, rare, (6, 4, 8), split=True, seed=1)
    surv_p, _, _, qmax_p = ensemble.weighted_first_passage_binned(
        jax.random.PRNGKey(5), (pt0, jnp.zeros((Kr, L), jnp.int32)),
        lw0, dm, rare, (6, 4, 8), split=False, seed=1)
    assert surv_s[-1] < 1.0 and surv_p[-1] == 1.0
    assert qmax_s.max() >= qmax_p.max() + 2


def test_sampling_circuit_split_matches_unsplit():
    """The SPLIT sampling-circuit synthesis (round 4: one sub-table
    per cell/distribution group, the wide-window enabler) is
    bit-identical to the whole-level synthesis on a machine both can
    handle — same inputs, same rand consumption, identical output
    words under a pure numpy evaluation of both DAGs."""
    from chemical_kinetics_and_program_execution_tpu.engine import (
        bitslice as bs,
    )

    dm = ensemble.compile_decision_machine("fuzz-wide-specs")
    c0 = bs.compile_sampling_circuit(dm)
    c1 = bs.compile_sampling_circuit(dm, force_split=True)
    assert c0[2] == c1[2] and c0[3] == c1[3]
    assert len(c0[1]) == len(c1[1])
    n_in = (dm.n_p + dm.n_d) * c0[2] + c0[3]
    rng = np.random.default_rng(0)
    words = [rng.integers(0, 2**32, size=(9,), dtype=np.uint32)
             for _ in range(n_in)]
    o0 = bs._eval_circuit(c0[0], c0[1], words, (9,))
    o1 = bs._eval_circuit(c1[0], c1[1], words, (9,))
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a, dtype=np.uint32),
                                      np.asarray(b, dtype=np.uint32))


def test_wide_window_machine_sampling_circuit_exact_law():
    """ex6-mini-bff-lite's level 2 reads 5 distinct cells (28-bit
    whole-level table — past _MAX_SEL_BITS), so it was FSM-only until
    the split synthesis (round-3 verdict weak #4: the 7x fast-path
    cliff for wide-window rules). Now sampleable; this gate samples
    the SPLIT circuit per window with a pure numpy evaluation (its
    ~11k-op jit is not XLA:CPU-compilable in CI time) and compares
    the empirical outcome-window law against the EXACT quantized
    branch law walked host-side from the decision nodes — the same
    24-bit thresholds the circuit implements, so deviations are pure
    MC noise."""
    from chemical_kinetics_and_program_execution_tpu.engine import (
        bitslice as bs,
    )

    dm = ensemble.compile_decision_machine("ex6-mini-bff-lite")
    assert bs.machine_is_sampleable(dm)
    circ = bs.compile_sampling_circuit(dm)
    ops, outputs, nb, n_rand = circ
    n_cells = dm.n_p + dm.n_d
    by_id = {n.node_id: n for n in dm.nodes}
    fields = 31 // dm.bits
    mask = (1 << dm.bits) - 1

    def branch(n, b):
        child = (int(n.child_words[b // fields])
                 >> (dm.bits * (b % fields))) & mask
        spec = (int(n.spec_words[b // fields])
                >> (dm.bits * (b % fields))) & mask
        return child, spec

    def q_quant(probs):
        q, _ = ensemble._choose_sampling_dist(probs, 1.0)
        t = [0] + [int(round(float(c) * (1 << 24)))
                   for c in np.cumsum(q)[:-1]] + [1 << 24]
        return [(t[b + 1] - t[b]) / (1 << 24) for b in range(len(q))]

    def exact_law(win):
        out: dict = {}

        def apply_spec(spec, pr):
            new = list(win)
            for c in range(n_cells):
                wm, wv = ensemble.wr_field_host(dm.wr_words[c],
                                                np.asarray([spec]),
                                                dm.wr_bits)
                if bool(wm[0]):
                    new[c] = int(wv[0])
            key = tuple(new)
            out[key] = out.get(key, 0.0) + pr

        def walk(nid, pr):
            n = by_id[nid]
            if isinstance(n, ensemble._Choose):
                for b, p in enumerate(q_quant(n.probs)):
                    if p == 0.0:
                        continue
                    child, spec = branch(n, b)
                    if child == 0:
                        apply_spec(spec, pr * p)
                    else:
                        walk(child, pr * p)
            else:
                child, spec = branch(n, win[n.cell])
                if child == 0:
                    apply_spec(spec, pr)
                else:
                    walk(child, pr)

        walk(dm.root, 1.0)
        return out

    rng = np.random.default_rng(12)
    W = 256                      # word arrays -> 8192 samples/window
    n_samp = 32 * W
    for _ in range(12):
        win = rng.integers(0, dm.size_a, n_cells)
        law = exact_law(win)
        in_words = []
        for c in range(n_cells):
            for k in range(nb):
                v = 0xFFFFFFFF if (int(win[c]) >> k) & 1 else 0
                in_words.append(np.full(W, v, np.uint32))
        for _r in range(n_rand):
            in_words.append(rng.integers(0, 2**32, W, dtype=np.uint32))
        outs = [np.asarray(v).astype(np.uint32)
                for v in bs._eval_circuit(ops, outputs, in_words, (W,))]
        lanes = np.arange(32, dtype=np.uint32)
        sym = np.zeros((n_cells, n_samp), np.int64)
        for c in range(n_cells):
            for k in range(nb):
                bits = ((outs[c * nb + k][:, None] >> lanes) & 1)
                sym[c] |= bits.astype(np.int64).ravel() << k
        keys, counts = np.unique(sym.T, axis=0, return_counts=True)
        emp = {tuple(int(x) for x in row): n / n_samp
               for row, n in zip(keys, counts)}
        assert set(emp) <= set(law), (sorted(emp), sorted(law))
        for key, p in law.items():
            e = emp.get(key, 0.0)
            tol = 7 * np.sqrt(p * (1 - p) / n_samp) + 2e-3
            assert abs(e - p) < tol, (key, e, p, tol)


def test_tempered_first_passage_ess_adaptive():
    """Round-5 (verdict weak #4): long-horizon tempered first passage
    must stop degenerating when the ESS-adaptive absorbing mode is on.

    (a) EXACT-ORACLE unbiasedness at tau=0.5: on the L=12 ring the
    absorbing adaptive estimator's survival must match the projected
    discrete master kernel (the same oracle as
    `test_first_passage_oracled_by_absorbing_master`). The round-5 fix
    history matters here: the self-normalized ratio flux/(flux+live)
    measured ~2x-high flux once the total-weight law went heavy-tailed,
    and the beam's w/m resample drops sub-1/K mass — the gated
    estimator is the ABSOLUTE flux martingale with equal-weight
    (total-preserving) resampling (`_blocked_merge_equal`).
    (b) Degeneracy contrast on the measured collapse scenario (ex2,
    256 rounds, merges every 128): plain tau=0.5 collapses (ESS ~ few,
    P(hit) ~10-80x low) while the adaptive run holds ESS at K and
    lands within a factor ~3 of the brute-force rate.
    """
    import math

    from chemical_kinetics_and_program_execution_tpu.engine import (
        master,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )

    # --- (a) exact-oracle unbiasedness on the small ring ---
    tag, size_a, cl_k, L = "ex2-ferromagnetic-chain", 2, 3, 12
    pattern, E = (1, 1, 1), 1
    spd = ferromagnet_p0(cl_k, p_pair=0.3).reshape((2,) * cl_k)
    p0 = master.ring_trace_measure(spd, size_a, cl_k, L)
    hitmask = master.ring_contains_pattern(L, size_a, pattern)
    Q = master.build_ring_generator(tag, L)
    S_exact = float(master.discrete_survival(Q, p0, hitmask, 60, L)[-1])

    dm = ensemble.compile_decision_machine(tag)
    K = 4096
    lw0 = jnp.full((K,), -math.log(K), jnp.float64)
    devs = []
    for seed in (8, 9):
        key = jax.random.PRNGKey(seed)
        dtape = ensemble.sample_tapes_from_spd(
            jax.random.fold_in(key, 0), spd, size_a, cl_k, K, L,
            ring=True).astype(np.int8)
        ptape = jnp.zeros((K, L), jnp.int8)
        s, ess, _, _, _, _, _ = ensemble.weighted_first_passage(
            jax.random.fold_in(key, 1), (ptape, dtape), lw0, dm,
            pattern, (4, 15, E), tau=0.5, ess_frac=0.5, check_every=1)
        dev = float(np.asarray(s)[-1]) - S_exact
        assert abs(dev) < 0.03, (seed, dev, S_exact)
        devs.append(dev)
    # calibrated seeds 8-11 read devs in [-0.004, +0.011]
    assert abs(np.mean(devs)) < 0.02, (devs, S_exact)

    # --- (b) degeneracy contrast on the measured collapse scenario ---
    dm = ensemble.compile_decision_machine(tag)
    K, L, E = 2048, 64, 4
    blocks, rounds = 2, 128
    pattern = (1, 1, 1, 1, 1, 1)
    p0b = ferromagnet_p0(4, p_pair=0.05, corrected=True).ravel()
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), p0b, 2, 4, K, L)
    ptape = jnp.zeros((K, L), jnp.int8)
    lw0 = jnp.full((K,), -math.log(K), jnp.float64)
    P_BF = 0.033  # brute per-round checks, seeds 7/70: 0.0313/0.0347

    s_p, ess_p, _, _, _, _, _ = ensemble.weighted_first_passage(
        jax.random.PRNGKey(8), (ptape, dtape), lw0, dm, pattern,
        (blocks, rounds, E), tau=0.5)
    p_plain = 1.0 - float(np.asarray(s_p)[-1])
    ess_plain = float(np.asarray(ess_p)[-1])
    assert ess_plain < K / 50, ess_plain          # the silent collapse
    assert p_plain < P_BF / 5, (p_plain, P_BF)    # 10-80x-low estimate

    s_a, ess_a, _, _, _, _, _ = ensemble.weighted_first_passage(
        jax.random.PRNGKey(8), (ptape, dtape), lw0, dm, pattern,
        (blocks, rounds, E), tau=0.5, ess_frac=0.5, check_every=4)
    p_adapt = 1.0 - float(np.asarray(s_a)[-1])
    ess_adapt = float(np.asarray(ess_a)[-1])
    assert ess_adapt > K / 2, ess_adapt
    assert P_BF / 3 < p_adapt < 3 * P_BF, (p_adapt, P_BF)


def test_merge_resample_sorted_invariants():
    """Sort-based merge/resample (round-5) against the hash-table
    formulation: identical merged group weights, valid parents, the
    systematic-resampling slot guarantee, and correct group count."""
    rng = np.random.RandomState(0)
    K = 4096
    # hashes drawn from a small pool force heavy duplication
    pool = rng.randint(0, 2**63, size=300).astype(np.uint64)
    h = jnp.asarray(pool[rng.randint(0, len(pool), K)])
    lw = jnp.asarray(rng.normal(size=K) * 3.0)
    lw = lw.at[:7].set(-np.inf)  # absorbed slots ride along

    parent, new_lw, n_groups = ensemble._merge_resample_sorted(
        jax.random.PRNGKey(1), h, lw)
    parent, new_lw = np.asarray(parent), np.asarray(new_lw)
    h_np, lw_np = np.asarray(h), np.asarray(lw)

    uniq = np.unique(h_np[np.isfinite(lw_np)])
    assert int(n_groups) == len(np.unique(h_np))
    assert parent.shape == (K,) and np.all((parent >= 0) & (parent < K))

    # per-group truth: logsumexp of member weights
    w = np.exp(lw_np - np.nanmax(lw_np[np.isfinite(lw_np)]))
    w[~np.isfinite(lw_np)] = 0.0
    truth = {hh: w[h_np == hh].sum() for hh in uniq}
    total = sum(truth.values())

    # slots of each group carry exactly the group weight (w/m split),
    # and every group with weight >= total/K holds at least one slot
    slot_w = np.exp(new_lw - np.nanmax(lw_np[np.isfinite(lw_np)]))
    for hh in uniq:
        sel = h_np[parent] == hh
        got = slot_w[sel].sum()
        if sel.any():
            # group masses come from DIFFERENCES of XLA's parallel
            # (reassociated) cumsum: measured ~1e-7 worst-case relative
            # at this K - immaterial next to the f32 FSM increments
            np.testing.assert_allclose(got, truth[hh], rtol=2e-6)
        else:
            assert truth[hh] < total / K * (1 + 1e-9), hh

    # cross-check merged weights against the hash-table formulation;
    # bucket collisions make it DEFER some merges (several reps per
    # hash, re-rolled by the per-block salt), so compare per-hash
    # TOTALS and require the sorted count to be the exact one
    _, merged_lw, is_rep, ng2 = ensemble._merge_stats(h, lw)
    merged_lw, is_rep = np.asarray(merged_lw), np.asarray(is_rep)
    assert int(ng2) >= int(n_groups)  # deferral only splits groups
    for hh in uniq:
        rep = np.flatnonzero(is_rep & (h_np == hh))
        tot = np.exp(
            merged_lw[rep] - np.nanmax(lw_np[np.isfinite(lw_np)])).sum()
        np.testing.assert_allclose(tot, truth[hh], rtol=1e-10)


def test_gather_planes_pair_packed_bit_exact():
    """The single pair-packed row gather (round-5) must reproduce the
    per-tape packed gathers bit-for-bit, including negative int8
    round-trip via the field masks."""
    rng = np.random.RandomState(5)
    stride, E, K = 16, 4, 2048
    pp = tuple(jnp.asarray(rng.randint(-128, 128, (E, K)), jnp.int8)
               for _ in range(stride))
    dd = tuple(jnp.asarray(rng.randint(0, 12, (E, K)), jnp.int8)
               for _ in range(stride))
    parent = jnp.asarray(rng.randint(0, K, K), jnp.int32)
    pa, da = (ensemble._gather_plane_columns(pp, parent),
              ensemble._gather_plane_columns(dd, parent))
    pb, db = ensemble._gather_planes_pair_packed(pp, dd, parent)
    for a, b in zip(pa + da, pb + db):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_resample_positions_invariants():
    """Position-space equal-weight resample (round-5 blocked-merge
    engine): exact n_unique, valid parents, total weight preserved
    exactly, and group slot counts within 1 of K * group-share (the
    systematic guarantee, group-level allocation via sorted
    adjacency)."""
    rng = np.random.RandomState(2)
    K = 4096
    pool = rng.randint(0, 2**63, size=257).astype(np.uint64)
    h = jnp.asarray(pool[rng.randint(0, len(pool), K)])
    lw = jnp.asarray(rng.normal(size=K) * 2.0)
    lw = lw.at[:5].set(-np.inf)

    parent, new_lw, n_unique = ensemble._merge_resample_positions(
        jax.random.PRNGKey(3), h, lw)
    parent, new_lw = np.asarray(parent), np.asarray(new_lw)
    h_np, lw_np = np.asarray(h), np.asarray(lw)

    assert int(n_unique) == len(np.unique(h_np))
    assert np.all((parent >= 0) & (parent < K))

    # equal slot weights, total preserved exactly (log-space check)
    lse = float(jax.scipy.special.logsumexp(lw))
    np.testing.assert_allclose(new_lw, lse - np.log(K), rtol=1e-12)

    # group allocation: slots per hash within 1 of K * group share
    w = np.exp(lw_np - lw_np[np.isfinite(lw_np)].max())
    w[~np.isfinite(lw_np)] = 0.0
    total = w.sum()
    for hh in np.unique(h_np[np.isfinite(lw_np)]):
        share = w[h_np == hh].sum() / total
        got = (h_np[parent] == hh).sum()
        assert abs(got - K * share) < 1.0 + 1e-9, (hh, got, K * share)

    # members with zero weight (absorbed) never become parents
    assert np.isfinite(lw_np[parent]).all()

    # tau=1 coincidence: uniform weights -> every unique config keeps
    # ~K/n_unique slots and slot weights equal the old w/m scheme's
    lw_u = jnp.zeros((K,)) - np.log(K)
    p2, nlw2, nu2 = ensemble._merge_resample_positions(
        jax.random.PRNGKey(4), h, lw_u)
    np.testing.assert_allclose(np.asarray(nlw2), -np.log(K),
                               rtol=1e-12)
