"""engine/master: the exact finite-ring master equation as the
microscopic oracle for both the ensemble and the closure."""

import math

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu.engine import master


def test_outcome_table_matches_analytic_ex2_rates():
    lo, hi, table = master.window_outcome_table("ex2-ferromagnetic-chain")
    assert (lo, hi) == (-1, 1)
    J, BETA, H = 1.0, 1.0, -0.25
    for rank, (l, m, r) in enumerate(
            (a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)):
        e = (1 if l == m else -1) + (1 if m == r else -1)
        fa = math.exp(-(BETA * J * (4 + 2 * e)))
        fb = math.exp(-2 * BETA * abs(H)) if (H > 0) == (m == 1) else 1.0
        entries = table[rank]
        assert len(entries) == 1
        prob, writes = entries[0]
        np.testing.assert_allclose(prob, fa * fb, rtol=1e-12)
        assert writes == {0: 1 - m}


def test_generator_conserves_and_gibbs_is_stationary():
    L = 8
    Q = master.build_ring_generator("ex2-ferromagnetic-chain", L)
    col = np.asarray(Q.sum(axis=0)).ravel()
    assert np.abs(col).max() < 1e-12
    pi = master.ring_gibbs_states(L, J_eff=2.0, h=-0.25, beta=1.0)
    assert np.abs(Q @ pi).max() < 1e-15  # detailed balance, exactly


def test_two_tape_rule_rejected():
    with pytest.raises(ValueError, match="single-tape"):
        master.window_outcome_table("ex4-chemical-turing")


def test_cross_tape_write_rejected():
    """Reads on one tape + a WRITE on the other must raise too:
    before the fix the write slipped through the read-only guard, was
    silently applied to the data ring, and aliased into later reads of
    the same index — a wrong generator with no error."""
    from chemical_kinetics_and_program_execution_tpu.engine import dsl

    tag = "_master-cross-tape-write"
    if tag not in dsl.registered_problems():
        @dsl.register_problem(tag, symbols=("a", "b"))
        def rule(t):
            v = t.get(True, 0)
            t.set(False, 0, 1 - v)

    with pytest.raises(ValueError, match="single-tape"):
        master.window_outcome_table(tag)


def test_write_only_single_tape_rule_accepted():
    """A rule that only writes (touching one tape) stays in scope."""
    from chemical_kinetics_and_program_execution_tpu.engine import dsl

    tag = "_master-write-only"
    if tag not in dsl.registered_problems():
        @dsl.register_problem(tag, symbols=("a", "b"))
        def rule(t):
            t.set(True, 0, 1)

    lo, hi, table = master.window_outcome_table(tag)
    assert (lo, hi) == (0, 0)
    assert table[0] == [(1.0, {0: 1})] and table[1] == []


def test_master_oracles_the_ensemble_dynamics():
    """THE dynamics oracle: evolve the exact master equation and the
    sampled ensemble from the SAME ring measure and compare cl_k=3
    window marginals at t>0 — validates the ensemble's branch sampling
    AND its Poisson time calibration against an approximation-free
    ground truth (no closure anywhere)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )

    tag, size_a, cl_k, L, B = "ex2-ferromagnetic-chain", 2, 3, 12, 8192
    spd = ferromagnet_p0(cl_k, p_pair=0.1).reshape((2,) * cl_k)

    # Master side: exact ring measure -> expm evolution.
    p0 = master.ring_trace_measure(spd, size_a, cl_k, L)
    Q = master.build_ring_generator(tag, L)
    rounds, E = 18, 1  # stride L > 2*span(=3)
    t_end = rounds * -math.log1p(-E / L)
    p_t = master.solve_master(Q, p0, [0.0, t_end])[-1]
    want = master.state_window_marginals(p_t, L, size_a, cl_k)

    # Ensemble side: lockstep rounds SHARE the firing-site sequence
    # across members (common random numbers — the dense-data-path
    # design), so one run has a single site-history sample regardless
    # of B. Average over independent keys and gate on the EMPIRICAL
    # scatter, which prices in both noise sources.
    dm = ensemble.compile_decision_machine(tag)
    n_keys, B_k = 16, B // 16
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(5 + kk)
        dtape = ensemble.sample_tapes_from_spd(
            jax.random.fold_in(key, 0), spd, size_a, cl_k, B_k, L,
            ring=True).astype(np.int32)
        ptape = np.zeros((B_k, L), np.int32)
        (ptape, dtape), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 1), (ptape, dtape), dm,
            (rounds, E))
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(dtape), np.full(B_k, 1.0 / B_k), size_a,
            cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    z = np.abs(got - want) / np.maximum(sem, 1e-6)
    assert float(z.max()) < 6.0, (float(z.max()),
                                  np.abs(got - want).max())
    # And the dynamics moved (the comparison is not vacuous).
    start = master.state_window_marginals(p0, L, size_a, cl_k)
    assert np.abs(want - start).max() > 1e-3


def test_master_finite_size_approaches_closure():
    """Ring window marginals converge to the infinite-chain closure
    trajectory as L grows: |master_L(t) - closure(t)| must shrink
    monotonically from L=6 to L=12 on ex2."""
    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import (
        solve,
    )

    tag, size_a, cl_k, t_end = "ex2-ferromagnetic-chain", 2, 3, 2.0
    spd = ferromagnet_p0(cl_k, p_pair=0.1).reshape((2,) * cl_k)
    fn = make_dy_dt(compile_problem(tag, cl_k))
    closure_t = np.asarray(solve(lambda y, t: fn(y), spd.ravel(),
                                 np.array([0.0, t_end]),
                                 rtol=1e-11, atol=1e-14))[-1]
    gaps = []
    for L in (6, 9, 12):
        p0 = master.ring_trace_measure(spd, size_a, cl_k, L)
        Q = master.build_ring_generator(tag, L)
        p_t = master.solve_master(Q, p0, [0.0, t_end])[-1]
        marg = master.state_window_marginals(p_t, L, size_a, cl_k)
        gaps.append(float(np.abs(marg - closure_t).sum()))
    assert gaps[0] > gaps[1] > gaps[2], gaps
    assert gaps[2] < 0.5 * gaps[0], gaps


def test_pair_generator_reduces_to_single_on_one_tape_rules():
    """A single-tape rule run through the PAIR machinery must evolve
    the data marginal exactly as the single-tape generator does (the
    untouched program ring is a spectator): kron-product initial law,
    same window marginals after a nontrivial time."""
    tag, size_a, cl_k, L, t_end = "ex2-ferromagnetic-chain", 2, 3, 6, 1.5
    Qs = master.build_ring_generator(tag, L)
    Qp = master.build_pair_ring_generator(tag, L)
    S = size_a ** L
    rng = np.random.RandomState(3)
    q0 = rng.rand(S)
    q0 /= q0.sum()
    p0_pair = np.kron(np.full(S, 1.0 / S), q0)
    marg_single = master.state_window_marginals(
        master.solve_master(Qs, q0, [0.0, t_end])[-1], L, size_a, cl_k)
    pair_t = master.solve_master(Qp, p0_pair, [0.0, t_end])[-1]
    joint = master.pair_state_window_marginals(pair_t, L, size_a, cl_k)
    # Marginalise the joint (size_a^2 alphabet) windows to data-only.
    A = size_a * size_a
    joint = joint.reshape((A,) * cl_k)
    marg_pair = np.zeros((size_a,) * cl_k)
    for idx in np.ndindex(*joint.shape):
        d_idx = tuple(c % size_a for c in idx)
        marg_pair[d_idx] += joint[idx]
    np.testing.assert_allclose(marg_pair.ravel(), marg_single,
                               atol=1e-12)


def test_ex3_pair_outcome_table_analytic_entry():
    """ex3 (two-tape copolymerisation) at the window pair
    program=(O,A,O), data=(O,O,M,O,O): isolated compatible monomer
    with BOTH chain-end sides free — exactly two outcomes at prob 1/2
    each, consuming the program monomer A and depositing it on the
    chosen side of the data chain (`problems.py` ex3; reference
    problems.scm)."""
    span_p, span_d, table = master.pair_outcome_table(
        "ex3-copolymerization")
    assert span_p == (-1, 1) and span_d == (-2, 2)
    O, A, M = 0, 1, 2
    rank_p = (O * 4 + A) * 4 + O
    rank_d = (((O * 4 + O) * 4 + M) * 4 + O) * 4 + O
    entries = sorted(table[(rank_p, rank_d)],
                     key=lambda e: sorted(e[2]))
    assert entries == [(0.5, {0: O}, {-1: A}), (0.5, {0: O}, {1: A})]


def _register_random_single_tape(seed, size_a):
    """Random replayable DATA-tape-only rule (the master equation's
    scope), reusing the fuzz statement grammar with the tape selector
    pinned."""
    from chemical_kinetics_and_program_execution_tpu.engine import dsl
    from tests.test_fuzz import _gen_program, _run_program

    tag = f"_fuzz-master-{size_a}-{seed}"
    if tag in dsl.registered_problems():
        return tag
    rng = np.random.RandomState(7000 + seed)
    prog = _gen_program(rng, size_a, depth=2)

    def pin_data(stmts):
        out = []
        for s in stmts:
            if s[0] == "get_branch":
                out.append((s[0], True, s[2],
                            [pin_data(b) for b in s[3]]))
            elif s[0] == "choose_branch":
                out.append((s[0], s[1], [pin_data(b) for b in s[2]]))
            elif s[0] == "set":
                out.append((s[0], True, s[2], s[3]))
            else:  # copy: force both tapes to DATA
                out.append((s[0], True, s[2], True, s[4]))
        return out

    prog = pin_data(prog)

    @dsl.register_problem(tag,
                          symbols=tuple(f"S{i}" for i in range(size_a)))
    def rule(t, prog=prog, size_a=size_a):
        _run_program(t, prog, size_a)

    return tag


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_master_oracles_random_rule_ensembles(seed):
    """Random single-tape rules: the ensemble's sampled process must
    match the EXACT DISCRETE kernel of its own rounds. At E=1 a round
    fires one uniformly random site and applies the rule's outcome
    distribution — exactly the Markov kernel K = I + Q/L — so the
    comparison has NO time-discretisation allowance: branch sampling
    and multi-cell writes are gated at the pure Monte-Carlo floor.

    The run uses ``independent_sites=True``: the default shared-site
    design preserves per-member marginals but makes RARE-pattern
    statistics key-heavy-tailed — measured by
    `probes/shared_site_tail.py` on seed 2's rule: 88% of 100 shared
    12-round site sequences carry exactly zero p(111) against an
    exact 4.8e-3 while the across-key mean stays exact, so a few-key
    estimate can read a hard 0. Independent sites restore per-member
    decorrelation and the plain binomial floor, rare windows
    included. (The continuous-time Poisson
    calibration — same-site repeats excluded within a round, an
    O(dt^2/2) effect measurably ~dt/2 for non-involutive random rules
    at L=12 — is validated separately on ex2 in
    test_master_oracles_the_ensemble_dynamics.)"""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    size_a = 2
    tag = _register_random_single_tape(seed, size_a)
    L, B, cl_k = 12, 4096, 3
    dm = ensemble.compile_decision_machine(tag)
    if L <= 2 * dm.span:
        pytest.skip(f"span {dm.span} too wide for L={L} at E=1")

    Q = master.build_ring_generator(tag, L)
    assert np.abs(np.asarray(Q.sum(axis=0)).ravel()).max() < 1e-12

    # Uniform initial rings (exactly representable on both sides).
    S = size_a ** L
    p = np.full(S, 1.0 / S)
    rounds, E = 12, 1
    for _ in range(rounds):  # exact round kernel: p <- (I + Q/L) p
        p = p + (Q @ p) / L
    want = master.state_window_marginals(p, L, size_a, cl_k)

    n_keys, B_k = 8, B // 8
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(100 + 37 * seed + kk)
        dtape = jax.random.randint(jax.random.fold_in(key, 0),
                                   (B_k, L), 0, size_a,
                                   dtype=np.int32)
        ptape = np.zeros((B_k, L), np.int32)
        (ptape, dtape), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 1), (ptape, dtape), dm,
            (rounds, E), independent_sites=True)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(dtape), np.full(B_k, 1.0 / B_k), size_a,
            cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    # Floor the empirical sem at the binomial floor (valid: members
    # are iid under independent_sites): a rare window can read zero
    # in EVERY key, collapsing the empirical sem to nothing and
    # turning an expected O(1e-4) miss into a spurious huge z.
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L / cl_k))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, (seed, float(z.max()))
    # The rare-window tail is populated (the shared-site mode read 0).
    assert got[want > 1e-3].min() > 0.0, got


@pytest.mark.parametrize("seed,L", [(700, 8), (727, 8), (702, 10)])
def test_fuzz_pair_master_oracles_two_tape_ensembles(seed, L):
    """Random TWO-TAPE rules — copies and cross-tape branching left
    UNPINNED (exactly the statements the single-tape fuzz oracle must
    pin away): the ensemble's joint (program, data) sampled process
    must match the exact discrete round kernel I + Q/L of the
    pair-ring master equation, compared on JOINT windows (combined
    per-site symbol p*size_a + d). At E=1 the comparison has no
    time-discretisation allowance; gated at the empirical MC floor.

    Seeds chosen by scan: 700/727 write BOTH tapes through the
    decision-machine path; 702 exceeds the machine's write-spec
    packing and exercises the transition-table path (span 4 → L=10,
    a 2^20-state pair generator)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from tests.test_fuzz import _register_random

    size_a = 2
    tag = _register_random(seed, size_a)
    cl_k = 3
    try:
        dm = ensemble.compile_decision_machine(tag)
    except ValueError:  # too many write specs for the packed machine
        dm = ensemble.device_table(ensemble.compile_transition_table(tag))
    assert L > 2 * dm.span, (seed, dm.span)

    Q = master.build_pair_ring_generator(tag, L)
    assert np.abs(np.asarray(Q.sum(axis=0)).ravel()).max() < 1e-12

    # Uniform initial PAIRS (exactly representable on both sides).
    S = size_a ** (2 * L)
    p = np.full(S, 1.0 / S)
    rounds, E = 12, 1
    for _ in range(rounds):  # exact round kernel: p <- (I + Q/L) p
        p = p + (Q @ p) / L
    want = master.pair_state_window_marginals(p, L, size_a, cl_k)

    n_keys, B_k = 8, 512
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(900 + 41 * seed + kk)
        ptape = jax.random.randint(jax.random.fold_in(key, 0),
                                   (B_k, L), 0, size_a,
                                   dtype=np.int32)
        dtape = jax.random.randint(jax.random.fold_in(key, 1),
                                   (B_k, L), 0, size_a,
                                   dtype=np.int32)
        (ptape, dtape), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 2), (ptape, dtape), dm,
            (rounds, E), independent_sites=True)
        comb = np.asarray(ptape) * size_a + np.asarray(dtape)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            comb, np.full(B_k, 1.0 / B_k), size_a * size_a, cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    # Binomial-floor the sem (members iid under independent_sites):
    # rare JOINT windows (64 of them at cl_k=3) can read zero in
    # every key, collapsing the empirical sem and inflating z by
    # orders of magnitude on an expected O(1e-4) miss.
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L / cl_k))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, (seed, float(z.max()))
    # Both tapes actually moved (the joint comparison is not vacuous).
    uni = master.pair_state_window_marginals(
        np.full(S, 1.0 / S), L, size_a, cl_k)
    assert np.abs(want - uni).max() > 1e-3, "rule left uniform fixed"


def test_wide_rule_on_master_sized_ring_at_e1():
    """E=1 relaxes the stride > 2*span guard (one site per round has
    nothing to conflict with): ex3's width-5 window runs on an L=5
    ring — the geometry the pair master equation needs — and one
    device round from a concrete pair matches the exact kernel column
    K = I + Q/L at the MC floor."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, size_a, L, B = "ex3-copolymerization", 4, 5, 4096
    dm = ensemble.compile_decision_machine(tag)
    assert dm.span == 5  # the whole ring — rejected before round 2
    Q = master.build_pair_ring_generator(tag, L).tocsc()

    # A state where the rule actually fires: isolated A monomer on the
    # program tape over a same-site M monomer with free data sides.
    xp = np.array([0, 1, 0, 0, 0], np.int32)
    xd = np.array([0, 2, 0, 0, 0], np.int32)
    x = 0
    for v in xp:
        x = x * size_a + int(v)
    for v in xd:
        x = x * size_a + int(v)
    pt = np.tile(xp, (B, 1))
    dt = np.tile(xd, (B, 1))
    (pt2, dt2), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(3), (pt, dt), dm, (1, 1),
        independent_sites=True)
    ranks = np.zeros(B, np.int64)
    for i in range(L):
        ranks = ranks * size_a + np.asarray(pt2)[:, i]
    for i in range(L):
        ranks = ranks * size_a + np.asarray(dt2)[:, i]
    emp = np.bincount(ranks, minlength=size_a ** (2 * L)) / B
    col = np.zeros(size_a ** (2 * L))
    col[x] = 1.0
    col += np.asarray(Q[:, x].todense()).ravel() / L
    tv = 0.5 * np.abs(emp - col).sum()
    assert tv < 0.05, tv
    assert col[x] < 1.0  # the rule fired with positive probability


def test_first_passage_oracled_by_absorbing_master():
    """EXACT first-passage oracle: `ensemble.first_passage_times`
    detects the pattern at round boundaries, so its survival curve
    must equal the projected discrete kernel P_free (I + Q/L) P_free
    — approximation-free, path-functional validation the internal
    weighted-vs-per-round crosscheck cannot provide. Per-member path
    law is exact even with the shared per-round site draw (one member
    sees one uniform iid site per round); keys supply the scatter."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        ferromagnet_p0,
    )

    tag, size_a, cl_k, L = "ex2-ferromagnetic-chain", 2, 3, 12
    pattern, rounds, E = (1, 1, 1), 60, 1
    spd = ferromagnet_p0(cl_k, p_pair=0.3).reshape((2,) * cl_k)

    p0 = master.ring_trace_measure(spd, size_a, cl_k, L)
    hit = master.ring_contains_pattern(L, size_a, pattern)
    Q = master.build_ring_generator(tag, L)
    S_exact = master.discrete_survival(Q, p0, hit, rounds, L)
    assert S_exact[0] == 1.0  # pair-seeded p0 carries no initial hits
    assert S_exact[-1] < 0.85  # the comparison is not vacuous

    dm = ensemble.compile_decision_machine(tag)
    dt_round = -math.log1p(-E / L)
    n_keys, B_k = 16, 512
    curves = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(40 + kk)
        dtape = ensemble.sample_tapes_from_spd(
            jax.random.fold_in(key, 0), spd, size_a, cl_k, B_k, L,
            ring=True).astype(np.int32)
        ptape = np.zeros((B_k, L), np.int32)
        t_hit, _, _ = ensemble.first_passage_times(
            jax.random.fold_in(key, 1), (ptape, dtape), dm, pattern,
            (rounds, E))
        t_hit = np.asarray(t_hit)
        curves.append([
            float((t_hit >= dt_round * (r + 0.5)).mean())
            for r in range(rounds + 1)
        ])
    curves = np.stack(curves)
    got = curves.mean(axis=0)
    sem = curves.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(S_exact * (1 - S_exact), 1e-9)
                    / (n_keys * B_k))
    z = np.abs(got - S_exact) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, (float(z.max()),
                                  np.abs(got - S_exact).max())


def test_two_tape_first_passage_oracled_by_pair_kernel():
    """First passage on a TWO-TAPE rule, exactly: when does the first
    A-M bond assemble on the ex3 strand? The survival
    curve of `first_passage_times` (data-tape detection, E=1 rounds on
    concrete pairs) must equal the projected discrete PAIR kernel —
    the pair-state mirror of the single-tape oracle, covering the
    cross-tape write path the single-tape mask cannot express."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, size_a, L = "ex3-copolymerization", 4, 5
    # First A-M bond: program A monomers over an M-bearing strand tape
    # with no A on the data side, so every hit is DYNAMICAL (S0 = 1).
    pattern, rounds = (1, 2), 60  # A M
    P_PROG = np.array([0.6, 0.4, 0.0, 0.0])
    P_DATA = np.array([0.7, 0.0, 0.3, 0.0])

    def iid_ring(probs):
        d = master._ring_digits(L, size_a)
        w = np.ones(size_a ** L)
        for i in range(L):
            w = w * probs[d[:, i]]
        return w

    p0 = np.kron(iid_ring(P_PROG), iid_ring(P_DATA))
    hit = master.pair_ring_contains_pattern(L, size_a, pattern)
    Q = master.build_pair_ring_generator(tag, L)
    S_exact = master.discrete_survival(Q, p0, hit, rounds, L)
    # The premise the docstring states: no initial hits, every hit is
    # dynamical (guards against later edits giving A data-side mass).
    # p0 carries kron rounding at the 1e-16 level, so check the hit
    # mass (exact zeros by construction) rather than S[0] == 1.0.
    assert float(p0[hit].sum()) == 0.0
    assert S_exact[0] > 1.0 - 1e-12, S_exact[0]
    assert 0.02 < 1.0 - S_exact[-1] < 0.9  # hits happen, not instantly

    dm = ensemble.compile_decision_machine(tag)
    dt_round = -math.log1p(-1 / L)
    n_keys, B_k = 16, 512
    curves = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(800 + kk)
        ptape = np.asarray(jax.random.choice(
            jax.random.fold_in(key, 0), size_a, (B_k, L),
            p=P_PROG)).astype(np.int32)
        dtape = np.asarray(jax.random.choice(
            jax.random.fold_in(key, 1), size_a, (B_k, L),
            p=P_DATA)).astype(np.int32)
        t_hit, _, _ = ensemble.first_passage_times(
            jax.random.fold_in(key, 2), (ptape, dtape), dm, pattern,
            (rounds, 1))
        t_hit = np.asarray(t_hit)
        curves.append([
            float((t_hit >= dt_round * (r + 0.5)).mean())
            for r in range(rounds + 1)
        ])
    curves = np.stack(curves)
    got = curves.mean(axis=0)
    sem = curves.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(S_exact * (1 - S_exact), 1e-9)
                    / (n_keys * B_k))
    z = np.abs(got - S_exact) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, (float(z.max()),
                                  np.abs(got - S_exact).max())
