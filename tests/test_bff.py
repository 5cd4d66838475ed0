"""BFF device-interpreter tests (`engine/bff.py`).

The faithful ex6 mini-BFF rule is un-enumerable: the exact engine can
only run it pruned, the decision machine exceeds its spec packing even
for the LITE variant (85 write specs > 6 bits), and the transition
table would need 12^7 rows — so the interpreter is the only device
path for the whole family, and it cannot be cross-checked against
another device kernel. It is validated against the host stack instead:

1. bit-exactly against the DSL rule itself on random windows
   (`master.enumerate_pair_outcomes` executes `models/problems
   ._ex6_rule` directly), faithful AND lite parameters;
2. bit-exactly at the ROUND level against a host application of the
   same stratified lattice semantics (validates the roll/reshape/
   write-back assembly, faithful parameters);
3. statistically against the conditioned-on-program master equation
   (`master.build_conditioned_ring_generator`) — the exact microscopic
   law of the data ring given a frozen program ring.

The SELF-MODIFYING variants add two more independent oracles: the
plain single-ring master equation (nothing is frozen, so no
conditioning), and the exact SPD closure ODE via the generic
enumerate->compile->dense pipeline — the lite self rule is enumerable
(21,236 events at cl_k=3), so the interpreter's sampled dynamics are
gated against the same engine that solves every other problem.
"""

import math
import os
import zlib

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu.engine import (
    bff,
    dsl,
    master,
)


@pytest.mark.parametrize("tag", ["ex6-mini-bff", "ex6-mini-bff-lite"])
def test_bff_fire_matches_host_rule(tag):
    """The unrolled interpreter is bit-exact against direct host
    execution of the DSL rule on random concrete windows."""
    m = bff.compile_bff(tag)
    problem = dsl.get_problem(tag)
    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    N = 200
    P = rng.integers(0, m.size_a, (N, m.n_p)).astype(np.int32)
    D = rng.integers(0, m.size_a, (N, m.n_d)).astype(np.int32)
    new_d, ops = (np.asarray(x) for x in bff.bff_fire(m, P, D))
    # Exactly fuel ops execute per event (every branch recurses).
    assert (ops.sum(axis=-1) == m.fuel).all()
    for i in range(N):
        wp = {o: int(P[i, o - m.p_lo]) for o in range(m.p_lo, m.p_hi + 1)}
        wd = {o: int(D[i, o - m.d_lo]) for o in range(m.d_lo, m.d_hi + 1)}
        outs, reach_p, reach_d = master.enumerate_pair_outcomes(
            problem, wp, wd)
        # Deterministic language: one outcome, program tape read-only,
        # reads/writes inside the static window compile_bff declared.
        assert len(outs) == 1 and outs[0][0] == 1.0
        assert not outs[0][1], outs[0][1]
        assert m.p_lo <= reach_p[0] and reach_p[1] <= m.p_hi
        assert m.d_lo <= reach_d[0] and reach_d[1] <= m.d_hi
        want = D[i].copy()
        for o, v in outs[0][2].items():
            want[o - m.d_lo] = v
        assert np.array_equal(want, new_d[i]), i


def test_bff_round_matches_host_application():
    """One stratified lattice round (faithful parameters, span 31) is
    bit-exact against serially applying the host rule at the same
    lattice sites — validating the roll/reshape window extraction and
    data-tape write-back around the interpreter."""
    import jax.numpy as jnp

    m = bff.compile_bff("ex6-mini-bff")
    problem = dsl.get_problem("ex6-mini-bff")
    rng = np.random.default_rng(11)
    B, L, E = 8, 256, 2  # stride 128 > 2*span = 62
    stride = L // E
    pt = rng.integers(0, m.size_a, (B, L)).astype(np.int32)
    dt = rng.integers(0, m.size_a, (B, L)).astype(np.int32)
    for shift in (0, 31, 255):
        p2, d2 = bff.apply_bff_round(m, jnp.asarray(pt), jnp.asarray(dt),
                                     jnp.int32(shift), events=E)
        assert np.array_equal(np.asarray(p2), pt)  # program read-only
        want = dt.copy()
        for b in range(B):
            for e in range(E):
                site = (shift + e * stride) % L
                wp = {o: int(pt[b, (site + o) % L])
                      for o in range(m.p_lo, m.p_hi + 1)}
                wd = {o: int(want[b, (site + o) % L])
                      for o in range(m.d_lo, m.d_hi + 1)}
                outs, _, _ = master.enumerate_pair_outcomes(
                    problem, wp, wd)
                for o, v in outs[0][2].items():
                    want[b, (site + o) % L] = v
        assert np.array_equal(np.asarray(d2), want), shift


def test_conditioned_generator_is_a_generator():
    """Column sums vanish (probability conservation) and identity
    outcomes never enter Q."""
    rng = np.random.default_rng(1)
    pr = rng.integers(0, 12, 4)
    Q = master.build_conditioned_ring_generator("ex6-mini-bff-lite", pr)
    assert Q.shape == (12**4, 12**4)
    assert np.abs(np.asarray(Q.sum(axis=0)).ravel()).max() == 0.0
    assert (Q.diagonal() <= 0).all()


def test_conditioned_generator_rejects_program_writers():
    """A rule that writes the program tape (ex3 consumes the monomer)
    must be refused — the conditioned law would not be Markov."""
    with pytest.raises(ValueError, match="program tape"):
        master.build_conditioned_ring_generator(
            "ex3-copolymerization", [0, 1, 0, 2])


def test_bff_ensemble_matches_conditioned_master():
    """The sampled BFF ensemble (lite rule, E=1 rounds, one frozen
    program ring shared by all members) must match the exact discrete
    kernel I + Q/L of the conditioned-on-program master equation on
    data-window marginals — no closure, no time-discretisation
    allowance, the same gating as the single-tape fuzz oracle."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, L, cl_k = "ex6-mini-bff-lite", 4, 2
    m = bff.compile_bff(tag)
    assert m.span <= L  # E=1 needs only span <= L
    size_a = m.size_a
    rng = np.random.default_rng(3)
    pr = rng.integers(0, size_a, L)
    Q = master.build_conditioned_ring_generator(tag, pr)

    S = size_a ** L
    p = np.full(S, 1.0 / S)  # uniform iid data rings, exact both sides
    rounds, E = 24, 1
    for _ in range(rounds):
        p = p + (Q @ p) / L
    want = master.state_window_marginals(p, L, size_a, cl_k)

    n_keys, B_k = 8, 1024
    ptape = np.tile(np.asarray(pr, np.int32), (B_k, 1))
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(4200 + kk)
        dtape = jax.random.randint(jax.random.fold_in(key, 0),
                                   (B_k, L), 0, size_a, dtype=np.int32)
        (_, dt_), _ = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), (ptape, dtape), m, (rounds, E),
            independent_sites=True)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(dt_), np.full(B_k, 1.0 / B_k), size_a, cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L / cl_k))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, float(z.max())


@pytest.mark.parametrize(
    "tag", ["ex6-mini-bff-self", "ex6-mini-bff-self-lite"])
def test_bff_self_fire_matches_host_rule(tag):
    """The self-modifying interpreter (opcode fetch from the live data
    window) is bit-exact against direct host execution of the
    single-tape DSL rule on random concrete windows — including the
    feedback path where an executed write changes a later opcode."""
    m = bff.compile_bff(tag)
    assert m.self_modifying and m.n_p == m.n_d
    problem = dsl.get_problem(tag)
    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    N = 200
    D = rng.integers(0, m.size_a, (N, m.n_d)).astype(np.int32)
    new_d, ops = (np.asarray(x) for x in bff.bff_fire(m, None, D))
    assert (ops.sum(axis=-1) == m.fuel).all()
    for i in range(N):
        wd = {o: int(D[i, o - m.d_lo]) for o in range(m.d_lo, m.d_hi + 1)}
        outs, reach = master.enumerate_window_outcomes(problem, wd)
        assert len(outs) == 1 and outs[0][0] == 1.0
        assert m.d_lo <= reach[0] and reach[1] <= m.d_hi
        want = D[i].copy()
        for o, v in outs[0][1].items():
            want[o - m.d_lo] = v
        assert np.array_equal(want, new_d[i]), i


def test_bff_self_writes_reach_the_instruction_stream():
    """A handcrafted window where step 1's write overwrites the opcode
    step 2 fetches — live fetch (correct self-modifying semantics) and
    stale fetch (two-tape semantics) give DIFFERENT final tapes."""
    m = bff.compile_bff("ex6-mini-bff-self-lite")  # fuel 2, d1 at +1
    # Offsets -1, 0, +1, +2. Step 1: 'dot' at pc=0 copies cell[d0=0]
    # (the 'dot' itself) to cell[d1=+1], clobbering the 'plus' there.
    # Step 2 fetches pc=+1: live semantics see the new 'dot' (copies
    # 'dot' onto +1 again, a no-op); stale semantics would execute the
    # original 'plus' and increment cell[d0=0] to 'comma'.
    D = np.asarray([[m.zero, m.dot, m.plus, m.zero]], np.int32)
    new_d, _ = bff.bff_fire(m, None, D)
    want = np.asarray([[m.zero, m.dot, m.dot, m.zero]], np.int32)
    assert np.array_equal(np.asarray(new_d), want)


def test_bff_self_round_matches_host_application():
    """One stratified lattice round of the faithful SELF machine
    (span 31) is bit-exact against serially applying the host
    single-tape rule at the same lattice sites."""
    import jax.numpy as jnp

    m = bff.compile_bff("ex6-mini-bff-self")
    problem = dsl.get_problem("ex6-mini-bff-self")
    rng = np.random.default_rng(12)
    B, L, E = 8, 256, 2  # stride 128 > 2*span = 62
    stride = L // E
    t0 = rng.integers(0, m.size_a, (B, L)).astype(np.int32)
    for shift in (0, 31, 255):
        t2 = bff.apply_bff_self_round(m, jnp.asarray(t0),
                                      jnp.int32(shift), events=E)
        want = t0.copy()
        for b in range(B):
            for e in range(E):
                site = (shift + e * stride) % L
                wd = {o: int(want[b, (site + o) % L])
                      for o in range(m.d_lo, m.d_hi + 1)}
                outs, _ = master.enumerate_window_outcomes(problem, wd)
                for o, v in outs[0][1].items():
                    want[b, (site + o) % L] = v
        assert np.array_equal(np.asarray(t2), want), shift


def test_bff_self_ensemble_matches_ring_master():
    """The sampled self-modifying ensemble (lite rule, E=1 rounds) must
    match the exact discrete kernel I + Q/L of the plain single-ring
    master equation on window marginals — the oracle the single-tape
    formulation unlocks (no conditioning needed: there is no frozen
    program)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, L, cl_k = "ex6-mini-bff-self-lite", 4, 2
    m = bff.compile_bff(tag)
    assert m.span <= L  # E=1 needs only span <= L
    size_a = m.size_a
    Q = master.build_ring_generator(tag, L)
    assert np.abs(np.asarray(Q.sum(axis=0)).ravel()).max() < 1e-12

    S = size_a ** L
    p = np.full(S, 1.0 / S)
    rounds, E = 24, 1
    for _ in range(rounds):
        p = p + (Q @ p) / L
    want = master.state_window_marginals(p, L, size_a, cl_k)

    n_keys, B_k = 8, 1024
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(5200 + kk)
        tape = jax.random.randint(jax.random.fold_in(key, 0),
                                  (B_k, L), 0, size_a, dtype=np.int32)
        tape_out, _ = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), tape, m, (rounds, E),
            independent_sites=True)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(tape_out), np.full(B_k, 1.0 / B_k), size_a,
            cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L / cl_k))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, float(z.max())


def test_run_ensemble_bff_contract():
    """Shapes, time calibration, op accounting, and geometry gates."""
    import jax

    m = bff.compile_bff("ex6-mini-bff")
    B, L, E, steps = 16, 256, 4, 3
    key = jax.random.PRNGKey(0)
    pt = jax.random.randint(jax.random.fold_in(key, 0), (B, L), 0,
                            m.size_a, dtype=np.int32)
    dt = jax.random.randint(jax.random.fold_in(key, 1), (B, L), 0,
                            m.size_a, dtype=np.int32)
    (p_out, d_out), (ops, times) = bff.run_ensemble_bff(
        jax.random.fold_in(key, 2), (pt, dt), m, (steps, E))
    assert np.array_equal(np.asarray(p_out), np.asarray(pt))
    assert ops.shape == (steps, m.size_a)
    # fuel ops per site event, B*E events per round.
    assert (np.asarray(ops).sum(axis=1) == B * E * m.fuel).all()
    dt_round = -math.log1p(-E / L)
    assert np.allclose(np.asarray(times),
                       dt_round * np.arange(1, steps + 1))
    with pytest.raises(ValueError, match="stride"):
        bff.run_ensemble_bff(key, (pt, dt), m, (1, 8))  # stride 32 < 62
    with pytest.raises(ValueError, match="not a mini-BFF"):
        bff.compile_bff("ex2-ferromagnetic-chain")


def test_run_ensemble_bff_scan_matches_serial_rounds():
    """The jitted scan path (which runs its tape carry as int8 —
    `_run_ensemble_bff`) is bit-identical to serially applying
    `apply_bff_round` / `apply_bff_self_round` on int32 tapes at the
    same shift stream: gates the scan-boundary dtype conversion end to
    end, lineage ring included."""
    import jax

    # Two-tape faithful machine.
    m = bff.compile_bff("ex6-mini-bff")
    B, L, E, steps = 8, 256, 4, 5
    key = jax.random.PRNGKey(7)
    pt = jax.random.randint(jax.random.fold_in(key, 0), (B, L), 0,
                            m.size_a, dtype=np.int32)
    dt = jax.random.randint(jax.random.fold_in(key, 1), (B, L), 0,
                            m.size_a, dtype=np.int32)
    k_run = jax.random.fold_in(key, 2)
    (_, d_out), _ = bff.run_ensemble_bff(k_run, (pt, dt), m, (steps, E))
    d_ser = dt
    for k in jax.random.split(k_run, steps):
        shift = jax.random.randint(k, (), 0, L, dtype=np.int32)
        _, d_ser = bff.apply_bff_round(m, pt, d_ser, shift, events=E)
    assert np.array_equal(np.asarray(d_out), np.asarray(d_ser))

    # Self-modifying machine with the int32 lineage ring riding along.
    ms = bff.compile_bff("ex6-mini-bff-self")
    t0 = jax.random.randint(jax.random.fold_in(key, 3), (B, L), 0,
                            ms.size_a, dtype=np.int32)
    prov0 = np.arange(B * L, dtype=np.int32).reshape(B, L)
    k_run2 = jax.random.fold_in(key, 4)
    (t_out, p_out), _ = bff.run_ensemble_bff(
        k_run2, t0, ms, (steps, E), prov=prov0)
    t_ser, p_ser = t0, prov0
    for k in jax.random.split(k_run2, steps):
        shift = jax.random.randint(k, (), 0, L, dtype=np.int32)
        t_ser, p_ser = bff.apply_bff_self_round(
            ms, t_ser, shift, events=E, prov=p_ser)
    assert np.array_equal(np.asarray(t_out), np.asarray(t_ser))
    assert np.array_equal(np.asarray(p_out), np.asarray(p_ser))


def test_bff_self_ensemble_tracks_exact_spd_closure():
    """Cross-engine triangle for the SELF-MODIFYING rule: the device
    interpreter's sampled window statistics must follow the exact SPD
    closure ODE — the generic enumerate->compile->dense pipeline
    handles the single-tape self rule like any other DSL rule (21,236
    events at cl_k=3), and the two implementations share nothing
    beyond the DSL definition. Gate: 6 sigma over 8 independent-site
    keys plus the measured elementwise cl_k=3<->4 closure gap (the SPD
    side's own truncation error, ~2e-4; the dynamical signal is
    |p - uniform| ~ 0.11)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import (
        solve,
    )

    tag, cl_k = "ex6-mini-bff-self-lite", 3
    m = bff.compile_bff(tag)
    B, L, E, rounds, n_keys = 256, 256, 8, 63, 8
    size_a = m.size_a

    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(100 + kk)
        tape = jax.random.randint(jax.random.fold_in(key, 0), (B, L),
                                  0, size_a, dtype=np.int32)
        tape, (_, times) = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), tape, m, (rounds, E),
            independent_sites=True)
        reps.append(np.asarray(ensemble.window_counts(tape, size_a,
                                                      cl_k)))
    t_eff = float(np.asarray(times)[-1])
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)

    ts = np.linspace(0.0, t_eff, 5)
    want = {}
    for k in (3, 4):
        c = compile_problem(tag, k, use_cache=False)
        fn = make_dy_dt(c)
        p0 = np.full(c.state_size, 1.0 / c.state_size)
        pk = np.asarray(solve(lambda y, t: fn(y), p0, ts,
                              rtol=1e-9, atol=1e-12)[-1])
        if k == 4:
            pk = pk.reshape(size_a ** cl_k, size_a).sum(axis=1)
        want[k] = pk
    closure_gap = np.abs(want[3] - want[4])
    assert closure_gap.max() < 1e-3  # k3 is dynamically near-exact

    # The dynamics moved far from uniform (the check is non-vacuous).
    assert np.abs(want[3] - 1 / size_a ** cl_k).max() > 0.05
    floor = np.sqrt(np.maximum(want[3], 1e-9) * (1.0 - want[3])
                    / (n_keys * B * L / cl_k))
    err = np.abs(got - want[3])
    bound = 6.0 * np.maximum(sem, floor) + closure_gap
    assert (err <= bound).all(), float((err - bound).max())


def test_bff_self_mutation_matches_composed_master_kernel():
    """With background mutation the per-round law composes EXACTLY:
    the sampled step applies the rule round then per-cell uniform
    resampling, so the discrete kernel is M(q) @ (I + Q/L) with
    M = m^(⊗L), m = (1-q)·I + (q/A)·1. Gate the sampled ensemble
    against that composed kernel at L=4 with no discretisation
    allowance — validating both the mutation implementation and its
    kernel-order semantics."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, L, cl_k, q = "ex6-mini-bff-self-lite", 4, 2, 0.05
    m = bff.compile_bff(tag)
    size_a = m.size_a
    Q = master.build_ring_generator(tag, L)

    mut = np.full((size_a, size_a), q / size_a)
    mut[np.diag_indices(size_a)] += 1.0 - q

    def apply_mut(p):
        # M = m^(⊗L) in the big-endian state encoding: contract m into
        # each site axis (exact, never materialises the S x S kernel).
        t = p.reshape((size_a,) * L)
        for ax in range(L):
            t = np.tensordot(mut, t, axes=(1, ax))
            t = np.moveaxis(t, 0, ax)
        return t.ravel()

    S = size_a ** L
    p = np.full(S, 1.0 / S)
    rounds, E = 24, 1
    for _ in range(rounds):
        p = apply_mut(p + (Q @ p) / L)
    want = master.state_window_marginals(p, L, size_a, cl_k)

    n_keys, B_k = 8, 1024
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(7100 + kk)
        tape = jax.random.randint(jax.random.fold_in(key, 0),
                                  (B_k, L), 0, size_a, dtype=np.int32)
        tape_out, _ = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), tape, m, (rounds, E),
            independent_sites=True, mutation_rate=q)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(tape_out), np.full(B_k, 1.0 / B_k), size_a,
            cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L / cl_k))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, float(z.max())


def test_bff_mutation_rejected_for_two_tape_machines():
    import jax

    m = bff.compile_bff("ex6-mini-bff-lite")
    t0 = np.zeros((2, 64), np.int32)
    with pytest.raises(ValueError, match="self-modifying"):
        bff.run_ensemble_bff(jax.random.PRNGKey(0), (t0, t0), m,
                             (1, 1), mutation_rate=0.01)


def test_bff_self_lite_exact_stationary_mutation_balance():
    """Selection-mutation balance, EXACTLY: power-iterate the composed
    per-round kernel K = M(q)·(I+Q/L) to its stationary state at L=4
    and (a) verify the sampled ensemble converges to the same window
    marginals (6σ, long run), (b) assert the exact non-monotone
    mutation response — small mutation FEEDS the replicator (it
    reseeds raw material selection converts to 'dot') while large
    mutation destroys it: stationary p(dot) is 0.364 at q=0, 0.561 at
    q=0.01, 0.194 at q=0.2. At q=0 the chain is not ergodic (frozen
    configurations absorb); 'stationary' means the limit from the
    uniform start, matching the sampled soup's initial condition."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tag, L, cl_k = "ex6-mini-bff-self-lite", 4, 1
    m = bff.compile_bff(tag)
    A = m.size_a
    Q = master.build_ring_generator(tag, L)

    def stationary(q, iters=20000):
        mut = np.full((A, A), q / A)
        mut[np.diag_indices(A)] += 1.0 - q
        p = np.full(A ** L, 1.0 / A ** L)
        for _ in range(iters):
            p2 = p + (Q @ p) / L
            t = p2.reshape((A,) * L)
            for ax in range(L):
                t = np.moveaxis(np.tensordot(mut, t, axes=(1, ax)),
                                0, ax)
            p2 = t.ravel()
            if np.abs(p2 - p).max() < 1e-14:
                return p2
            p = p2
        raise AssertionError("power iteration did not converge")

    pd = {q: master.state_window_marginals(stationary(q), L, A,
                                           cl_k)[m.dot]
          for q in (0.0, 0.01, 0.2)}
    # Exact non-monotone mutation response.
    assert pd[0.01] > pd[0.0] + 0.1, pd
    assert pd[0.2] < pd[0.0] - 0.1, pd

    # Sampled ensemble reaches the same stationary marginals (q=0.01
    # mixes slowly — the exact kernel needs ~3300 rounds; run 6000).
    q = 0.01
    want = master.state_window_marginals(stationary(q), L, A, cl_k)
    n_keys, B_k, rounds = 6, 1024, 6000
    reps = []
    for kk in range(n_keys):
        key = jax.random.PRNGKey(9300 + kk)
        tape = jax.random.randint(jax.random.fold_in(key, 0),
                                  (B_k, L), 0, A, dtype=np.int32)
        tape, _ = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), tape, m, (rounds, 1),
            independent_sites=True, mutation_rate=q)
        reps.append(np.asarray(ensemble.weighted_window_counts(
            np.asarray(tape), np.full(B_k, 1.0 / B_k), A, cl_k)))
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)
    floor = np.sqrt(np.maximum(want, 1e-9) * np.clip(1.0 - want, 0, 1)
                    / (n_keys * B_k * L))
    z = np.abs(got - want) / np.maximum(sem, floor)
    assert float(z.max()) < 6.0, float(z.max())


def _host_fire_with_prov(m, d, prov):
    """Independent host interpreter of the self-modifying machine with
    lineage tracking, written straight from the language spec
    (problems._ex6_rule semantics): copies carry provenance, point
    mutations keep it. Used to gate `bff_fire(..., prov_cells=...)`."""
    d, prov = list(d), list(prov)
    pc, d0, d1, mode = 0, 0, m.d1_start, 0
    A = m.size_a

    def i(o):
        return o - m.d_lo

    for _ in range(m.fuel):
        op = d[i(pc)]
        if mode < 0:  # scanning left for the |mode|-th '['
            if op == m.bl and mode == -1:
                mode = 0
                pc += 1
            else:
                mode += (op == m.bl) - (op == m.br)
                pc -= 1
        elif mode > 0:  # scanning right for the mode-th ']'
            if op == m.br and mode == 1:
                mode = 0
            else:
                mode += (op == m.bl) - (op == m.br)
            pc += 1
        else:
            if op == m.lt:
                d0 -= 1
            elif op == m.gt:
                d0 += 1
            elif op == m.cl:
                d1 -= 1
            elif op == m.cr:
                d1 += 1
            elif op in (m.plus, m.minus):
                d[i(d0)] = (d[i(d0)] + (1 if op == m.plus else -1)) % A
            elif op == m.dot:
                d[i(d1)] = d[i(d0)]
                prov[i(d1)] = prov[i(d0)]
            elif op == m.comma:
                d[i(d0)] = d[i(d1)]
                prov[i(d0)] = prov[i(d1)]
            elif op == m.bl:
                mode = 1 if d[i(d0)] == m.zero else 0
            elif op == m.br and d[i(d0)] != m.zero:
                mode = -1
                pc -= 2
            pc += 1
    return d, prov


@pytest.mark.parametrize(
    "tag", ["ex6-mini-bff-self", "ex6-mini-bff-self-lite"])
def test_bff_lineage_matches_host_interpreter(tag):
    """bff_fire's provenance threading is bit-exact against the
    independent host interpreter on random windows, and the content
    trajectory is bit-identical with and without lineage."""
    m = bff.compile_bff(tag)
    rng = np.random.default_rng(zlib.crc32(tag.encode()) ^ 0xBEEF)
    N = 300
    D = rng.integers(0, m.size_a, (N, m.n_d)).astype(np.int32)
    P0 = np.tile(np.arange(m.n_d, dtype=np.int32), (N, 1))
    new_d, new_p, ops = (np.asarray(x)
                         for x in bff.bff_fire(m, None, D, P0))
    plain_d, _ = (np.asarray(x) for x in bff.bff_fire(m, None, D))
    np.testing.assert_array_equal(new_d, plain_d)
    for k in range(N):
        wd, wp = _host_fire_with_prov(m, D[k].tolist(), P0[k].tolist())
        assert np.array_equal(new_d[k], wd), k
        assert np.array_equal(new_p[k], wp), k


def test_bff_lineage_run_content_invariant_and_conserving():
    """run_ensemble_bff(prov=...) leaves the content stream untouched
    (bit-identical tapes with and without lineage, including under
    mutation), provenance values only coarsen (subset of the initial
    ids plus the -1 de-novo stamp), and mutation_rate=1 stamps every
    cell -1 in one round."""
    import jax

    m = bff.compile_bff("ex6-mini-bff-self")
    B, L = 16, 256
    key = jax.random.PRNGKey(33)
    tape = jax.random.randint(key, (B, L), 0, m.size_a,
                              dtype=np.int32)
    prov0 = np.tile(np.arange(L, dtype=np.int32), (B, 1))
    for mu in (0.0, 0.02):
        plain, _ = bff.run_ensemble_bff(
            jax.random.PRNGKey(34), tape, m, (6, 4), mutation_rate=mu)
        (lt, lp), _ = bff.run_ensemble_bff(
            jax.random.PRNGKey(34), tape, m, (6, 4), mutation_rate=mu,
            prov=prov0)
        np.testing.assert_array_equal(np.asarray(plain),
                                      np.asarray(lt))
        vals = set(np.unique(np.asarray(lp)).tolist())
        assert vals <= set(range(L)) | {-1}
        assert (-1 in vals) == (mu > 0)
    (_, lp1), _ = bff.run_ensemble_bff(
        jax.random.PRNGKey(35), tape, m, (1, 4), mutation_rate=1.0,
        prov=prov0)
    assert (np.asarray(lp1) == -1).all()
    with pytest.raises(ValueError, match="self-modifying"):
        bff.run_ensemble_bff(
            jax.random.PRNGKey(0),
            (np.zeros((2, 64), np.int32),) * 2,
            bff.compile_bff("ex6-mini-bff-lite"), (1, 1), prov=prov0)


def test_bff_self_faithful_tracks_pruned_spd():
    """FAITHFUL fuel-10 self rule vs the PRUNED exact SPD closure.

    The faithful single-ring rule is un-enumerable in full, but near a
    replicator monoculture (IID p0 with p(dot)=0.98) the guided native
    DFS keeps ≥99.5% of the event mass at threshold 1e-7 — so the
    pruned dense program predicts the interpreter's short-horizon
    relaxation. This is the regression twin of
    `probes/self_faithful_gate.py`, which solves a 40x deeper model
    (thr 1e-9, mass ≥99.4% to t=1) and MEASURES the error budget
    nu_prune + nu_close ~= 0.02-0.09 l1/time (pruning-truncation rate
    plus off-manifold closure defect); here the coarse 4517-world
    model is integrated by hand-rolled RK4 on the jitted RHS and the
    ensemble is gated at 6 sigma plus the probe's band NU_BAND*t —
    resolution ~0.03 in any window bin, enough to catch engine-level
    breakage (wrong rates, misfiring interpreter), while fine drift is
    the probe's job."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        dense,
        ensemble,
    )

    tag, cl_k, eps = "ex6-mini-bff-self", 3, 0.02
    # probes/self_faithful_gate.py coarse-model block: this model's own
    # truncation rate nu_prune(1e-7 vs 1e-9) <= 0.047 plus the closure
    # defect nu_close <= 0.067.
    NU_BAND = 0.12
    prob = dsl.get_problem(tag)
    size_a = prob.size_a
    p1 = np.full(size_a, eps / (size_a - 1))
    p1[prob.symbols.index("dot")] = 1.0 - eps
    p0 = np.array([1.0])
    for _ in range(cl_k):
        p0 = np.kron(p0, p1)

    prog = dense.compile_dense(tag, cl_k, p_ref=p0, prune_threshold=1e-7,
                               max_worlds=20_000_000)
    assert len(prog.w_const) == 4517  # enumeration regression pin
    fn = dense.make_dense_dy_dt(prog, with_mass=True)
    fn_raw = lambda p: np.asarray(fn(p)[0])  # noqa: E731

    m = bff.compile_bff(tag)
    # E=4: independent-site rounds need stride L/E > the fuel-10
    # window span (31 cells).
    B, L, E, rounds, n_keys = 256, 256, 4, 24, 8
    dt_round = -math.log1p(-E / L)
    t_end = rounds * dt_round

    # Hand-rolled RK4 (h ~= 0.016; local error far below NU_BAND*t).
    y = p0.copy()
    n_steps = 24
    h = t_end / n_steps
    for _ in range(n_steps):
        k1 = fn_raw(y)
        k2 = fn_raw(y + 0.5 * h * k1)
        k3 = fn_raw(y + 0.5 * h * k2)
        k4 = fn_raw(y + h * k3)
        y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    want = y
    # The pruned model keeps its mass along the trajectory (0.9978 at
    # t=0, ~0.981 at t_end; the leaked flux is inside NU_BAND).
    assert float(fn(want)[1]) > 0.98
    # The dynamics moved (non-vacuous gate).
    assert np.abs(want - p0).sum() > 0.02

    reps = []
    for kk in range(n_keys):
        rng = np.random.default_rng(1000 + kk)
        tape = rng.choice(size_a, size=(B, L), p=p1).astype(np.int32)
        tape, (_, times) = bff.run_ensemble_bff(
            jax.random.PRNGKey(100 + kk), tape, m, (rounds, E),
            independent_sites=True)
        reps.append(np.asarray(ensemble.window_counts(tape, size_a,
                                                      cl_k)))
    t_eff = float(np.asarray(times)[-1])
    np.testing.assert_allclose(t_eff, t_end, rtol=1e-12)
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(n_keys)

    floor = np.sqrt(np.maximum(want, 1e-9) * (1.0 - want)
                    / (n_keys * B * L / cl_k))
    bound = 6.0 * np.maximum(sem, floor) + NU_BAND * t_end
    err = np.abs(got - want)
    assert (err <= bound).all(), float((err - bound).max())


def test_max_cyclic_run_matches_bruteforce():
    """Doubled-ring run-length scan vs a per-ring host brute force,
    including wrap-around runs and the full-ring cap."""
    from chemical_kinetics_and_program_execution_tpu.engine import (
        soup_we,
    )

    rng = np.random.default_rng(5)
    t = rng.integers(0, 3, (64, 12)).astype(np.int32)
    t[0] = 1                      # full ring
    t[1, :] = 0; t[1, -3:] = 1; t[1, :2] = 1   # wrap run of 5
    got = soup_we.max_cyclic_run(t, 1)
    for b in range(t.shape[0]):
        best = 0
        L = t.shape[1]
        for start in range(L):
            run = 0
            for j in range(L):
                if t[b, (start + j) % L] == 1:
                    run += 1
                    best = max(best, run)
                else:
                    break
        assert got[b] == min(best, L), (b, got[b], best)


def test_we_emergence_unbiased():
    """Weighted-ensemble splitting must not bias the first-passage
    estimate: with splitting ON vs OFF (plain Monte Carlo in the same
    harness), the cumulative emergence probability of a dot-run >= 8
    from a uniform soup agrees within combined 6 sigma across seeds —
    while the split runs resolve the early tail plain MC cannot (their
    survival leaves 1.0 strictly earlier at equal K)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        soup_we,
    )

    m = bff.compile_bff("ex6-mini-bff-self")
    L, K, blocks = 256, 1024, 10
    n_seeds = 4

    def make_init(s):
        rng = np.random.default_rng(900 + s)
        return lambda n: rng.integers(0, m.size_a, (n, L),
                                      dtype=np.int32)

    finals = {}
    early = {}
    for split in (True, False):
        vals = []
        early_hits = []
        for s in range(n_seeds):
            r = soup_we.we_emergence(
                jax.random.PRNGKey(40 + 10 * s + split), m,
                make_init(s), plan=(K, blocks, 8, 4), q_target=8,
                split=split, seed=s)
            vals.append(1.0 - r.survival[-1])
            early_hits.append(int(np.argmax(r.survival < 1.0))
                              if (r.survival < 1.0).any() else blocks)
        finals[split] = np.asarray(vals)
        early[split] = np.asarray(early_hits)
    mean_t, mean_f = finals[True].mean(), finals[False].mean()
    sem = np.sqrt(finals[True].var(ddof=1) / n_seeds
                  + finals[False].var(ddof=1) / n_seeds
                  + 1e-12)
    assert abs(mean_t - mean_f) < 6.0 * max(sem, 1e-3), (
        mean_t, mean_f, sem)
    # Non-vacuous: emergence actually happened...
    assert mean_f > 0.01
    # ...and splitting resolves the tail no later than MC on average.
    assert early[True].mean() <= early[False].mean()


def test_we_emergence_recycle_satisfies_hill_relation():
    """Steady-flux (recycle) mode must reproduce the renewal rate
    1/E[T_fp] implied by survival mode (the Hill relation): absorbed
    walkers restart from the initial soup, so the stationary flux is
    the inverse mean first-passage time — NOT the late-time hazard,
    which keeps rising while the soup matures toward the replicator
    attractor. E[T] comes from the survival curve (trapezoid) plus an
    exponential tail at the late hazard; measured ratios 0.97-1.08
    over 3 seeds (probe run recorded in the test's tolerance)."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        soup_we,
    )

    m = bff.compile_bff("ex6-mini-bff-self")
    L, K, blocks = 256, 1024, 32
    dt_block = -math.log1p(-4 / L) * 8

    def make_init(s):
        rng = np.random.default_rng(900 + s)
        return lambda n: rng.integers(0, m.size_a, (n, L),
                                      dtype=np.int32)

    ratios = []
    for s in range(3):
        rs = soup_we.we_emergence(
            jax.random.PRNGKey(60 + s), m, make_init(s),
            plan=(K, blocks, 8, 4), q_target=8, seed=s)
        S = rs.survival
        h_late = (np.log(max(S[blocks // 2], 1e-300))
                  - np.log(max(S[-1], 1e-300))) / (
                      rs.times[-1] - rs.times[blocks // 2])
        ts = np.concatenate([[0.0], rs.times])
        Sf = np.concatenate([[1.0], S])
        ET = np.trapezoid(Sf, ts) + S[-1] / h_late
        rr = soup_we.we_emergence(
            jax.random.PRNGKey(160 + s), m, make_init(s),
            plan=(K, blocks, 8, 4), q_target=8, recycle=True, seed=s)
        rate = rr.flux[blocks // 2:].mean() / dt_block
        ratios.append(rate * ET)
    ratios = np.asarray(ratios)
    assert 0.8 < ratios.mean() < 1.2, ratios
    assert (np.abs(ratios - 1.0) < 0.3).all(), ratios
