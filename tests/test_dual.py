"""Dual-SPD mode: separate program/data tape distributions.

The exact consistency oracle: the reference's shared accumulator sums
both tapes' contributions into one dy/dt (`tape_multiverse.scm:
1424-1443`), so at equal distributions the dual engine's two halves
must sum to the shared engine's output exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.engine.compile import (
    compile_problem_dual,
)
from chemical_kinetics_and_program_execution_tpu.engine.rhs import (
    make_chain_dy_dt,
    make_dual_dy_dt,
)


@pytest.mark.parametrize("tag", [
    "ex1-radioactive-decay",
    "ex2-ferromagnetic-chain",
    "ex3-copolymerization",
    "ex4-chemical-turing",
    "ex5-msrtf-machine",
])
def test_dual_halves_sum_to_shared_engine_at_equal_spds(tag):
    cl_k = 3
    shared = compile_problem(tag, cl_k, use_cache=False)
    fn_shared = make_dy_dt(shared)
    dual = compile_problem_dual(tag, cl_k)
    fn_dual = make_dual_dy_dt(dual)

    rng = np.random.RandomState(0)
    for _ in range(3):
        p = rng.dirichlet(np.ones(shared.state_size))
        dy_p, dy_d = fn_dual(p, p)
        want = np.asarray(fn_shared(jnp.asarray(p)))
        np.testing.assert_allclose(
            np.asarray(dy_p) + np.asarray(dy_d), want,
            rtol=1e-12, atol=1e-15)
        # Per-tape conservation: each half's events are ±paired.
        assert abs(float(np.asarray(dy_p).sum())) < 1e-13
        assert abs(float(np.asarray(dy_d).sum())) < 1e-13


def test_dual_tree_and_chain_kernels_agree():
    dual = compile_problem_dual("ex2-ferromagnetic-chain", 3)
    fn_tree = make_dual_dy_dt(dual)
    fn_chain = make_chain_dy_dt(dual)
    rng = np.random.RandomState(1)
    pp = rng.dirichlet(np.ones(8))
    pd = rng.dirichlet(np.ones(8))
    dy_p, dy_d = fn_tree(pp, pd)
    dy2 = np.asarray(fn_chain(jnp.concatenate(
        [jnp.asarray(pp), jnp.asarray(pd)])))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(dy_p), np.asarray(dy_d)]), dy2,
        rtol=1e-13, atol=1e-16)


def test_dual_directional_independence_ex1():
    """ex1 reads/writes ONLY the data tape: the program half of dy/dt
    must vanish identically and the data half must not depend on the
    program distribution."""
    dual = compile_problem_dual("ex1-radioactive-decay", 3)
    fn = make_dual_dy_dt(dual)
    rng = np.random.RandomState(2)
    pd = rng.dirichlet(np.ones(8))
    outs = []
    for _ in range(2):
        pp = rng.dirichlet(np.ones(8))
        dy_p, dy_d = fn(pp, pd)
        np.testing.assert_array_equal(np.asarray(dy_p), 0.0)
        outs.append(np.asarray(dy_d))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_dual_asymmetric_coupling_ex3():
    """ex3 copolymerization couples the tapes (isolated monomer on the
    program tape joins a chain on the data tape): both halves must be
    live, and the data-half dynamics must actually respond to the
    program-tape monomer density."""
    dual = compile_problem_dual("ex3-copolymerization", 3)
    fn = make_dual_dy_dt(dual)
    rng = np.random.RandomState(3)
    pd = rng.dirichlet(np.ones(64))
    dy_d = []
    for alpha in (0.2, 0.8):
        pp = rng.dirichlet(np.ones(64)) * 0 + np.full(64, 1 / 64.0)
        pp = (1 - alpha) * pp + alpha * rng.dirichlet(np.ones(64))
        out = fn(pp, pd)
        assert np.abs(np.asarray(out[0])).max() > 0
        assert np.abs(np.asarray(out[1])).max() > 0
        dy_d.append(np.asarray(out[1]))
    assert np.abs(dy_d[0] - dy_d[1]).max() > 1e-12


def test_dual_closure_matches_concrete_tape_ensemble():
    """Triangle check through a fully independent engine: the ensemble
    evolves CONCRETE separate tapes, so sampling the program tapes from
    p_prog and the data tapes from p_data and comparing window
    statistics validates the dual closure's cross-tape physics without
    sharing any code path with the compiler/kernels."""
    import math

    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        copolymerization_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.integrate import (
        solve,
    )

    tag, cl_k, size_a = "ex3-copolymerization", 3, 4
    pp0 = copolymerization_p0(cl_k, p_a=0.06).ravel()
    pd0 = copolymerization_p0(cl_k, p_a=0.02).ravel()

    dual = compile_problem_dual(tag, cl_k)
    fn = make_dual_dy_dt(dual, jit=False)
    half = size_a**cl_k

    def rhs(y, t):
        dy_p, dy_d = fn(y[:half], y[half:])
        return jnp.concatenate([dy_p, dy_d])

    dm = ensemble.compile_decision_machine(tag)
    B, L, E, rounds = 96, 2048, 64, 64
    ptape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), pp0, size_a, cl_k, B, L)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(1), pd0, size_a, cl_k, B, L)
    (pt2, dt2), (_, times) = ensemble.run_ensemble(
        jax.random.PRNGKey(2), (ptape, dtape), dm, (rounds, E))
    t_eff = float(np.asarray(times)[-1])

    ys = solve(rhs, np.concatenate([pp0, pd0]),
               np.linspace(0.0, t_eff, 3), rtol=1e-8, atol=1e-10)
    want_p, want_d = np.asarray(ys[-1][:half]), np.asarray(ys[-1][half:])

    emp_p = np.asarray(ensemble.window_counts(pt2, size_a, cl_k))
    emp_d = np.asarray(ensemble.window_counts(dt2, size_a, cl_k))
    # MC resolution: B*L ~ 200k windows per tape per sample.
    np.testing.assert_allclose(emp_p, want_p, atol=0.01)
    np.testing.assert_allclose(emp_d, want_d, atol=0.01)
    # The coupling must be live: the closure itself predicts visible
    # polymerization drift on the data tape over this horizon, and the
    # ensemble's dominant-window drift has the same sign.
    assert np.abs(want_d - pd0).max() > 1.5e-3
    assert emp_d[0] < pd0[0]  # solvent window depleted by chain growth


@pytest.mark.parametrize("tag", [
    "ex1-radioactive-decay",
    "ex2-ferromagnetic-chain",
    "ex3-copolymerization",
    "ex4-chemical-turing",
])
def test_dense_dual_matches_tree_dual_and_shared_oracle(tag):
    """The dense transfer-matrix engine's dual mode must agree with the
    gather-kernel dual mode at arbitrary (p_prog, p_data), and satisfy
    the equal-SPD oracle against the shared dense engine."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense

    cl_k = 3
    dual_dense = dense.compile_dense_dual(tag, cl_k)
    fn_dense = dense.make_dense_dy_dt(dual_dense)
    dual_tree = compile_problem_dual(tag, cl_k)
    fn_tree = make_dual_dy_dt(dual_tree)
    shared = dense.make_dense_dy_dt(dense.compile_dense(tag, cl_k))
    n = dual_dense.size_a**cl_k

    rng = np.random.RandomState(4)
    pp = rng.dirichlet(np.ones(n))
    pd = rng.dirichlet(np.ones(n))
    got = np.asarray(fn_dense(jnp.concatenate(
        [jnp.asarray(pp), jnp.asarray(pd)])))
    dy_p, dy_d = fn_tree(pp, pd)
    want = np.concatenate([np.asarray(dy_p), np.asarray(dy_d)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)

    eq = np.asarray(fn_dense(jnp.concatenate(
        [jnp.asarray(pp), jnp.asarray(pp)])))
    np.testing.assert_allclose(
        eq[:n] + eq[n:], np.asarray(shared(jnp.asarray(pp))),
        rtol=1e-12, atol=1e-15)


def test_dense_dual_shards_over_state_axis():
    """The GSPMD state-axis sharding wraps dual programs unchanged: the
    concatenated [p_prog | p_data] axis partitions across the mesh with
    per-half sweeps and collectives inside."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense_dual("ex3-copolymerization", 3)
    assert prog.state_size == 128
    mesh = make_mesh(n_batch=1, n_event=8)
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    single = dense.make_dense_dy_dt(prog)
    rng = np.random.RandomState(0)
    y = np.concatenate([rng.dirichlet(np.ones(64)),
                        rng.dirichlet(np.ones(64))])
    got = np.asarray(sharded(y[None]))[0]
    want = np.asarray(single(jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-16)
