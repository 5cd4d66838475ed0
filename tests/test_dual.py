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
