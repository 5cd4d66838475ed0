"""ops/closure: Markov extension, the cross-cl_k consistency oracle,
and the off-manifold truncation-error indicator."""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
    markov,
)
from chemical_kinetics_and_program_execution_tpu.models.ferromagnet import (
    ising_gibbs_windows,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve
from chemical_kinetics_and_program_execution_tpu.ops import closure

from test_correlations import _random_markov_spd


def test_markov_extend_marginals_and_seq_prob():
    """Both (k)-marginals of the extension recover p, and extension
    word probabilities equal markov.seq_prob's long-sequence branch."""
    size_a, cl_k = 3, 3
    spd = _random_markov_spd(size_a, cl_k, seed=11)
    q = closure.markov_extend(spd, size_a, cl_k)
    np.testing.assert_allclose(q.sum(axis=-1), spd, rtol=1e-12,
                               atol=1e-16)
    np.testing.assert_allclose(q.sum(axis=0), spd, rtol=1e-12,
                               atol=1e-16)
    for word in [(0, 1, 2, 0), (2, 2, 1, 1), (1, 0, 0, 2)]:
        want = markov.seq_prob(spd, list(word))[0]
        np.testing.assert_allclose(q[word], want, rtol=1e-12,
                                   atol=1e-16)


@pytest.mark.parametrize("tag,size_a,cl_k", [
    ("ex1-radioactive-decay", 2, 3),
    ("ex2-ferromagnetic-chain", 2, 3),
    ("ex3-copolymerization", 4, 3),
    ("ex5-msrtf-machine", 5, 3),
])
def test_cross_cl_k_consistency_identity(tag, size_a, cl_k):
    """marg(F_{k+1}(extend(p))) == F_k(p) EXACTLY: the k-flow is by
    construction the marginal flow of the extended measure, so any
    disagreement between the k and k+1 compilations of the same rule
    is an engine bug. A sharp cross-context-length oracle, checked at
    a random consistent state (not a fixed point)."""
    spd = _random_markov_spd(size_a, cl_k, seed=13)
    r = closure.consistency_residual(tag, cl_k, spd, norm="max")
    assert r < 1e-13, r


def test_defect_vanishes_at_exact_gibbs_root():
    """The Ising Gibbs measure is an order-1 Markov root of ex2 at
    every cl_k: the flow is ~0 at the extension too, so both the
    consistency residual and the defect vanish."""
    spd = ising_gibbs_windows(3, J_eff=2.0, h=-0.25, beta=1.0)
    assert closure.consistency_residual(
        "ex2-ferromagnetic-chain", 3, spd) < 1e-13
    assert closure.closure_defect(
        "ex2-ferromagnetic-chain", 3, spd) < 1e-6  # FD-limited near 0


def test_defect_positive_and_decreasing_in_cl_k_on_ex2():
    """Away from equilibrium the ex2 closure is inexact: the defect is
    strictly positive at cl_k=3 and smaller at cl_k=4 (the
    trajectory-level cl_k convergence, seen locally)."""
    rates = {}
    for k in (3, 4):
        p0 = ferromagnet_p0(k, p_pair=1 / 250).ravel()
        fn = make_dy_dt(compile_problem("ex2-ferromagnetic-chain", k))
        p_t = np.asarray(solve(lambda y, t: fn(y), p0,
                               np.array([0.0, 5.0]),
                               rtol=1e-10, atol=1e-13))[-1]
        rates[k] = closure.closure_defect("ex2-ferromagnetic-chain",
                                          k, p_t)
    assert rates[3] > 1e-6, rates
    assert rates[4] < 0.5 * rates[3], rates
