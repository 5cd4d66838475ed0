"""Parametric rate constants (`engine/parametric.py`).

The feature under test: rebuilding the dense engine's baked
choose-weight vector as a differentiable function of declared rate
parameters by replaying each enumerated world's decision script with
traced arithmetic — giving d(dp/dt)/d(rate) and, through the fixed-grid
solver, rate sensitivities of whole trajectories.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    build_dy_dt, parametric,
)
from chemical_kinetics_and_program_execution_tpu.engine.dsl import (  # noqa: E402
    DATA, get_problem, register_problem,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E402
    ferromagnet_p0,
)

TAG = "ex2-ferromagnetic-chain-p"


def _valid_p(cl_k):
    return ferromagnet_p0(cl_k, p_pair=0.02, corrected=True).ravel()


def test_parametric_matches_baked_at_defaults():
    """At the declared defaults the parametric RHS equals the plain
    baked dense RHS of the non-parametric twin problem."""
    pd, prog = parametric.make_parametric_dense(TAG, 4)
    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", 4)
    p = _valid_p(4)
    got = np.asarray(pd(jnp.asarray(p), get_problem(TAG).param_defaults))
    want = np.asarray(dfn(jnp.asarray(p)))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-16)


def test_parametric_matches_fresh_compile_at_perturbed_params():
    """Moving a parameter at runtime equals recompiling a rule with that
    value baked in — the structural ground truth for the replay."""
    import math

    beta = 1.37

    @register_problem("_test-ex2-beta-baked", ("D", "U"))
    def _baked(t):
        mid = t.get_sym(DATA, 0)
        left = t.get_sym(DATA, -1)
        right = t.get_sym(DATA, +1)
        energy_j = ((1 if left == mid else -1)
                    + (1 if mid == right else -1))
        factor_a = math.exp(-(beta * 1.0 * (4 + 2 * energy_j)))
        factor_b = (math.exp(-2.0 * beta * 0.25)
                    if mid == "D" else 1.0)  # h = -0.25
        p_flip = factor_a * factor_b
        if t.choose([(p_flip, True), (1.0 - p_flip, False)]):
            t.set_sym(DATA, 0, "D" if mid == "U" else "U")

    pd, _ = parametric.make_parametric_dense(TAG, 3)
    dfn, _ = build_dy_dt("_test-ex2-beta-baked", 3)
    p = _valid_p(3)
    got = np.asarray(pd(jnp.asarray(p),
                        {"J": 1.0, "h": -0.25, "beta": beta}))
    want = np.asarray(dfn(jnp.asarray(p)))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-16)


def test_parametric_rhs_gradient_matches_fd():
    """jax.grad of the RHS w.r.t. beta vs central finite differences of
    the same parametric function."""
    pd, _ = parametric.make_parametric_dense(TAG, 4)
    p = jnp.asarray(_valid_p(4))
    v = jnp.linspace(0.5, 1.5, p.shape[0])  # fixed probe covector

    def scalar(beta):
        prm = {"J": 1.0, "h": -0.25, "beta": beta}
        return jnp.vdot(v, pd(p, prm))

    g = jax.grad(scalar)(jnp.asarray(1.0, jnp.float64))
    eps = 1e-6
    fd = (float(scalar(1.0 + eps)) - float(scalar(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)


def test_rate_sensitivity_end_to_end():
    """Trajectory-level rate gradients: value_and_grad through compile
    tables + fixed-grid solve, pinned against finite differences."""
    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        odeint_fixed,
    )

    cl_k = 3
    p0 = _valid_p(cl_k)
    ts = np.linspace(0.0, 5.0, 6)
    obs_idx = 0b011

    value, grads = parametric.rate_sensitivity(
        TAG, cl_k, p0, ts, lambda y: y[obs_idx], n_sub=6)
    assert set(grads) == {"J", "h", "beta"}

    pd = parametric.ParametricDense(TAG, cl_k)

    def solve_at(beta):
        prm = {"J": 1.0, "h": -0.25, "beta": beta}
        ys = odeint_fixed(lambda y, t, w: pd.dy_dt(y, w), p0, ts,
                          n_sub=6, args=pd.consts(prm))
        return float(ys[-1, obs_idx])

    eps = 1e-6
    fd_beta = (solve_at(1.0 + eps) - solve_at(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(grads["beta"]), fd_beta, rtol=1e-5)
    assert value == pytest.approx(solve_at(1.0), rel=1e-12)


def test_parametric_requires_declared_params():
    with pytest.raises(ValueError, match="declares no parameters"):
        parametric.make_parametric_dense("ex2-ferromagnetic-chain", 3)


def test_parametric_ex4_suppression_gradient():
    """The flagship rule family is parametric too: d(dp/dt)/d(reverse
    suppression) on the chemical Turing machine, vs FD."""
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E501
        chemical_turing_p0,
    )

    pd, prog = parametric.make_parametric_dense("ex4-chemical-turing-p", 3)
    p = jnp.asarray(chemical_turing_p0(3).ravel())
    v = jnp.linspace(-1.0, 1.0, p.shape[0])

    def scalar(s):
        return jnp.vdot(v, pd(p, {"suppression": s}))

    # Parity with the baked non-parametric ex4 at the default 0.05.
    dfn, _ = build_dy_dt("ex4-chemical-turing", 3)
    np.testing.assert_allclose(
        np.asarray(pd(p, {"suppression": 0.05})), np.asarray(dfn(p)),
        rtol=1e-13, atol=1e-18)

    g = jax.grad(scalar)(jnp.asarray(0.05, jnp.float64))
    eps = 1e-7
    fd = (float(scalar(0.05 + eps)) - float(scalar(0.05 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_parametric_ex4var2_free_enthalpy_gradient():
    """The full ΔG landscape of the detachable-evaluator machine
    (`problems.scm:310-347`) is differentiable: parity with the baked
    tables at the default landscape, and d(dp/dt)/dG_D vs FD."""
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E501
        chemical_turing_v2_p0,
    )

    tag = "ex4var2-chemical-turing-p"
    pd, _ = parametric.make_parametric_dense(tag, 3)
    defaults = get_problem(tag).param_defaults
    p = jnp.asarray(chemical_turing_v2_p0(3).ravel())

    dfn, _ = build_dy_dt("ex4var2-chemical-turing", 3)
    np.testing.assert_allclose(
        np.asarray(pd(p, defaults)), np.asarray(dfn(p)),
        rtol=1e-13, atol=1e-18)

    v = jnp.linspace(-1.0, 1.0, p.shape[0])

    def scalar(g_d):
        prm = dict(defaults)
        prm["G_D"] = g_d
        return jnp.vdot(v, pd(p, prm))

    g = jax.grad(scalar)(jnp.asarray(1.5, jnp.float64))
    eps = 1e-6
    fd = (float(scalar(1.5 + eps)) - float(scalar(1.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_parametric_vmap_over_parameter_grid():
    """Parameter sweeps batch with vmap: one compiled program evaluates
    the RHS over a whole grid of rate constants."""
    pd, _ = parametric.make_parametric_dense(TAG, 3)
    p = jnp.asarray(_valid_p(3))
    betas = jnp.linspace(0.5, 2.0, 7)

    batched = jax.vmap(
        lambda b: pd(p, {"J": 1.0, "h": -0.25, "beta": b}))
    dys = np.asarray(batched(betas))
    assert dys.shape == (7, p.shape[0])
    for i, b in enumerate(np.asarray(betas)):
        one = np.asarray(pd(p, {"J": 1.0, "h": -0.25, "beta": float(b)}))
        np.testing.assert_allclose(dys[i], one, rtol=1e-12, atol=1e-16)


def test_time_dependent_protocol_gradient():
    """Time-dependent rate parameters (annealing protocols): the
    traced table rebuild composes with the solve under a schedule
    beta(t), and d(final observable)/d(knots) matches finite
    differences — the machinery behind
    `examples/ex2_optimal_annealing.py`."""
    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        odeint_fixed,
    )

    cl_k = 3
    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", cl_k)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    knots = jnp.linspace(0.0, 5.0, 3)
    ts = jnp.linspace(0.0, 5.0, 3)
    p0 = jnp.full((2 ** cl_k,), 1.0 / 2 ** cl_k)

    def rhs(y, t, theta):
        prm = dict(defaults)
        prm["beta"] = jnp.interp(t, knots, theta)
        return pd(y, prm)

    def obs(theta):
        ys = odeint_fixed(rhs, p0, ts, n_sub=20, args=theta)
        return ys[-1, -1]  # p(UUU) at t=5

    theta0 = jnp.asarray([0.3, 0.8, 1.2])
    g = jax.jit(jax.grad(obs))(theta0)
    eps = 1e-6
    for j in range(3):
        e = jnp.zeros(3).at[j].set(eps)
        fd = (float(obs(theta0 + e)) - float(obs(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[j]), fd, rtol=1e-6)


@pytest.mark.parametrize("ptag,btag,param,default", [
    ("ex3var1-copolymerization-p", "ex3var1-copolymerization",
     "q_reject", 0.75),
    ("ex3var2-copolymerization-p", "ex3var2-copolymerization",
     "k_rev", 1.0 / 50.0),
])
def test_parametric_ex3_matches_baked_and_fd(ptag, btag, param, default):
    """The ex3 parametric family: at the declared defaults each
    parametric RHS equals the plain baked twin (exact weight-product
    parity through the replay), and the declared knob's RHS gradient
    matches central finite differences."""
    cl_k = 4
    pd, _ = parametric.make_parametric_dense(ptag, cl_k)
    dfn, _ = build_dy_dt(btag, cl_k)
    # iid p0 (Markov-consistent) with mass on adjacent same-comonomer
    # windows — the dilute isolated-monomer p0 gives var1's rejection
    # branch zero support and a legitimately zero gradient.
    psym = np.array([0.7, 0.1, 0.1, 0.1])
    p = psym
    for _ in range(cl_k - 1):
        p = np.multiply.outer(p, psym)
    p = jnp.asarray(p.ravel())
    got = np.asarray(pd(p, get_problem(ptag).param_defaults))
    want = np.asarray(dfn(p))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-16)

    # Random fixed probe covector: an index-affine probe (linspace) is
    # exactly orthogonal to this flow's index first moment and reads 0.
    v = jnp.asarray(np.random.RandomState(0).rand(p.shape[0]))

    def scalar(x):
        return jnp.vdot(v, pd(p, {param: x}))

    g = jax.grad(scalar)(jnp.asarray(default, jnp.float64))
    eps = 1e-6
    fd = (float(scalar(default + eps))
          - float(scalar(default - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)
    assert abs(float(g)) > 1e-6  # the knob actually moves the flow
