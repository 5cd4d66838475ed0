"""Direct steady-state solver (`ode/steady.py`): pseudo-transient
Newton–Krylov on dp/dt = 0 plus implicit-function-theorem gradients.

The reference can only reach stationarity by long integration
(`examples/ex4var2_chemical_turing.py:131,149`); these tests pin the
direct solve against exact equilibrium physics (the 1D Ising Gibbs
measure that ex2's flip rates are detailed-balanced against), against
the time integrator (stationarity of the root), and its implicit
gradients against finite differences and the analytic transfer-matrix
derivative.
"""

import numpy as np

import jax
import jax.numpy as jnp

from chemical_kinetics_and_program_execution_tpu.engine import build_dy_dt
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.ode.fixed import odeint_fixed
from chemical_kinetics_and_program_execution_tpu.ode.steady import (
    make_steady_state,
    steady_state,
)

CL_K = 3
S = 2 ** CL_K


def _ising_gibbs_windows(cl_k, J=1.0, h=-0.25, beta=1.0):
    """ex2's exact equilibrium: the Ising Gibbs measure at J_eff = 2J
    (detailed-balance analysis in `ferromagnet.ising_gibbs_windows`)."""
    from chemical_kinetics_and_program_execution_tpu.models.ferromagnet import (  # noqa: E501
        ising_gibbs_windows,
    )

    return ising_gibbs_windows(cl_k, J_eff=2.0 * J, h=h, beta=beta)


def test_ex2_steady_state_is_ising_gibbs():
    """PTC from a uniform guess lands on the exact Ising equilibrium —
    a state the time integrator is still 0.16 away from at t=2000
    (domain coarsening is glacial at βJ_eff=2)."""
    pg = _ising_gibbs_windows(CL_K)
    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", CL_K)
    # Gibbs is an exact root of the closure RHS...
    assert float(jnp.sqrt(jnp.mean(dfn(jnp.asarray(pg)) ** 2))) < 1e-15
    # ...and the solver finds it from uniform.
    p_inf, info = steady_state("ex2-ferromagnetic-chain", CL_K,
                               jnp.full((S,), 1.0 / S), warm_t=5.0)
    assert bool(info.converged)
    assert float(info.residual) <= 1e-12
    np.testing.assert_allclose(np.asarray(p_inf), pg, rtol=0, atol=1e-9)
    assert abs(float(jnp.sum(p_inf)) - 1.0) < 1e-12


def test_steady_state_is_stationary_under_the_integrator():
    """Cross-validation against the ODE stack: integrating from the
    root moves nothing."""
    p_inf, info = steady_state("ex2-ferromagnetic-chain", CL_K,
                               jnp.full((S,), 1.0 / S), warm_t=5.0)
    assert bool(info.converged)
    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", CL_K)
    ys = odeint_fixed(lambda y, t: dfn(y), p_inf,
                      jnp.asarray([0.0, 100.0]), n_sub=800)
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(p_inf),
                               rtol=0, atol=1e-11)


def test_steady_state_boundary_fixed_point():
    """ex1 decays to the simplex boundary (everything A): the solver
    handles a degenerate corner fixed point with zero entries."""
    p_inf, info = steady_state("ex1-radioactive-decay", CL_K,
                               jnp.full((S,), 1.0 / S), warm_t=10.0)
    assert bool(info.converged)
    np.testing.assert_allclose(float(p_inf[0]), 1.0, rtol=0, atol=1e-10)
    assert float(jnp.max(jnp.abs(p_inf[1:]))) < 1e-10


def test_implicit_gradient_matches_finite_differences():
    """d(steady-state observable)/d(beta) through the custom_vjp (one
    transposed Krylov solve) agrees with central differences (two full
    PTC solves)."""
    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", CL_K)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    solve = make_steady_state(lambda p, w: pd.dy_dt(p, w),
                              size_a=2, cl_k=CL_K, tol=1e-14,
                              probe_args=pd.consts(defaults))
    v = jnp.linspace(-1.0, 1.0, S)
    guess = jnp.asarray(_ising_gibbs_windows(CL_K))

    def obs(beta):
        prm = dict(defaults)
        prm["beta"] = beta
        p_inf, _ = solve(guess, pd.consts(prm))
        return jnp.vdot(v, p_inf)

    g = jax.grad(obs)(jnp.asarray(1.0, jnp.float64))
    # eps balances FD truncation against the solver's ~1e-12 state
    # noise (eps=1e-6 amplifies that noise to 2e-4 relative; measured
    # adjoint-vs-direct-dense-solve agreement is 4.5e-15).
    eps = 1e-4
    fd = (float(obs(jnp.asarray(1.0 + eps)))
          - float(obs(jnp.asarray(1.0 - eps)))) / (2 * eps)
    assert fd != 0.0
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)


def test_gibbs_sensitivity_cross_check():
    """Physics cross-check of the implicit gradient: d p∞(UUU)/dβ from
    the solver matches the derivative of the analytic Ising
    transfer-matrix window probability."""
    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", CL_K)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    solve = make_steady_state(lambda p, w: pd.dy_dt(p, w),
                              size_a=2, cl_k=CL_K, tol=1e-14,
                              probe_args=pd.consts(defaults))
    guess = jnp.asarray(_ising_gibbs_windows(CL_K))

    def p_uuu(beta):
        prm = dict(defaults)
        prm["beta"] = beta
        p_inf, _ = solve(guess, pd.consts(prm))
        return p_inf[-1]  # UUU window

    g = jax.grad(p_uuu)(jnp.asarray(1.0, jnp.float64))
    eps = 1e-5
    fd = (_ising_gibbs_windows(CL_K, beta=1.0 + eps)[-1]
          - _ising_gibbs_windows(CL_K, beta=1.0 - eps)[-1]) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_support_mode_on_the_free_enthalpy_machine():
    """ex4var2 (boundary-degenerate driven machine): support masking +
    exhaustive invariant detection takes the residual ~40x below the
    reference's t=10⁴ integration endpoint (||F|| = 4.5e-8 there,
    `examples/ex4var2_chemical_turing.py:131`). The within-valley
    position is under-determined (curved invariant manifolds), so the
    contract is the residual bound, not a unique point — converged may
    honestly be False at tight tol."""
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E501
        chemical_turing_v2_p0,
    )

    dfn, _ = build_dy_dt("ex4var2-chemical-turing", 3)
    p0 = jnp.asarray(chemical_turing_v2_p0(3).ravel())
    ys = odeint_fixed(lambda y, t: dfn(y), p0,
                      jnp.asarray([0.0, 1e3]), n_sub=200)
    pw = jnp.maximum(ys[-1], 0.0)

    solve = make_steady_state(
        lambda p, a: dfn(p), size_a=10, cl_k=3,
        conserved="support", support_guess=np.asarray(pw),
        delta0=1e12, max_iter=150, gmres_restart=60, gmres_maxiter=4)
    p_inf, info = jax.jit(solve)(pw, None)

    assert float(info.residual) < 5e-8  # beats the t=1e4 endpoint
    # Dead windows stay exactly dead; mass and conserved counts hold.
    dead = np.asarray(pw) <= 1e-20
    assert float(jnp.max(jnp.abs(p_inf[dead]))) == 0.0
    assert abs(float(jnp.sum(p_inf)) - 1.0) < 1e-6


def test_relaxation_modes_match_dense_eigs():
    """Shift-invert Arnoldi relaxation spectrum at the ex2 equilibrium
    matches a dense eigendecomposition of the augmented Jacobian, and
    the slowest mode quantifies the coarsening time the time
    integrator suffers from (tau ~ 300 at beta=1)."""
    from chemical_kinetics_and_program_execution_tpu.ode.steady import (
        relaxation_modes,
    )

    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", CL_K)
    pg = jnp.asarray(_ising_gibbs_windows(CL_K))

    lams, resids = relaxation_modes(lambda p, a: dfn(p), pg,
                                    size_a=2, cl_k=CL_K,
                                    n_modes=4, krylov_m=8)
    assert np.all(resids < 1e-8)
    assert np.all(np.real(lams) < 0)  # stable equilibrium

    # Dense ground truth: smallest-|lambda| eigenvalues of the same
    # augmented system.
    from chemical_kinetics_and_program_execution_tpu.ode.steady import (
        _build_augmentation,
    )

    aug, targets_fn, _m, _h, _cv, _ce = _build_augmentation(
        lambda p, a: dfn(p), 2, CL_K, "auto", None, None, 1e-20)
    tg = targets_fn(pg)
    J = np.asarray(jax.jacfwd(lambda q: aug(q, None, tg))(pg))
    ev = np.linalg.eigvals(J)
    ev = ev[np.argsort(np.abs(ev))][:4]
    np.testing.assert_allclose(np.sort(np.real(lams)),
                               np.sort(np.real(ev)), rtol=1e-7)
    # Slowest physical relaxation time ~ O(100) at beta=1 — the reason
    # the integrator is still drifting at t=2000.
    tau = -1.0 / np.real(lams[0])
    assert 50 < tau < 5000
