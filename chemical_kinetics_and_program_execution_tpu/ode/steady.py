"""Direct steady states: damped Newton–Krylov on dp/dt = 0, with
implicit-function-theorem gradients.

The reference reaches long-time behaviour only by integrating to large
t (ex4var2 runs t∈[0,10⁴] at rtol 1e-11,
`examples/ex4var2_chemical_turing.py:131,149`). For questions about the
*stationary* SPD — equilibrium window probabilities, their parameter
sensitivities — that detour costs thousands of RHS evaluations and its
gradient costs a reverse pass through all of them. This module solves
F(p) = dp/dt = 0 directly:

- **Invariant-manifold augmentation.** F's Jacobian is structurally
  singular in TWO ways: its image lies in the sum-zero subspace (every
  dy/dt conserves total probability — the ± pairing at
  `tape_multiverse.scm:1285-1291`), and the marginal-consistency
  manifold (first-axis window marginal = last-axis marginal, the
  validity condition `markov_tapes.py:133-175` gates p0 on) is flow-
  invariant, which makes J rank-deficient along p-dependent directions
  (measured: cond 3·10¹⁶ at the ex2 equilibrium with sum-augmentation
  alone). We solve
  G(p) = F(p) − Cᵀ(Cp) − (Σp − 1)·1/S, where C is the consistency-
  defect operator (Cp = first-axis marginal − last-axis marginal).
  Both added terms vanish identically on valid SPDs — the root is
  unmoved — while J_G becomes well-conditioned (4·10³ at the same
  point) with every eigenvalue's real part negative, so the PTC
  pseudo-flow *damps* constraint defects instead of riding the
  singular directions.
- **Matrix-free pseudo-transient continuation.** Plain Newton stalls
  on these problems: SPD equilibria often sit at simplex corners
  behind slow manifolds (ex2's domain-coarsening dynamics is still
  drifting at t=2000 while its equilibrium has p(DDD)=0.998). PTC
  steps (I − δ·J_G) dp = δ·G are implicit-Euler steps of the flow —
  forward-Euler-like for small δ, exactly Newton as δ→∞ — with δ
  adapted by switched-evolution relaxation (δ ← δ·‖G_prev‖/‖G_new‖;
  Kelley & Keyes, SINUM 35(2), 1998). Each linear system is solved by
  GMRES on `jax.jvp` products — no Jacobian is ever materialised
  (dense would be 80 GB at the 100,000-dim ex4var2 state), the same
  approach as the stiff stepper's stages (`kvaerno3.py:77-83`).
- **Implicit gradients.** The solve is wrapped in `jax.custom_vjp`:
  for a steady state p∞(θ) defined by G(p∞, θ) = 0, the cotangent pull
  back is one *transposed* GMRES solve J_Gᵀ u = ḡ followed by one VJP
  of F in θ — O(1) linear solves instead of differentiating through an
  entire t→10⁴ integration. Composed with the parametric engine
  (`engine/parametric.py`) this yields d(steady state)/d(rate
  constants) — e.g. equilibrium sensitivities to ex2's (J, h, β) or
  ex4var2's free-enthalpy landscape.

The whole solve (Newton, Krylov, line search) is one jitted
`lax.while_loop` program; everything runs on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SteadyInfo(NamedTuple):
    converged: jax.Array   # bool: residual tolerance met
    iterations: jax.Array  # int32: Newton iterations taken
    residual: jax.Array    # float: final rms of the augmented residual


def _rms(x):
    return jnp.sqrt(jnp.mean(x * x))


def make_steady_state(fn, *, size_a: int | None = None,
                      cl_k: int | None = None,
                      tol: float = 1e-12, max_iter: int = 200,
                      delta0: float = 1.0, delta_max: float = 1e14,
                      delta_min: float = 1e-10,
                      gmres_tol: float = 1e-8, gmres_restart: int = 50,
                      gmres_maxiter: int = 8,
                      gmres_tol_bwd: float = 1e-13):
    """Builds ``solve(p_guess, args) -> (p_inf, info)`` for
    ``dp/dt = fn(p, args)``.

    ``args`` is an arbitrary pytree of (possibly traced) arrays the RHS
    closes over — e.g. a `ParametricDense` const vector. The returned
    solve is differentiable in ``args`` via the implicit function
    theorem (`jax.custom_vjp`); it is *independent* of ``p_guess`` at
    the solution, so the guess cotangent is zero by construction.

    ``size_a``/``cl_k`` identify the state as an SPD and enable the
    invariant-manifold augmentation (module docstring) — REQUIRED for
    SPD dynamics, whose raw Jacobian is structurally singular. Omit
    both only for generic ODE systems (e.g. mass-action kinetics) with
    nonsingular Jacobians.

    Convergence: rms of the augmented residual ≤ ``tol`` (absolute; SPD
    entries live on [0, 1] so an absolute scale is meaningful).
    ``delta0`` is the initial pseudo-time step: a residual-increasing
    step rejects and quarters δ; an accepting step grows δ by the
    residual ratio (SER), so the iteration turns into full Newton near
    the root. ``converged=False`` with δ at ``delta_min`` means the
    iteration found a non-root attractor of ‖G‖ — restart from a
    better-relaxed guess (`steady_state`'s ``warm_t``).
    """
    if (size_a is None) != (cl_k is None):
        raise ValueError("pass size_a and cl_k together (or neither)")

    if size_a is not None:

        def _aug(p, args):
            f = fn(p, args)
            q = p.reshape((size_a,) * cl_k)
            # Consistency defect Cp (zero on any valid SPD) and its
            # adjoint embedding C^T(Cp).
            defect = q.sum(axis=0) - q.sum(axis=-1)
            ct = (jnp.broadcast_to(defect[None, ...], q.shape)
                  - jnp.broadcast_to(defect[..., None], q.shape))
            return f - ct.reshape(p.shape) - (jnp.sum(p) - 1.0) / p.shape[0]
    else:

        def _aug(p, args):
            return fn(p, args)

    def _ptc(p0, args):
        p0 = jnp.asarray(p0)
        f64 = p0.dtype

        def cond(st):
            p, gn, delta, it, done = st
            return (~done) & (delta >= delta_min) & (it < max_iter)

        def body(st):
            p, gn, delta, it, _ = st
            g = _aug(p, args)

            def matvec(v):
                # (I - delta*J_G) v via a jvp at the current iterate.
                jv = jax.jvp(lambda q: _aug(q, args), (p,), (v,))[1]
                return v - delta * jv

            dp, _ = jax.scipy.sparse.linalg.gmres(
                matvec, delta * g, tol=gmres_tol, atol=0.0,
                restart=gmres_restart, maxiter=gmres_maxiter,
                solve_method="batched")
            new_n = _rms(_aug(p + dp, args))
            accept = jnp.isfinite(new_n) & (new_n < gn)
            p_new = jnp.where(accept, p + dp, p)
            gn_new = jnp.where(accept, new_n, gn)
            # SER: grow delta by the residual ratio on accept (clamped
            # to 1e3x per step), quarter it on reject.
            grow = jnp.clip(gn / jnp.maximum(new_n, 1e-300), 1.0, 1e3)
            delta_new = jnp.where(accept,
                                  jnp.minimum(delta * grow, delta_max),
                                  delta * 0.25)
            done = gn_new <= tol
            return p_new, gn_new, delta_new, it + 1, done

        gn0 = _rms(_aug(p0, args))
        p, gn, delta, it, done = jax.lax.while_loop(
            cond, body, (p0, gn0, jnp.asarray(delta0, f64),
                         jnp.int32(0), gn0 <= tol))
        res = _rms(_aug(p, args))
        return p, SteadyInfo(converged=res <= tol, iterations=it,
                             residual=res)

    @jax.custom_vjp
    def solve(p_guess, args):
        return _ptc(p_guess, args)

    def solve_fwd(p_guess, args):
        p_inf, info = _ptc(p_guess, args)
        return (p_inf, info), (p_inf, args)

    def solve_bwd(residuals, cotangents):
        p_inf, args = residuals
        g_p, _g_info = cotangents  # info is diagnostics; cotangent unused

        # u solves J_G(p_inf)^T u = g_p; the transposed matvec is one
        # VJP of the augmented RHS at the solution.
        _, vjp_p = jax.vjp(lambda q: _aug(q, args), p_inf)

        def matvec_t(v):
            return vjp_p(v)[0]

        # Tighter tolerance than the forward Newton systems: gradient
        # error scales as cond(J_G)·tol, and unlike a forward iterate a
        # backward solve is not self-correcting.
        u, _ = jax.scipy.sparse.linalg.gmres(
            matvec_t, g_p, tol=gmres_tol_bwd, atol=0.0,
            restart=gmres_restart, maxiter=gmres_maxiter,
            solve_method="batched")

        # p_inf(args) satisfies G(p_inf, args) = 0, so
        # args_bar = -(dG/dargs)^T u; the augmentation term carries no
        # args dependence, so dG/dargs = dF/dargs.
        _, vjp_args = jax.vjp(lambda a: fn(p_inf, a), args)
        args_bar = jax.tree_util.tree_map(jnp.negative, vjp_args(u)[0])
        p_guess_bar = jnp.zeros_like(p_inf)
        return p_guess_bar, args_bar

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def steady_state(tag: str, cl_k: int, p_guess, *, warm_t: float = 0.0,
                 n_sub: int = 64, **kwargs):
    """Convenience wrapper: steady state of a registered problem's
    exact dense SPD dynamics.

    ``warm_t > 0`` first integrates the guess forward by that much time
    (fixed-grid RK5) — Newton's basin for SPD dynamics is wide but a
    short relaxation makes convergence from crude guesses (e.g. uniform)
    robust. Returns ``(p_inf, info)``.
    """
    from ..engine import build_dy_dt
    from ..engine.dsl import get_problem
    from .fixed import odeint_fixed

    dfn, _ = build_dy_dt(tag, cl_k)
    p_guess = jnp.asarray(p_guess, jnp.float64).reshape(-1)
    if warm_t > 0.0:
        ys = odeint_fixed(lambda y, t: dfn(y), p_guess,
                          jnp.asarray([0.0, warm_t]), n_sub=n_sub)
        p_guess = ys[-1]
    solve = make_steady_state(lambda p, _a: dfn(p),
                              size_a=get_problem(tag).size_a, cl_k=cl_k,
                              **kwargs)
    return jax.jit(solve)(p_guess, None)
