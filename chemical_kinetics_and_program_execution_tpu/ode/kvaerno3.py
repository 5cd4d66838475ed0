"""Jit-native stiff ODE integrator: Kvaerno 3(2) ESDIRK, Newton–Krylov.

The reference's *default* solver for ex2/ex3 is LSODA via
`scipy.integrate.odeint` (`framework/markov_tapes.py:318`), which switches
to a BDF method when the problem turns stiff. The explicit on-device
steppers (`dopri5.py`, `dop853.py`) cover every shipped workload (they are
accuracy-limited, not stability-limited — see RESULTS.md "Stiffness
analysis (round 2)"), but a TPU-native framework needs a stiff option of its own
for rate-table problems users may write with widely separated rates.

Method: Kvaerno's 4-stage ESDIRK 3(2) (A-/L-stable, stiffly accurate,
explicit first stage, embedded 2nd-order error estimate; A. Kvaerno,
"Singly diagonally implicit Runge-Kutta methods with an explicit first
stage", BIT 44, 2004 — the same tableau diffrax ships as `Kvaerno3`).
Each implicit stage solves

    z = g + h*gamma*f(z, t_s),   g = y + h * sum_j a_sj * k_j

by a Newton iteration whose linear systems (I - h*gamma*J) dz = -phi are
solved **matrix-free** with GMRES on `jax.jvp` products — no Jacobian is
ever materialised, which is what makes the method viable at the
100,000-dim ex4var2 state (a dense Jacobian would be 80 GB). The whole
solve (stepping, Newton, Krylov, error control, sampling) is one jitted
`lax.while_loop` program, same as the explicit steppers.

Step-size control is an I controller on the embedded 2(3) error with the
same safety/clamp conventions as `dopri5.py`; Newton non-convergence
rejects the step with a 4x cut (cf. scipy Radau's handling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Kvaerno 3(2) tableau (row sums equal c; stage 4 row is b, stage 3 row
# is the embedded 2nd-order weights).
_GAMMA = 0.435866521508459
_A31 = 0.490563388419108
_A32 = 0.073570090080892
_A41 = 0.308809969973036
_A42 = 1.490563388254106
_A43 = -1.235239879727145
_C = (0.0, 2 * _GAMMA, 1.0, 1.0)
_ORDER = 3.0


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x * x))


def _newton_stage(fn, g, t_s, h, y_scale, f_guess, newton_tol,
                  max_newton=8, gmres_restart=20):
    """Solves z = g + h*gamma*f(z, t_s) for one implicit stage.

    Returns (z, f(z, t_s), converged). ``f_guess`` seeds the predictor
    z0 = g + h*gamma*f_guess (the previous stage's slope — exact for
    slowly varying f).
    """
    hg = h * _GAMMA

    def phi(z):
        return z - hg * fn(z, t_s) - g

    z0 = g + hg * f_guess

    def cond(state):
        z, it, done, fail = state
        return (~done) & (~fail) & (it < max_newton)

    def body(state):
        z, it, done, fail = state
        r = phi(z)

        def matvec(v):
            # (I - h*gamma*J) v via a jvp at the current iterate.
            return v - hg * jax.jvp(lambda yy: fn(yy, t_s), (z,), (v,))[1]

        dz, _ = jax.scipy.sparse.linalg.gmres(
            matvec, -r, tol=1e-4, atol=0.0, restart=gmres_restart,
            maxiter=1, solve_method="batched")
        z_new = z + dz
        step_norm = _rms_norm(dz / y_scale)
        done_new = step_norm < newton_tol
        # Divergence guard: a growing update means (I - hgJ) is too far
        # from the Newton model at this h — reject and retry smaller.
        fail_new = ~jnp.isfinite(step_norm) | (
            (it > 2) & (step_norm > 1.0))
        return z_new, it + 1, done_new, fail_new

    z, it, done, fail = jax.lax.while_loop(
        cond, body, (z0, jnp.int32(0), jnp.bool_(False), jnp.bool_(False)))
    return z, fn(z, t_s), done & ~fail


@partial(jax.jit, static_argnums=(0, 4))
def odeint_kvaerno3(fn, y0, ts, tols, max_steps=1_000_000):
    """Integrates stiff ``dy/dt = fn(y, t)`` sampling at times ``ts``.

    Same contract as `odeint_dopri5`: returns ``(ys, info)`` with
    ``ys[0] == y0`` and steps clamped to land on sample times.
    """
    rtol, atol = tols
    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts, dtype=y0.dtype)
    n_out = ts.shape[0]
    out = jnp.zeros((n_out,) + y0.shape, y0.dtype).at[0].set(y0)

    eps = jnp.finfo(y0.dtype).eps
    newton_tol = jnp.maximum(
        10 * eps / rtol, jnp.minimum(0.03, rtol ** 0.5))

    t0 = ts[0]
    f0 = fn(y0, t0)
    scale0 = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale0)
    d1 = _rms_norm(f0 / scale0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    span = ts[-1] - t0
    dt0 = jnp.clip(h0, 1e-14 * span, span)

    def cond(state):
        t, y, f, dt, i_out, out, n_acc, n_rej = state
        return (i_out < n_out) & (n_acc + n_rej < max_steps)

    def body(state):
        t, y, f, dt, i_out, out, n_acc, n_rej = state
        t_target = ts[jnp.minimum(i_out, n_out - 1)]
        dt_eff = jnp.minimum(dt, t_target - t)
        hits_target = dt_eff >= (t_target - t) * (1 - 1e-14)
        y_scale = atol + jnp.abs(y) * rtol

        k1 = f  # explicit first stage
        g2 = y + dt_eff * _GAMMA * k1
        z2, k2, ok2 = _newton_stage(
            fn, g2, t + _C[1] * dt_eff, dt_eff, y_scale, k1, newton_tol)
        g3 = y + dt_eff * (_A31 * k1 + _A32 * k2)
        z3, k3, ok3 = _newton_stage(
            fn, g3, t + _C[2] * dt_eff, dt_eff, y_scale, k2, newton_tol)
        g4 = y + dt_eff * (_A41 * k1 + _A42 * k2 + _A43 * k3)
        z4, k4, ok4 = _newton_stage(
            fn, g4, t + _C[3] * dt_eff, dt_eff, y_scale, k3, newton_tol)
        newton_ok = ok2 & ok3 & ok4

        y_new = z4  # stiffly accurate: b equals the last stage row
        # Embedded 2nd order is stage 3's row (z3 targets c=1).
        err_vec = y_new - z3
        scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        err = jnp.maximum(_rms_norm(err_vec / scale), 1e-30)
        err = jnp.where(newton_ok, err, jnp.asarray(2.0, y0.dtype))

        accept = newton_ok & (err <= 1.0)
        factor = jnp.clip(0.9 * err ** (-1.0 / _ORDER), 0.2, 10.0)
        dt_next = jnp.where(
            newton_ok, dt_eff * factor, dt_eff * 0.25)
        dt_next = jnp.maximum(dt_next, 1e-14 * span)

        t_acc = jnp.where(hits_target, t_target, t + dt_eff)
        wrote = accept & hits_target
        out = jax.lax.cond(
            wrote,
            lambda o: o.at[jnp.minimum(i_out, n_out - 1)].set(y_new),
            lambda o: o,
            out,
        )
        return (
            jnp.where(accept, t_acc, t),
            jnp.where(accept, y_new, y),
            jnp.where(accept, k4, f),  # FSAL: k4 at t+h is next k1
            dt_next,
            i_out + jnp.where(wrote, 1, 0),
            out,
            n_acc + jnp.where(accept, 1, 0),
            n_rej + jnp.where(accept, 0, 1),
        )

    state = (t0, y0, f0, dt0, 1, out,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    t, y, f, dt, i_out, out, n_acc, n_rej = jax.lax.while_loop(
        cond, body, state)
    info = {"num_accepted": n_acc, "num_rejected": n_rej,
            "completed": i_out >= n_out}
    return out, info
