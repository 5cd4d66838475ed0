"""Jit-native adaptive Dormand–Prince 5(4) ODE integrator.

The reference integrates on the host with `scipy.integrate.odeint` /
`solve_ivp` (`framework/markov_tapes.py:292-354`), paying a Python→C→Scheme
FFI round-trip per RHS evaluation. Here the whole solve — stepping, error
control, and output sampling — runs inside one `jax.jit` as a
`lax.while_loop`, so the RHS never leaves the device.

Output values are produced by clamping steps to land exactly on the
requested sample times (no interpolation error at sample points; with
tolerances of 1e-9..1e-13 the natural step count dominates anyway).
Step-size control is the standard PI controller (β=0.4/5, α=0.7/5 - 0.75β
equivalent; here the common (0.7, 0.4)/order pair) with 0.2–10× clamps and
a 0.9 safety factor, matching scipy's RK defaults in spirit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Dormand–Prince 5(4) tableau.
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                 11 / 84, 0.0])
_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                 -92097 / 339200, 187 / 2100, 1 / 40])
_ERR = _B5 - _B4
_ORDER = 5.0


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x * x))


@partial(jax.jit, static_argnums=(0, 4))
def odeint_dopri5(fn, y0, ts, tols, max_steps=1_000_000):
    """Integrates ``dy/dt = fn(y, t)`` sampling at times ``ts``.

    Args:
      fn: RHS function ``(y, t) -> dy/dt`` (jittable).
      y0: initial state at ``ts[0]``.
      ts: increasing sample times, shape ``[T]``.
      tols: ``(rtol, atol)`` pair.
      max_steps: hard cap on accepted+rejected steps (static).

    Returns:
      ``(ys, info)`` where ``ys`` has shape ``[T, ...]`` (``ys[0] == y0``)
      and ``info`` is a dict with step statistics.
    """
    rtol, atol = tols
    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts, dtype=y0.dtype)
    n_out = ts.shape[0]
    out = jnp.zeros((n_out,) + y0.shape, y0.dtype).at[0].set(y0)

    t0 = ts[0]
    f0 = fn(y0, t0)

    # Initial step heuristic (cf. Hairer/Wanner; scipy _select_initial_step).
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = fn(y1, t0 + h0)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / _ORDER),
    )
    dt0 = jnp.minimum(100 * h0, h1)
    span = ts[-1] - t0
    dt0 = jnp.clip(dt0, 1e-14 * span, span)

    def cond(state):
        t, y, f, dt, err_prev, i_out, out, n_acc, n_rej = state
        return (i_out < n_out) & (n_acc + n_rej < max_steps)

    def body(state):
        t, y, f, dt, err_prev, i_out, out, n_acc, n_rej = state
        t_target = ts[jnp.minimum(i_out, n_out - 1)]
        dt_eff = jnp.minimum(dt, t_target - t)
        hits_target = dt_eff >= (t_target - t) * (1 - 1e-14)

        # The 7 stages (FSAL: stage 7 value is the next step's stage 1).
        ks = [f]
        for row, c in zip(_A[1:], _C[1:]):
            yi = y + dt_eff * sum(a * k for a, k in zip(row, ks))
            ks.append(fn(yi, t + c * dt_eff))
        k_mat = jnp.stack(ks)
        y_new = y + dt_eff * jnp.tensordot(_B5.astype(y.dtype), k_mat, 1)
        err_vec = dt_eff * jnp.tensordot(_ERR.astype(y.dtype), k_mat, 1)
        scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        err = jnp.maximum(_rms_norm(err_vec / scale), 1e-30)

        accept = err <= 1.0
        # PI step-size controller.
        factor = 0.9 * err ** (-0.7 / _ORDER) * err_prev ** (0.4 / _ORDER)
        factor = jnp.clip(factor, 0.2, 10.0)
        dt_next = jnp.where(accept, dt_eff * factor, dt_eff * jnp.clip(
            0.9 * err ** (-1.0 / _ORDER), 0.2, 1.0))

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
            jnp.where(accept, ks[-1], f),
            dt_next,
            jnp.where(accept, err, err_prev),
            i_out + jnp.where(wrote, 1, 0),
            out,
            n_acc + jnp.where(accept, 1, 0),
            n_rej + jnp.where(accept, 0, 1),
        )

    # Output index starts at 1: slot 0 already holds y0. If ts[0] is
    # duplicated the loop still terminates because dt_eff becomes 0 and
    # hits_target is immediately true.
    state = (t0, y0, f0, dt0, jnp.asarray(1.0, y0.dtype), 1, out,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    t, y, f, dt, err_prev, i_out, out, n_acc, n_rej = jax.lax.while_loop(
        cond, body, state
    )
    info = {"num_accepted": n_acc, "num_rejected": n_rej,
            "completed": i_out >= n_out}
    return out, info
