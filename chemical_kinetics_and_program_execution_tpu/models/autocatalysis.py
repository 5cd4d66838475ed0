"""Mass-action autocatalysis kinetics (JAX, fully on-device).

Covers the reference's self-contained example (`examples/autocatalysis.py`):
two autocatalytic dimer species A/B competing for a monomer M in a flow
reactor. Parameters pack as
``[c_form_a, c_auto_a, c_stab_a, c_form_b, c_auto_b, c_stab_b, c_add,
c_remove]`` (`autocatalysis.py:126-151`); dissociation constants derive
from formation/stability.

TPU-first differences: the 4-parameter-set sweeps the reference runs in a
Python loop over `scipy.integrate.odeint` (`autocatalysis.py:167-176`)
are a single `vmap` over the jitted adaptive solver here, and the
equilibrium finder is on-device Newton/gradient descent on ‖dy/dt‖²
instead of host BFGS (`autocatalysis.py:191-209`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ode.dopri5 import odeint_dopri5


@jax.jit
def dy_dt(y, params):
    """Rate law for [A-dimer, B-dimer, monomer]."""
    (c_form_a, c_auto_a, c_stab_a,
     c_form_b, c_auto_b, c_stab_b,
     c_add, c_remove) = params
    c_sdiss_a = c_form_a / c_stab_a
    c_adiss_a = c_auto_a / c_stab_a
    c_sdiss_b = c_form_b / c_stab_b
    c_adiss_b = c_auto_b / c_stab_b
    ca, cb, cm = y
    form_a = c_form_a * cm * cm
    form_b = c_form_b * cm * cm
    auto_a = c_auto_a * ca * cm * cm
    auto_b = c_auto_b * cb * cm * cm
    sdiss_a = c_sdiss_a * ca
    sdiss_b = c_sdiss_b * cb
    adiss_a = c_adiss_a * ca * ca
    adiss_b = c_adiss_b * cb * cb
    return jnp.stack([
        form_a + auto_a - sdiss_a - adiss_a - c_remove * ca,
        form_b + auto_b - sdiss_b - adiss_b - c_remove * cb,
        2 * (sdiss_a + sdiss_b) + 2 * (adiss_a + adiss_b)
        - 2 * (form_a + form_b) - 2 * (auto_a + auto_b)
        - c_remove * cm + c_add,
    ])


@partial(jax.jit, static_argnums=(3,))
def _solve_batch(y0s, params_batch, ts, max_steps):
    def one(y0, params):
        ys, _ = odeint_dopri5(
            lambda y, t: dy_dt(y, params), y0, ts, (1.49012e-8, 1.49012e-8),
            max_steps=max_steps,
        )
        return ys

    return jax.vmap(one)(y0s, params_batch)


def integrate_sweep(y0_and_params, ts, max_steps=200_000):
    """Integrates a batch of (y0[3] ++ params[8]) rows; returns
    [B, T, 3]."""
    arr = jnp.asarray(y0_and_params, dtype=jnp.float64)
    ts = jnp.asarray(ts, dtype=jnp.float64)
    return np.asarray(_solve_batch(arr[:, :3], arr[:, 3:], ts, max_steps))


def find_equilibrium(y0, params, steps=2000, lr=1e-3):
    """On-device minimisation of ‖dy/dt‖² starting from ``y0``.

    Returns ``(y_eq, residual)``; mirrors the intent of the reference's
    BFGS-based `get_equilibrium_fn` (`autocatalysis.py:191-209`).
    """
    params = jnp.asarray(params, dtype=jnp.float64)

    @jax.jit
    def loss(y):
        d = dy_dt(y, params)
        return d @ d

    grad = jax.grad(loss)

    @jax.jit
    def run(y):
        def body(i, state):
            y, rate = state
            g = grad(y)
            y_new = y - rate * g
            better = loss(y_new) < loss(y)
            return (
                jnp.where(better, y_new, y),
                jnp.where(better, rate * 1.2, rate * 0.5),
            )

        y, _ = jax.lax.fori_loop(0, steps, body, (y, lr))
        return y

    y_eq = run(jnp.asarray(y0, dtype=jnp.float64))
    return np.asarray(y_eq), float(loss(y_eq))
