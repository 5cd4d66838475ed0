"""Fixed-grid Runge–Kutta solver — the differentiable solve path.

The adaptive solvers (`dopri5.py`, `dop853.py`) run their step loop as a
`lax.while_loop`, which JAX cannot reverse-mode differentiate. This
module provides the complementary formulation: the same Dormand–Prince
5th-order tableau on a *fixed* step grid driven by `lax.scan`, so
`jax.grad` / `jax.vjp` flow end-to-end through a whole solve.

That unlocks a capability class the reference (CPU Gambit + scipy,
`framework/markov_tapes.py:292-354`) structurally cannot offer:
**sensitivities and inverse design**. d(observable at t_final)/d(p0) is
one `jax.grad` away, and any scalar parametrisation of p0 (pair
density, monomer fraction, fuel fraction) can be optimised against a
target trajectory with optax, with every iteration a fully jitted
solve+gradient on device.

Memory: reverse-mode through T×n_sub RK steps would store every stage;
`jax.checkpoint` on the per-interval body caps residency at one
interval's stages plus the [T] output row — the standard
rematerialisation trade (recompute forward stages during the backward
sweep).

Accuracy: every shipped SPD workload is accuracy-limited, not
stability-limited (see RESULTS.md stiffness analysis), so a uniform
grid with a modest per-interval substep count reproduces the adaptive
answer; `tests/test_ode.py` pins parity vs dop853 and a
finite-difference gradient check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .dopri5 import _A, _B5, _C

# The tableau as a strictly-lower-triangular [7, 7] matrix so the RK
# stages can run as a `lax.scan` over stage index (zero-padded rows;
# row j only weights stages < j, so reading the not-yet-written rows of
# the stage carry is exact — they are zero-initialised and zero-weighted).
_A_MAT = jnp.array([tuple(row) + (0.0,) * (7 - len(row)) for row in _A])


def odeint_fixed(fn, y0, ts, n_sub: int = 8, args=None):
    """Integrates ``dy/dt = fn(y, t)`` on a fixed grid, differentiably.

    Args:
      fn: RHS function ``(y, t) -> dy/dt`` — or ``(y, t, args) ->
        dy/dt`` when ``args`` is given (jittable, differentiable).
      y0: initial state at ``ts[0]``.
      ts: increasing sample times, shape ``[T]``.
      n_sub: RK5 substeps per sample interval (static). Error per
        interval scales as ``(dt/n_sub)**5``.
      args: optional pytree of runtime parameters passed through to
        ``fn`` as a third argument. Unlike closure capture, values here
        may be JAX tracers — this is the channel for differentiating a
        solve w.r.t. rate parameters (`engine/parametric.py`).

    Returns:
      ``ys`` of shape ``[T, ...]`` with ``ys[0] == y0``. Fully
      reverse-mode differentiable w.r.t. ``y0``, ``args``, and any
      (non-traced) closure parameters of ``fn``.

    ``fn`` is a static jit argument: every distinct function OBJECT
    compiles (and caches) its own program, so loops should hoist the
    RHS out and vary only ``args`` / ``y0`` / ``ts``.
    """
    return _odeint_fixed_impl(fn, y0, ts, n_sub, args)


@partial(jax.jit, static_argnums=(0, 3))
def _odeint_fixed_impl(fn3, y0, ts, n_sub, args):
    if args is None:
        fn = fn3  # two-argument convention: fn(y, t)
    else:
        fn = lambda y, t: fn3(y, t, args)  # noqa: E731
    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts, dtype=y0.dtype)

    # Nested scans keep the compiled program small (one RK body total —
    # important on remote-compile backends): the inner scan runs the
    # n_sub substeps, the outer scan the sample intervals, and
    # `jax.checkpoint` on the interval body rematerialises stages in
    # the backward sweep instead of storing them.
    @jax.checkpoint
    def interval(y, t_pair):
        t_lo, t_hi = t_pair
        h = (t_hi - t_lo) / n_sub

        def substep(y, i):
            t = t_lo + i * h

            # Stage loop as a scan so the compiled graph holds exactly
            # ONE instance of the RHS (and, in reverse mode, one of its
            # transpose). Chaining the 7 stage RHS calls inline makes
            # XLA:CPU's compile of the *gradient* superlinear in the
            # chain length (measured: 1 call 2s, 7 calls 483s for the
            # ex4var2 dense RHS); the scan form compiles in seconds and
            # is runtime-equivalent (the [7, S] stage carry is noise
            # next to the RHS itself).
            def stage(ks, j):
                yi = y + h * jnp.tensordot(_A_MAT[j].astype(y.dtype),
                                           ks, 1)
                k = fn(yi, t + _C[j].astype(y.dtype) * h)
                return ks.at[j].set(k), None

            ks = jnp.zeros((7,) + y.shape, y.dtype)
            ks, _ = jax.lax.scan(stage, ks, jnp.arange(7))
            return y + h * jnp.tensordot(_B5.astype(y.dtype), ks,
                                         1), None

        y, _ = jax.lax.scan(substep, y, jnp.arange(n_sub))
        return y, y

    _, ys = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def grad_observable(fn, p0, ts, observable, n_sub: int = 8):
    """``(value, d value/d p0)`` of a scalar observable of the final state.

    ``observable`` maps the state at ``ts[-1]`` to a scalar. The whole
    solve + adjoint runs as one jitted reverse-mode pass.
    """

    def loss(p0):
        ys = odeint_fixed(fn, p0, ts, n_sub)
        return observable(ys[-1])

    return jax.value_and_grad(loss)(p0)
