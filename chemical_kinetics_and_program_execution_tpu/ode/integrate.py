"""High-level ODE drivers over compiled problems or raw RHS functions.

Two backends:

- ``"jax"`` (default): the on-device adaptive Dormand–Prince solver
  (`dopri5.py`) — the whole solve is one jitted device computation.
- ``"scipy"``: host-side `scipy.integrate.odeint` / `solve_ivp` driving the
  jitted RHS, for parity checks against the reference's solver behavior
  (`framework/markov_tapes.py:292-354` uses LSODA and DOP853).
"""

from __future__ import annotations

import numpy as np

from .dop853 import odeint_dop853
from .dopri5 import odeint_dopri5


def solve(fn_dy_dt, y0, ts, *, rtol=1e-9, atol=1e-9, backend="jax",
          method=None, max_steps=1_000_000, return_info=False):
    """Integrates ``dy/dt = fn(y, t)`` sampling at ``ts``.

    Returns an array of shape ``[len(ts), n]`` like
    ``scipy.integrate.odeint``. On the jax backend, ``method`` picks the
    on-device stepper ("dopri5" or "dop853"/"DOP853"); by default tight
    tolerances (< 1e-9) route to DOP853, matching the reference's solver
    choices (`examples/ex4_chemical_turing.py:115`).
    """
    y0 = np.asarray(y0, dtype=np.float64).ravel()
    ts = np.asarray(ts, dtype=np.float64)
    if backend == "jax":
        name = (method or "").lower()
        if not name:
            name = "dop853" if min(rtol, atol) < 1e-9 else "dopri5"
        if name not in ("dopri5", "dop853"):
            name = "dop853"  # scipy method names (DOP853, RK45, LSODA...)
        stepper = odeint_dop853 if name == "dop853" else odeint_dopri5
        ys, info = stepper(fn_dy_dt, y0, ts, (rtol, atol),
                           max_steps=max_steps)
        ys = np.asarray(ys)
        if not bool(info["completed"]):
            raise RuntimeError(
                f"ODE solve did not complete within max_steps={max_steps} "
                f"(accepted={int(info['num_accepted'])}, "
                f"rejected={int(info['num_rejected'])})."
            )
        return (ys, info) if return_info else ys
    if backend == "scipy":
        import scipy.integrate

        if method in (None, "odeint", "lsoda"):
            ys = scipy.integrate.odeint(
                lambda y, t: np.asarray(fn_dy_dt(y, t)), y0, ts,
                rtol=rtol, atol=atol)
        else:
            ys = scipy.integrate.solve_ivp(
                lambda t, y: np.asarray(fn_dy_dt(y, t)),
                (ts[0], ts[-1]), y0, t_eval=ts, rtol=rtol, atol=atol,
                method=method).y.T
        return (ys, {}) if return_info else ys
    raise ValueError(f"Unknown backend {backend!r}")
