"""Drop-in replacement for the reference's `markov_tapes` Python API.

Mirrors the public surface of `framework/markov_tapes.py` — the analysis
helpers, `get_dy_dt`, `ode_integrate`, `ode_integrate_ivp` — so reference
users can switch by changing one import. Differences by design:

- No Gambit runtime, no FFI, no import-time native setup: problems are
  compiled to dense event tables on first use and cached (so there is also
  no `init_gambit`; a no-op stub is provided).
- `ode_integrate*` accept ``backend="jax"`` (on-device adaptive RK, the
  default here is still "scipy" for exact behavioral parity with the
  reference's solvers).
- The reference's unconditional ``print(f'DDD {t=...}')`` in the RHS hot
  path (`markov_tapes.py:277`, a debug leftover per SURVEY §7.4) is not
  reproduced; set ``MARKOV_TAPES_DEBUG=1`` for progress logging instead.
"""

from __future__ import annotations

import types

import numpy as np

from .engine import build_dy_dt
from .markov import (  # noqa: F401  (re-exported API surface)
    ctm_from_mpp,
    get_ctm_eigenvalue1_eigenspace,
    markov_entropy,
    mpp_from_spd,
    seq_prob,
    tprint,
)
from .ode.integrate import solve
from .utils import config

IS_DEBUG = config.IS_DEBUG


def init_gambit():  # pragma: no cover - compatibility stub
    """No-op. The TPU framework has no embedded Scheme runtime to boot."""


def get_dy_dt(*, tag, size_a, cl_k, debug=False):
    """Returns the ``(probs_in, t) -> dp/dt`` RHS for a registered problem.

    Matches the reference signature (`markov_tapes.py:259-289`) including
    the state-size validation; computation runs as one jitted device
    kernel.
    """
    fn, compiled = build_dy_dt(tag, cl_k)
    if compiled.size_a != size_a:
        raise ValueError(
            f"Problem {tag!r} has alphabet size {compiled.size_a}, "
            f"but size_a={size_a} was requested."
        )
    expected_size = size_a**cl_k

    def dy_dt(a_probs_in, t=0.0):
        probs = np.asarray(a_probs_in, dtype=np.float64).ravel()
        if probs.size != expected_size:
            raise ValueError(
                f"probability-array should have size {expected_size}, "
                f"observed: {probs.size}"
            )
        if debug and IS_DEBUG:
            # Reference parity: debug threads down to a per-world dump of
            # (p_world, program, old/new sequences) each RHS call
            # (`tape_multiverse.scm:1006-1028`, `markov_tapes.py:266-277`).
            from .engine.reference import dump_worlds

            print(f"[ckpe] dy_dt t={t:.10g}")
            dump_worlds(tag, cl_k, probs, limit=200)
        return np.asarray(fn(probs))

    dy_dt.compiled = compiled
    dy_dt.device_fn = fn
    return dy_dt


def _validate_p0(p0, size_a, cl_k):
    p0 = np.asarray(p0, dtype=np.float64).ravel()
    if not (
        p0.size == size_a**cl_k
        and (0 <= p0).all()
        and (p0 <= 1).all()
        and abs(p0.sum() - 1) < 1e-10
    ):
        raise ValueError(
            "Parameter p0 is not a subsequence probability distribution."
        )
    return p0


def ode_integrate(*, tag, size_a, cl_k, p0, ts,
                  odeint_kwargs=types.MappingProxyType({}),
                  debug=False, backend="scipy"):
    """`scipy.integrate.odeint`-compatible solve (`markov_tapes.py:292-318`).

    ``backend="jax"`` switches to the on-device adaptive solver with the
    rtol/atol taken from ``odeint_kwargs``.
    """
    p0 = _validate_p0(p0, size_a, cl_k)
    dy_dt = get_dy_dt(tag=tag, size_a=size_a, cl_k=cl_k, debug=debug)
    if backend == "jax":
        kwargs = dict(odeint_kwargs)
        return solve(
            _device_rhs(dy_dt), p0, ts, backend="jax",
            rtol=kwargs.pop("rtol", 1.49012e-8),
            atol=kwargs.pop("atol", 1.49012e-8),
            chunk_size=kwargs.pop("chunk_size", None),
            progress=kwargs.pop("progress", False),
        )
    import scipy.integrate

    return scipy.integrate.odeint(dy_dt, p0, ts, **dict(odeint_kwargs))


def ode_integrate_ivp(*, tag, size_a, cl_k, p0, ts,
                      ivp_kwargs=types.MappingProxyType({}),
                      debug=False, backend="scipy"):
    """`solve_ivp`-compatible solve reshaped to odeint layout
    (`markov_tapes.py:321-354`)."""
    p0 = _validate_p0(p0, size_a, cl_k)
    dy_dt = get_dy_dt(tag=tag, size_a=size_a, cl_k=cl_k, debug=debug)
    kwargs = dict(ivp_kwargs)
    if backend == "jax":
        return solve(
            _device_rhs(dy_dt), p0, ts, backend="jax",
            rtol=kwargs.pop("rtol", 1e-3),
            atol=kwargs.pop("atol", 1e-6),
            method=kwargs.pop("method", None),
            chunk_size=kwargs.pop("chunk_size", None),
            progress=kwargs.pop("progress", False),
            checkpoint_path=kwargs.pop("checkpoint_path", None),
            project=kwargs.pop("project", None),
            return_info=kwargs.pop("return_info", False),
        )
    import scipy.integrate

    return scipy.integrate.solve_ivp(
        lambda t, y: dy_dt(y, t), (ts[0], ts[-1]), p0, t_eval=ts, **kwargs
    ).y.T


def _device_rhs(dy_dt):
    fn = dy_dt.device_fn

    def rhs(y, t):
        del t
        return fn(y)

    return rhs


def _run_validation():
    """The reference's import-time golden-value smoke test
    (`markov_tapes.py:357-365`), exposed for test suites."""
    fn_dy_dt = get_dy_dt(
        tag="__canary_problem_radioactive_decay", size_a=2, cl_k=3
    )
    observed = fn_dy_dt(np.full([8], 0.125), 0.0).tolist()
    expected = [0.375, 0.125, 0.125, -0.125, 0.125, -0.125, -0.125, -0.375]
    if expected != observed:
        raise RuntimeError(
            "Load-time validation problem failed to produce the expected "
            f"result: {observed}"
        )
