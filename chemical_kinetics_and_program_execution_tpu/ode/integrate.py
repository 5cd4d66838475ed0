"""High-level ODE drivers over compiled problems or raw RHS functions.

Two backends:

- ``"jax"`` (default): the on-device adaptive Dormand–Prince solver
  (`dopri5.py`) — the whole solve is one jitted device computation.
- ``"scipy"``: host-side `scipy.integrate.odeint` / `solve_ivp` driving the
  jitted RHS, for parity checks against the reference's solver behavior
  (`framework/markov_tapes.py:292-354` uses LSODA and DOP853).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np

from .dop853 import odeint_dop853, odeint_dop853_dense
from .dopri5 import odeint_dopri5

# "dop853" uses the dense-output stepper (steps decoupled from the
# sample grid); "dop853-step" clamps steps to sample times (the simpler
# variant, kept selectable for cross-checks).
_STEPPERS = {
    "dopri5": "odeint_dopri5",
    "dop853": "odeint_dop853_dense",
    "dop853-step": "odeint_dop853",
}


def solve(fn_dy_dt, y0, ts, *, rtol=1e-9, atol=1e-9, backend="jax",
          method=None, max_steps=1_000_000, return_info=False,
          chunk_size=None, progress=False, checkpoint_path=None):
    """Integrates ``dy/dt = fn(y, t)`` sampling at ``ts``.

    Returns an array of shape ``[len(ts), n]`` like
    ``scipy.integrate.odeint``. On the jax backend, ``method`` picks the
    on-device stepper ("dopri5" or "dop853"/"DOP853"); by default tight
    tolerances (< 1e-9) route to DOP853, matching the reference's solver
    choices (`examples/ex4_chemical_turing.py:115`).

    ``chunk_size`` splits the sample grid into device calls of at most
    that many output points (carrying (y, t) across chunks). Long solves
    on remote/tunnelled accelerators need this: a single device program
    running for many minutes can trip transport watchdogs, and chunking
    also bounds per-call output memory and enables ``progress`` logging.

    ``checkpoint_path`` (jax backend, chunked) makes the solve
    crash-resumable: completed chunks stream into an ``.npy`` memmap at
    that path with a JSON progress sidecar; re-invoking the same solve
    resumes after the last completed chunk instead of restarting. The
    files are removed on successful completion.
    """
    y0 = np.asarray(y0, dtype=np.float64).ravel()
    ts = np.asarray(ts, dtype=np.float64)
    if backend == "jax":
        name = (method or "").lower()
        if not name:
            name = "dop853" if min(rtol, atol) < 1e-9 else "dopri5"
        if name not in _STEPPERS:
            name = "dop853"  # scipy method names (DOP853, RK45, LSODA...)
        # Looked up via globals() so tests can monkeypatch the stepper.
        stepper = globals()[_STEPPERS[name]]

        n_out = len(ts)
        if n_out < 2:
            return (np.asarray([y0]), {"num_accepted": 0,
                                       "num_rejected": 0,
                                       "completed": True}) \
                if return_info else np.asarray([y0])
        if chunk_size is None:
            env = os.environ.get("CKPE_ODE_CHUNK")
            chunk_size = int(env) if env else None
        chunk = n_out if not chunk_size else max(2, int(chunk_size))
        ys_parts = []
        y = y0
        acc = rej = 0
        start = 0
        mm = meta_path = None
        if checkpoint_path:
            key = hashlib.sha1(
                ts.tobytes() + y0.tobytes()
                + f"{rtol}:{atol}:{name}".encode()
            ).hexdigest()
            meta_path = checkpoint_path + ".meta.json"
            if os.path.exists(checkpoint_path) and os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                if meta.get("key") == key:
                    mm = np.lib.format.open_memmap(checkpoint_path,
                                                   mode="r+")
                    start = int(meta["next"])
                    acc = int(meta.get("num_accepted", 0))
                    rej = int(meta.get("num_rejected", 0))
                    y = np.array(mm[start - 1])
                    if progress:
                        print(f"[ckpe.ode] resuming at sample {start}"
                              f"/{n_out} from {checkpoint_path}",
                              flush=True)
            if mm is None:
                mm = np.lib.format.open_memmap(
                    checkpoint_path, mode="w+", dtype=np.float64,
                    shape=(n_out, y0.size),
                )

        # With the dense-output stepper every chunk is padded to a single
        # static shape (chunk+1 sample times, the tail repeating t_end),
        # so the device program compiles once instead of once per
        # distinct first/middle/last chunk length. Dense output at a
        # repeated sample time just re-evaluates the same interpolant;
        # the step-clamped steppers would take zero-length steps, so
        # they keep exact chunk shapes.
        pad_chunks = chunk < n_out and name == "dop853"
        if pad_chunks and start == 0:
            ys_parts.append(y0[None])
            if mm is not None:
                mm[0] = y0
            start = 1

        t_begin = time.time()
        while start < n_out:
            stop = min(start + chunk, n_out)
            ts_chunk = ts[start:stop] if start == 0 else ts[start - 1:stop]
            if pad_chunks and len(ts_chunk) < chunk + 1:
                ts_chunk = np.concatenate(
                    [ts_chunk,
                     np.full(chunk + 1 - len(ts_chunk), ts[-1])])
            ys_c, info = stepper(fn_dy_dt, y, ts_chunk, (rtol, atol),
                                 max_steps=max_steps)
            ys_c = np.asarray(ys_c)[:1 + (stop - start)
                                    if start else (stop - start)]
            if not bool(info["completed"]):
                raise RuntimeError(
                    f"ODE solve did not complete within "
                    f"max_steps={max_steps} "
                    f"(accepted={int(info['num_accepted'])}, "
                    f"rejected={int(info['num_rejected'])})."
                )
            acc += int(info["num_accepted"])
            rej += int(info["num_rejected"])
            rows = ys_c if start == 0 else ys_c[1:]
            if mm is not None:
                mm[start:stop] = rows
                mm.flush()
                tmp = meta_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"key": key, "next": stop,
                               "num_accepted": acc,
                               "num_rejected": rej}, f)
                os.replace(tmp, meta_path)
            else:
                ys_parts.append(rows)
            y = ys_c[-1]
            if progress:
                print(
                    f"[ckpe.ode] t={ts[stop - 1]:g}/{ts[-1]:g} "
                    f"steps={acc}(+{rej} rej) "
                    f"{time.time() - t_begin:.0f}s",
                    flush=True,
                )
            start = stop
        if mm is not None:
            ys = np.array(mm)
            del mm
            os.remove(checkpoint_path)
            os.remove(meta_path)
        else:
            ys = (np.concatenate(ys_parts, axis=0) if len(ys_parts) > 1
                  else ys_parts[0])
        info = {"num_accepted": acc, "num_rejected": rej, "completed": True}
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
