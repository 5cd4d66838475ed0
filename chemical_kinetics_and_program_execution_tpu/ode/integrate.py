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
from .kvaerno3 import odeint_kvaerno3

# "dop853" uses the dense-output stepper (steps decoupled from the
# sample grid); "dop853-step" clamps steps to sample times (the simpler
# variant, kept selectable for cross-checks). "kvaerno3" is the
# on-device stiff option (L-stable ESDIRK with Newton–Krylov stages);
# scipy's stiff method names map onto it so `method="LSODA"`-style
# callers land on the right stepper class.
_STEPPERS = {
    "dopri5": "odeint_dopri5",
    "dop853": "odeint_dop853_dense",
    "dop853-step": "odeint_dop853",
    "kvaerno3": "odeint_kvaerno3",
    "lsoda": "odeint_kvaerno3",
    "radau": "odeint_kvaerno3",
    "bdf": "odeint_kvaerno3",
}


def solve(fn_dy_dt, y0, ts, *, rtol=1e-9, atol=1e-9, backend="jax",
          method=None, max_steps=1_000_000, return_info=False,
          chunk_size=None, progress=False, checkpoint_path=None,
          project=None):
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

    ``project`` (jax backend): a device-side observable projection — a
    callable mapping sampled states ``[T, n]`` to observables
    ``[T, n_obs]``, applied on device per chunk so only the projected
    rows cross the host link. At large states the full sample grid is
    the wall-clock bottleneck on a tunnelled TPU (e.g. ex4 at cl_k=7:
    4.78M-dim f64 state → 38 MB per sample), and most observables (all
    ``seq_prob`` windows of length ≤ cl_k) are linear slices of p. The
    returned array has shape ``[len(ts), n_obs]``; with ``return_info``
    the full final state rides in ``info["y_final"]``. With
    ``checkpoint_path`` the full carry state is additionally saved to
    ``<checkpoint_path>.y.npy`` each chunk (projected rows alone cannot
    seed a resume); a resume assumes the same projection.
    """
    y0 = np.asarray(y0, dtype=np.float64).ravel()
    ts = np.asarray(ts, dtype=np.float64)
    if project is not None and backend != "jax":
        raise ValueError("project= requires the jax backend")
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
            out = (np.asarray([y0]) if project is None
                   else np.asarray(project(y0[None]), dtype=np.float64))
            info0 = {"num_accepted": 0, "num_rejected": 0,
                     "completed": True}
            if project is not None:
                info0["y_final"] = y0
            return (out, info0) if return_info else out
        if chunk_size is None:
            env = os.environ.get("CKPE_ODE_CHUNK")
            chunk_size = int(env) if env else None
        chunk = n_out if not chunk_size else max(2, int(chunk_size))
        ys_parts = []
        y = y0
        acc = rej = 0
        start = 0
        if project is not None:
            row0 = np.asarray(project(y0[None]), dtype=np.float64)
            width = row0.shape[-1]
        else:
            row0 = y0[None]
            width = y0.size
        mm = meta_path = y_path = None
        if checkpoint_path:
            key = hashlib.sha1(
                ts.tobytes() + y0.tobytes()
                + f"{rtol}:{atol}:{name}:{width}".encode()
            ).hexdigest()
            meta_path = checkpoint_path + ".meta.json"
            y_path = checkpoint_path + ".y.npy"
            if os.path.exists(checkpoint_path) and os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                y_resume = None
                if meta.get("key") == key and project is not None \
                        and os.path.exists(y_path):
                    # Validate that the state sidecar matches this meta
                    # (see the write-side comment on atomicity). A
                    # content hash, not a float sum: SPD states conserve
                    # sum(y)≈1, so sums can collide across chunks.
                    y_cand = np.load(y_path)
                    if (meta.get("y_next") == meta.get("next")
                            and hashlib.sha1(y_cand.tobytes()).hexdigest()
                            == meta.get("y_sha1")):
                        y_resume = y_cand
                if meta.get("key") == key and (
                        project is None or y_resume is not None):
                    mm = np.lib.format.open_memmap(checkpoint_path,
                                                   mode="r+")
                    start = int(meta["next"])
                    acc = int(meta.get("num_accepted", 0))
                    rej = int(meta.get("num_rejected", 0))
                    y = (y_resume if project is not None
                         else np.array(mm[start - 1]))
                    if progress:
                        print(f"[ckpe.ode] resuming at sample {start}"
                              f"/{n_out} from {checkpoint_path}",
                              flush=True)
            if mm is None:
                mm = np.lib.format.open_memmap(
                    checkpoint_path, mode="w+", dtype=np.float64,
                    shape=(n_out, width),
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
            ys_parts.append(row0)
            if mm is not None:
                mm[0] = row0[0]
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
            # Stays a device array until (projected) transfer below.
            ys_c = ys_c[:1 + (stop - start) if start else (stop - start)]
            if not bool(info["completed"]):
                raise RuntimeError(
                    f"ODE solve did not complete within "
                    f"max_steps={max_steps} "
                    f"(accepted={int(info['num_accepted'])}, "
                    f"rejected={int(info['num_rejected'])})."
                )
            acc += int(info["num_accepted"])
            rej += int(info["num_rejected"])
            rows_dev = ys_c if start == 0 else ys_c[1:]
            rows = np.asarray(rows_dev if project is None
                              else project(rows_dev), dtype=np.float64)
            y = ys_c[-1]  # full state, device-resident under project
            if mm is not None:
                mm[start:stop] = rows
                mm.flush()
                meta = {"key": key, "next": stop,
                        "num_accepted": acc, "num_rejected": rej}
                if project is not None:
                    # The two os.replace calls below are not jointly
                    # atomic, so the meta records which sample the
                    # sidecar state corresponds to ("y_next") plus a
                    # checksum; resume validates both (a crash between
                    # the replaces then restarts the solve instead of
                    # silently resuming one chunk ahead).
                    y_host = np.asarray(y, dtype=np.float64)
                    meta["y_next"] = stop
                    meta["y_sha1"] = hashlib.sha1(
                        y_host.tobytes()).hexdigest()
                    tmp_y = y_path + ".tmp"
                    np.save(tmp_y, y_host)
                    os.replace(tmp_y + ".npy", y_path)
                tmp = meta_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(meta, f)
                os.replace(tmp, meta_path)
            else:
                ys_parts.append(rows)
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
            if y_path and os.path.exists(y_path):
                os.remove(y_path)
        else:
            ys = (np.concatenate(ys_parts, axis=0) if len(ys_parts) > 1
                  else ys_parts[0])
        info = {"num_accepted": acc, "num_rejected": rej, "completed": True}
        if project is not None:
            info["y_final"] = np.asarray(y, dtype=np.float64)
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
