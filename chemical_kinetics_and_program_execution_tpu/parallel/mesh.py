"""Mesh helpers for multi-chip execution.

The reference is single-process single-thread (SURVEY §2.5); the TPU
framework introduces two SPMD axes:

- ``"ev"``  — the event axis: the compiled event tables are sharded across
  devices and partial dy/dt vectors are `psum`-reduced over ICI (the
  tensor-parallel-like axis).
- ``"batch"`` — the ensemble axis: independent SPD vectors (parameter
  sweeps, many initial conditions) are data-parallel.
"""

from __future__ import annotations

import jax
import numpy as np


def make_mesh(n_batch: int = 1, n_event: int | None = None,
              devices=None) -> jax.sharding.Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_event is None:
        n_event = devices.size // n_batch
    if n_batch * n_event != devices.size:
        raise ValueError(
            f"mesh {n_batch}x{n_event} != {devices.size} devices"
        )
    return jax.sharding.Mesh(
        devices.reshape(n_batch, n_event), ("batch", "ev")
    )
