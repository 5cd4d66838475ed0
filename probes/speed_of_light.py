"""Roofline / speed-of-light audit of the hot device kernels.

Measures, on the attached chip:
  1. Peak achievable HBM bandwidth (big-array copy / triad, scanned
     on-device so the ~100-250 ms tunnel dispatch is amortised).
  2. The ensemble plane-round kernel's effective bandwidth and
     bytes-per-transition (from its timed rate), giving the achieved
     fraction of the copy roofline.
  3. The same for the blocked-frontier round and the BFF interpreter.

The point: BASELINE's north star is a rate (1e8 transitions/s); this
probe turns "fast" into "X% of what the memory system physically
admits", so future rounds know whether the remaining gap is HBM or
compute (the FSM select cascade).

Run: timeout 900 python probes/speed_of_light.py      (TPU, ~2 min)
     CKPE_PLATFORM=cpu python probes/speed_of_light.py (smoke)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from chemical_kinetics_and_program_execution_tpu.utils import config  # noqa: E402

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _time_scanned(fn, arg, iters, reps=3):
    """Median wall time per iteration of fn scanned on-device."""

    @jax.jit
    def scanned(x):
        def body(y, _):
            return fn(y), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y[..., :1].astype(jnp.float32))

    float(scanned(arg))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(scanned(arg))
        ts.append((time.time() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def bench_hbm_copy(mb=1024, iters=30):
    """Pure copy: read N bytes + write N bytes (y = x + 1 elementwise,
    int8). Effective BW = 2N / t."""
    n = mb * (1 << 20)
    x = jnp.zeros((n,), jnp.int8)
    dt = _time_scanned(lambda y: y + jnp.int8(1), x, iters)
    bw = 2 * n / dt
    return bw, {"MiB": mb, "ms": round(dt * 1e3, 3)}


def bench_hbm_triad(mb=512, iters=30):
    """STREAM-triad-like: z = x + 2*y over f32 (3N traffic).

    x is materialised on device first (a traced iota constant would be
    shipped to the remote compiler and trip its body-size limit)."""
    n = mb * (1 << 20) // 4
    x = jax.jit(lambda: jax.lax.iota(jnp.float32, n) * 1e-9)()
    x.block_until_ready()

    @jax.jit
    def scanned(y, xs):
        def body(c, _):
            return c + 2.0 * xs, None
        y, _ = jax.lax.scan(body, y, None, length=iters)
        return jnp.sum(y[:1])

    y0 = jnp.zeros((n,), jnp.float32)
    float(scanned(y0, x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(scanned(y0, x))
        ts.append((time.time() - t0) / iters)
    ts.sort()
    bw = 3 * n * 4 / ts[1]
    return bw, {"MiB": mb, "ms": round(ts[1] * 1e3, 3)}


def bench_ensemble_rate(B=16384, L=4096, steps=1250):
    # 1250 rounds/call: at ~82 us/round a 250-round call is ~2/3
    # per-call plane pack/unpack + dispatch; we audit the kernel.
    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    events = L // 16
    key = jax.random.PRNGKey(0)
    pt = jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int32)
    dtp = jnp.zeros((B, L), jnp.int32)
    (pt, dtp), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(1), (pt, dtp), dm, (steps, events))
    int(jnp.sum(pt.astype(jnp.int64)))
    rates = []
    for i in range(3):
        t0 = time.time()
        (pt, dtp), (applied, _) = ensemble.run_ensemble(
            jax.random.PRNGKey(2 + i), (pt, dtp), dm, (steps, events))
        int(jnp.sum(pt.astype(jnp.int64)))
        dt = time.time() - t0
        rates.append(int(np.asarray(applied).sum()) / dt)
    rates.sort()
    info = {"B": B, "L": L, "steps": steps, "E": events,
            "stride": L // events, "n_p": dm.n_p, "n_d": dm.n_d}
    return rates[1], info


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    bw_copy, ci = bench_hbm_copy()
    print(f"HBM copy roofline: {bw_copy / 1e9:.1f} GB/s  {ci}", flush=True)
    bw_triad, ti = bench_hbm_triad()
    print(f"HBM triad roofline: {bw_triad / 1e9:.1f} GB/s  {ti}",
          flush=True)
    peak = max(bw_copy, bw_triad)

    rate, info = bench_ensemble_rate()
    # Minimal algorithmic traffic per transition: read the window's
    # n_p + n_d int8 cells + uniforms, write back the touched cells.
    n_cells = info["n_p"] + info["n_d"]
    min_bytes = 2 * n_cells  # int8 read + write per cell
    eff_bytes = peak / rate  # bytes/transition IF the kernel were HBM-bound
    print(f"ensemble plane round: {rate:.3e} transitions/s "
          f"({info})", flush=True)
    print(f"  HBM-bound budget at copy peak: {eff_bytes:.0f} "
          f"bytes/transition available; minimal algorithmic traffic "
          f"~{min_bytes} B (r+w int8 window cells)", flush=True)
    print(f"  => if the kernel moved only the window cells it could "
          f"reach {peak / min_bytes:.2e} transitions/s; achieved "
          f"fraction of that ceiling: {rate * min_bytes / peak:.1%}",
          flush=True)
    # All-planes upper bound on what the round can move: every plane
    # read+written once per round.
    B, L = info["B"], info["L"]
    all_planes = 2 * 2 * B * L  # two tapes, int8, read + write
    per_round_s = B * info["E"] / rate
    print(f"  if every plane moved once per round: "
          f"{all_planes / per_round_s / 1e9:.0f} GB/s "
          f"({all_planes / (B * info['E']):.0f} B/transition)", flush=True)
    # Bit-sliced representation: a transition touches n_cells planes of
    # nb bits each (read + write), 1 bit per site per plane — LESS than
    # the int8-cell accounting above by 8/nb. This is the honest
    # ceiling for the shipped kernel.
    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble as _ens, bitslice as _bs)
    dm = _ens.compile_decision_machine("ex5-msrtf-machine")
    nb = _bs.compile_round_circuit(dm)[2]
    bit_bytes = 2 * n_cells * nb / 8
    print(f"  bit-plane accounting: {bit_bytes:.2f} B/transition "
          f"(r+w {n_cells} cells x {nb} bit-planes) => ceiling "
          f"{peak / bit_bytes:.2e} transitions/s; achieved "
          f"{rate * bit_bytes / peak:.1%}", flush=True)


if __name__ == "__main__":
    main()
