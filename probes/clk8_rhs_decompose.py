"""Decompose the cl_k=8 streamed RHS's 8.7 s (round-5 verdict item 1).

The dense engine's own scaling trend is linear in state size (cl_k=5
1.79 ms -> cl_k=6 16.5 ms for 9x state), so 81x more state should land
near ~1.4 s; the measured 8.69 s (BENCH_r04 `clk8_rhs`) is ~6x above
trend.  Host-side structure (this probe's `--plan` mode): 8 groups,
71 emissions, 205 (orig, adj) pairs, 119 unique rank deltas; 34
emissions take the flat masked-roll path (`dense._ROLL_EMIT_MIN_STATE`)
with a per-PAIR full-state where+roll, and 37 take the 3-D sub-slice
path whose multi-index `.at[].add` scatters are the same lowering the
frontier merge measured pathological on this backend.

Run ON THE ACCELERATOR:

    python probes/clk8_rhs_decompose.py          # timing decomposition
    python probes/clk8_rhs_decompose.py --plan   # host-only structure

Timings use min-of-REPS with a device-side checksum per call (tunnel
dispatch is ~100-250 ms and one-sided noisy; minima difference it out).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from chemical_kinetics_and_program_execution_tpu.engine import dense

REPS = 3


def sync(x):
    """Device-side checksum + tiny transfer — honest sync on the tunnel."""
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", action="store_true")
    ap.add_argument("--cl_k", type=int, default=8)
    args = ap.parse_args()

    prog = dense.compile_dense("ex4-chemical-turing", args.cl_k)
    a, k = prog.size_a, prog.cl_k
    groups = dense._group_plans(prog.plans, a, k)
    if args.plan:
        for gi, (l0, ch, members) in enumerate(groups):
            _, _, s0s = dense._sweep_meta(l0, ch, k)
            pairs = sum(
                len({dense._emit_sub_ranks(m, s0, k, a) for m in members})
                for s0 in s0s)
            print(f"group {gi}: l0={l0} ch={ch} members={len(members)} "
                  f"emits={len(s0s)} pairs={pairs}")
        return

    fn = dense.make_dense_dy_dt_streamed(prog)
    p0 = np.full(prog.state_size, 1.0 / prog.state_size)

    t0 = time.time()
    dy = fn(p0)
    c = sync(dy)
    print(f"first call {time.time() - t0:.1f} s (sum {c:.3e})", flush=True)

    walls = []
    for _ in range(REPS):
        t0 = time.time()
        sync(fn(p0))
        walls.append(time.time() - t0)
    print(f"full RHS min {min(walls):.2f} s  reps {np.round(walls, 2)}",
          flush=True)

    # prep alone
    p_dev = jnp.asarray(p0)
    prep = fn.prep if hasattr(fn, "prep") else None
    if prep is None:
        # reconstruct: first segment of fn is the jitted prep closure
        import inspect  # noqa: F401
        prep = fn.__closure__ and None
    if prep is not None:
        s, rle, rre = prep(p_dev)
        sync(rre)
        walls = []
        for _ in range(REPS):
            t0 = time.time()
            s, rle, rre = prep(p_dev)
            sync(rre)
            walls.append(time.time() - t0)
        print(f"prep min {min(walls):.3f} s  reps {np.round(walls, 3)}",
              flush=True)
    else:
        print("prep handle not exposed; skipping", flush=True)
        s = rle = rre = None

    if s is not None:
        for gi, g in enumerate(fn.group_fns):
            walls = []
            for _ in range(REPS):
                dy0 = jnp.zeros(a**k, jnp.float64)
                sync(dy0)
                t0 = time.time()
                out = g(dy0, s, rle, rre)
                sync(out)
                walls.append(time.time() - t0)
            l0, ch, members = groups[gi]
            print(f"group {gi} (l0={l0} ch={ch} m={len(members)}): "
                  f"min {min(walls):.3f} s  reps {np.round(walls, 3)}",
                  flush=True)


if __name__ == "__main__":
    main()
