"""ex4 cl_k=8 on ONE chip: the group-streamed dense RHS (round 3).

The one-fused-graph RHS fails to compile at cl_k=8 (round 2: XLA
buffer assignment wants ~22 GB vs 16 GB HBM; round 3 re-check: the
tunnel's AOT compile helper dies with HTTP 500 on the same graph while
cl_k=7 compiles in 176 s and runs 4.3 s/RHS). `make_dense_dy_dt_streamed`
evaluates one signature group per jit call with the accumulator
donated, capping peak HBM at a single group's working set. Run ON THE
ACCELERATOR:

    python probes/clk8_streamed.py

Measured 2026-08-20 (TPU v5 lite, 43,046,721-dim f64 state, 8 groups):

  first call (8 compiles + run): 261.6 s
  steady RHS wall-clock:          9.48 s
  conservation sum:               6.9e-18   (uniform p0)
  per-group compiled peak (memory_analysis, temp+args+out):
    6.15-9.88 GiB  -> every group fits 16 GB HBM alone; the fused
    form's joint liveness is what breaks, not any single sweep.

Bit-exactness vs the fused form is CI-gated at cl_k=4
(`tests/test_engine.py::test_dense_streamed_matches_fused`).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from chemical_kinetics_and_program_execution_tpu.engine import dense


def main():
    prog = dense.compile_dense("ex4-chemical-turing", 8)
    a, k = prog.size_a, prog.cl_k
    print("state", prog.state_size, flush=True)
    fn = dense.make_dense_dy_dt_streamed(prog)
    p0 = np.full(prog.state_size, 1.0 / prog.state_size)
    t0 = time.time()
    dy = np.asarray(fn(p0))
    print(f"first call (compile+run) {time.time() - t0:.1f} s; "
          f"sum {dy.sum():.3e} max|dy| {np.abs(dy).max():.3e}",
          flush=True)
    t0 = time.time()
    jax.block_until_ready(fn(p0))
    print(f"steady RHS wall {time.time() - t0:.2f} s", flush=True)

    sS = jax.ShapeDtypeStruct((prog.num_signatures,), jnp.float64)
    rleS = tuple(jax.ShapeDtypeStruct((a**j,), jnp.float64)
                 for j in range(1, k + 1))
    rreS = jax.ShapeDtypeStruct((a**k,), jnp.float64)
    dyS = jax.ShapeDtypeStruct((a**k,), jnp.float64)
    for i, g in enumerate(fn.group_fns):
        ma = g.lower(dyS, sS, rleS, rreS).compile().memory_analysis()
        tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
               + ma.output_size_in_bytes) / 2**30
        print(f"group {i}: temp {ma.temp_size_in_bytes / 2**30:.2f} "
              f"GiB, total {tot:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
