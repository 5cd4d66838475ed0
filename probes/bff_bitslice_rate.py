"""Cross-engine rate probe for the BFF interpreter (RESULTS.md
"Round 3 — the interpreter bit-sliced").

Times the faithful fuel-10 machine at bench geometry under both
engines with repeat-call differencing (first call per (engine, steps)
is compile; the repeats are steady state — the round-2 methodology of
`bench._steady_rate`, hand-rolled here so both engines share one tape
state). Run ON THE ACCELERATOR (no CKPE_PLATFORM override):

    python probes/bff_bitslice_rate.py

Measured 2026-08-20 (TPU v5 lite, B=16384, L=4096, events=64):
bitslice 5 rounds 0.068 s / 50 rounds 0.078 s -> 4.72e9 site
events/s; scan 0.083 / 0.346 -> 1.80e8. The two engines are
bit-identical (tests/test_bff_bitslice.py; bench.py gates the
faithful rule on-device each round). NOTE the short 5->50 differencing
here is noisier than `bench.bench_bff`'s 200->1000 methodology, which
is the citable number (5.48e9 with the in-circuit bit-serial op
counters; 5.29e9 with the first cut's raw one-hot count planes).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chemical_kinetics_and_program_execution_tpu.engine import bff
import chemical_kinetics_and_program_execution_tpu.models.problems  # noqa: F401

S_LO, S_HI = 5, 50


def main():
    m = bff.compile_bff("ex6-mini-bff")
    B, L = 16384, 4096
    events = L // 64
    key = jax.random.PRNGKey(0)
    state = (
        jax.random.randint(key, (B, L), 0, m.size_a, dtype=jnp.int32),
        jax.random.randint(jax.random.fold_in(key, 1), (B, L), 0,
                           m.size_a, dtype=jnp.int32),
    )
    for engine in ("bitslice", "scan"):
        best = {}
        for s in (S_LO, S_HI):
            times = []
            for _ in range(4):
                t0 = time.time()
                (p, d), _ = bff.run_ensemble_bff(
                    jax.random.PRNGKey(8), state, m, (s, events),
                    engine=engine)
                int(jnp.sum(p.astype(jnp.int64))
                    + jnp.sum(d.astype(jnp.int64)))
                times.append(time.time() - t0)
            best[s] = min(times[1:])  # drop the compile call
            print(f"{engine} steps {s}: "
                  f"{['%.3f' % t for t in times]}", flush=True)
        rate = B * events * (S_HI - S_LO) / (best[S_HI] - best[S_LO])
        print(f"{engine}: {rate:.3e} site events/s "
              f"({rate * m.fuel:.2e} machine ops/s)", flush=True)


if __name__ == "__main__":
    main()
