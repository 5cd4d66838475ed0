"""Why does the full bench suite measure the BFF circuit slower than
an isolated run? (round-3 verdict weak #1: RESULTS claimed 5.48e9 from
an isolated `bench.bench_bff` while the driver's full-suite capture
recorded 3.427e9 — a 1.6x swing on the same command.)

Runs `bench.bench_bff` (the 200->1000 differencing) three times in ONE
process: fresh, again immediately (run-to-run variance), then after
the two families that precede it in `bench.main` (ensemble + branching
ensemble — the suspects for perturbing allocator/HBM state). Run ON
THE ACCELERATOR:

    python probes/bff_variance.py
"""

import sys
import time

sys.path.insert(0, ".")

import bench


def main():
    t0 = time.time()
    r1, i1 = bench.bench_bff()
    print(f"[{time.time()-t0:7.1f}s] bff fresh:     {r1:.3e} "
          f"us/round={i1['us_per_round']} calls={i1['call_s']}",
          flush=True)
    r2, i2 = bench.bench_bff()
    print(f"[{time.time()-t0:7.1f}s] bff repeat:    {r2:.3e} "
          f"us/round={i2['us_per_round']} calls={i2['call_s']}",
          flush=True)
    be, ie = bench.bench_ensemble()
    print(f"[{time.time()-t0:7.1f}s] ensemble:      {be:.3e}", flush=True)
    bb, ib = bench.bench_branching_ensemble()
    print(f"[{time.time()-t0:7.1f}s] branching ex4: {bb:.3e}", flush=True)
    r3, i3 = bench.bench_bff()
    print(f"[{time.time()-t0:7.1f}s] bff after fam: {r3:.3e} "
          f"us/round={i3['us_per_round']} calls={i3['call_s']}",
          flush=True)


if __name__ == "__main__":
    main()
