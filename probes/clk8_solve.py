"""ex4 cl_k=8: a SOLVED trajectory on one chip (round-4; round-3 got
the RHS only — `probes/clk8_streamed.py`).

Integrates the 43,046,721-dim SPD to t=2000 with scipy's DOP853
stepper driven from the host over the group-streamed dense RHS
(`dense.make_dense_dy_dt_streamed` — the jitted-while-loop solvers
need the fused RHS, which does not compile at this size). Sample-time
observables are projected HOST-side (the 12 curves of
`examples/ex4_chemical_turing.py`: 8 sequence probabilities + 4
cursor totals — each one reshape+slice+sum over the state vector,
matching `ops.observables.seq_prob_projector` bit for bit), so only
[21, 12] numbers are retained; the full state is checkpointed to
CKPE_CACHE_DIR after every crossed sample time for crash resume
(~344 MB, deliberately outside the repo).

Run ON THE ACCELERATOR:

    python probes/clk8_solve.py          # resumes from checkpoint

Writes `examples/ex4_chemical_turing_a_k8_obs.npz` (obs [21, 12] +
ts) when t=2000 is reached. Budget: ~270 accepted-step RHS calls at
rtol 1e-8 (measured 269 nfev on the identical dynamics at cl_k=5,
2026-08-20) + 3 dense-output stages per crossed sample, at 9.48 s per
streamed RHS (probes/clk8_streamed.py) ≈ 1 h.
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import numpy as np
from scipy.integrate import DOP853

from chemical_kinetics_and_program_execution_tpu.engine import dense
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_p0,
)
from chemical_kinetics_and_program_execution_tpu.utils import config

SIZE_A, CL_K, T_MAX = 9, 8, 2000.0
RTOL, ATOL = 1e-8, 1e-12
TS = np.linspace(0.0, T_MAX, 21)
CKPT = os.path.join(config.CACHE_DIR, "clk8_solve_ckpt.npz")
OUT = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "ex4_chemical_turing_a_k8_obs.npz")

# The 12 observables of examples/ex4_chemical_turing.py (8 curves + 4
# cursor states), as (length, trailing rank) pairs.
SEQS = [[5, 0, 5, 5, 5], [5, 4, 1, 5, 5], [5, 4, 1, 4, 5],
        [5, 4, 5, 2, 5], [5, 4, 5, 2, 4], [5, 4, 5, 4, 3],
        [6], [7], [0], [1], [2], [3]]


def project_host(p):
    """Host twin of `seq_prob_projector` for one state vector."""
    out = np.empty(len(SEQS))
    for j, seq in enumerate(SEQS):
        length = len(seq)
        rank = 0
        for s in seq:
            rank = rank * SIZE_A + s
        out[j] = p.reshape(SIZE_A ** (CL_K - length),
                           SIZE_A ** length)[:, rank].sum()
    return out


def main():
    t_start = time.time()
    prog = dense.compile_dense("ex4-chemical-turing", CL_K)
    fn = dense.make_dense_dy_dt_streamed(prog)
    nfev = [0]

    def f(t, y):
        nfev[0] += 1
        return np.asarray(fn(y))

    if os.path.exists(CKPT):
        with np.load(CKPT) as d:
            t0, y0, h0 = float(d["t"]), d["y"], float(d["h"])
            obs = d["obs"]
            next_i = int(d["next_i"])
        print(f"resume from t={t0:.1f} (sample {next_i})", flush=True)
    else:
        t0 = 0.0
        y0 = chemical_turing_p0(CL_K, powered_fraction=0.04).ravel()
        h0 = None
        obs = np.zeros((len(TS), len(SEQS)))
        obs[0] = project_host(y0)
        next_i = 1

    if h0 is not None:  # a resumed h may exceed the remaining interval
        h0 = min(h0, max(T_MAX - t0, 1e-6))
    solver = DOP853(f, t0, y0, t_bound=T_MAX, rtol=RTOL, atol=ATOL,
                    first_step=h0)
    while solver.status == "running":
        t_old = solver.t
        msg = solver.step()
        if solver.status == "failed":
            raise RuntimeError(f"DOP853 failed at t={solver.t}: {msg}")
        crossed = False
        while next_i < len(TS) and TS[next_i] <= solver.t:
            den = solver.dense_output()  # 3 extra stages, once per step
            obs[next_i] = project_host(den(TS[next_i]))
            print(f"sample t={TS[next_i]:.0f}: "
                  f"{np.array2string(obs[next_i], precision=6)}",
                  flush=True)
            next_i += 1
            crossed = True
        if crossed:
            np.savez(CKPT, t=solver.t, y=solver.y, h=solver.h_abs,
                     obs=obs, next_i=next_i)
        print(f"step t {t_old:9.3f} -> {solver.t:9.3f} "
              f"(h={solver.t - t_old:.3g}) nfev={nfev[0]} "
              f"wall={time.time() - t_start:7.0f}s "
              f"sum={solver.y.sum():.12f}", flush=True)

    np.savez(OUT, obs=obs, ts=TS)
    print(f"DONE nfev={nfev[0]} wall={time.time() - t_start:.0f}s "
          f"-> {OUT}", flush=True)

    k7 = np.load(os.path.join(os.path.dirname(OUT),
                              "ex4_chemical_turing_a_k7_obs.npz"))
    o7 = k7["ode_ys"]
    rel = np.abs(obs[1:] - o7[1:]) / np.maximum(np.abs(o7[1:]), 1e-300)
    print("k7<->k8 max rel delta per sample:",
          np.array2string(rel.max(axis=1), precision=3), flush=True)
    print(f"k7<->k8 overall max rel delta: {rel.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
