"""Can the exact engine predict the soup's error threshold? (Measured
answer: NO at cl_k=3 — and the probe documents exactly why.)

The mutation sweep (`examples/ex6_bff_mutation.py`) MEASURES the
replicator's extinction between mu=3e-3 and 2e-2 per cell per round.
This probe attempts the prediction from the exact side: stationary
states of

    dp/dt = f_rule(p) + rho * sum_i (U_i - I) p

tracked by pseudo-transient Newton-Krylov continuation in rho
(`ode/steady.make_steady_state`), where f_rule is the PRUNED exact SPD
closure of the faithful fuel-10 self rule (guided native DFS,
re-pruned adaptively against each new root) and (U_i - I) is the EXACT
window-mutation generator — per-cell uniform resampling at rate rho is
iid across cells, so the cl_k-window marginal dynamics is closed with
no further approximation. In soup units rho = mu / dt_round with
dt_round = -log1p(-E/L): the sweep's mu in {1e-3, 3e-3, 2e-2} at E=4,
L=256 maps to rho in {0.064, 0.19, 1.27}.

MEASURED OUTCOME (quoted in RESULTS.md): even at rho=0.01 — 6x below
the smallest surviving sweep point — the PTC lands on a state with
p(dot^3)=0.0006 and enumerated mass 0.014: a pruning-INVALID
pseudo-root (when ~99% of the event mass is un-enumerated, the pruned
RHS is ~0 and everything looks stationary). The physical cause is
visible in the soup itself: even the mu=0 attractor carries ~21% of
cells outside the copy class (`ex6_bff_self.py`), i.e. the TRUE
stationary mutant load sits far beyond the mass horizon of guided
enumeration at fuel 10 (mass 0.41 at p(dot)=0.78, thr 1e-5). The
pruned exact SPD is a NEAR-MONOCULTURE local model — quantitative for
relaxation and invasion gradients (`examples/ex6_bff_self_spd.py`,
`probes/self_faithful_gate.py`) — and the stationary quasispecies is
outside its validity region; the threshold remains the sampling
engine's question.

Usage: CKPE_PLATFORM=cpu python probes/self_threshold_continuation.py
"""

import os
import sys
import time

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    dense,
    dsl,
)
from chemical_kinetics_and_program_execution_tpu.ode.steady import (  # noqa: E402
    make_steady_state,
)

TAG = "ex6-mini-bff-self"
CL_K = 3
THR = 1e-7
L, E = 256, 4
DT_ROUND = -np.log1p(-E / L)


def main():
    import jax.numpy as jnp

    prob = dsl.get_problem(TAG)
    a = prob.size_a
    dot = prob.symbols.index("dot")

    def mutation_term(p):
        y = p.reshape((a,) * CL_K)
        g = jnp.zeros_like(y)
        for i in range(CL_K):
            g = g + (y.sum(axis=i, keepdims=True) / a - y)
        return g.reshape(-1)

    def compile_at(p_ref):
        prog = dense.compile_dense(TAG, CL_K, p_ref=p_ref,
                                   prune_threshold=THR,
                                   max_worlds=30_000_000)
        fn = dense.make_dense_dy_dt(prog, with_mass=True)
        return prog, fn

    # Initial branch point: the monoculture, slightly smoothed so the
    # guided enumeration sees every context the mutated state visits.
    eps0 = 0.02
    p1 = np.full(a, eps0 / (a - 1))
    p1[dot] = 1.0 - eps0
    p_ref = np.array([1.0])
    for _ in range(CL_K):
        p_ref = np.kron(p_ref, p1)

    mono = sum(dot * a ** i for i in range(CL_K))
    rhos = np.concatenate([
        np.geomspace(0.01, 0.1, 5),
        np.geomspace(0.12, 1.5, 12),
    ])
    y = p_ref.copy()
    rows = []
    for rho in rhos:
        t0 = time.time()
        prog, fn = compile_at(np.maximum(y, 1e-8) / np.maximum(
            y, 1e-8).sum())

        def rhs(p, mu):
            return fn(p)[0] + mu * mutation_term(p)

        solve = make_steady_state(rhs, size_a=a, cl_k=CL_K,
                                  conserved=None, tol=1e-11,
                                  max_iter=400)
        y_new, info = solve(jnp.asarray(y), jnp.float64(rho))
        y_new = np.asarray(y_new)
        mass = float(fn(y_new)[1])
        ok = bool(info.converged)
        rows.append((rho, y_new[mono], mass, ok,
                     float(info.residual), len(prog.w_const)))
        print(f"rho={rho:8.4f} (mu={rho * DT_ROUND:.2e}/round): "
              f"p(dot^3)={y_new[mono]:.5f}, mass={mass:.4f}, "
              f"converged={ok} (res={float(info.residual):.1e}, "
              f"{len(prog.w_const)} worlds, {time.time() - t0:.0f}s)",
              flush=True)
        if ok:
            y = y_new
        if mass < 0.5:
            print("\nroot left the enumerability horizon (mass "
                  f"{mass:.3f} < 0.5): this is a pruning-invalid "
                  "pseudo-root, NOT a physical branch — the stationary "
                  "mutant load exceeds what guided enumeration can "
                  "keep at fuel 10 (see module docstring). Stopping.")
            break
        if y_new[mono] < 0.05:
            print("replicator branch collapsed; stopping continuation")
            break

    rows = np.asarray([r[:3] for r in rows])
    np.save("/tmp/self_threshold_rows.npy", rows)


if __name__ == "__main__":
    main()
