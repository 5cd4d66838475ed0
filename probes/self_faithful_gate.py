"""Cross-engine gate for the FAITHFUL self-modifying rule (fuel 10).

The round's cross-engine triangle gated the LITE self rule (fuel 2)
against the complete exact SPD. The faithful fuel-10 single-ring rule
is un-enumerable in full, but near a replicator monoculture the guided
native DFS (`native/enumerate6.cc`, code_tape=1) keeps ≥99.4% of the
event mass at threshold 1e-9 — so the PRUNED exact SPD closure can
predict the soup's relaxation dynamics from a perturbed monoculture,
and the BFF device interpreter must follow it within a MEASURED error
budget:

  budget(t) = ∫ [ ν_prune + ν_close ] dt
    ν_prune = l1 gap between the solved model's RHS and a
              two-decades-deeper threshold (1e-11) — the
              enumeration-truncation rate;
    ν_close = off-manifold closure defect vs the pruned cl_k=4 flow
              (`ops/closure.closure_defect`, complex-step tangent).

Initial state: IID windows with p(dot) = 1-eps, eps=0.02 — 'dot' on a
one-ring machine copies cell d0 to d0+12, so the monoculture is the
machine's self-maintaining replicator and rare symbols are invading
mutants whose code executes and spreads/decays.

Usage: CKPE_PLATFORM=cpu python probes/self_faithful_gate.py
Quoted in RESULTS.md ("Faithful self rule: pruned exact SPD gate");
the reduced CI twin is tests/test_bff.py::
test_bff_self_faithful_tracks_pruned_spd.
"""

import os
import sys
import time

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)

from chemical_kinetics_and_program_execution_tpu.engine import (  # noqa: E402
    bff,
    dense,
    dsl,
    ensemble,
)
from chemical_kinetics_and_program_execution_tpu.ops import (  # noqa: E402
    closure as clo,
)

TAG = "ex6-mini-bff-self"
CL_K = 3
EPS = 0.02
T_END = 1.0
THR = 1e-9          # solved model
THR_DEEP = 1e-11    # nu_prune reference
# E=4: independent-site rounds need stride L/E > span 31.
B, L, E, N_KEYS = 256, 256, 4, 8


def win(p1, k):
    w = np.array([1.0])
    for _ in range(k):
        w = np.kron(w, p1)
    return w


def main():
    import jax

    prob = dsl.get_problem(TAG)
    size_a = prob.size_a
    p1 = np.full(size_a, EPS / (size_a - 1))
    p1[prob.symbols.index("dot")] = 1.0 - EPS

    t0 = time.time()
    prog = dense.compile_dense(TAG, CL_K, p_ref=win(p1, CL_K),
                               prune_threshold=THR, max_worlds=30_000_000)
    fn = dense.make_dense_dy_dt(prog, with_mass=True)
    print(f"solved model: {len(prog.w_const)} live worlds @thr={THR:g} "
          f"({time.time() - t0:.1f}s)", flush=True)

    # Hand-rolled RK4 on the jitted RHS: jitting the adaptive solver
    # WHOLE (dop853 while_loop) over a 254k-world RHS graph stalls XLA
    # for >30 min; compiling the bare RHS once and stepping from
    # Python costs one small compile + ~500 ms-scale calls. Fixed step
    # h ~= 0.016 gives O(h^4) ~ 1e-7 local error — far below the nu
    # budget this probe measures. The grid end is the ensemble's
    # EFFECTIVE time (whole lattice rounds), so both sides are
    # compared at identical t.
    dt_round = -np.log1p(-E / L)
    n_rounds = int(round(T_END / dt_round))
    t_eff_end = n_rounds * dt_round
    ts = np.linspace(0.0, t_eff_end, 5)
    fn_rhs = lambda p: np.asarray(fn(p)[0])  # noqa: E731
    t0 = time.time()
    n_sub = 16
    y = win(p1, CL_K)
    ys = [y.copy()]
    for i in range(len(ts) - 1):
        h = (ts[i + 1] - ts[i]) / n_sub
        for _ in range(n_sub):
            k1 = fn_rhs(y)
            k2 = fn_rhs(y + 0.5 * h * k1)
            k3 = fn_rhs(y + 0.5 * h * k2)
            k4 = fn_rhs(y + h * k3)
            y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ys.append(y.copy())
    mass = [float(fn(yy)[1]) for yy in ys]
    print(f"solve (RK4 x{n_sub * (len(ts) - 1)}) {time.time() - t0:.1f}s; "
          f"mass along trajectory {min(mass):.6f}..{max(mass):.6f}",
          flush=True)

    # nu_prune: RHS gap to the deeper threshold (eager — the deep
    # program is evaluated 5 times, not solved).
    t0 = time.time()
    prog_d = dense.compile_dense(TAG, CL_K, p_ref=win(p1, CL_K),
                                 prune_threshold=THR_DEEP,
                                 max_worlds=30_000_000)
    fn_d = dense.make_dense_dy_dt(prog_d, jit=False)
    nu_p = [float(np.abs(np.asarray(fn_d(y)) - fn_rhs(y)).sum())
            for y in ys]
    print(f"nu_prune (vs {len(prog_d.w_const)} worlds @thr={THR_DEEP:g}): "
          f"{['%.2e' % x for x in nu_p]} ({time.time() - t0:.1f}s)",
          flush=True)

    # nu_close: off-manifold defect vs the pruned cl_k+1 flow.
    t0 = time.time()
    prog4 = dense.compile_dense(TAG, CL_K + 1, p_ref=win(p1, CL_K + 1),
                                prune_threshold=1e-7,
                                max_worlds=30_000_000)
    fn4 = dense.make_dense_dy_dt(prog4)
    pair = (fn_rhs, lambda p: np.asarray(fn4(p)), size_a)
    nu_c = [clo.closure_defect(TAG, CL_K, y, compiled_pair=pair, norm="l1")
            for y in ys]
    print(f"nu_close (k4, {len(prog4.w_const)} worlds): "
          f"{['%.2e' % x for x in nu_c]} ({time.time() - t0:.1f}s)",
          flush=True)

    # Coarse-model band — the number examples/ex6_bff_self_spd.py and
    # the CI twin's NU_BAND cite: nu_prune of the thr=1e-7 model
    # (their solved model) measured against THIS solved model.
    t0 = time.time()
    prog_c = dense.compile_dense(TAG, CL_K, p_ref=win(p1, CL_K),
                                 prune_threshold=1e-7,
                                 max_worlds=30_000_000)
    fn_c = dense.make_dense_dy_dt(prog_c)
    nu_pc = [float(np.abs(np.asarray(fn_c(y)) - fn_rhs(y)).sum())
             for y in ys]
    print(f"coarse-model nu_prune (thr=1e-7, {len(prog_c.w_const)} "
          f"worlds, vs solved model): {['%.2e' % x for x in nu_pc]}; "
          f"NU_BAND must cover max(nu_pc)+max(nu_close) = "
          f"{max(nu_pc) + max(nu_c):.3f} ({time.time() - t0:.1f}s)",
          flush=True)

    nu = np.array(nu_p) + np.array(nu_c)
    budgets = np.concatenate([[0.0], np.cumsum(
        0.5 * (nu[1:] + nu[:-1]) * np.diff(ts))])
    sig = np.abs(ys[-1] - win(p1, CL_K))
    print(f"budget(t_end)={budgets[-1]:.4g} vs signal l1={sig.sum():.4g} "
          f"max={sig.max():.4g}", flush=True)

    # Ensemble side: the BFF device interpreter, independent sites.
    m = bff.compile_bff(TAG)
    rounds = n_rounds  # shared grid with the ODE (whole rounds)
    t0 = time.time()
    reps = []
    for kk in range(N_KEYS):
        key = jax.random.PRNGKey(100 + kk)
        rng = np.random.default_rng(1000 + kk)
        tape = rng.choice(size_a, size=(B, L), p=p1).astype(np.int32)
        tape, (_, times) = bff.run_ensemble_bff(
            jax.random.fold_in(key, 1), tape, m, (rounds, E),
            independent_sites=True)
        reps.append(np.asarray(ensemble.window_counts(tape, size_a, CL_K)))
    t_eff = float(np.asarray(times)[-1])
    reps = np.stack(reps)
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(N_KEYS)
    print(f"ensemble {time.time() - t0:.1f}s; t_eff={t_eff:.4f} "
          f"(ode t_end={t_eff_end:.4f})", flush=True)

    want = ys[-1]
    floor = np.sqrt(np.maximum(want, 1e-9) * (1.0 - want)
                    / (N_KEYS * B * L / CL_K))
    stat = 6.0 * np.maximum(sem, floor)
    err = np.abs(got - want)
    # Elementwise: statistical band + the scalar budget (an l1 bound
    # dominates any single element's systematic error).
    bound = stat + budgets[-1]
    print(f"elementwise: worst err={err.max():.4g}, "
          f"violations={(err > bound).sum()}, "
          f"worst margin={float((err - bound).max()):.4g}")
    # Aggregates (budget is a valid l1 bound for any +-1 weighting).
    dot_sym = prob.symbols.index("dot")
    mono = sum(dot_sym * size_a ** i for i in range(CL_K))
    for label, wvec in [
        ("p(dot^3)", np.eye(size_a ** CL_K)[mono]),
        ("rare-window mass", 1.0 - np.eye(size_a ** CL_K)[mono]),
    ]:
        # Aggregate per replicate, then SEM across replicates — the
        # bins are correlated within a ring, so summing per-bin
        # variances would be wrong.
        agg = reps @ wvec
        g_o, w_o = float(agg.mean()), float(wvec @ want)
        s_o = float(agg.std(ddof=1) / np.sqrt(N_KEYS))
        ok = abs(g_o - w_o) <= 6.0 * s_o + budgets[-1]
        print(f"{label}: ensemble={g_o:.5f} spd={w_o:.5f} "
              f"|d|={abs(g_o - w_o):.2e} bound={6.0 * s_o + budgets[-1]:.2e}"
              f" {'OK' if ok else 'VIOLATION'}")


if __name__ == "__main__":
    main()
