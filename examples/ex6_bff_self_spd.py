"""The pruned exact SPD predicts the faithful self-modifying soup.

The companion soup runs (`ex6_bff_self.py`) show the fuel-10
single-ring BFF machine converging on exact fixed-point copy code.
This run closes the loop from the EXACT side: near a replicator
monoculture (IID rings with p(dot) = 1-eps) the guided native DFS
(`native/enumerate6.cc`, code_tape=1) keeps ≥99.5% of the event mass
at threshold 1e-7, so the same enumerate→compile→dense pipeline that
solves every enumerable problem ALSO solves the un-enumerable faithful
rule — pruned, with measured mass — and its cl_k=3 closure ODE
predicts the soup's relaxation observable-by-observable:

1. the monoculture bulk p(dot,dot,dot) decays as mutant code invades
   from the machine's own execution (no external mutation operator);
2. the per-opcode mutant window classes (windows with exactly one
   non-dot symbol) each follow their OWN exact-SPD trajectory — the
   instruction set's selection gradient, resolved per symbol;
3. the device-interpreter ensemble (8 independent-site replicas)
   tracks every curve within its sampling band plus the measured
   defect budget (`probes/self_faithful_gate.py`: nu_prune + nu_close,
   the pruning-truncation rate plus the off-manifold closure defect).

Usage: CKPE_PLATFORM=cpu python ex6_bff_self_spd.py [--eps 0.02]
Output: ex6_bff_self_spd.pdf (+ .npz artifact)

Reference twin: none — beyond-reference capability (the reference
registers faithful ex6 but cannot run it, SURVEY §2.3).
"""

import argparse
import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import (
    bff,
    dense,
    dsl,
    ensemble,
)

TAG = "ex6-mini-bff-self"
CL_K = 3
THR = 1e-7
T_END = 1.0
SNAPS = 10
B = int(os.environ.get("CKPE_EX6SPD_B", "256"))
N_KEYS = int(os.environ.get("CKPE_EX6SPD_KEYS", "8"))
L, E = 256, 4  # independent-site stride 64 > span 31
# Measured l1 defect-rate band of THIS model (thr=1e-7, cl_k=3) on
# t in [0,1] at eps=0.02 — probes/self_faithful_gate.py's coarse-model
# block: nu_prune(1e-7 vs 1e-9) <= 0.047 plus nu_close <= 0.067.
NU_BAND = 0.12


def _suffix(args):
    s = "" if B == 256 and N_KEYS == 8 else f"_b{B}x{N_KEYS}"
    return s if args.eps == 0.02 else s + f"_e{args.eps:g}"


def mutant_class_masks(size_a, dot):
    """[size_a, size_a**CL_K] 0/1 masks: windows with exactly one
    non-dot symbol equal to s (rows for s == dot are zero)."""
    masks = np.zeros((size_a, size_a ** CL_K))
    for w in range(size_a ** CL_K):
        digs, r = [], w
        for _ in range(CL_K):
            r, d = divmod(r, size_a)
            digs.append(d)
        non = [d for d in digs if d != dot]
        if len(non) == 1:
            masks[non[0], w] = 1.0
    return masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=0.02)
    args = ap.parse_args()
    import jax

    prob = dsl.get_problem(TAG)
    size_a = prob.size_a
    syms = prob.symbols
    dot = syms.index("dot")
    if N_KEYS < 2:
        raise SystemExit("CKPE_EX6SPD_KEYS must be >= 2 (the error "
                         "bands need a cross-replicate SEM)")
    p1 = np.full(size_a, args.eps / (size_a - 1))
    p1[dot] = 1.0 - args.eps
    p0 = _common.iid_spd(p1, CL_K).reshape(-1)

    # --- exact side: pruned dense program, RK4 on the jitted RHS ----
    prog = dense.compile_dense(TAG, CL_K, p_ref=p0, prune_threshold=THR,
                               max_worlds=20_000_000)
    fn = dense.make_dense_dy_dt(prog, with_mass=True)
    fn_rhs = lambda p: np.asarray(fn(p)[0])  # noqa: E731
    print(f"pruned SPD: {len(prog.w_const)} live worlds @thr={THR:g}, "
          f"mass(p0)={float(fn(p0)[1]):.5f}")

    # Snapshot grid = the ensemble's EFFECTIVE round times, so the
    # SPD and the soup are compared at identical t (a lattice round
    # advances t by -log1p(-E/L), which does not divide T_END).
    dt_round = -math.log1p(-E / L)
    rounds_per_snap = max(1, int(round(T_END / SNAPS / dt_round)))
    t_snap_eff = rounds_per_snap * dt_round
    ts = np.arange(SNAPS + 1) * t_snap_eff
    n_sub = 8
    y = p0.copy()
    ys, mass = [y.copy()], [float(fn(y)[1])]
    for i in range(SNAPS):
        h = (ts[i + 1] - ts[i]) / n_sub
        for _ in range(n_sub):
            k1 = fn_rhs(y)
            k2 = fn_rhs(y + 0.5 * h * k1)
            k3 = fn_rhs(y + 0.5 * h * k2)
            k4 = fn_rhs(y + h * k3)
            y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ys.append(y.copy())
        mass.append(float(fn(y)[1]))
    ys = np.stack(ys)            # [SNAPS+1, 12^3]
    mass = np.asarray(mass)
    print(f"enumerated mass along trajectory: {mass[0]:.5f} -> "
          f"{mass[-1]:.5f}")

    # --- sampled side: device-interpreter ensemble ------------------
    m = bff.compile_bff(TAG)
    reps = []
    for kk in range(N_KEYS):
        rng = np.random.default_rng(1000 + kk)
        tape = rng.choice(size_a, size=(B, L), p=p1).astype(np.int32)
        rows = [np.asarray(ensemble.window_counts(tape, size_a, CL_K))]
        for snap in range(SNAPS):
            tape, _ = bff.run_ensemble_bff(
                jax.random.PRNGKey(7000 + 100 * kk + snap), tape, m,
                (rounds_per_snap, E), independent_sites=True)
            rows.append(np.asarray(ensemble.window_counts(
                tape, size_a, CL_K)))
        reps.append(np.stack(rows))
    reps = np.stack(reps)        # [N_KEYS, SNAPS+1, 12^3]
    got = reps.mean(axis=0)
    sem = reps.std(axis=0, ddof=1) / np.sqrt(N_KEYS)
    ts_ens = ts
    print(f"ensemble: {N_KEYS} keys x {B} rings, "
          f"{rounds_per_snap} rounds/snapshot (shared grid "
          f"dt={t_snap_eff:.4f}, t_max={ts[-1]:.3f})")

    # --- observables ------------------------------------------------
    mono = sum(dot * size_a ** i for i in range(CL_K))
    masks = mutant_class_masks(size_a, dot)
    obs_spd = {"mono": ys[:, mono], "rare": 1.0 - ys[:, mono]}
    obs_got = {"mono": got[:, mono], "rare": 1.0 - got[:, mono]}
    obs_sem = {"mono": sem[:, mono], "rare": sem[:, mono]}
    cls_spd = ys @ masks.T       # [SNAPS+1, size_a]
    # Aggregate PER REPLICATE first: window bins of a class overlap on
    # the same rings, so summing per-bin variances would ignore their
    # covariance; the cross-replicate spread of the aggregated value
    # is the exact SEM.
    cls_reps = reps @ masks.T    # [N_KEYS, SNAPS+1, size_a]
    cls_got = cls_reps.mean(axis=0)
    cls_sem = cls_reps.std(axis=0, ddof=1) / np.sqrt(N_KEYS)

    budget = NU_BAND * ts
    dev = np.abs(obs_got["mono"] - obs_spd["mono"])
    bound = 6.0 * np.maximum(obs_sem["mono"], 1e-12) + budget
    print(f"p(dot^3): SPD {obs_spd['mono'][0]:.4f} -> "
          f"{obs_spd['mono'][-1]:.4f}; ensemble dev max "
          f"{dev.max():.2e} (band max {bound.max():.2e}; "
          f"within={bool((dev <= bound).all())})")
    grad = (cls_spd[-1] - cls_spd[0]) / cls_spd[0].clip(1e-12)
    order = np.argsort(grad)
    print("per-opcode mutant-class selection gradient (rel. change of "
          f"one-mutant window mass over t={ts[-1]:.3g}):")
    for s in order:
        if s == dot:
            continue
        print(f"  {syms[s]:>6}: {grad[s]:+.2%}")

    np.savez_compressed(
        _common.out_path(f"ex6_bff_self_spd{_suffix(args)}.npz"),
        ts=ts, ts_ens=ts_ens, ys_obs_mono=obs_spd["mono"],
        got_mono=obs_got["mono"], sem_mono=obs_sem["mono"],
        cls_spd=cls_spd, cls_got=cls_got, cls_sem=cls_sem,
        mass=mass, budget=budget, eps=args.eps, thr=THR,
        n_worlds=len(prog.w_const))

    # --- figure -----------------------------------------------------
    fig, axes = _common.pyplot.subplots(1, 3, figsize=(24, 7))
    ax = axes[0]
    ax.plot(ts, obs_spd["mono"], "-", lw=2, label="pruned exact SPD")
    ax.fill_between(ts, obs_spd["mono"] - budget,
                    obs_spd["mono"] + budget, alpha=0.2,
                    label="measured defect budget")
    ax.errorbar(ts_ens, obs_got["mono"], yerr=6 * obs_sem["mono"],
                fmt="o", ms=4, capsize=3,
                label="BFF interpreter ensemble (6$\\sigma$)")
    ax.set_xlabel("time")
    ax.set_ylabel(r"$p(\mathrm{dot}^3)$ window probability")
    ax.set_title(
        f"monoculture bulk: exact SPD vs soup (eps={args.eps:g})")
    ax.legend()
    ax.grid()

    ax = axes[1]
    hl = []
    for s in np.argsort(np.abs(grad))[::-1]:
        if s != dot and len(hl) < 5:
            hl.append(int(s))
    for s in range(size_a):
        if s == dot:
            continue
        is_hl = s in hl
        (line,) = ax.plot(ts, cls_spd[:, s], "-",
                          lw=2 if is_hl else 0.8,
                          color=None if is_hl else "gray",
                          alpha=1.0 if is_hl else 0.4,
                          label=syms[s] if is_hl else None)
        ax.errorbar(ts_ens, cls_got[:, s], yerr=6 * cls_sem[:, s],
                    fmt="o", ms=3, capsize=2, color=line.get_color(),
                    alpha=1.0 if is_hl else 0.3)
    ax.set_xlabel("time")
    ax.set_ylabel("one-mutant window mass per opcode")
    ax.set_title("the instruction set's selection gradient, "
                 "opcode by opcode")
    ax.legend()
    ax.grid()

    ax = axes[2]
    ax.plot(ts, 1.0 - mass, "o-")
    ax.set_xlabel("time")
    ax.set_ylabel("un-enumerated event mass  $1 - \\Sigma w(p)$")
    ax.set_title(
        f"pruning stays honest: mass leak of the {len(prog.w_const)}"
        f"-world model (thr={THR:g})")
    ax.grid()
    fig.tight_layout()
    out = _common.out_path(f"ex6_bff_self_spd{_suffix(args)}.pdf")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
