"""Tethered fuel: ignition statistics and fuel starvation of the
chemical Turing machine — physics the well-mixed closure cannot pose.

The reference's kinetics are WELL-MIXED: every rule firing reveals
fresh program/data windows from the distribution, as if molecules
collide at random (`tape_multiverse.scm` reveal semantics). The
concrete-tape ensemble is the opposite limit: each ring carries its
machines TETHERED to a fixed fuel lane — a cursor can only burn the P
molecules its own sites hold. This script puts machines (dilute A
cursors on random bits, data tape) over a frozen fuel solution
(P at density PF in solvent, program tape) and measures what tethering
does, with closed-form lattice statistics as oracles:

1. IGNITION (first powered step, first X on the program tape,
   `ensemble.first_passage_times`): a cursor whose site holds no P can
   never take a first step (nothing moves fuel), so the survival curve
   has a closed form: S(t) = (1 − a + a·e^{−t/2})^L with
   a = p(A over P with I/O bits ahead) computed EXACTLY from the
   initial SPDs (per-site alignment, rate-1 site clock, choose=1/2).
   Measured survival must land on it — plateau (never-igniters) and
   all.
2. STARVATION: each ignited cursor advances while consecutive fuel
   cells happen to hold P — a geometric run. Mean spent fuel saturates
   near CURSOR·a·PF/(1−PF)·(1/a·?) — the script uses the simple
   geometric-run estimate CURSOR_DENSITY·q/(1−q) (q = step success
   prob) and gates loosely; the DUAL-SPD closure
   (`dense.compile_dense_dual`) meanwhile burns fuel indefinitely
   (well-mixed machines never stall) — the plotted gap between the
   two is the tethering effect, not an error in either engine.
3. The initial production slope, before any local depletion, is the
   one regime where both models agree — gated against the dual
   closure's first samples.

Runs in ~10 min full-scale on one CPU (B=4096; CKPE_EX4IG_B reduces).
Output: `ex4_ignition.pdf`.
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.engine import dense
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, CL_K, SIZE_A = "ex4-chemical-turing", 4, 9
SYM_A, SYM_I, SYM_O, SYM_P, SYM_X = 0, 4, 5, 6, 7
PF, CURSOR = 0.16, 0.02
B = int(os.environ.get("CKPE_EX4IG_B", "4096"))
SUFFIX = "" if B == 4096 else f"_b{B}"
L, E = 128, 4
T_MAX = 60.0
ROUNDS = int(round(T_MAX / -math.log1p(-E / L)))
ROUNDS_PER_SNAP = 16
N_SNAPS = ROUNDS // ROUNDS_PER_SNAP


def p_halves():
    p_fuel = chemical_turing_p0(
        CL_K, tape_fraction=0.0, powered_fraction=PF).ravel()
    p_tape = chemical_turing_p0(
        CL_K, tape_fraction=1.0, cursor_fraction=CURSOR,
        random01=True).ravel()
    return p_fuel, p_tape


def alignment_prob(p_fuel, p_tape):
    """Exact per-site probability that a site can EVER ignite: data
    reads (A, io, io) and the program site holds P — independent tapes
    at t=0, window marginals straight from the SPDs."""
    p_fire = 0.0
    for b1 in (SYM_I, SYM_O):
        for b2 in (SYM_I, SYM_O):
            p_fire += float(np.squeeze(markov_tapes.seq_prob(
                p_tape.reshape((SIZE_A,) * CL_K), (SYM_A, b1, b2))[0]))
    p_p = float(np.squeeze(markov_tapes.seq_prob(
        p_fuel.reshape((SIZE_A,) * CL_K), (SYM_P,))[0]))
    return p_fire * p_p, p_fire, p_p


def ensemble_run():
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    p_fuel, p_tape = p_halves()
    dm = ensemble.compile_decision_machine(TAG)
    key = jax.random.PRNGKey(4)
    ptape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), p_fuel.reshape((SIZE_A,) * CL_K),
        SIZE_A, CL_K, B, L, ring=True).astype(jnp.int32)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 1), p_tape.reshape((SIZE_A,) * CL_K),
        SIZE_A, CL_K, B, L, ring=True).astype(jnp.int32)

    # Round-resolution first X on the PROGRAM tape (one jitted scan).
    t_hit, _, _ = ensemble.first_passage_times(
        jax.random.fold_in(key, 2), (ptape, dtape), dm, (SYM_X,),
        (ROUNDS, E), data_tape=False)

    # Snapshot loop (independent replica) for the occupancy curve.
    occ = [float((ptape == SYM_X).mean())]
    pt, dt_ = ptape, dtape
    for snap in range(N_SNAPS):
        (pt, dt_), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 3 + snap), (pt, dt_), dm,
            (ROUNDS_PER_SNAP, E))
        occ.append(float((pt == SYM_X).mean()))
    return np.asarray(t_hit), np.asarray(occ)


def closure_x(ts):
    """Well-mixed dual-SPD closure p_X(t) on the fuel half."""
    dual = dense.compile_dense_dual(TAG, CL_K)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    p_fuel, p_tape = p_halves()
    y0 = np.concatenate([p_fuel, p_tape])
    ys = np.asarray(solve(lambda y, t: fn(y), y0, ts,
                          rtol=1e-9, atol=1e-12, method="dop853"))
    half = SIZE_A ** CL_K
    return np.array([
        float(np.squeeze(markov_tapes.seq_prob(
            y[:half].reshape((SIZE_A,) * CL_K), (SYM_X,))[0]))
        for y in ys
    ])


def main():
    dt_round = -math.log1p(-E / L)
    ts_snap = np.arange(N_SNAPS + 1) * (ROUNDS_PER_SNAP * dt_round)

    path = _common.out_path(f"ex4_ignition{SUFFIX}.npz")
    if os.access(path, os.R_OK):
        with np.load(path) as z:
            t_hit, occ, px = z["t_hit"], z["occ"], z["px"]
    else:
        t_hit, occ = ensemble_run()
        px = closure_x(ts_snap)
        np.savez_compressed(path, t_hit=t_hit, occ=occ, px=px)

    p_fuel, p_tape = p_halves()
    a, p_fire, p_p = alignment_prob(p_fuel, p_tape)

    frac_hit = float(np.isfinite(t_hit).mean())
    med = float(np.median(t_hit[np.isfinite(t_hit)]))
    ts_fine = np.linspace(0.0, T_MAX, 300)
    surv = np.array([(t_hit > t).mean() for t in ts_fine])
    # Closed-form tethered survival: per site, P(alignment) = a; an
    # aligned site ignites at rate 1/2 (rate-1 site clock x choose).
    surv_pred = (1.0 - a + a * np.exp(-0.5 * ts_fine)) ** L

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))
    ax1.plot(ts_fine, surv, "-", color="C1",
             label=f"ensemble survival (B={B}, L={L})")
    ax1.plot(ts_fine, surv_pred, "--", color="k",
             label=r"lattice closed form $(1-a+a e^{-t/2})^L$")
    ax1.axhline((1 - a) ** L, color="k", lw=0.8, ls=":",
                label=f"never-ignite plateau $(1-a)^L$ = "
                      f"{(1 - a) ** L:.3f}")
    ax1.set_xlabel("t")
    ax1.set_ylabel("P(no powered step yet)")
    ax1.set_title(f"ignition: median t = {med:.2f}, "
                  f"{100 * frac_hit:.1f}% ignite ever")
    ax1.legend(fontsize=11)
    ax1.grid(alpha=0.3)

    ax2.plot(ts_snap, px, "-", color="C0",
             label=f"well-mixed dual closure (cl_k={CL_K})")
    ax2.plot(ts_snap, occ, "o", ms=4, mfc="none", color="C1",
             label="tethered ensemble (program-tape X)")
    # Geometric fuel-run starvation estimate: an ignited cursor keeps
    # stepping while consecutive cells hold P AND the bits ahead are
    # writable; per-site spent fuel ~ p_fire * sum_k q^k, q = a/p_fire
    # ... = PF (next-cell alignment ~ fuel density; bit condition ~1).
    sat = p_fire * PF / (1.0 - PF)
    ax2.axhline(sat, color="k", lw=0.8, ls=":",
                label=f"geometric-run starvation ~ {sat:.4f}")
    ax2.set_xlabel("t")
    ax2.set_ylabel(r"$p_X$ on the fuel tape")
    ax2.set_title("spent fuel: tethering starves the machines;\n"
                  "the well-mixed closure never stalls")
    ax2.legend(fontsize=11)
    ax2.grid(alpha=0.3)

    print(f"alignment a = {a:.5f} (p_fire {p_fire:.5f} x p_P {p_p:.4f})")
    print(f"ignition: median t = {med:.2f}, hit fraction {frac_hit:.3f} "
          f"vs closed-form asymptote {1 - (1 - a) ** L:.3f}")
    surv_dev = float(np.max(np.abs(surv - surv_pred)))
    print(f"max |survival - closed form| = {surv_dev:.4f}")
    print(f"X saturation: measured {occ[-1]:.5f} vs geometric-run "
          f"{sat:.5f} vs well-mixed closure {px[-1]:.5f}")
    print(f"initial slope: ensemble occ[1] = {occ[1]:.5f} vs closure "
          f"px[1] = {px[1]:.5f} (both well-mixed at t=0)")

    noise = max(1.0, math.sqrt(4096 / B))
    # Whole survival curve on the closed form (MC binomial floor).
    assert surv_dev < 0.02 * noise, surv_dev
    # Saturation within the geometric-run estimate's accuracy.
    assert abs(occ[-1] / sat - 1.0) < 0.25, (occ[-1], sat)
    # Pre-depletion slope agrees with the well-mixed closure.
    assert abs(occ[1] / px[1] - 1.0) < 0.15 * noise, (occ[1], px[1])

    fig.suptitle("ex4 chemical Turing machine with tethered fuel "
                 f"(PF={PF}, cursors {CURSOR}/site)")
    fig.tight_layout()
    out = _common.out_path(f"ex4_ignition{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
