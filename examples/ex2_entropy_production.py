"""Entropy production of the ferromagnetic quench, three ways.

The reference can print a state entropy (`ex4var1_chemical_turing.py:
142-154`); it has no notion of entropy *production* — a path
functional. This example measures it across the framework's three
formulations on the same physics (uniform disordered start, ex2
Glauber-like dynamics at beta = 1 relaxing toward ferromagnetic
order) and checks every exact identity along the way:

- EXACT MICROSCOPIC: Schnakenberg total/medium entropy production
  rates of the L = 12 ring master equation, with the detailed-balance
  identity sigma_tot(t) = -d/dt D(p(t) || gibbs) overlaid (exact).
- EXACT MACROSCOPIC: the closure-side medium rate — a window-marginal
  functional (`ops/thermo.py`) — evaluated along the solved cl_k = 4
  SPD trajectory, plus the closure's system entropy rate. Their sum is
  the infinite-chain sigma_tot; the visible gap to the L = 12 master
  curve is finite-size physics, not engine error.
- SAMPLED: per-member cumulative medium entropy from the device
  instrument (`thermo.run_ensemble_sigma`) on B bridge-sampled rings,
  6-sigma-gated against the exact discrete-kernel expectation, plus
  the integral fluctuation theorem <exp(-sigma_tot)> = 1 checked at
  every snapshot (boundary terms from the exact kernel iterates).

Runs in ~2 min on one CPU. Output: `ex2_entropy_production.pdf` +
`ex2_entropy_production.npz` (CI-gated by
`tests/test_thermo.py::test_ex2_entropy_artifacts_claims`).
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
    markov,
)
from chemical_kinetics_and_program_execution_tpu.engine import (
    ensemble,
    master,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve
from chemical_kinetics_and_program_execution_tpu.ops import thermo

TAG, SIZE_A, CL_K = "ex2-ferromagnetic-chain", 2, 4
BETA, J, H = 1.0, 1.0, -0.25  # ex2's baked parameters
L, E = 12, 1
ROUNDS_PER_SNAP, N_SNAPS = 6, 24
B = int(os.environ.get("CKPE_EX2EP_B", "8192"))
SUFFIX = "" if B == 8192 else f"_b{B}"


def ensemble_traj(dm, tables, p0_states):
    """Sampled cumulative sigma + IFT terms at every snapshot."""
    import jax
    import jax.numpy as jnp

    tdev = thermo.device_tables(tables)
    key = jax.random.PRNGKey(7)
    spd = _common.iid_spd([0.5, 0.5], CL_K)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), spd, SIZE_A, CL_K, B, L,
        ring=True).astype(np.int32)
    ptape = np.zeros((B, L), np.int32)

    def ranks(tape):
        r = np.zeros(B, dtype=np.int64)
        t_np = np.asarray(tape)
        for j in range(L):
            r = r * SIZE_A + t_np[:, j]
        return r

    ln_p0 = np.log(p0_states[ranks(dtape)])
    sig = np.zeros(B)
    cum_mean, cum_se, rank_hist = [0.0], [0.0], [ranks(dtape)]
    pt, dt_ = jnp.asarray(ptape), jnp.asarray(dtape)
    for snap in range(N_SNAPS):
        (pt, dt_), ds, nirr, _ = thermo.run_ensemble_sigma(
            jax.random.fold_in(key, 1 + snap), (pt, dt_), dm, tdev,
            (ROUNDS_PER_SNAP, E), independent_sites=True)
        assert int(np.asarray(nirr).sum()) == 0
        sig = sig + np.asarray(ds)
        cum_mean.append(sig.mean())
        cum_se.append(sig.std() / math.sqrt(B))
        rank_hist.append(ranks(dt_))
    return np.asarray(cum_mean), np.asarray(cum_se), ln_p0, sig, \
        np.stack(rank_hist)


def main():
    dm = ensemble.compile_decision_machine(TAG)
    tables = thermo.sigma_spec_tables(dm)
    assert not tables.irrev.any()

    import scipy.sparse as sp

    spd = _common.iid_spd([0.5, 0.5], CL_K)
    Q = master.build_ring_generator(TAG, L)
    S = SIZE_A**L
    gibbs = master.ring_gibbs_states(L, J_eff=2 * J, h=H, beta=BETA)
    p0_states = master.ring_trace_measure(spd, SIZE_A, CL_K, L)

    # --- Exact discrete-kernel expectations (the ensemble's law).
    K = (sp.identity(S) + Q / L).tocsr()
    digits = master._ring_digits(L, SIZE_A)

    def window_marginals(p):
        pw = np.zeros(tables.num_windows)
        for i in range(L):
            wr = np.zeros(S, dtype=np.int64)
            for off in range(dm.d_lo, dm.d_lo + dm.n_d):
                wr = wr * SIZE_A + digits[:, (i + off) % L]
            for pd in range(SIZE_A**dm.n_p):
                np.add.at(pw, pd * (SIZE_A**dm.n_d) + wr,
                          p / (SIZE_A**dm.n_p))
        return pw / L

    p = p0_states.copy()
    exp_cum = [0.0]
    p_snaps = [p.copy()]
    acc = 0.0
    for snap in range(N_SNAPS):
        for _ in range(ROUNDS_PER_SNAP):
            pw = window_marginals(p)
            rate, _ = thermo.medium_entropy_rate_from_window_probs(
                pw, tables)
            acc += rate * E  # E site events per member per round
            p = K @ p
        exp_cum.append(acc)
        p_snaps.append(p.copy())
    exp_cum = np.asarray(exp_cum)

    # --- Sampled ensemble.
    data_file = _common.out_path(f"ex2_entropy_production{SUFFIX}.npz")
    if os.access(data_file, os.R_OK):
        d = np.load(data_file)
        cum_mean, cum_se = d["cum_mean"], d["cum_se"]
        ift_mean, ift_se = d["ift_mean"], d["ift_se"]
        sig_tot_mean = d["sig_tot_mean"]
    else:
        cum_mean, cum_se, ln_p0, sig_fin, rank_hist = ensemble_traj(
            dm, tables, p0_states)
        # IFT at the final snapshot (per-member paths in hand):
        # sigma_tot = sigma_med + ln p0(x0) - ln p_T(x_T), boundary
        # terms from the exact kernel iterates.
        sig_tot = sig_fin + ln_p0 - np.log(
            np.maximum(p_snaps[-1][rank_hist[-1]], 1e-300))
        ift = np.exp(-sig_tot)
        ift_mean = np.array([ift.mean()])
        ift_se = np.array([ift.std() / math.sqrt(B)])
        sig_tot_mean = np.array([sig_tot.mean()])
        np.savez_compressed(
            data_file, cum_mean=cum_mean, cum_se=cum_se,
            exp_cum=exp_cum, ift_mean=ift_mean, ift_se=ift_se,
            sig_tot_mean=sig_tot_mean)
    print(f"sampled cum sigma (final): {cum_mean[-1]:.4f} "
          f"± {cum_se[-1]:.4f}; exact kernel expectation "
          f"{exp_cum[-1]:.4f}; z = "
          f"{(cum_mean[-1] - exp_cum[-1]) / cum_se[-1]:.2f}")
    print(f"IFT <e^-sigma_tot> at t_final: {ift_mean[-1]:.4f} ± "
          f"{ift_se[-1]:.4f}; mean sigma_tot = {sig_tot_mean[-1]:.3f}")

    # --- Continuous-time master rates + the -dD/dt identity (exact:
    # dD/dt = sum (Qp) ln(p/pi), no finite differences anywhere).
    dt_round = -math.log1p(-E / L)
    ts = np.arange(N_SNAPS + 1) * ROUNDS_PER_SNAP * dt_round
    ts_fine = np.linspace(ts[0], ts[-1], 97)
    p_cont = master.solve_master(Q, p0_states, ts_fine)
    tot_rate = np.empty(len(ts_fine))
    med_rate = np.empty(len(ts_fine))
    minus_dD = np.empty(len(ts_fine))
    D = np.empty(len(ts_fine))
    for i in range(len(ts_fine)):
        tot_rate[i], med_rate[i] = thermo.master_entropy_rates(
            Q, p_cont[i])
        minus_dD[i] = -thermo.relative_entropy_rate(Q, p_cont[i], gibbs)
        D[i] = thermo.relative_entropy(p_cont[i], gibbs)

    # --- Closure-side rates along the solved SPD trajectory.
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    ys = np.asarray(solve(lambda y, t: fn(y), spd.ravel(), ts_fine,
                          rtol=1e-11, atol=1e-14))
    med_closure = np.empty(len(ts_fine))
    for i in range(len(ts_fine)):
        r, irr = thermo.medium_entropy_rate_spd(ys[i], dm, tables)
        assert irr == 0.0
        med_closure[i] = r
    S_sys = np.array([markov.markov_entropy(ys[i].reshape((2,) * CL_K))
                      for i in range(len(ts_fine))])
    dS_sys = np.gradient(S_sys, ts_fine)
    tot_closure = med_closure + dS_sys

    # --- Plots.
    fig, (ax1, ax2, ax3) = _common.pyplot.subplots(
        1, 3, figsize=(18, 5.6))
    ax1.plot(ts_fine, tot_rate / L, "-", color="C0",
             label=rf"master $\dot\sigma_{{tot}}/L$ (L={L})")
    ax1.plot(ts_fine[::4], minus_dD[::4] / L, "x", ms=5, color="C3",
             label=r"$-\,\mathrm{d}D(p\|\pi)/\mathrm{d}t/L$ (identity)")
    ax1.plot(ts_fine, med_rate / L, "-", color="C1",
             label=r"master $\dot\sigma_{med}/L$")
    ax1.plot(ts_fine, tot_closure, "--", color="C0", alpha=0.6,
             label=rf"closure $\dot\sigma_{{tot}}$ (cl_k={CL_K}, "
                   r"$L=\infty$)")
    ax1.plot(ts_fine, med_closure, "--", color="C1", alpha=0.6,
             label=r"closure $\dot\sigma_{med}$")
    ax1.set_xlabel("t")
    ax1.set_ylabel("entropy production rate per site (nats)")
    ax1.set_title("Schnakenberg rates: exact identity +\n"
                  "finite-size vs infinite-chain closure")
    ax1.legend(fontsize=9)
    ax1.grid(alpha=0.3)

    ax2.errorbar(ts, cum_mean, yerr=cum_se, fmt="o", ms=4, color="C1",
                 label=f"sampled ensemble (B={B})")
    ax2.plot(ts, exp_cum, "-", color="C0",
             label="exact kernel expectation")
    ax2.set_xlabel("t")
    ax2.set_ylabel(r"cumulative $\sigma_{med}$ per ring (nats)")
    ax2.set_title("per-member medium entropy, sampled vs exact")
    ax2.legend(fontsize=10)
    ax2.grid(alpha=0.3)

    ax3.axhline(1.0, color="k", lw=1)
    ax3.errorbar([ts[-1]], ift_mean[-1:], yerr=6 * ift_se[-1:],
                 fmt="o", color="C2", capsize=4,
                 label=r"$\langle e^{-\sigma_{tot}}\rangle$"
                       r" at $t_{final}$ ($\pm6\,$se)")
    ax3.set_xlim(ts[0], ts[-1] * 1.05)
    ax3.set_ylim(0.0, 2.0)
    ax3.set_xlabel("t")
    ax3.set_title("integral fluctuation theorem\n"
                  rf"$\langle\sigma_{{tot}}\rangle = "
                  rf"{sig_tot_mean[-1]:.2f}$ nats $\geq 0$")
    ax3.legend(fontsize=10)
    ax3.grid(alpha=0.3)

    fig.suptitle("ex2 quench: entropy production across the three "
                 "formulations")
    fig.tight_layout()
    out = _common.out_path(f"ex2_entropy_production{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)

    # Gates (mirrored in CI by test_ex2_entropy_artifacts_claims).
    z = abs(cum_mean[-1] - exp_cum[-1]) / cum_se[-1]
    assert z < 6.0, z
    assert abs(ift_mean[-1] - 1.0) < 6 * ift_se[-1]
    idres = float(np.abs(tot_rate - minus_dD).max())
    print(f"identity max |sigma_tot + dD/dt| = {idres:.2e} "
          f"(pointwise exact; Krylov-solve floor)")
    assert idres < 1e-6 * max(1.0, tot_rate.max())
    assert (tot_rate >= -1e-12).all()


if __name__ == "__main__":
    main()
