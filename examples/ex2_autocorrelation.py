"""Temporal autocorrelation at equilibrium: Onsager regression measured
on the tape ensemble, predicted by the linearized closure.

The regression hypothesis says spontaneous equilibrium fluctuations
decay by the same law as macroscopic relaxations — the stationary
autocorrelation of a slow observable must decay at the linearized
dynamics' slowest eigenvalue. This script tests that across code paths
that share nothing:

- MEASURED: B tape rings bridge-sampled from the direct steady state
  evolve under the true stochastic rule (`ensemble.run_ensemble`, the
  headline-bench kernel); the per-ring magnetization time series gives
  the stationary autocorrelation C(τ).
- PREDICTED: `ode/steady.relaxation_modes` (shift-invert Arnoldi on
  the matrix-free closure Jacobian) gives λ₁; the equal-time variance
  comes EXACTLY from the spatial ring correlator
  (`ops/correlations.py`): Var(M) = (1/L) Σ_d C_ring(d).

The script registers its own β=0.5 ferromagnet variant through the
public DSL (`dsl.register_problem`) — the stock ex2 rule bakes β=1,
where τ ≈ 350 makes the measurement needlessly long; at β=0.5 the
slowest mode (τ ≈ 52) is 5.8× separated from the next, so the tail is
cleanly single-mode. Two quantitative gates: measured Var(M) on the
exact spatial prediction (validates cross-site JOINT statistics at
stationarity), and the fitted mid-tail rate of C(τ)/C(0) on −λ₁.
λ₁ is a closure eigenvalue, itself converging in cl_k (≈1%/level
here), so the gate compares against the geometric cl_k=4/5/6
extrapolation; all three levels are printed.

Runs in ~10 min full-scale on one CPU (B=4096; CKPE_EX2AC_B reduces).
Output: `ex2_autocorrelation.pdf`.
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.engine import dsl
from chemical_kinetics_and_program_execution_tpu.ode.steady import (
    make_steady_state,
    relaxation_modes,
)
from chemical_kinetics_and_program_execution_tpu.ops import (
    correlations as corr,
)

CL_K = 4
S = 2 ** CL_K
BETA, J, H = 0.5, 1.0, -0.25
TAG = "ex2-ferromagnetic-chain-b05"
B = int(os.environ.get("CKPE_EX2AC_B", "4096"))
SUFFIX = "" if B == 4096 else f"_b{B}"
L, E = 64, 4
ROUNDS_PER_SNAP = 8
N_SNAPS = 600
SPIN = {(0,): -1.0, (1,): 1.0}
DATA = 1


@dsl.register_problem(TAG, ("D", "U"))
def _ferro_b05(t):
    """ex2 physics (`problems.scm:30-55`) at β=0.5, J=1, h=−0.25."""
    mid = t.get_sym(DATA, 0)
    left = t.get_sym(DATA, -1)
    right = t.get_sym(DATA, +1)
    energy_j = (1 if left == mid else -1) + (1 if mid == right else -1)
    factor_a = math.exp(-(BETA * J * (4 + 2 * energy_j)))
    factor_b = (math.exp(-2 * BETA * abs(H))
                if (H > 0) == (mid == "U") else 1.0)
    p_flip = factor_a * factor_b
    if t.choose([(p_flip, True), (1 - p_flip, False)]):
        t.set_sym(DATA, 0, "D" if mid == "U" else "U")


def steady_and_mode():
    import jax.numpy as jnp

    fn = make_dy_dt(compile_problem(TAG, CL_K))
    solve = make_steady_state(lambda p, w: fn(p), size_a=2, cl_k=CL_K,
                              tol=1e-13)
    p_inf, info = solve(jnp.full((S,), 1.0 / S), None)
    assert bool(info.converged)
    lams, _ = relaxation_modes(lambda p, w: fn(p), p_inf, None,
                               size_a=2, cl_k=CL_K, n_modes=1,
                               krylov_m=12)
    # lambda_1 is a cl_k=CL_K closure eigenvalue, not a microscopic
    # exact: compute two more context lengths and extrapolate the
    # geometric tail (deltas shrink ~0.58x per level at this beta).
    higher = []
    for k in (CL_K + 1, CL_K + 2):
        fnk = make_dy_dt(compile_problem(TAG, k))
        solvek = make_steady_state(lambda p, w: fnk(p), size_a=2,
                                   cl_k=k, tol=1e-13)
        pk, infok = solvek(jnp.full((2 ** k,), 2.0 ** -k), None)
        assert bool(infok.converged)
        lamsk, _ = relaxation_modes(lambda p, w: fnk(p), pk, None,
                                    size_a=2, cl_k=k, n_modes=1,
                                    krylov_m=14)
        higher.append(float(np.real(lamsk[0])))
    l4, l5, l6 = float(np.real(lams[0])), higher[0], higher[1]
    r = (l6 - l5) / (l5 - l4)
    lam_inf = l6 + (l6 - l5) * r / (1.0 - r)
    return np.asarray(p_inf), l4, l5, l6, lam_inf


def magnetization_series(spd):
    """[N_SNAPS+1, B] per-ring mean spin under the true dynamics."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    dm = ensemble.compile_decision_machine(TAG)
    key = jax.random.PRNGKey(42)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), spd.reshape((2,) * CL_K), 2, CL_K,
        B, L, ring=True).astype(jnp.int32)
    ptape = jnp.zeros((B, L), jnp.int32)

    def mag(tape):
        return np.asarray(2.0 * tape.mean(axis=1, dtype=jnp.float64)
                          - 1.0)

    ms = [mag(dtape)]
    # Plane-resident snapshot loop: keep_planes returns the packed
    # device state so only the decode (for the magnetization readout)
    # is paid per snapshot, not the re-pack — bit-identical tape stream
    # to the plain loop at the same keys
    # (tests/test_ensemble.py::test_plane_state_continuation_*).
    state = (ptape, dtape)
    for snap in range(N_SNAPS):
        state, _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 1 + snap), state, dm,
            (ROUNDS_PER_SNAP, E), keep_planes=True)
        ms.append(mag(state.tapes()[1]))
    return np.stack(ms)


def main():
    # The steady state / eigenvalues are B-independent: one shared
    # cache, so reduced smoke runs reuse the committed full-scale one.
    mode_path = _common.out_path("ex2_autocorrelation_mode.npz")
    if os.access(mode_path, os.R_OK):
        with np.load(mode_path) as z:
            spd, lam_slow, lam5, lam6, lam_inf = (
                z["spd"], float(z["lam"]), float(z["lam5"]),
                float(z["lam6"]), float(z["laminf"]))
    else:
        spd, lam_slow, lam5, lam6, lam_inf = steady_and_mode()
        np.savez_compressed(mode_path, spd=spd, lam=lam_slow,
                            lam5=lam5, lam6=lam6, laminf=lam_inf)
    ms = _common.cached(f"ex2_autocorrelation_series{SUFFIX}.npz",
                        lambda: magnetization_series(spd))
    dt_snap = ROUNDS_PER_SNAP * (-math.log1p(-E / L))
    spd_t = spd.reshape((2,) * CL_K)

    # Exact equal-time variance from the spatial ring correlator.
    c_ring = corr.observable_correlation(spd_t, SPIN, SPIN, range(L),
                                         ring=L)
    var_exact = float(c_ring.sum() / L)

    x = ms - ms.mean()
    var_meas = float((x * x).mean())
    n_tau = int(min(N_SNAPS // 2, 6.0 / (abs(lam_slow) * dt_snap)))
    taus = np.arange(n_tau)
    c = np.array([(x[: len(x) - t] * x[t:]).mean() for t in taus])
    c /= c[0]
    pred = np.exp(lam_inf * taus * dt_snap)

    # Fit window: below the mode-mixing region (short lags decay
    # FASTER — higher modes), above the estimator's deep-tail region
    # (the MC noise floor flattens c there, biasing the rate low;
    # measured: windows ending at 0.05 read ~6% slow vs 0.2).
    sel = (c < 0.6) & (c > 0.2) & (taus > 0)
    rate_fit = -np.polyfit(taus[sel] * dt_snap, np.log(c[sel]), 1)[0]

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))
    ax1.semilogy(taus * dt_snap, np.maximum(c, 1e-4), "o", ms=3,
                 mfc="none", color="C1",
                 label=f"ensemble (B={B}, L={L})")
    ax1.semilogy(taus * dt_snap, pred, "-", color="C0",
                 label=rf"$e^{{\lambda_1\tau}}$, $\lambda_1$="
                       rf"{lam_inf:.5f} (Arnoldi, cl_k-extrapolated)")
    ax1.set_xlabel(r"$\tau$")
    ax1.set_ylabel(r"$C(\tau)/C(0)$")
    ax1.set_title("magnetization autocorrelation at equilibrium")
    ax1.legend(fontsize=12)
    ax1.grid(alpha=0.3)

    ax2.bar(["measured", "exact spatial\ncorrelator"],
            [var_meas, var_exact], color=["C1", "C0"], width=0.5)
    ax2.set_ylabel(r"$\mathrm{Var}(M)$ per ring")
    ax2.set_title("equal-time variance:\n"
                  r"$\mathrm{Var}(M) = \frac{1}{L}\sum_d C_{ring}(d)$")
    ax2.grid(alpha=0.3, axis="y")

    print(f"lambda_1 = {lam_slow:.6f}/{lam5:.6f}/{lam6:.6f} "
          f"(cl_k={CL_K}/{CL_K + 1}/{CL_K + 2}), extrapolated "
          f"{lam_inf:.6f}; tau = {-1 / lam_inf:.2f}")
    print(f"fitted regression rate = {rate_fit:.6f}  "
          f"(ratio to -lambda_1(cl_k={CL_K}): "
          f"{rate_fit / -lam_slow:.3f}, to extrapolated: "
          f"{rate_fit / -lam_inf:.3f})")
    print(f"Var(M): measured {var_meas:.6f} vs exact {var_exact:.6f} "
          f"(ratio {var_meas / var_exact:.3f})")
    gate = 0.10 * max(1.0, math.sqrt(4096 / B))
    assert abs(var_meas / var_exact - 1.0) < gate
    assert abs(rate_fit / -lam_inf - 1.0) < gate

    fig.suptitle(f"Onsager regression on the ferromagnetic chain, "
                 f"beta={BETA}, cl_k={CL_K}")
    fig.tight_layout()
    out = _common.out_path(f"ex2_autocorrelation{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
