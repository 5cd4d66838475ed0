"""Spatial correlation functions of the ferromagnetic chain: the
closure state knows statistics at EVERY separation.

The reference reports single-window marginals (length <= cl_k) only.
But the SPD closure state defines an order-(cl_k-1) Markov measure
whose JOINT statistics at arbitrary separation are exactly computable
(`ops/correlations.py`): this script sweeps β, solves each equilibrium
directly (`ode/steady.py` continuation, no integration), and extracts

  1. the connected spin-spin correlator C(d) = <s_0 s_d> − m² out to
     d = 30 sites — 7 context lengths beyond what the cl_k=4 state
     stores — overlaid on the analytic 1D Ising transfer-matrix
     correlator at (J_eff = 2J, h) (independent 2×2 eigendecomposition);
  2. the correlation length ξ(β) from the subleading eigenvalue of the
     context transfer operator vs the analytic −1/ln(λ₂/λ₁);
  3. an instrument-level twin: empirical C(d) counted on bridge-sampled
     tape RINGS (`ensemble.sample_tapes_from_spd`) vs the exact cyclic
     trace formula (`pair_prob(ring=L)`) — finite-ring effects included.

Exactness is not approximate here: ex2's rates are detailed-balanced
against 1D Ising (order-1 Markov ⊂ the closure for cl_k ≥ 2), so the
engine's steady state must put the correlator ON the analytic curve at
every d (measured ≤1e-8 absolute; the assert gates 1e-6).

Runs in ~1 min on one CPU. Output: `ex2_correlations.pdf`.
"""

import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.ode.steady import (
    make_steady_state,
)
from chemical_kinetics_and_program_execution_tpu.ops import (
    correlations as corr,
)

CL_K = 4
S = 2 ** CL_K
J_EFF, H = 2.0, -0.25       # ex2 defaults: J=1 (J_eff=2J), h=-0.25
BETAS = np.linspace(0.2, 1.2, 11)
BETA_DETAIL = (0.4, 0.8, 1.2)
DS = np.arange(1, 31)
B_RINGS = int(os.environ.get("CKPE_EX2CORR_B", "8192"))
L_RING = 64
SUFFIX = "" if B_RINGS == 8192 else f"_b{B_RINGS}"
SPIN = {(0,): -1.0, (1,): 1.0}


def analytic_ising(beta):
    """2×2 symmetric Ising transfer matrix at (J_eff, H): returns
    (m, amp, ratio) with C(d) = amp · ratio^d exactly (two-state 1D)."""
    s = np.array([-1.0, 1.0])
    T = np.exp(beta * (J_EFF * np.outer(s, s)
                       + 0.5 * H * (s[:, None] + s[None, :])))
    lam, u = np.linalg.eigh(T)
    order = np.argsort(lam)[::-1]
    lam, u = lam[order], u[:, order]
    m = float(u[:, 0] @ (s * u[:, 0]))
    amp = float(u[:, 0] @ (s * u[:, 1])) ** 2
    return m, amp, lam[1] / lam[0]


def compute_steady_spds():
    import jax
    import jax.numpy as jnp

    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", CL_K)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    solve = make_steady_state(lambda p, w: pd.dy_dt(p, w),
                              size_a=2, cl_k=CL_K, tol=1e-13,
                              probe_args=pd.consts(defaults))
    spds, guess = [], jnp.full((S,), 1.0 / S)
    for beta in BETAS:
        prm = dict(defaults)
        prm["beta"] = jnp.asarray(beta, jnp.float64)
        p_inf, info = solve(guess, pd.consts(prm))
        if not bool(info.converged):
            raise RuntimeError(f"no convergence at beta={beta:g}")
        spds.append(np.asarray(p_inf))
        guess = p_inf
    return np.stack(spds)


def ring_counts(spd, beta):
    """Empirical connected spin correlator on bridge-sampled rings."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    tapes = np.asarray(ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(7000 + int(round(beta * 1000))),
        spd, 2, CL_K, B_RINGS, L_RING, ring=True))
    s = tapes.astype(np.float64) * 2 - 1
    m = s.mean()
    # Translation-averaged pair products: B*L samples per separation.
    emp = np.array([(s * np.roll(s, -d, axis=1)).mean() for d in DS])
    return emp - m * m


def main():
    spds = _common.cached(f"ex2_correlations{SUFFIX}.npz",
                          compute_steady_spds, key="spds")

    fig, (ax1, ax2, ax3) = _common.pyplot.subplots(1, 3, figsize=(19, 6))

    # Panel 1: C(d) at detail betas — engine markers on analytic lines.
    worst = 0.0
    for i, beta in enumerate(BETA_DETAIL):
        bi = int(np.argmin(np.abs(BETAS - beta)))
        spd = spds[bi].reshape((2,) * CL_K)
        got = corr.observable_correlation(spd, SPIN, SPIN, DS)
        m, amp, ratio = analytic_ising(BETAS[bi])
        want = amp * ratio ** DS.astype(float)
        worst = max(worst, float(np.max(np.abs(got - want))))
        c = f"C{i}"
        ax1.semilogy(DS, want, "-", color=c,
                     label=rf"Ising analytic, $\beta$={BETAS[bi]:.1f}")
        ax1.semilogy(DS[::2], got[::2], "o", color=c, ms=5, mfc="none")
    ax1.axvline(CL_K - 1, color="k", lw=0.8, ls=":",
                label=f"stored window reach (cl_k−1={CL_K - 1})")
    ax1.set_xlabel("separation d (sites)")
    ax1.set_ylabel(r"$\langle s_0 s_d\rangle - m^2$")
    ax1.set_title("steady-state spin correlator\n(markers: engine; "
                  "lines: 2×2 transfer matrix)")
    ax1.legend(fontsize=12)
    ax1.grid(alpha=0.3)
    print(f"max |C(d) - analytic| over betas {BETA_DETAIL}, "
          f"d<=30: {worst:.3e}")
    assert worst < 1e-6, f"correlator off the analytic curve: {worst}"

    # Panel 2: correlation length sweep.
    xi = np.array([
        corr.correlation_length(spds[i].reshape((2,) * CL_K))
        for i in range(len(BETAS))
    ])
    xi_want = np.array([-1.0 / np.log(analytic_ising(b)[2])
                        for b in BETAS])
    ax2.semilogy(BETAS, xi_want, "-", color="C0",
                 label=r"analytic $-1/\ln(\lambda_2/\lambda_1)$")
    ax2.semilogy(BETAS, xi, "o", color="C1", ms=6, mfc="none",
                 label="engine: context-operator $\\lambda_2$")
    ax2.set_xlabel(r"$\beta$")
    ax2.set_ylabel(r"correlation length $\xi$ (sites)")
    ax2.set_title("correlation length vs temperature")
    ax2.legend(fontsize=12)
    ax2.grid(alpha=0.3)
    xi_dev = float(np.max(np.abs(xi / xi_want - 1.0)))
    print(f"max rel deviation of xi(beta): {xi_dev:.3e}")
    assert xi_dev < 1e-6

    # Panel 3: ensemble twin on finite rings at one beta.
    bi = int(np.argmin(np.abs(BETAS - 0.8)))
    spd = spds[bi].reshape((2,) * CL_K)
    emp = ring_counts(spd, BETAS[bi])
    exact_ring = corr.observable_correlation(spd, SPIN, SPIN, DS,
                                             ring=L_RING)
    chain = corr.observable_correlation(spd, SPIN, SPIN, DS)
    ax3.plot(DS, exact_ring, "-", color="C0",
             label=f"exact cyclic trace (L={L_RING})")
    ax3.plot(DS, chain, "--", color="C2", lw=1,
             label="infinite chain")
    ax3.plot(DS, emp, "o", color="C1", ms=5, mfc="none",
             label=f"bridge-sampled rings (B={B_RINGS})")
    ax3.set_xlabel("separation d (sites)")
    ax3.set_ylabel(r"$C(d)$")
    ax3.set_title(f"instrument twin at $\\beta$={BETAS[bi]:.1f}: "
                  "sampled rings vs trace formula")
    ax3.legend(fontsize=12)
    ax3.grid(alpha=0.3)
    # Translation-averaged MC noise floor: correlated samples, so gate
    # loosely (scaled for reduced smoke runs).
    gate = 0.02 * max(1.0, np.sqrt(8192 / B_RINGS))
    ring_dev = float(np.max(np.abs(emp - exact_ring)))
    print(f"max |empirical - cyclic exact| at beta={BETAS[bi]:.1f}: "
          f"{ring_dev:.4f} (gate {gate})")
    assert ring_dev < gate

    fig.suptitle(f"ex2 spatial correlations beyond the stored windows "
                 f"(cl_k={CL_K}, J=1, h={H})")
    fig.tight_layout()
    out = _common.out_path(f"ex2_correlations{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
