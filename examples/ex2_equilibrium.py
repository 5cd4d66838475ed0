"""Direct equilibrium of the ferromagnetic chain: β-continuation of
steady states with implicit-gradient sensitivities.

The reference can only approach ex2's equilibrium by time integration —
and at βJ_eff ≳ 2 domain coarsening is so slow the integrator is still
0.16 away (max window-probability error) at t=2000. Here each point of
a β sweep is solved DIRECTLY with the pseudo-transient Newton–Krylov
solver (`ode/steady.py`), warm-started from the previous β (numerical
continuation), and the magnetization susceptibility-like response
dm/dβ comes from one implicit-function-theorem adjoint per β — no
trajectory is ever integrated.

Exactness check built in: ex2's flip rates are detailed-balanced
against the 1D Ising model at J_eff = 2J
(`ferromagnet.ising_gibbs_windows`), whose Gibbs measure is order-1
Markov — inside the SPD closure for every cl_k ≥ 2 — so the solver's
fixed points must land ON the analytic transfer-matrix curves (not
just near them), at every context length.

Output: `ex2_equilibrium.pdf` — m(β) and dm/dβ(β), solver markers over
analytic lines.
"""

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.models.ferromagnet import (
    ising_gibbs_windows,
)
from chemical_kinetics_and_program_execution_tpu.ode.steady import (
    make_steady_state,
)

CL_K = 4
S = 2 ** CL_K
BETAS = np.linspace(0.2, 1.4, 25)
DATA_FILE = "ex2_equilibrium.npz"


def magnetization(p, cl_k):
    """⟨s⟩ from the single-symbol marginal of a window distribution."""
    import jax.numpy as jnp

    q = p.reshape((2,) * cl_k)
    p_up = q.sum(axis=tuple(range(1, cl_k)))[1]
    return 2.0 * p_up - 1.0


def analytic_m(beta):
    pg = ising_gibbs_windows(1, J_eff=2.0, h=-0.25, beta=beta)
    return 2.0 * pg[1] - 1.0


def compute():
    import jax
    import jax.numpy as jnp

    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", CL_K)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    solve = make_steady_state(lambda p, w: pd.dy_dt(p, w),
                              size_a=2, cl_k=CL_K, tol=1e-13,
                              probe_args=pd.consts(defaults))

    def m_of_beta(beta, guess):
        prm = dict(defaults)
        prm["beta"] = beta
        p_inf, info = solve(guess, pd.consts(prm))
        return magnetization(p_inf, CL_K), (p_inf, info)

    val_and_grad = jax.jit(jax.value_and_grad(m_of_beta, has_aux=True))

    from chemical_kinetics_and_program_execution_tpu.ode.steady import (
        relaxation_modes,
    )

    w_defaults = pd.consts(defaults)
    rows, guess = [], jnp.full((S,), 1.0 / S)
    for beta in BETAS:
        (m, (p_inf, info)), dm = val_and_grad(
            jnp.asarray(beta, jnp.float64), jax.lax.stop_gradient(guess))
        if not bool(info.converged):
            raise RuntimeError(f"no convergence at beta={beta:g}: "
                               f"residual={float(info.residual):.3e}")
        # Slowest relaxation mode at this equilibrium (shift-invert
        # Arnoldi on the same matrix-free machinery): the coarsening
        # time that makes reaching this state by integration so slow.
        prm = dict(defaults)
        prm["beta"] = jnp.asarray(beta, jnp.float64)
        lams, _ = relaxation_modes(
            lambda p, w: pd.dy_dt(p, w), p_inf, pd.consts(prm),
            size_a=2, cl_k=CL_K, n_modes=1, krylov_m=10,
            probe_args=w_defaults)
        tau = -1.0 / float(np.real(lams[0]))
        rows.append((float(m), float(dm), tau, int(info.iterations)))
        guess = p_inf  # continuation: warm-start the next beta
        print(f"beta={beta:.3f}  m={rows[-1][0]:+.8f}  "
              f"dm/dbeta={rows[-1][1]:+.6f}  tau={tau:.4g}  "
              f"iters={rows[-1][3]}")
    return np.asarray(rows)


def main():
    table = _common.cached(DATA_FILE, compute, key="mrows")
    m, dm, tau = table[:, 0], table[:, 1], table[:, 2]

    bs = np.linspace(BETAS[0], BETAS[-1], 400)
    m_exact = np.array([analytic_m(b) for b in bs])
    eps = 1e-6
    dm_exact = np.array([(analytic_m(b + eps) - analytic_m(b - eps))
                         / (2 * eps) for b in bs])

    fig, (ax1, ax2, ax3) = _common.pyplot.subplots(1, 3, figsize=(19, 6))
    ax1.plot(bs, m_exact, "-", color="C0",
             label="Ising transfer matrix (J_eff=2J)")
    ax1.plot(BETAS, m, "o", color="C1", ms=5, label="direct steady state")
    ax1.set_xlabel(r"$\beta$")
    ax1.set_ylabel(r"$m = \langle s \rangle$")
    ax1.legend(fontsize=13)
    ax1.grid(alpha=0.3)
    ax2.plot(bs, dm_exact, "-", color="C0", label="analytic d$m$/d$\\beta$")
    ax2.plot(BETAS, dm, "o", color="C1", ms=5, label="implicit adjoint")
    ax2.set_xlabel(r"$\beta$")
    ax2.set_ylabel(r"$\partial m / \partial \beta$")
    ax2.legend(fontsize=13)
    ax2.grid(alpha=0.3)
    ax3.semilogy(BETAS, tau, "o-", color="C2")
    ax3.set_xlabel(r"$\beta$")
    ax3.set_ylabel(r"slowest relaxation time $\tau = -1/\mathrm{Re}\,"
                   r"\lambda_1$")
    ax3.set_title("why integration crawls\n(shift-invert Arnoldi)",
                  fontsize=14)
    ax3.grid(alpha=0.3)
    fig.suptitle(f"ex2 equilibrium by direct solve, cl_k={CL_K} "
                 "(J=1, h=-0.25)")
    fig.tight_layout()
    fig.savefig(_common.out_path("ex2_equilibrium.pdf"))
    print("max |m - analytic| =",
          float(np.max(np.abs(m - np.array([analytic_m(b)
                                            for b in BETAS])))))
    print("wrote", _common.out_path("ex2_equilibrium.pdf"))


if __name__ == "__main__":
    main()
