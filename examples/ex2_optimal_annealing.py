"""Optimal annealing schedules by gradient descent through the exact
closure dynamics (differentiable protocol optimization).

The classic simulated-annealing question — how should the temperature
be lowered in a FIXED time budget to end up as ordered as possible? —
becomes a smooth optimization problem here: the tape/MPD closure gives
the exact ensemble dynamics of the ferromagnetic chain under a
time-dependent β(t) (the parametric registration rebuilds the flip
weights as traced functions of β, `engine/parametric.py`), the RK5
stage-scan solve is differentiable end-to-end (`ode/fixed.py`), so
d(final order)/d(schedule knots) is one reverse-mode pass and the
schedule is optimized with plain Adam-free gradient ascent.

The physics: the time budget T = 20 is far below the equilibration
time at the final temperature (τ(β=1.4) ≈ 986, see
`ex2_equilibrium.py`), so an instant quench freezes domain walls.
Gradually lowering the temperature lets domains coarsen while flips
are still fast — the optimizer discovers an annealing ramp, and beats
both the quench and the naive linear ramp.

The reference cannot pose this question at all: its rates are baked
into a compiled Scheme closure at registration, and there is no
gradient path through its FFI solve.

Output: `ex2_optimal_annealing.pdf` — β(t) schedules and their m(t)
trajectories; printed final magnetizations.
"""

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric

CL_K = 4
S = 2 ** CL_K
T_FINAL = 20.0
N_KNOTS = 8
BETA_LO, BETA_HI = 0.2, 1.4
N_SUB = 40  # per sample interval; dt = 0.025
N_SAMPLES = 21
OPT_STEPS = 60
DATA_FILE = "ex2_optimal_annealing.npz"


def main():
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        odeint_fixed,
    )

    pd = parametric.ParametricDense("ex2-ferromagnetic-chain-p", CL_K)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in pd.problem.param_defaults.items()}
    knots = jnp.linspace(0.0, T_FINAL, N_KNOTS)
    ts = jnp.linspace(0.0, T_FINAL, N_SAMPLES)
    p0 = jnp.full((S,), 1.0 / S)  # disordered (infinite temperature)

    def beta_of(theta, t):
        """Schedule β(t): piecewise-linear in t over sigmoid-bounded
        knot values (β ∈ [BETA_LO, BETA_HI] by construction)."""
        vals = BETA_LO + (BETA_HI - BETA_LO) * jax.nn.sigmoid(theta)
        return jnp.interp(t, knots, vals)

    def rhs(y, t, theta):
        prm = dict(defaults)
        prm["beta"] = beta_of(theta, t)
        # Traced table rebuild per RHS instance — ONE instance exists
        # thanks to the RK stage-scan (`ode/fixed.py`).
        return pd(y, prm)

    def magnetization(p):
        return 2.0 * p.reshape((2,) * CL_K).sum(
            axis=tuple(range(1, CL_K)))[1] - 1.0

    def solve(theta):
        return odeint_fixed(rhs, p0, ts, n_sub=N_SUB, args=theta)

    def order(theta):
        # h < 0 orders the chain downward: maximize -m(T).
        return -magnetization(solve(theta)[-1])

    val_grad = jax.jit(jax.value_and_grad(order))

    def compute():
        import scipy.optimize as sopt

        # Baselines in knot-value space (pre-sigmoid).
        def logit(b):
            x = (b - BETA_LO) / (BETA_HI - BETA_LO)
            x = np.clip(x, 1e-6, 1 - 1e-6)
            return np.log(x / (1 - x))

        theta_quench = jnp.full((N_KNOTS,), logit(BETA_HI))
        theta_linear = jnp.asarray(logit(np.linspace(BETA_LO, BETA_HI,
                                                     N_KNOTS)))

        # Optimize with L-BFGS on the exact gradient (the adjoint pass
        # through all 800 RK5 sub-steps).
        def f_np(x):
            v, g = val_grad(jnp.asarray(x))
            return -float(v), -np.asarray(g)

        res = sopt.minimize(f_np, np.asarray(theta_linear), jac=True,
                            method="L-BFGS-B",
                            options={"maxiter": OPT_STEPS})
        theta_opt = jnp.asarray(res.x)

        rows = {}
        for name, th in [("quench", theta_quench),
                         ("linear", theta_linear),
                         ("optimized", theta_opt)]:
            ys = solve(th)
            ms = np.asarray([float(magnetization(y)) for y in ys])
            bs = np.asarray([float(beta_of(th, t)) for t in np.asarray(ts)])
            rows[name] = np.stack([bs, ms])
            print(f"{name:>10}: m(T) = {ms[-1]:+.6f}")
        assert rows["optimized"][1, -1] <= rows["linear"][1, -1] + 1e-9
        return np.stack([rows["quench"], rows["linear"],
                         rows["optimized"]])

    table = _common.cached(DATA_FILE, compute, key="protocols")
    names = ["instant quench", "linear ramp", "optimized"]
    colors = ["C3", "C0", "C2"]

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))
    tgrid = np.asarray(ts)
    for row, name, c in zip(table, names, colors):
        ax1.plot(tgrid, row[0], "-o", ms=3, color=c, label=name)
        ax2.plot(tgrid, row[1], "-o", ms=3, color=c,
                 label=f"{name}: m(T)={row[1, -1]:+.4f}")
    ax1.set_xlabel("t")
    ax1.set_ylabel(r"$\beta(t)$")
    ax1.set_title("annealing schedules")
    ax1.legend(fontsize=13)
    ax1.grid(alpha=0.3)
    ax2.set_xlabel("t")
    ax2.set_ylabel(r"$m(t)$")
    ax2.set_title(f"order reached in T={T_FINAL:g} "
                  f"(τ_eq(β={BETA_HI}) ≈ 986)")
    ax2.legend(fontsize=13)
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(_common.out_path("ex2_optimal_annealing.pdf"))
    print("wrote", _common.out_path("ex2_optimal_annealing.pdf"))


if __name__ == "__main__":
    main()
