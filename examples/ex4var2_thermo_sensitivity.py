"""Thermodynamic sensitivity of program execution (parametric ex4var2).

The detachable-evaluator machine's rates all derive from a free-enthalpy
landscape — seven G levels plus beta (`problems.scm:310-347`). The
parametric registration (`ex4var2-chemical-turing-p`) keeps that
landscape as runtime parameters, so one reverse-mode pass through
compile tables + solve yields d(execution observables)/d(G_species) for
every species at once: which thermodynamic knob moves the machine's
output distribution, and by how much.

The reference cannot ask this question — its rate tables are baked into
a compiled Scheme closure at registration (`problems.scm:310-347`), and
finite differences over 8 parameters would cost 16 full re-registrations
+ solves. Here it is one jitted adjoint per observable.

Output: `ex4var2_thermo_sensitivity.pdf` — d log p(obs)/d theta bars for
an output-pattern window (IOIO), the evaluator-bearing window (IIII),
and spent-fuel marginal p(X) at t = T_MAX, plus the printed table.
"""

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.engine.dsl import get_problem
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_v2_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.fixed import odeint_fixed
from chemical_kinetics_and_program_execution_tpu.ops.observables import (
    seq_prob_projector,
)

TAG = "ex4var2-chemical-turing-p"
CL_K = 4
T_MAX = 100.0
N_SUB = 100  # RK5 sub-steps per sample interval (dt = 0.09)
DATA_FILE = "ex4var2_thermo_sensitivity.npz"

SYMS = "ABCDIOPXSE"
OBSERVABLES = [  # (label, symbol window)
    ("p(IOIO)", "IOIO"),  # alternating machine output
    ("p(IIII)", "IIII"),  # all-I output run
    ("p(X)", "X"),  # spent fuel
]


def main():
    import jax
    import jax.numpy as jnp

    problem = get_problem(TAG)
    defaults = {k: jnp.asarray(v, jnp.float64)
                for k, v in problem.param_defaults.items()}
    names = sorted(defaults)

    def compute():
        pd = parametric.ParametricDense(TAG, CL_K)
        p0 = jnp.asarray(chemical_turing_v2_p0(CL_K).ravel())
        ts = jnp.linspace(0.0, T_MAX, 11)
        project = seq_prob_projector(
            [[SYMS.index(c) for c in seq] for _, seq in OBSERVABLES],
            problem.size_a, CL_K)

        def final_obs(prm):
            ys = odeint_fixed(lambda y, t, w: pd.dy_dt(y, w), p0, ts,
                              n_sub=N_SUB, args=pd.consts(prm))
            return project(ys[-1:])[0]

        # One jitted jacrev: d log p(obs_j) / d theta_k for all (j, k)
        # in a single compiled adjoint program; has_aux returns the
        # primal observables from the same forward pass (no second
        # solve).
        def log_obs(prm):
            v = final_obs(prm)
            return jnp.log(v), v

        jac, vals_dev = jax.jit(jax.jacrev(log_obs, has_aux=True))(defaults)
        vals = np.asarray(vals_dev)
        rows = []
        for j, (label, _) in enumerate(OBSERVABLES):
            row = [float(jac[k][j]) for k in names]
            rows.append((float(vals[j]), row))
            print(f"{label} = {vals[j]:.6g};  "
                  + ", ".join(f"dlog/d{k} = {g:+.3e}"
                              for k, g in zip(names, row)))
        return np.asarray([[v] + g for v, g in rows])

    table = _common.cached(DATA_FILE, compute, key="sens")
    values, grads = table[:, 0], table[:, 1:]

    fig, ax = _common.pyplot.subplots(figsize=(12, 6))
    width = 0.8 / len(OBSERVABLES)
    x = np.arange(len(names))
    for j, (label, _) in enumerate(OBSERVABLES):
        ax.bar(x + (j - 1) * width, grads[j], width,
               label=f"{label} = {values[j]:.3g}")
    ax.set_xticks(x)
    ax.set_xticklabels([n.replace("G_", "G(") .rstrip() + ")"
                        if n.startswith("G_") else n for n in names])
    ax.axhline(0.0, color="k", lw=0.8)
    ax.set_ylabel(r"$\partial \log p_{\rm obs}(T) / \partial \theta$")
    ax.set_title(f"ex4var2 free-enthalpy sensitivities, "
                 f"cl_k={CL_K}, T={T_MAX:g}")
    ax.legend()
    ax.grid(True, axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(_common.out_path("ex4var2_thermo_sensitivity.pdf"))
    print("wrote", _common.out_path("ex4var2_thermo_sensitivity.pdf"))


if __name__ == "__main__":
    main()
