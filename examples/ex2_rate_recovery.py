"""Recovery of a reaction-rate parameter by autodiff through the
multiverse compile (`engine/parametric.py`).

Sequel to `ex2_inverse_design.py` (which differentiates w.r.t. the
initial state): here the gradient flows into the RULE itself. The
parametric ex2 ferromagnet declares (J, h, beta) as runtime rate
parameters; each enumerated world's choose-weight product is rebuilt as
a traced function of them, so d(trajectory)/d(beta) is exact
reverse-mode — no recompilation, no finite differences. We observe a
single final-time island probability generated at a hidden inverse
temperature beta* and recover beta* by Newton through compile tables +
fixed-grid solve + adjoint.

The reference consumes choose weights inside its Scheme interpreter
(`tape_multiverse.scm:594-626`) — a rate gradient of this kind is not
expressible there at any cost.
"""

import time

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.fixed import odeint_fixed

TAG = "ex2-ferromagnetic-chain-p"
CL_K = 4
T_MAX = 20.0
BETA_TRUE = 1.21
BETA_GUESS = 0.7


def main():
    import jax
    import jax.numpy as jnp

    pd = parametric.ParametricDense(TAG, CL_K)
    p0 = jnp.asarray(ferromagnet_p0(CL_K, p_pair=0.02,
                                    corrected=True).ravel())
    ts = jnp.linspace(0.0, T_MAX, 41)
    obs_idx = 0b0110  # DUUD island window

    def traj(beta):
        prm = {"J": 1.0, "h": -0.25, "beta": beta}
        ys = odeint_fixed(lambda y, t, w: pd.dy_dt(y, w), p0, ts,
                          n_sub=8, args=pd.consts(prm))
        return ys[:, obs_idx]

    # Fit the whole observed trajectory, not one point: a single
    # final-time probability is non-monotonic in beta (colder chains
    # align more but move slower), so distinct betas can cross at one t.
    # The trajectory pins beta uniquely.
    target = traj(jnp.asarray(BETA_TRUE, jnp.float64))
    print(f"observed p(DUUD)(t) trajectory, final = "
          f"{float(target[-1]):.12g} (hidden beta* = {BETA_TRUE})")

    # Also report the full sensitivity vector at the defaults — the
    # parameter-study one-liner.
    val, grads = parametric.rate_sensitivity(
        TAG, CL_K, np.asarray(p0), np.asarray(ts),
        lambda y: y[obs_idx], n_sub=8)
    print("sensitivities at defaults: "
          + ", ".join(f"d/d{k} = {float(v):+.4e}"
                      for k, v in sorted(grads.items())))

    # Newton on the gradient: second-order reverse-over-reverse AD
    # through compile tables + solve (loss, dloss/db, d2loss/db2 in one
    # jitted call).
    def loss_fn(b):
        return jnp.sum((traj(b) - target) ** 2)

    g_fn = jax.grad(loss_fn)
    step = jax.jit(lambda b: (loss_fn(b), g_fn(b), jax.grad(
        lambda x: g_fn(x))(b)))
    b = jnp.asarray(BETA_GUESS, jnp.float64)
    errors = [abs(float(b) - BETA_TRUE)]
    t0 = time.time()
    for it in range(20):
        v, g, h = step(b)
        if float(v) < 1e-28:
            break
        db = g / h
        db = jnp.where(h > 0, db, jnp.sign(g) * 0.2)  # fall back to
        # a damped descent step outside the convex basin
        b = jnp.clip(b - db, 0.1, 5.0)
        errors.append(abs(float(b) - BETA_TRUE))
        print(f"  iter {it}: beta = {float(b):.12g}  "
              f"|err| = {errors[-1]:.3e}  loss = {float(v):.3e}")
    dt = time.time() - t0
    print(f"recovered beta = {float(b):.12g} (true {BETA_TRUE}) "
          f"in {len(errors) - 1} Newton steps, {dt:.1f}s")

    fig, ax = _common.pyplot.subplots(figsize=(10, 7))
    ax.semilogy(range(len(errors)), errors, "o-")
    ax.set_xlabel("Newton iteration")
    ax.set_ylabel(r"$|\beta - \beta^*|$")
    ax.grid(True)
    ax.set_title("rate-constant recovery through the multiverse compile")
    fig.tight_layout()
    out = _common.out_path("ex2_rate_recovery.pdf")
    fig.savefig(out)
    print(f"wrote {out}")

    assert abs(float(b) - BETA_TRUE) < 1e-6, "recovery failed"


if __name__ == "__main__":
    main()
