"""Inverse design of the ferromagnet initial state by autodiff.

A capability demo beyond the reference's reach: because the whole
solve — compiled multiverse RHS + fixed-grid RK5 (`ode/fixed.py`) — is
differentiable JAX, `jax.grad` gives exact sensitivities of any final
observable to the initial distribution, and gradient descent through
the ODE recovers the initial pair density that produces a prescribed
final island probability. The reference (Gambit-C RHS behind a ctypes
FFI + scipy, `framework/markov_tapes.py:292-354`) cannot form this
gradient at all; finite differences would cost one full solve per
parameter per iteration and carry truncation noise.

Panels:
  left  — Newton convergence of the recovered pair density (|error| vs
          iteration, machine-precision floor in ~5 steps);
  right — p(DUUD)(t) for the initial guess, the recovered optimum, and
          the hidden target (optimum and target coincide).
"""

import time

import numpy as np

import _common
from _common import finish, new_fig
from chemical_kinetics_and_program_execution_tpu.engine import build_dy_dt
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0_traced,
)
from chemical_kinetics_and_program_execution_tpu.ode.fixed import odeint_fixed

CL_K = 5
T_MAX = 30.0
TARGET_PAIR = 1 / 77.0   # the "hidden" design parameter to recover
GUESS_PAIR = 1 / 500.0


def main():
    import jax
    import jax.numpy as jnp

    dfn, prog = build_dy_dt("ex2-ferromagnetic-chain", CL_K)
    fn = lambda y, t: dfn(y)  # noqa: E731
    ts = jnp.linspace(0.0, T_MAX, 61)
    obs_idx = 0b01100  # DUUD window at the left of the cl_k=5 frame

    def solve(p_pair):
        return odeint_fixed(fn, ferromagnet_p0_traced(CL_K, p_pair), ts,
                            n_sub=8)

    def final_obs(p_pair):
        return solve(p_pair)[-1, obs_idx]

    target = final_obs(TARGET_PAIR)
    print(f"target p(DUUD)(t={T_MAX:g}) = {float(target):.12g} "
          f"(from hidden p_pair = {TARGET_PAIR:.6g})")

    # Newton on the squared residual through the full solve:
    # v = (f(x)-target)^2, step x -= 2v/g with g = dv/dx.
    loss = jax.jit(jax.value_and_grad(
        lambda x: (final_obs(x) - target) ** 2))
    x = jnp.asarray(GUESS_PAIR, jnp.float64)
    errors, xs = [abs(float(x) - TARGET_PAIR)], [float(x)]
    t0 = time.time()
    for it in range(12):
        v, g = loss(x)
        if float(v) < 1e-28:
            break
        x = jnp.clip(x - 2.0 * v / g, 1e-5, 0.2)
        xs.append(float(x))
        errors.append(abs(float(x) - TARGET_PAIR))
        print(f"  iter {it}: p_pair = {float(x):.12g}  "
              f"|err| = {errors[-1]:.3e}  loss = {float(v):.3e}")
    dt = time.time() - t0
    print(f"recovered p_pair = {float(x):.12g} "
          f"(true {TARGET_PAIR:.12g}) in {len(xs) - 1} Newton steps, "
          f"{dt:.1f}s total ({dt / max(len(xs) - 1, 1):.2f}s per "
          f"solve+adjoint)")

    ys_guess = np.asarray(solve(GUESS_PAIR))
    ys_opt = np.asarray(solve(float(x)))
    ys_target = np.asarray(solve(TARGET_PAIR))
    ts_np = np.asarray(ts)

    fig, (ax1, ax2) = _common.pyplot.subplots(
        1, 2, figsize=(16, 8))
    ax1.semilogy(range(len(errors)), errors, "o-")
    ax1.set_xlabel("Newton iteration")
    ax1.set_ylabel(r"$|p_{pair} - p_{pair}^*|$")
    ax1.grid(True)
    ax1.set_title("parameter recovery through the ODE adjoint")

    ax2.plot(ts_np, ys_guess[:, obs_idx], "--", label="initial guess")
    ax2.plot(ts_np, ys_opt[:, obs_idx], "-", lw=3, label="recovered")
    ax2.plot(ts_np, ys_target[:, obs_idx], ":", lw=3, label="target")
    ax2.set_xlabel("time")
    ax2.set_ylabel("p(DUUD)")
    ax2.grid(True)
    ax2.legend()
    ax2.set_title(f"ex2 ferromagnet, cl_k={CL_K}")

    fig.tight_layout()
    out = _common.out_path("ex2_inverse_design.pdf")
    fig.savefig(out)
    print(f"wrote {out}")

    assert abs(float(x) - TARGET_PAIR) < 1e-6, "recovery failed"


if __name__ == "__main__":
    main()
