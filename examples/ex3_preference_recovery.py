"""Recovery of the copolymer alternation preference from strand
statistics, by autodiff through the multiverse compile.

ex3var1 rejects same-comonomer additions with probability q (the
reference bakes 75% into its choose weights, `problems.scm:89-126`);
the parametric registration `ex3var1-copolymerization-p` exposes q as
a runtime rate parameter. The preference is exactly the kind of
microscopic constant an experiment cannot see directly — what IS
observable is the copolymer's sequence statistics. Deposits always bond the program
monomer to a strand A (the compatibility gate), so comonomer PAIRS
like MM never form — the preference lives in the TRIADS: q suppresses
M-A-M relative to M-A-N. We observe the p(MAM)/p(MAN) trajectory
generated at a hidden q* and recover q* by Newton through compile
tables + fixed-grid solve + adjoint — the ex3-family twin of
`ex2_rate_recovery.py`, and a question (infer the synthesis preference
from polymer statistics) the reference's baked-weights architecture
cannot pose.

Runs in ~1 min on one CPU.
"""

import time

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import parametric
from chemical_kinetics_and_program_execution_tpu.ode.fixed import odeint_fixed

TAG = "ex3var1-copolymerization-p"
CL_K, SIZE_A = 4, 4
T_MAX = 400.0
Q_TRUE = 0.62
Q_GUESS = 0.20


def main():
    import jax
    import jax.numpy as jnp

    pd = parametric.ParametricDense(TAG, CL_K)
    # iid soup with all three monomer species present (the dilute
    # isolated-monomer p0 gives the preference branch zero support
    # until chains form; starting iid reaches it immediately).
    p0 = jnp.asarray(_common.iid_spd(
        np.array([0.7, 0.1, 0.1, 0.1]), CL_K).ravel())
    ts = jnp.linspace(0.0, T_MAX, 41)

    def seq_idx(seq):
        r = 0
        for s in seq:
            r = r * SIZE_A + s
        return r

    A, M, N = 1, 2, 3
    mam = [seq_idx((M, A, M, b)) for b in range(4)]
    man = [seq_idx((M, A, N, b)) for b in range(4)]

    # One RHS object for every solve: odeint_fixed keys its jit cache
    # on the function's identity, so a fresh lambda per call would
    # recompile the whole RK program each time.
    rhs = lambda y, t, w: pd.dy_dt(y, w)

    def traj(q):
        ys = odeint_fixed(rhs, p0, ts,
                          n_sub=8, args=pd.consts({"q_reject": q}))
        # alternation triad ratio p(MAM)/p(MAN) along the trajectory
        return ys[:, mam].sum(axis=1) / ys[:, man].sum(axis=1)

    target = traj(jnp.asarray(Q_TRUE, jnp.float64))
    print(f"observed p(MAM)/p(MAN) trajectory, final = "
          f"{float(target[-1]):.10g} (hidden q* = {Q_TRUE})")

    def loss_fn(q):
        return jnp.sum((traj(q) - target) ** 2)

    g_fn = jax.grad(loss_fn)
    step = jax.jit(lambda q: (loss_fn(q), g_fn(q),
                              jax.grad(lambda x: g_fn(x))(q)))
    q = jnp.asarray(Q_GUESS, jnp.float64)
    t0 = time.time()
    errs = [abs(float(q) - Q_TRUE)]
    for it in range(20):
        v, g, h = step(q)
        if float(v) < 1e-26:
            break
        dq = jnp.where(h > 0, g / h, jnp.sign(g) * 0.1)
        q = jnp.clip(q - dq, 0.01, 0.99)
        errs.append(abs(float(q) - Q_TRUE))
        print(f"  iter {it}: q = {float(q):.10g}  |err| = "
              f"{errs[-1]:.3e}  loss = {float(v):.3e}")
    print(f"recovered q = {float(q):.10g} (true {Q_TRUE}) in "
          f"{len(errs) - 1} Newton steps, {time.time() - t0:.1f}s")
    assert errs[-1] < 1e-6, errs[-1]

    # Figure: the observable's q-dependence and the recovery path.
    fig, ax = _common.pyplot.subplots(figsize=(10, 7))
    for qv, style in ((0.2, "--"), (Q_TRUE, "-"), (0.9, ":")):
        r = np.asarray(traj(jnp.asarray(qv, jnp.float64)))
        ax.plot(np.asarray(ts), r, style,
                label=f"p(MAM)/p(MAN) at q = {qv}")
    ax.set_xlabel("t")
    ax.set_ylabel("same-comonomer triad ratio")
    ax.set_title("ex3var1: alternation preference is identifiable "
                 "from strand statistics")
    ax.legend(fontsize=11)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    out = _common.out_path("ex3_preference_recovery.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
