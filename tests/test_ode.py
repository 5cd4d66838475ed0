"""ODE solver tests: closed forms, scipy parity, end-to-end decay."""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve


def test_dopri5_exponential_decay():
    import jax.numpy as jnp

    ts = np.linspace(0.0, 5.0, 51)
    ys = solve(lambda y, t: -y, jnp.array([1.0, 2.0]), ts,
               rtol=1e-10, atol=1e-12)
    want = np.exp(-ts)[:, None] * np.array([1.0, 2.0])
    np.testing.assert_allclose(ys, want, rtol=1e-8, atol=1e-10)


def test_dopri5_harmonic_oscillator():
    import jax.numpy as jnp

    def rhs(y, t):
        return jnp.stack([y[1], -y[0]])

    ts = np.linspace(0.0, 10.0, 101)
    ys = solve(rhs, jnp.array([1.0, 0.0]), ts, rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(ys[:, 0], np.cos(ts), atol=1e-8)
    np.testing.assert_allclose(ys[:, 1], -np.sin(ts), atol=1e-8)


def test_dopri5_nonautonomous():
    ts = np.linspace(0.0, 2.0, 21)
    ys = solve(lambda y, t: 2 * t * y, np.array([1.0]), ts,
               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ys[:, 0], np.exp(ts**2), rtol=1e-7)


def test_dop853_tight_tolerance_oscillator():
    """DOP853 at 1e-13 (the reference's ex4/ex5 setting) over many
    periods: phase error must stay at the 1e-10 level."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.ode.dop853 import (
        odeint_dop853,
    )

    def rhs(y, t):
        return jnp.stack([y[1], -y[0]])

    ts = np.linspace(0.0, 20.0, 41)
    ys, info = odeint_dop853(rhs, jnp.array([1.0, 0.0]), ts,
                             (1e-13, 1e-13))
    assert bool(info["completed"])
    np.testing.assert_allclose(ys[:, 0], np.cos(ts), atol=5e-11)
    # 8th order: far fewer steps than dopri5 at the same tolerance.
    from chemical_kinetics_and_program_execution_tpu.ode.dopri5 import (
        odeint_dopri5,
    )

    _, info5 = odeint_dopri5(rhs, jnp.array([1.0, 0.0]), ts,
                             (1e-13, 1e-13))
    assert int(info["num_accepted"]) < int(info5["num_accepted"]) / 3


def test_solve_method_routing():
    ts = np.linspace(0.0, 1.0, 5)
    for method in (None, "dopri5", "dop853", "DOP853"):
        ys = solve(lambda y, t: -y, np.array([1.0]), ts, rtol=1e-12,
                   atol=1e-12, method=method)
        np.testing.assert_allclose(ys[:, 0], np.exp(-ts), rtol=1e-9)


def test_radioactive_decay_end_to_end_backends_agree():
    """ex1 at uniform p0: p(B) decays exponentially; the jax and scipy
    solver backends must agree on the full SPD trajectory."""
    p0 = np.full(8, 0.125)
    ts = np.linspace(0.0, 3.0, 31)
    kwargs = dict(tag="ex1-radioactive-decay", size_a=2, cl_k=3,
                  p0=p0, ts=ts)
    ys_scipy = markov_tapes.ode_integrate(
        odeint_kwargs=dict(rtol=1e-10, atol=1e-12), **kwargs)
    ys_jax = markov_tapes.ode_integrate(
        odeint_kwargs=dict(rtol=1e-10, atol=1e-12), backend="jax", **kwargs)
    np.testing.assert_allclose(ys_jax, ys_scipy, rtol=1e-6, atol=1e-9)
    # p(B at a site) = marginal of windows with middle symbol B; for the
    # decay rule it follows exp(-t) exactly.
    from chemical_kinetics_and_program_execution_tpu.markov import seq_prob

    p_b = np.array([seq_prob(y.reshape(2, 2, 2), (1,))[0] for y in ys_jax])
    np.testing.assert_allclose(p_b, 0.5 * np.exp(-ts), rtol=1e-6)


def test_dop853_scipy_parity_on_spd_at_1e13():
    """On-device DOP853 vs scipy's DOP853 at rtol/atol 1e-13 on a real
    SPD trajectory (SURVEY §7.3 hard part #5; the reference's ex4/ex5
    solves all run at this tolerance, `ex4_chemical_turing.py:109-116`)."""
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E501
        copolymerization_p0,
    )

    cl_k = 4
    p0 = copolymerization_p0(cl_k).ravel()
    ts = np.linspace(0.0, 50.0, 26)
    kwargs = dict(tag="ex3-copolymerization", size_a=4, cl_k=cl_k,
                  p0=p0, ts=ts,
                  ivp_kwargs=dict(rtol=1e-13, atol=1e-13, method="DOP853"))
    ys_jax = markov_tapes.ode_integrate_ivp(backend="jax", **kwargs)
    ys_scipy = markov_tapes.ode_integrate_ivp(backend="scipy", **kwargs)
    dev = np.abs(ys_jax - ys_scipy).max()
    assert dev <= 1e-9, f"max trajectory deviation {dev:.3e} > 1e-9"


def test_dense_output_matches_step_clamped_with_fewer_steps():
    """The dense-output stepper must reproduce the step-clamped DOP853
    trajectory while taking fewer steps on a dense sample grid."""
    from chemical_kinetics_and_program_execution_tpu import build_dy_dt

    fn, prog = build_dy_dt("ex2-ferromagnetic-chain", 4)
    rhs = lambda y, t: fn(y)  # noqa: E731
    p0 = np.full(prog.state_size, 1.0 / prog.state_size)
    ts = np.linspace(0.0, 20.0, 801)  # dense grid: clamping binds
    kwargs = dict(rtol=1e-12, atol=1e-12, return_info=True)
    ys_dense, info_dense = solve(rhs, p0, ts, method="dop853", **kwargs)
    ys_step, info_step = solve(rhs, p0, ts, method="dop853-step", **kwargs)
    np.testing.assert_allclose(ys_dense, ys_step, rtol=1e-8, atol=1e-12)
    assert info_dense["num_accepted"] < info_step["num_accepted"] / 2


def test_chunked_solve_matches_unchunked():
    """Chunked device calls (bounded program duration on tunnelled TPUs)
    must reproduce the single-call solve to solver accuracy."""
    p0 = np.full(8, 0.125)
    ts = np.linspace(0.0, 3.0, 31)
    kwargs = dict(tag="ex1-radioactive-decay", size_a=2, cl_k=3,
                  p0=p0, ts=ts)
    full = markov_tapes.ode_integrate_ivp(
        backend="jax",
        ivp_kwargs=dict(rtol=1e-12, atol=1e-12, method="DOP853"), **kwargs)
    for chunk in (7, 10, 5):  # 10 and 5 divide n_out-1: boundary cases
        chunked = markov_tapes.ode_integrate_ivp(
            backend="jax",
            ivp_kwargs=dict(rtol=1e-12, atol=1e-12, method="DOP853",
                            chunk_size=chunk), **kwargs)
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked, full, rtol=1e-9, atol=1e-11)


def test_chunked_dense_solve_uses_one_chunk_shape(monkeypatch):
    """Dense-output chunking pads every device call to one static sample
    count so the solve compiles a single program (first/middle/last
    chunks previously had three distinct shapes)."""
    from chemical_kinetics_and_program_execution_tpu.ode import integrate

    seen = []
    real = integrate.odeint_dop853_dense

    def spy(fn, y0, ts, tols, **kw):
        seen.append(len(ts))
        return real(fn, y0, ts, tols, **kw)

    monkeypatch.setattr(integrate, "odeint_dop853_dense", spy)
    from chemical_kinetics_and_program_execution_tpu import (
        build_dy_dt,
    )
    fn, _ = build_dy_dt("ex1-radioactive-decay", 3)
    integrate.solve(lambda y, t: fn(y), np.full(8, 0.125),
                    np.linspace(0, 3, 31), rtol=1e-12, atol=1e-12,
                    method="dop853", chunk_size=7)
    assert len(seen) > 1 and len(set(seen)) == 1


def test_checkpointed_solve_resumes_after_crash(tmp_path):
    """A chunked solve killed mid-way must resume from its checkpoint
    and produce the same trajectory as an uninterrupted run."""
    from chemical_kinetics_and_program_execution_tpu import build_dy_dt

    fn, _ = build_dy_dt("ex1-radioactive-decay", 3)
    rhs = lambda y, t: fn(y)  # noqa: E731
    p0 = np.full(8, 0.125)
    ts = np.linspace(0.0, 3.0, 31)
    kwargs = dict(rtol=1e-10, atol=1e-12, chunk_size=7)
    full = solve(rhs, p0, ts, **kwargs)

    ckpt = str(tmp_path / "solve.npy")
    from chemical_kinetics_and_program_execution_tpu.ode import (
        integrate as integ,
    )

    calls = {"n": 0}
    orig_stepper = integ.odeint_dop853_dense

    def crashing_stepper(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:  # die after two completed chunks
            raise KeyboardInterrupt
        return orig_stepper(*a, **k)

    integ.odeint_dop853_dense = crashing_stepper
    try:
        with pytest.raises(KeyboardInterrupt):
            solve(rhs, p0, ts, checkpoint_path=ckpt, **kwargs)
    finally:
        integ.odeint_dop853_dense = orig_stepper
    assert (tmp_path / "solve.npy").exists()  # partial state persisted

    counting = {"n": 0}

    def counting_stepper(*a, **k):
        counting["n"] += 1
        return orig_stepper(*a, **k)

    integ.odeint_dop853_dense = counting_stepper
    try:
        resumed = solve(rhs, p0, ts, checkpoint_path=ckpt, **kwargs)
    finally:
        integ.odeint_dop853_dense = orig_stepper
    np.testing.assert_allclose(resumed, full, rtol=1e-9, atol=1e-12)
    assert counting["n"] == 3  # 5 chunks total, 2 done pre-crash
    assert not (tmp_path / "solve.npy").exists()  # cleaned up on success


def test_ode_integrate_validates_p0():
    with pytest.raises(ValueError, match="not a subsequence probability"):
        markov_tapes.ode_integrate(
            tag="ex1-radioactive-decay", size_a=2, cl_k=3,
            p0=np.full(8, 0.25), ts=np.linspace(0, 1, 3))


def test_projected_solve_matches_full_solve(tmp_path):
    """`project=` must yield exactly the observables of the full solve
    (the projection is linear, so projecting per chunk on device and
    projecting the full trajectory post-hoc commute), including through
    a crash/resume cycle where the full carry state rides a sidecar."""
    from chemical_kinetics_and_program_execution_tpu import build_dy_dt
    from chemical_kinetics_and_program_execution_tpu.markov import seq_prob
    from chemical_kinetics_and_program_execution_tpu.ops.observables import (
        seq_prob_projector,
    )

    fn, _ = build_dy_dt("ex2-ferromagnetic-chain", 4)
    rhs = lambda y, t: fn(y)  # noqa: E731
    p0 = np.zeros(16)
    p0[0] = 0.9
    p0[3] = p0[12] = 0.05
    ts = np.linspace(0.0, 2.0, 31)
    seqs = [(1,), (1, 1), (0, 1, 1, 0)]
    proj = seq_prob_projector(seqs, 2, 4)
    kwargs = dict(rtol=1e-11, atol=1e-12, chunk_size=7, method="dop853")

    full = solve(rhs, p0, ts, **kwargs)
    obs, info = solve(rhs, p0, ts, project=proj, return_info=True,
                      **kwargs)
    assert obs.shape == (31, 3)
    np.testing.assert_allclose(info["y_final"], full[-1], rtol=1e-12)
    for j, s in enumerate(seqs):
        want = [seq_prob(p.reshape([2] * 4), s)[0] for p in full]
        np.testing.assert_allclose(obs[:, j], want, rtol=1e-9,
                                   atol=1e-15)

    # Crash after two chunks, then resume: identical observables.
    from chemical_kinetics_and_program_execution_tpu.ode import (
        integrate as integ,
    )

    ckpt = str(tmp_path / "proj.npy")
    orig_stepper = integ.odeint_dop853_dense
    calls = {"n": 0}

    def crashing_stepper(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise KeyboardInterrupt
        return orig_stepper(*a, **k)

    integ.odeint_dop853_dense = crashing_stepper
    try:
        with pytest.raises(KeyboardInterrupt):
            solve(rhs, p0, ts, project=proj, checkpoint_path=ckpt,
                  **kwargs)
    finally:
        integ.odeint_dop853_dense = orig_stepper
    assert (tmp_path / "proj.npy.y.npy").exists()  # full-state sidecar
    resumed = solve(rhs, p0, ts, project=proj, checkpoint_path=ckpt,
                    **kwargs)
    np.testing.assert_allclose(resumed, obs, rtol=1e-9, atol=1e-15)
    assert not (tmp_path / "proj.npy.y.npy").exists()


def test_kvaerno3_robertson_stiff_vs_radau():
    """The on-device stiff solver (L-stable Kvaerno 3(2), Newton-Krylov)
    must handle the Robertson problem — rate constants spanning 9 orders
    of magnitude, the canonical stiffness benchmark an explicit RK
    cannot integrate to t=1e4 in bounded steps — and agree with scipy's
    Radau. The reference's default LSODA (framework/markov_tapes.py:318)
    switches to BDF on such problems; this is the TPU-native
    equivalent."""
    import jax.numpy as jnp
    import scipy.integrate

    from chemical_kinetics_and_program_execution_tpu.ode.kvaerno3 import (
        odeint_kvaerno3,
    )

    def rob(y, t):
        d1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
        d3 = 3e7 * y[1] * y[1]
        return jnp.stack([d1, -d1 - d3, d3])

    ts = np.array([0.0, 1e-2, 1.0, 1e2, 1e4])
    y0 = np.array([1.0, 0.0, 0.0])
    ys, info = odeint_kvaerno3(rob, jnp.asarray(y0), jnp.asarray(ts),
                               (1e-8, 1e-10))
    assert bool(info["completed"])
    # Stiffness handled: step count must be ~1e3, not the ~1e9 an
    # explicit method's stability limit (h ~ 1/(3e7*y2)) would force.
    assert int(info["num_accepted"]) < 10_000

    ref = scipy.integrate.solve_ivp(
        lambda t, y: np.asarray(rob(y, t)), (0, 1e4), y0, t_eval=ts,
        rtol=1e-10, atol=1e-12, method="Radau").y.T
    np.testing.assert_allclose(np.asarray(ys)[1:], ref[1:], rtol=1e-6,
                               atol=1e-12)


def test_kvaerno3_spd_parity_with_explicit():
    """On a (non-stiff) SPD problem the stiff stepper must reproduce the
    explicit solver's trajectory — same RHS, same answer."""
    from chemical_kinetics_and_program_execution_tpu import (
        build_dy_dt,
        markov_tapes as mt,
    )

    tag, size_a, cl_k = "ex2-ferromagnetic-chain", 2, 3
    fn, prog = build_dy_dt(tag, cl_k)
    p0 = np.full(size_a**cl_k, 1.0 / size_a**cl_k)
    ts = np.linspace(0.0, 3.0, 7)
    ys_exp = solve(lambda y, t: fn(y), p0, ts, rtol=1e-10, atol=1e-12)
    ys_stiff = solve(lambda y, t: fn(y), p0, ts, rtol=1e-8, atol=1e-10,
                     method="kvaerno3")
    np.testing.assert_allclose(ys_stiff, ys_exp, rtol=2e-6, atol=1e-9)
    # Probability conservation through the implicit steps.
    np.testing.assert_allclose(ys_stiff.sum(axis=1), 1.0, rtol=1e-7)


def test_stiff_method_name_routing():
    """scipy-style stiff method names route to the on-device stiff
    stepper on the jax backend."""
    from chemical_kinetics_and_program_execution_tpu.ode import integrate

    for name in ("lsoda", "radau", "bdf", "kvaerno3"):
        assert integrate._STEPPERS[name] == "odeint_kvaerno3"


def test_fixed_grid_matches_adaptive_on_spd():
    """The differentiable fixed-grid RK5 reproduces the adaptive dop853
    answer on a branching SPD workload (ex2, cl_k=4)."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        build_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.models import (
        initial_states,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.dop853 import (
        odeint_dop853,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        odeint_fixed,
    )

    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", 4)
    fn = lambda y, t: dfn(y)  # noqa: E731
    p0 = initial_states.ferromagnet_p0(4, corrected=True).ravel()
    ts = np.linspace(0.0, 20.0, 11)
    ys_fixed = odeint_fixed(fn, p0, ts, n_sub=16)
    ys_adapt, _ = odeint_dop853(
        fn, jnp.asarray(p0), jnp.asarray(ts), (1e-12, 1e-14))
    np.testing.assert_allclose(ys_fixed, ys_adapt, rtol=1e-8, atol=1e-11)
    # Conservation holds on the fixed grid too.
    np.testing.assert_allclose(np.asarray(ys_fixed).sum(axis=1), 1.0,
                               rtol=1e-12)


def test_fixed_grid_gradient_matches_finite_differences():
    """jax.grad through a full solve agrees with central finite
    differences — the adjoint path the reference cannot provide."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        build_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        grad_observable, odeint_fixed,
    )

    dfn, _ = build_dy_dt("ex1-radioactive-decay", 3)
    fn = lambda y, t: dfn(y)  # noqa: E731
    p0 = np.full(8, 0.125)
    ts = np.linspace(0.0, 2.0, 11)
    obs = lambda y: jnp.sum(y**2)  # noqa: E731
    _, g = grad_observable(fn, jnp.asarray(p0), jnp.asarray(ts), obs, 8)
    eps = 1e-6
    g_fd = np.zeros(8)
    for i in range(8):
        pp = p0.copy()
        pp[i] += eps
        pm = p0.copy()
        pm[i] -= eps
        g_fd[i] = (
            float(obs(odeint_fixed(fn, pp, ts, 8)[-1]))
            - float(obs(odeint_fixed(fn, pm, ts, 8)[-1]))
        ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-6, atol=1e-9)


def test_inverse_design_recovers_pair_density():
    """End-to-end inverse design: gradient descent through the solve
    recovers the pair density that produced a target observable."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import (
        build_dy_dt,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.fixed import (
        odeint_fixed,
    )

    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (  # noqa: E501
        ferromagnet_p0_traced,
    )

    cl_k = 4
    dfn, _ = build_dy_dt("ex2-ferromagnetic-chain", cl_k)
    fn = lambda y, t: dfn(y)  # noqa: E731
    ts = jnp.linspace(0.0, 10.0, 6)

    def final_uu(p_pair):
        ys = odeint_fixed(fn, ferromagnet_p0_traced(cl_k, p_pair), ts,
                          n_sub=8)
        return ys[-1, 0b0110]  # p(DUUD)

    target_pair = 0.013
    target = final_uu(target_pair)

    # Newton on the squared residual: x -= 2v/g (g = d/dx (f-target)^2).
    loss = jax.jit(jax.value_and_grad(
        lambda x: (final_uu(x) - target) ** 2))
    x = jnp.asarray(0.005, jnp.float64)
    for _ in range(40):
        v, g = loss(x)
        if float(v) < 1e-24:
            break
        x = jnp.clip(x - 2.0 * v / g, 1e-4, 0.05)
    assert abs(float(x) - target_pair) < 1e-5


def test_streamed_dop853_matches_jitted():
    """The host-driven device-resident DOP853 (`ode/streamed_solve.py`,
    the cl_k=8 solve driver) mirrors the jitted dense-output stepper's
    tableau and controller exactly, so on the same RHS both must walk
    essentially the same step sequence — the reduced-scale CI twin the
    round-4 verdict asked for (the k8 solve loop itself runs only on
    the accelerator)."""
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        chemical_turing_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.dop853 import (
        odeint_dop853_dense,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.streamed_solve import (
        dop853_streamed,
    )

    prog = dense.compile_dense("ex4-chemical-turing", 3)
    fn = dense.make_dense_dy_dt(prog)
    y0 = chemical_turing_p0(3, powered_fraction=0.04).ravel()
    ts = np.linspace(0.0, 50.0, 6)
    tols = (1e-10, 1e-14)

    want, info = odeint_dop853_dense(lambda y, t: fn(y), jnp.asarray(y0),
                                     jnp.asarray(ts), tols)
    want = np.asarray(want)

    samples, y_fin, stats = dop853_streamed(
        fn, y0, 0.0, 50.0, rtol=tols[0], atol=tols[1],
        sample_ts=ts[1:])
    got = np.stack([np.asarray(s) for s in samples])
    # Same tableau + same controller arithmetic -> near-identical
    # trajectories; the loose bound guards against platform-dependent
    # reduction orders in the error norms.
    np.testing.assert_allclose(got, want[1:], rtol=0, atol=1e-12)
    assert stats.n_accepted > 3
    np.testing.assert_allclose(np.asarray(y_fin), want[-1], atol=1e-12)


def test_streamed_dop853_checkpoint_resume():
    """Interrupting the streamed driver at a checkpoint and resuming
    from (t, y, h) must reproduce the uninterrupted samples — the
    reduced-scale twin of `probes/clk8_solve.py`'s crash-resume path."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
        chemical_turing_p0,
    )
    from chemical_kinetics_and_program_execution_tpu.ode.streamed_solve import (
        dop853_streamed,
    )

    prog = dense.compile_dense("ex4-chemical-turing", 3)
    fn = dense.make_dense_dy_dt(prog)
    y0 = chemical_turing_p0(3, powered_fraction=0.04).ravel()
    ts = np.linspace(0.0, 50.0, 6)

    full, _, _ = dop853_streamed(fn, y0, 0.0, 50.0, rtol=1e-10,
                                 atol=1e-14, sample_ts=ts[1:])

    class Stop(Exception):
        pass

    ckpt = {}

    def on_step(t, y_dev, h, next_i):
        ckpt.update(t=t, y=np.asarray(y_dev), h=h, next_i=next_i)
        if next_i >= 2:  # crash after the second sample lands
            raise Stop

    part = None
    try:
        dop853_streamed(fn, y0, 0.0, 50.0, rtol=1e-10, atol=1e-14,
                        sample_ts=ts[1:], on_step=on_step)
    except Stop:
        part = ckpt

    assert part is not None and part["next_i"] >= 2
    rest, _, _ = dop853_streamed(
        fn, part["y"], part["t"], 50.0, rtol=1e-10, atol=1e-14,
        sample_ts=ts[1:], h0=part["h"])
    # Samples before the crash were already recorded; the resumed run
    # must fill the remainder identically to the uninterrupted solve.
    for i in range(part["next_i"], len(ts) - 1):
        np.testing.assert_allclose(np.asarray(rest[i]),
                                   np.asarray(full[i]), rtol=0,
                                   atol=1e-12)
