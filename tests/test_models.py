"""Model-library tests: p0 builders, companion simulators (SURVEY §4.2/4.3)."""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import markov
from chemical_kinetics_and_program_execution_tpu.models import (
    autocatalysis,
    ferromagnet,
    gillespie,
    initial_states,
)


# --- Initial states ----------------------------------------------------------

@pytest.mark.parametrize("builder,kwargs", [
    (initial_states.ferromagnet_p0, dict(cl_k=5, p_pair=1 / 250)),
    (initial_states.ferromagnet_p0,
     dict(cl_k=5, p_pair=1 / 250, corrected=True)),
    (initial_states.copolymerization_p0, dict(cl_k=4)),
    (initial_states.chemical_turing_p0, dict(cl_k=3)),
    (initial_states.chemical_turing_p0, dict(cl_k=3, random01=True)),
    (initial_states.chemical_turing_v2_p0, dict(cl_k=3)),
    (initial_states.msrtf_p0, dict(cl_k=4)),
])
def test_p0_is_distribution(builder, kwargs):
    p0 = builder(**kwargs)
    assert (p0 >= 0).all()
    np.testing.assert_allclose(p0.sum(), 1.0, rtol=1e-12)


def test_copolymerization_p0_passes_eigen_gate():
    """The reference raises 'Impossible p0.' above 1e-10
    (`ex3_copolymerization.py:59-61`)."""
    p0 = initial_states.copolymerization_p0(4)
    delta, eigenspace = markov.get_ctm_eigenvalue1_eigenspace(p0)
    assert eigenspace is not None
    assert delta <= 1e-10


def test_msrtf_p0_passes_eigen_gate():
    p0 = initial_states.msrtf_p0(4)
    delta, _ = markov.get_ctm_eigenvalue1_eigenspace(p0)
    assert delta <= 1e-10


def test_ferromagnet_p0_structure():
    """The plain builder matches `ex2_ferromagnet_tape.py:43-52` (exactly
    marginal-consistent); the corrected one adds only the U..U boundary
    cross-term at p_pair² and renormalises through the all-D window
    (`:55-65`)."""
    cl_k, p_pair = 5, 1 / 250
    plain = initial_states.ferromagnet_p0(cl_k, p_pair).ravel()
    # Exactly 3 + (cl_k - 2) windows at p_pair: interior pairs + two
    # boundary halves.
    assert (plain == p_pair).sum() == cl_k + 1
    np.testing.assert_allclose(plain.sum(), 1.0)
    marg_dist = np.linalg.norm(
        plain.reshape([2] * cl_k).sum(axis=0).ravel()
        - plain.reshape([2] * cl_k).sum(axis=-1).ravel()
    )
    assert marg_dist < 1e-15

    fixed = initial_states.ferromagnet_p0(cl_k, p_pair, corrected=True)
    diff = fixed.ravel() - plain
    cross = (1 << (cl_k - 1)) | 1
    assert diff[cross] == p_pair**2
    np.testing.assert_allclose(diff[0], -(p_pair**2), atol=1e-18)
    np.testing.assert_allclose(fixed.sum(), 1.0)


# --- Autocatalysis ODE -------------------------------------------------------

def test_autocatalysis_conserves_mass_closed_reactor():
    """With c_add = c_remove = 0, total monomer count 2*[A]+2*[B]+[M]
    is a conserved quantity of the rate law."""
    row = np.array([0.0, 0.0, 1.0,
                    0.001, 20.0, 10.0, 0.001, 50.0, 20.0, 0.0, 0.0])
    ts = np.linspace(0, 50, 501)
    ys = autocatalysis.integrate_sweep(row[None], ts)[0]
    total = 2 * ys[:, 0] + 2 * ys[:, 1] + ys[:, 2]
    np.testing.assert_allclose(total, total[0], rtol=1e-7)


def test_autocatalysis_equilibrium_is_stationary():
    row = np.array([0.0, 0.0, 1.0,
                    0.05, 20.0, 10.0, 0.05, 25.0, 10.0, 1.0, 1.0])
    ts = np.linspace(0, 200, 201)
    ys = autocatalysis.integrate_sweep(row[None], ts)[0]
    y_eq, residual = autocatalysis.find_equilibrium(ys[-1], row[3:])
    assert residual < 1e-10


# --- Ferromagnet companion models --------------------------------------------

def test_analytic_island_populations_nonnegative_and_saturating():
    ys = ferromagnet.analytic_p_history(t_max=40.0, t_steps=101)
    assert (ys >= 0).all()
    # Under h<0 the up-islands melt towards a small quasi-equilibrium:
    # late-time populations change slowly.
    late_delta = np.abs(ys[-1] - ys[-2]).max()
    early_delta = np.abs(ys[1] - ys[0]).max()
    assert late_delta < early_delta


def test_mc_matches_analytic_bands():
    """Scaled-down version of the reference's headline cross-check
    (`ex2_ferromagnet_mc.py:194-213`): the analytic p(L=1) curve must lie
    within (loose) MC percentile bands."""
    num_steps, chain_length = 400, 5000
    counts = ferromagnet.mc_island_history(
        num_trials=8, chain_length=chain_length, num_steps=num_steps,
        trials_per_step=chain_length // 100, sites_per_pair=250,
        rounds_per_step=10,
    )
    assert counts.shape == (8, num_steps, 6)
    p_mc = counts[..., 1] / chain_length  # p(L=1)
    analytic = ferromagnet.analytic_p_history(
        t_max=num_steps / 100, t_steps=num_steps, p0_pair=1 / 250
    )
    # Compare time-averaged second half (quasi-equilibrium region).
    half = num_steps // 2
    mc_mean = p_mc[:, half:].mean()
    an_mean = analytic[half:, 0].mean()
    assert 0.3 * an_mean < mc_mean < 3.0 * an_mean


def test_island_length_stats_wraparound():
    chain = np.array([1, 0, 1, 1, 0, 0, 1])  # wraps: island len 2 at ends
    stats = ferromagnet.island_length_stats(chain)
    assert stats == {2: 2}


def test_simulate_metropolis_shapes_and_cold_freeze():
    import jax

    # At beta*J >> 1 with no up-spins, nothing can ignite spontaneously
    # except via the (rate exp(-8J beta + 2 beta h)) pair channel — with
    # J=5 that is ~0, so the chain stays all-down.
    chain0 = np.zeros(256, np.int32)
    counts = np.asarray(ferromagnet.simulate_metropolis(
        jax.random.PRNGKey(0), chain0, 50, 32, 8, 5.0, -0.25, 1.0
    ))
    assert counts.shape == (50, 6)
    assert counts.sum() == 0


# --- Gillespie SSA -----------------------------------------------------------

def test_ssa_pure_decay_statistics():
    """A -> 0 at rate 1: event times of the jump chain follow the known
    order statistics; mean lifetime of the population ~ harmonic sum."""
    net = gillespie.ReactionNetwork(
        reactants=np.array([[1]]), products=np.array([[0]]),
        rates=np.array([1.0]),
    )
    n0 = np.array([30])
    ts, ns = gillespie.run_ssa_ensemble(net, n0, num_trajectories=200,
                                        num_events=30, seed=2)
    assert (np.diff(ns[..., 0], axis=1) == -1).all()
    t_extinct = ts[:, -1]
    expected = np.sum(1.0 / np.arange(1, 31))  # E[T] = H_30
    assert abs(t_extinct.mean() - expected) < 0.5


def test_ssa_quiescence_padding():
    net = gillespie.ReactionNetwork(
        reactants=np.array([[1]]), products=np.array([[0]]),
        rates=np.array([1.0]),
    )
    ts, ns = gillespie.run_ssa_ensemble(net, np.array([3]),
                                        num_trajectories=4, num_events=10)
    assert (ns[:, -1, 0] == 0).all()
    assert np.isinf(ts[:, -1]).all()  # past extinction: inf-padded


def test_ssa_autocatalysis_network_balances():
    net = gillespie.autocatalysis_network(
        0.001, 20.0, 10.0, 0.001, 50.0, 20.0, 0.0, 0.0, volume=100.0
    )
    # Closed reactor: every ACTIVE reaction conserves 2A+2B+M (the flow
    # feed/removal channels are present with rate 0 here).
    weights = np.array([2, 2, 1])
    active = net.rates > 0
    assert ((net.stoichiometry @ weights)[active] == 0).all()


def test_ssa_f32_batch_statistically_matches_f64():
    """The benched float32 batch SSA must agree moment-wise with the
    float64 formulations (the per-trajectory f64 stepper and the f64
    batch flag) on the autocatalysis network: the f32 falling-factorial
    bias is invisible at the shipped count scales (~2000 molecules,
    far below the 2^24 resolution limit). Moments are compared at a
    common EVENT index with a 5-sigma budget on the standard error."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.models import gillespie

    net = gillespie.autocatalysis_network(
        1.0, 100.0, 1.0, 1.0, 100.0, 1.0, 10.0, 2.0)
    n0 = (0, 0, 2000)
    B, E = 2048, 400

    _, ns32 = gillespie.ssa_batch(
        jax.random.PRNGKey(0), n0, net.static, E, B)
    _, ns64 = gillespie.ssa_batch(
        jax.random.PRNGKey(1), n0, net.static, E, B, jnp.float64)
    traj = jax.vmap(
        lambda k: gillespie.ssa_trajectories(k, n0, net.static, E))
    _, ns_ref = traj(jax.random.split(jax.random.PRNGKey(2), 512))

    final32 = np.asarray(ns32[:, -1, :], dtype=np.float64)
    final64 = np.asarray(ns64[:, -1, :], dtype=np.float64)
    final_ref = np.asarray(ns_ref[:, -1, :], dtype=np.float64)

    for a, b in ((final32, final64), (final32, final_ref)):
        se = np.sqrt(a.var(axis=0) / a.shape[0] + b.var(axis=0) / b.shape[0])
        diff = np.abs(a.mean(axis=0) - b.mean(axis=0))
        assert (diff <= 5 * se + 1e-9).all(), (diff, se)
    # Second moment too (variance ratio within a loose band).
    v32, v64 = final32.var(axis=0), final64.var(axis=0)
    ok = (v64 < 1e-9) | ((v32 / np.maximum(v64, 1e-9) > 0.7)
                         & (v32 / np.maximum(v64, 1e-9) < 1.4))
    assert ok.all(), (v32, v64)
