"""Stochastic thermodynamics instrument (`ops/thermo.py`).

Validation layers, exactly as DESIGN.md describes:
- table antisymmetry + the ex2 <-> 1D Ising detailed-balance identity
  (sigma per flip = -beta dE at J_eff = 2J, h = -0.25 — the same
  correspondence the master equation's Gibbs-stationarity test pins);
- exact master-equation identities: sigma_tot(gibbs) = 0,
  sigma_tot(p) = -dD(p||gibbs)/dt under detailed balance,
  and the closure-side window-marginal expression equals the master
  medium rate identically;
- the sampled ensemble's cumulative sigma 6-sigma-gated against the
  exact discrete kernel (I + Q/L);
- the integral fluctuation theorem <exp(-sigma_tot)> = 1 at
  trajectory level (boundary terms from the exact kernel iterates);
- scoping: mechanism-resolved entropy production requires channel
  microreversibility — ex3's polymerization channels are site-locally
  irreversible and must be REPORTED so, not silently zeroed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chemical_kinetics_and_program_execution_tpu.engine import (
    ensemble,
    master,
)
from chemical_kinetics_and_program_execution_tpu.ops import thermo

BETA, J, H = 1.0, 1.0, -0.25  # ex2's baked parameters (problems.scm:30-33)


@pytest.fixture(scope="module")
def ex2_dm():
    return ensemble.compile_decision_machine("ex2-ferromagnetic-chain")


@pytest.fixture(scope="module")
def ex2_tables(ex2_dm):
    return thermo.sigma_spec_tables(ex2_dm)


@pytest.fixture(scope="module")
def ex2_master_L8():
    return master.build_ring_generator("ex2-ferromagnetic-chain", 8)


def _window_marginals(p, dm, L, a, tables):
    """Site-averaged combined-window marginals of a master state
    (dummy program digits uniform — ex2 never reads its program tape)."""
    digits = master._ring_digits(L, a)
    pw = np.zeros(tables.num_windows)
    for i in range(L):
        wr = np.zeros(a**L, dtype=np.int64)
        for off in range(dm.d_lo, dm.d_lo + dm.n_d):
            wr = wr * a + digits[:, (i + off) % L]
        for pd in range(a**dm.n_p):
            np.add.at(pw, pd * (a**dm.n_d) + wr, p / (a**dm.n_p))
    return pw / L


def test_sigma_table_antisymmetric_and_reversible(ex2_tables):
    t = ex2_tables
    assert not t.irrev.any()  # ex2: every flip has a same-site reverse
    n_jumps = 0
    for w, r in enumerate(t.rates):
        for w2, fwd in r.items():
            rev = t.rates[w2].get(w, 0.0)
            assert rev > 0.0
            s_fwd = np.log(fwd) - np.log(rev)
            s_rev = np.log(rev) - np.log(fwd)
            assert abs(s_fwd + s_rev) < 1e-14
            n_jumps += 1
    assert n_jumps > 0


def test_ex2_sigma_is_ising_delta_E(ex2_dm, ex2_tables):
    """ln[R(w->w')/R(w'->w)] = -beta (E(w') - E(w)) with the window
    Ising energy at J_eff = 2J — microreversibility against the same
    Gibbs measure the master equation's stationarity test uses."""
    dm, t = ex2_dm, ex2_tables
    a, n = dm.size_a, dm.n_cells

    def energy(dig):
        s = [1.0 if d == 1 else -1.0 for d in dig[dm.n_p:]]
        return -(2 * J) * (s[0] * s[1] + s[1] * s[2]) - H * s[1]

    for w, r in enumerate(t.rates):
        dig = thermo._decode_rank(w, n, a)
        for w2, fwd in r.items():
            dig2 = thermo._decode_rank(w2, n, a)
            lhs = np.log(fwd) - np.log(t.rates[w2][w])
            rhs = -BETA * (energy(dig2) - energy(dig))
            assert abs(lhs - rhs) < 1e-12


def test_master_total_rate_zero_at_gibbs_positive_elsewhere(
        ex2_master_L8):
    Q = ex2_master_L8
    gibbs = master.ring_gibbs_states(8, J_eff=2 * J, h=H, beta=BETA)
    tot, med = thermo.master_entropy_rates(Q, gibbs)
    assert abs(tot) < 1e-12
    p = np.random.RandomState(0).dirichlet(np.ones(2**8))
    tot, med = thermo.master_entropy_rates(Q, p)
    assert tot > 0.1


def test_master_total_rate_is_minus_dD_dt(ex2_master_L8):
    """For detailed-balanced dynamics sigma_tot(p) = -d/dt D(p||pi)
    exactly (Schnakenberg); checked with a central difference along the
    true master flow."""
    Q = ex2_master_L8
    gibbs = master.ring_gibbs_states(8, J_eff=2 * J, h=H, beta=BETA)
    p = np.random.RandomState(1).dirichlet(np.ones(2**8))
    tot, _ = thermo.master_entropy_rates(Q, p)
    dt = 1e-6
    pdot = Q @ p
    D_m = thermo.relative_entropy(p - dt * pdot, gibbs)
    D_p = thermo.relative_entropy(p + dt * pdot, gibbs)
    assert abs(tot + (D_p - D_m) / (2 * dt)) < 1e-6 * max(1.0, tot)


def test_closure_expression_matches_master_medium_rate(
        ex2_dm, ex2_tables, ex2_master_L8):
    """The per-site medium entropy rate is a functional of the rule's
    window marginals only: evaluated at the master state's
    site-averaged window marginals it equals the master rate / L
    identically — the cross-formulation identity that lets the SPD
    closure report entropy production."""
    dm, t, Q = ex2_dm, ex2_tables, ex2_master_L8
    L, a = 8, dm.size_a
    p = np.random.RandomState(2).dirichlet(np.ones(a**L))
    _, med = thermo.master_entropy_rates(Q, p)
    pw = _window_marginals(p, dm, L, a, t)
    rate, irrev_flux = thermo.medium_entropy_rate_from_window_probs(
        pw, t)
    assert irrev_flux == 0.0
    assert abs(rate * L - med) < 1e-9 * max(1.0, abs(med))


def test_medium_rate_vanishes_at_gibbs_marginals(ex2_dm, ex2_tables):
    """At equilibrium sigma_tot = 0 and dS_sys/dt = 0, so the medium
    rate alone must vanish at the Gibbs window marginals."""
    dm, t = ex2_dm, ex2_tables
    L, a = 8, dm.size_a
    gibbs = master.ring_gibbs_states(L, J_eff=2 * J, h=H, beta=BETA)
    pw = _window_marginals(gibbs, dm, L, a, t)
    rate, irrev_flux = thermo.medium_entropy_rate_from_window_probs(
        pw, t)
    assert irrev_flux == 0.0
    assert abs(rate) < 1e-12


def test_ensemble_sigma_tracks_exact_kernel(ex2_dm, ex2_tables):
    """Sampled cumulative medium entropy vs the exact expectation under
    the discrete round kernel (I + Q/L), 6-sigma gate."""
    import scipy.sparse as sp

    dm, t = ex2_dm, ex2_tables
    tdev = thermo.device_tables(t)
    L, B, rounds, a = 8, 4096, 40, dm.size_a
    pt = jnp.zeros((B, L), jnp.int32)
    dt_ = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, a,
                             dtype=jnp.int32)
    (_, dtf), sigma, nirr, _ = thermo.run_ensemble_sigma(
        jax.random.PRNGKey(2), (pt, dt_), dm, tdev, (rounds, 1),
        independent_sites=True)
    sigma = np.asarray(sigma)
    assert int(np.asarray(nirr).sum()) == 0

    Q = master.build_ring_generator("ex2-ferromagnetic-chain", L)
    S = a**L
    K = (sp.identity(S) + Q / L).tocsr()
    p = np.full(S, 1.0 / S)
    expected = 0.0
    for _ in range(rounds):
        pw = _window_marginals(p, dm, L, a, t)
        rate, _ = thermo.medium_entropy_rate_from_window_probs(pw, t)
        expected += rate  # E=1: one site event per member per round
        p = K @ p
    se = sigma.std() / np.sqrt(B)
    assert abs(sigma.mean() - expected) < 6 * se


def test_integral_fluctuation_theorem(ex2_dm, ex2_tables):
    """<exp(-sigma_tot)> = 1 with sigma_tot = sigma_med + ln p0(x0)
    - ln pT(xT); boundary terms from the exact kernel iterates."""
    import scipy.sparse as sp

    dm, t = ex2_dm, ex2_tables
    tdev = thermo.device_tables(t)
    L, B, rounds, a = 8, 8192, 40, dm.size_a
    pt = jnp.zeros((B, L), jnp.int32)
    dt_ = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0, a,
                             dtype=jnp.int32)
    (_, dtf), sigma, _, _ = thermo.run_ensemble_sigma(
        jax.random.PRNGKey(4), (pt, dt_), dm, tdev, (rounds, 1),
        independent_sites=True)
    sigma = np.asarray(sigma)

    Q = master.build_ring_generator("ex2-ferromagnetic-chain", L)
    S = a**L
    K = (sp.identity(S) + Q / L).tocsr()
    p = np.full(S, 1.0 / S)
    for _ in range(rounds):
        p = K @ p
    dtf_np = np.asarray(dtf)
    rank = np.zeros(B, dtype=np.int64)
    for j in range(L):
        rank = rank * a + dtf_np[:, j]
    sig_tot = sigma - L * np.log(a) - np.log(np.maximum(p[rank], 1e-300))
    ift = np.exp(-sig_tot)
    se = ift.std() / np.sqrt(B)
    assert abs(ift.mean() - 1.0) < 6 * se
    # Second law at the ensemble level.
    assert sig_tot.mean() > 0.0


def test_ex3_channels_reported_irreversible():
    """Mechanism-resolved entropy production requires channel
    microreversibility. ex3's polymerization events have NO same-site
    reverse (depolymerization in ex3var2 fires at the chain end — a
    different site), so every jump must be flagged irreversible, and
    the runner must count them rather than fold a bogus 0 into sigma."""
    dm = ensemble.compile_decision_machine("ex3-copolymerization")
    t = thermo.sigma_spec_tables(dm)
    n_jumps = sum(len(r) for r in t.rates)
    assert n_jumps > 0
    assert int(t.irrev.sum()) > 0
    assert not t.sigma.any()  # nothing reversible -> all sigma zero
    # And the flux accounting reports it:
    pw = np.full(t.num_windows, 1.0 / t.num_windows)
    rate, irrev_flux = thermo.medium_entropy_rate_from_window_probs(
        pw, t)
    assert rate == 0.0 and irrev_flux > 0.0


def test_master_entropy_rates_raises_on_irreversible_flux():
    Q = master.build_ring_generator("ex1-radioactive-decay", 5)
    p = np.random.RandomState(3).dirichlet(np.ones(2**5))
    with pytest.raises(ValueError):
        thermo.master_entropy_rates(Q, p)


_EX4V2_G = {"A": -1.0, "B": -1.0, "C": -1.0, "D": 1.5, "I": 0.0,
            "O": 0.0, "P": 6.0, "X": 0.0, "S": 0.0, "E": 1.0}
_EX4V2_BETA = 1.0


def _ex4v2_outcomes(wp, wd):
    from chemical_kinetics_and_program_execution_tpu.engine import dsl

    problem = dsl.get_problem("ex4var2-chemical-turing")
    sym = {s: i for i, s in enumerate(problem.symbols)}
    outs, _, _ = master.enumerate_pair_outcomes(
        problem, {k: sym[v] for k, v in wp.items()},
        {k: sym[v] for k, v in wd.items()})
    res = []
    for prob, wrp, wrd in outs:
        if prob <= 0:
            continue
        res.append((prob,
                    {k: problem.symbols[v] for k, v in wrp.items()},
                    {k: problem.symbols[v] for k, v in wrd.items()}))
    return res


def _rate_of(outs, wrp_want, wrd_want):
    return sum(p for p, wrp, wrd in outs
               if wrp == wrp_want and wrd == wrd_want)


def test_ex4var2_channel_affinities():
    """EVERY reaction channel of ex4var2 satisfies exact local detailed
    balance w.r.t. the potential 2*beta*G: ln(r_fwd/r_rev) = -2 beta
    sum(G products - G reactants), outcome-resolved, for all cursor
    states and io contexts. The factor 2 is the same structural
    doubling as ex2's J_eff = 2J (the choose-encoding of rates). This
    identity is what makes the free-enthalpy LEDGER exact
    (`thermo.run_ensemble_ledger`)."""
    G, beta = _EX4V2_G, _EX4V2_BETA
    n_checked = 0

    def affinity(r_f, r_b, species_dG):
        assert r_f > 0 and r_b > 0
        lhs = np.log(r_f) - np.log(r_b)
        assert abs(lhs + 2 * beta * species_dG) < 1e-10, (
            lhs, -2 * beta * species_dG)

    # Cursor advances: cur+P -> nxt+X writing `bit` behind the cursor.
    for cur, nxt, bit in (("A", "B", "I"), ("B", "C", "O"),
                          ("C", "D", "I")):
        for b1 in "IO":      # bit under the cursor's landing cell
            for b2 in "IO":  # forward guard at d+2
                fw = _ex4v2_outcomes({0: "P"},
                                     {0: cur, 1: b1, 2: b2})
                r_f = _rate_of(fw, {0: "X"}, {0: bit, 1: nxt})
                rv = _ex4v2_outcomes({0: "X"},
                                     {0: nxt, -1: bit, -2: b2})
                r_b = _rate_of(rv, {0: "P"}, {0: b1, -1: cur})
                dG = ((G["X"] - G["P"]) + (G[bit] - G[cur])
                      + (G[nxt] - G[b1]))
                affinity(r_f, r_b, dG)
                n_checked += 1

    # Attach/detach: S+cur <-> E for cur in (A, D), io written per side.
    for cur in ("A", "D"):
        for bit in "IO":     # bit the detach writes where cur stood
            for b1 in "IO":  # guards
                fw = _ex4v2_outcomes({0: "S"},
                                     {0: cur, 1: b1, -1: b1})
                r_f = _rate_of(fw, {0: "E"}, {0: bit})
                rv = _ex4v2_outcomes({0: "E"},
                                     {0: bit, 1: b1, -1: b1})
                r_b = _rate_of(rv, {0: "S"}, {0: cur})
                dG = (G["E"] - G["S"]) + (G[bit] - G[cur])
                affinity(r_f, r_b, dG)
                n_checked += 1
    assert n_checked == 20


def test_ex4var2_ledger_bookkeeping_identity():
    """The ledger's cumulative sigma equals the tape-potential drop
    Phi(0) - Phi(T) per member exactly — the cell-additive bookkeeping
    cannot drift — and the spec counts account for every fired event."""
    dm = ensemble.compile_decision_machine("ex4var2-chemical-turing")
    problem_syms = ("A", "B", "C", "D", "I", "O", "P", "X", "S", "E")
    g = np.array([_EX4V2_G[s] for s in problem_syms])
    beta_eff = 2.0 * _EX4V2_BETA
    ledger = (jnp.asarray(g), jnp.asarray(g), beta_eff)

    B, L, rounds, E = 256, 64, 20, 2
    key = jax.random.PRNGKey(5)
    # Fueled mix: P/X on the program lane, cursors + bits on data.
    ptape = jax.random.choice(
        jax.random.fold_in(key, 0),
        jnp.asarray([6, 7, 8, 9], jnp.int32), (B, L),
        p=jnp.asarray([0.4, 0.3, 0.2, 0.1]))
    dtape = jax.random.choice(
        jax.random.fold_in(key, 1),
        jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32), (B, L),
        p=jnp.asarray([0.1, 0.1, 0.1, 0.1, 0.3, 0.3]))
    phi0 = thermo.tape_potential(ptape, dtape, g, g, beta_eff)
    (pt, dt_), sigma, (counts, spec_sig), _ = \
        thermo.run_ensemble_ledger(
            jax.random.fold_in(key, 2), (ptape, dtape), dm, ledger,
            (rounds, E))
    phiT = thermo.tape_potential(pt, dt_, g, g, beta_eff)
    np.testing.assert_allclose(np.asarray(sigma),
                               np.asarray(phi0 - phiT),
                               rtol=0, atol=1e-9)
    counts = np.asarray(counts)
    assert (counts.sum(axis=1) == rounds * E).all()
    assert np.asarray(sigma).sum() != 0.0  # something actually fired
    # The per-spec decomposition re-sums to the total exactly.
    np.testing.assert_allclose(np.asarray(spec_sig).sum(axis=1),
                               np.asarray(sigma), rtol=0, atol=1e-9)


def test_ex4var2_gibbs_product_is_stationary():
    """The machine's equilibrium: the iid per-symbol Boltzmann product
    at beta_eff = 2 beta is stationary under the dual closure (the
    potential is cell-additive, so despite the correlated dynamics the
    detailed-balance measure is a product). Recomputed from scratch —
    the sharpest closure-level consequence of the channel LDB."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense

    syms = ("A", "B", "C", "D", "I", "O", "P", "X", "S", "E")
    g = np.array([_EX4V2_G[s] for s in syms])
    w = np.exp(-2.0 * _EX4V2_BETA * g)
    p1 = w / w.sum()
    cl_k = 3
    spd = p1.copy()
    for _ in range(cl_k - 1):
        spd = np.multiply.outer(spd, p1)
    dual = dense.compile_dense_dual("ex4var2-chemical-turing", cl_k)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    dy = np.asarray(fn(np.concatenate([spd.ravel(), spd.ravel()])))
    assert np.abs(dy).max() < 1e-8
    # ...and visibly NOT stationary at uniform (scale reference).
    u = np.full(spd.size, 1.0 / spd.size)
    assert np.abs(np.asarray(fn(np.concatenate([u, u])))).max() > 1e-5


def test_ex4var2_ledger_artifacts_claims():
    """Committed ex4var2_ledger.npz must support the RESULTS claims:
    exact bookkeeping, per-spec sigma constancy, monotone free energy
    onto the Boltzmann product, and the 12-nat instruction channels."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "ex4var2_ledger.npz")
    if not os.path.exists(path):
        pytest.skip("run examples/ex4var2_ledger.py first")
    d = np.load(path)
    assert float(d["book_err"]) < 1e-8
    assert float(d["decomp_err"]) < 1e-8
    assert float(d["gibbs_res"]) < 1e-8
    F = np.asarray(d["F_dual"])
    assert (np.diff(F) <= 1e-9).all()
    assert F[-1] >= float(d["F_gibbs"]) - 1e-9
    sigma_spec, fired = np.asarray(d["sigma_spec"]), np.asarray(
        d["fired"])
    counts = np.asarray(d["counts_total"])
    adv = np.asarray(d["advance"]) & fired
    # Every fuel stroke dissipates exactly -2 beta dG of ITS stroke:
    # the A->B / B->C / C->D advances burn 12, 12, 7 nats.
    assert adv.any() and counts[adv].sum() > 0
    assert all(min(abs(s - 12.0), abs(s - 7.0)) < 1e-9
               for s in sigma_spec[adv])
    # Heat and entropy both grow along the dual quench; heat dominates
    # (the fuel stroke is strongly downhill).
    heat, dS = np.asarray(d["heat_dual"]), np.asarray(d["dS_dual"])
    assert heat[-1] > 0 and heat[-1] > dS[-1]


def test_relative_entropy_rate_is_exact_dD_dt(ex2_master_L8):
    Q = ex2_master_L8
    gibbs = master.ring_gibbs_states(8, J_eff=2 * J, h=H, beta=BETA)
    p = np.random.RandomState(4).dirichlet(np.ones(2**8))
    rate = thermo.relative_entropy_rate(Q, p, gibbs)
    dt = 1e-6
    pdot = Q @ p
    D_m = thermo.relative_entropy(p - dt * pdot, gibbs)
    D_p = thermo.relative_entropy(p + dt * pdot, gibbs)
    assert abs(rate - (D_p - D_m) / (2 * dt)) < 1e-6 * max(1.0,
                                                           abs(rate))


def test_ex2_entropy_artifacts_claims(ex2_dm, ex2_tables):
    """Committed ex2_entropy_production.npz must support the RESULTS
    claims, with the exact kernel expectation RECOMPUTED (an engine
    regression anywhere in the outcome tables or the sigma instrument
    fails this without regenerating the artifact)."""
    import os

    import scipy.sparse as sp

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "ex2_entropy_production.npz")
    if not os.path.exists(path):
        pytest.skip("run examples/ex2_entropy_production.py first")
    d = np.load(path)
    cum_mean, cum_se = d["cum_mean"], d["cum_se"]
    n_snaps = len(cum_mean) - 1
    rounds_per_snap = 6  # committed geometry of the example

    dm, t = ex2_dm, ex2_tables
    L, a = 12, dm.size_a
    S = a**L
    Q = master.build_ring_generator("ex2-ferromagnetic-chain", L)
    K = (sp.identity(S) + Q / L).tocsr()
    p = np.full(S, 1.0 / S)  # uniform iid start, as in the example
    digits = master._ring_digits(L, a)
    expected = [0.0]
    acc = 0.0
    for _ in range(n_snaps):
        for _ in range(rounds_per_snap):
            pw = np.zeros(t.num_windows)
            for i in range(L):
                wr = np.zeros(S, dtype=np.int64)
                for off in range(dm.d_lo, dm.d_lo + dm.n_d):
                    wr = wr * a + digits[:, (i + off) % L]
                for pd in range(a**dm.n_p):
                    np.add.at(pw, pd * (a**dm.n_d) + wr,
                              p / (a**dm.n_p))
            pw /= L
            rate, _ = thermo.medium_entropy_rate_from_window_probs(
                pw, t)
            acc += rate
            p = K @ p
        expected.append(acc)
    expected = np.asarray(expected)
    z = np.abs(cum_mean[1:] - expected[1:]) / np.maximum(cum_se[1:],
                                                         1e-12)
    assert float(z.max()) < 6.0, float(z.max())
    # Fluctuation theorem + second law at the committed scale.
    assert abs(float(d["ift_mean"][-1]) - 1.0) < 6 * float(
        d["ift_se"][-1])
    assert float(d["sig_tot_mean"][-1]) > 0.0
