"""ops/correlations: exact spatial correlators of the Markov extension.

Oracles: brute-force enumeration of the chain/ring measures on tiny
geometries, the closed-form 1D Ising correlator, and the ensemble
engine's bridge sampler as an independent statistical twin.
"""

import itertools

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import markov
from chemical_kinetics_and_program_execution_tpu.models.ferromagnet import (
    ising_gibbs_windows,
)
from chemical_kinetics_and_program_execution_tpu.ops import correlations as corr


def _random_markov_spd(size_a, cl_k, seed):
    """A valid SPD: stationary window distribution of a random
    order-(cl_k-1) Markov chain (contexts -> random conditional rows)."""
    rng = np.random.default_rng(seed)
    n_ctx = size_a ** (cl_k - 1)
    mpp = rng.random((n_ctx, size_a)) + 0.05
    mpp /= mpp.sum(axis=1, keepdims=True)
    nctx = (np.arange(n_ctx)[:, None] * size_a
            + np.arange(size_a)[None, :]) % n_ctx
    T = np.zeros((n_ctx, n_ctx))
    np.add.at(T, (np.repeat(np.arange(n_ctx), size_a), nctx.ravel()),
              mpp.ravel())
    lam, vecs = np.linalg.eig(T.T)
    pi = np.real(vecs[:, np.argmax(np.real(lam))])
    pi = np.abs(pi) / np.abs(pi).sum()
    return (pi[:, None] * mpp).reshape((size_a,) * cl_k)


def _brute_chain_pair(spd, seq_a, seq_b, d, size_a, cl_k):
    """Sum the Markov extension over every length-(d+len(b)) sequence."""
    n = max(len(seq_a), d + len(seq_b))
    total = 0.0
    for seq in itertools.product(range(size_a), repeat=n):
        if list(seq[:len(seq_a)]) != list(seq_a):
            continue
        if list(seq[d:d + len(seq_b)]) != list(seq_b):
            continue
        total += markov.seq_prob(spd, list(seq))[0]
    return total


def test_chain_pair_prob_matches_brute_force():
    size_a, cl_k = 2, 3
    spd = _random_markov_spd(size_a, cl_k, seed=0)
    for seq_a, seq_b, d in [
        ((0,), (1,), 0), ((0,), (1,), 1), ((0, 1), (1, 0), 1),
        ((0, 1), (1, 1), 3), ((1,), (0, 0), 5), ((0, 1, 0), (0,), 2),
    ]:
        got = corr.pair_prob(spd, seq_a, seq_b, d)
        want = _brute_chain_pair(spd, seq_a, seq_b, d, size_a, cl_k)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)
    # Incompatible overlap is exactly zero.
    assert corr.pair_prob(spd, (0, 1), (0, 0), 1) == 0.0


def test_ring_pair_prob_matches_brute_force():
    size_a, cl_k, L = 2, 3, 8
    spd = _random_markov_spd(size_a, cl_k, seed=1)
    mpp, nctx, _ = corr.context_arrays(spd)
    m = cl_k - 1

    def ring_weight(seq):
        w = 1.0
        for i in range(L):
            ctx = 0
            for j in range(i - m, i):
                ctx = ctx * size_a + seq[j % L]
            w *= mpp[ctx, seq[i]]
        return w

    rings = list(itertools.product(range(size_a), repeat=L))
    weights = np.array([ring_weight(s) for s in rings])
    weights /= weights.sum()

    def brute(seq_a, seq_b, d):
        tot = 0.0
        for seq, w in zip(rings, weights):
            if any(seq[i % L] != s for i, s in enumerate(seq_a)):
                continue
            if any(seq[(d + i) % L] != s for i, s in enumerate(seq_b)):
                continue
            tot += w
        return tot

    for seq_a, seq_b, d in [
        ((0,), (1,), 1), ((0,), (1,), 4), ((0, 1), (1, 0), 3),
        ((0,), (0,), 7),          # wrap-around adjacency
        ((0, 1, 0), (0, 1), 6),   # B wraps across the seam into A
    ]:
        got = corr.pair_prob(spd, seq_a, seq_b, d, ring=L)
        np.testing.assert_allclose(got, brute(seq_a, seq_b, d),
                                   rtol=1e-12, atol=1e-15)


def test_chain_correlator_factorises_at_large_d():
    spd = _random_markov_spd(3, 3, seed=2)
    pa = corr.word_prob(spd, (0, 2))
    pb = corr.word_prob(spd, (1,))
    got = corr.pair_prob(spd, (0, 2), (1,), 200)
    np.testing.assert_allclose(got, pa * pb, rtol=1e-12)
    c = corr.observable_correlation(spd, {(0, 2): 1.0}, {(1,): 1.0},
                                    [200])
    assert abs(c[0]) < 1e-13


def test_ising_spin_correlator_and_length_match_closed_form():
    """1D Ising at field 0: <s_0 s_d> = tanh(beta*J_eff)^d and
    xi = -1/ln tanh(beta*J_eff) — textbook transfer-matrix results the
    context-operator machinery must reproduce exactly."""
    beta, j_eff = 0.7, 2.0
    spd = ising_gibbs_windows(3, J_eff=j_eff, h=0.0, beta=beta)
    spin = {(0,): -1.0, (1,): 1.0}
    ds = [1, 2, 3, 5, 10]
    got = corr.observable_correlation(spd, spin, spin, ds,
                                       size_a=2, cl_k=3)
    t = np.tanh(beta * j_eff)
    np.testing.assert_allclose(got, t ** np.array(ds, dtype=float),
                               rtol=1e-10, atol=1e-14)
    xi = corr.correlation_length(spd, size_a=2, cl_k=3)
    np.testing.assert_allclose(xi, -1.0 / np.log(t), rtol=1e-10)


def test_observable_correlation_ring_mode_spins():
    """Ring-mode correlator at L=10 matches a brute-force over all 2^10
    rings for the Ising spin observable (seam-crossing separations
    included)."""
    beta, j_eff, L = 0.4, 2.0, 10
    spd = ising_gibbs_windows(3, J_eff=j_eff, h=0.0, beta=beta)
    spin = {(0,): -1.0, (1,): 1.0}
    ds = [1, 3, 5, 9]
    got = corr.observable_correlation(spd, spin, spin, ds, ring=L,
                                       size_a=2, cl_k=3)

    mpp, _, _ = corr.context_arrays(spd, size_a=2, cl_k=3)
    rings = list(itertools.product((0, 1), repeat=L))
    w = np.empty(len(rings))
    for i, seq in enumerate(rings):
        acc = 1.0
        for j in range(L):
            ctx = seq[(j - 2) % L] * 2 + seq[(j - 1) % L]
            acc *= mpp[ctx, seq[j]]
        w[i] = acc
    w /= w.sum()
    s = np.array(rings, dtype=float) * 2 - 1
    mean = float(w @ s[:, 0])  # mean spin at one site
    for j, d in enumerate(ds):
        want = float(w @ (s[:, 0] * s[:, d % L])) - mean * mean
        np.testing.assert_allclose(got[j], want, rtol=1e-10, atol=1e-14)


def test_bridge_sampler_matches_ring_correlator():
    """Statistical twin: empirical pair frequencies of bridge-sampled
    rings (`ensemble.sample_tapes_from_spd(ring=True)`) agree with the
    exact cyclic trace formula — validating joint statistics far beyond
    the single-window marginals the sampler was built against."""
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    size_a, cl_k, L, B = 2, 3, 16, 4096
    spd = _random_markov_spd(size_a, cl_k, seed=3)
    tapes = np.asarray(ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(0), spd, size_a, cl_k, B, L, ring=True))
    for seq_a, seq_b, d in [((0,), (1,), 3), ((1, 1), (0,), 6)]:
        ok_a = np.ones(B, bool)
        for i, s in enumerate(seq_a):
            ok_a &= tapes[:, i % L] == s
        ok_b = np.ones(B, bool)
        for i, s in enumerate(seq_b):
            ok_b &= tapes[:, (d + i) % L] == s
        emp = (ok_a & ok_b).mean()
        want = corr.pair_prob(spd, seq_a, seq_b, d, ring=L)
        se = np.sqrt(want * (1 - want) / B)
        assert abs(emp - want) < 5 * se + 1e-3, (seq_a, seq_b, d, emp,
                                                 want)


def test_correlation_length_arnoldi_branch_matches_chain():
    """n_ctx > 4096 takes the matrix-free scipy-Arnoldi path. An
    order-1 chain lifted to cl_k=14 windows (next symbol depends on the
    last symbol only) has a context operator whose nonzero spectrum IS
    the 2x2 chain's, so xi must equal the chain's -1/ln|lambda_2|."""
    rng = np.random.default_rng(5)
    mpp1 = rng.random((2, 2)) + 0.2
    mpp1 /= mpp1.sum(axis=1, keepdims=True)
    lam = np.linalg.eigvals(mpp1)
    lam2 = float(np.sort(np.abs(lam))[0])
    ev, vecs = np.linalg.eig(mpp1.T)  # stationary dist of the chain
    pi1 = np.real(vecs[:, np.argmax(np.real(ev))])
    pi1 = np.abs(pi1) / np.abs(pi1).sum()

    cl_k = 14  # n_ctx = 8192 > _DENSE_CTX_LIMIT
    spd = pi1.copy()
    for _ in range(cl_k - 1):
        spd = spd[..., None] * mpp1[(None,) * (spd.ndim - 1) + (Ellipsis,)]
    assert spd.shape == (2,) * cl_k
    np.testing.assert_allclose(spd.sum(), 1.0, rtol=1e-12)
    xi = corr.correlation_length(spd)
    # The lifted operator is highly non-normal (a large nilpotent
    # block), which limits Arnoldi's lambda_2 accuracy to ~1e-5 here;
    # the dense branch is exact.
    np.testing.assert_allclose(xi, -1.0 / np.log(lam2), rtol=1e-4)


def test_ring_mode_rejects_oversized_contexts():
    spd = _random_markov_spd(2, 3, seed=4)
    with pytest.raises(ValueError, match="d must be >= 0"):
        corr.pair_prob(spd, (0,), (1,), -1)
    # Words longer than the ring wrap onto themselves: consistent
    # cells intersect (same mass as the once-around word) and
    # contradictory ones are exactly 0.
    np.testing.assert_allclose(
        corr.pair_prob(spd, (0,) * 9, (), 0, ring=8),
        corr.pair_prob(spd, (0,) * 8, (), 0, ring=8), rtol=1e-12)
    assert corr.pair_prob(spd, (0,) * 8 + (1,), (), 0, ring=8) == 0.0
    # n_ctx > dense gate: ring mode must refuse BEFORE allocating the
    # dense [n_ctx, n_ctx] operators (order-1 chain lifted to cl_k=14,
    # n_ctx=8192 — same construction as the Arnoldi test).
    rng = np.random.default_rng(6)
    mpp1 = rng.random((2, 2)) + 0.2
    mpp1 /= mpp1.sum(axis=1, keepdims=True)
    ev, vecs = np.linalg.eig(mpp1.T)
    pi1 = np.real(vecs[:, np.argmax(np.real(ev))])
    pi1 = np.abs(pi1) / np.abs(pi1).sum()
    big = pi1.copy()
    for _ in range(13):
        big = big[..., None] * mpp1[(None,) * (big.ndim - 1)
                                    + (Ellipsis,)]
    with pytest.raises(ValueError, match="ring mode builds dense"):
        corr.pair_prob(big, (0,), (1,), 3, ring=64)
    with pytest.raises(ValueError, match="ring mode builds dense"):
        corr.observable_correlation(big, {(0,): 1.0}, {(1,): 1.0},
                                    [2], ring=64)


def test_class_words_match_symbol_sums():
    """A symbol-class position must equal the sum over its member
    symbols, chain and ring modes, overlaps included."""
    spd = _random_markov_spd(3, 3, seed=7)
    for ring in (None, 9):
        cls = corr.pair_prob(spd, (0, (1, 2)), ((0, 1),), 3, ring=ring)
        plain = sum(
            corr.pair_prob(spd, (0, m), (b,), 3, ring=ring)
            for m in (1, 2) for b in (0, 1))
        np.testing.assert_allclose(cls, plain, rtol=1e-12, atol=1e-16)
    # Overlap intersection: class {1,2} over fixed 2 keeps only 2;
    # class {0,1} over fixed 2 is contradictory.
    got = corr.pair_prob(spd, (0, (1, 2)), (2,), 1)
    np.testing.assert_allclose(got, corr.pair_prob(spd, (0, 2), (2,), 1),
                               rtol=1e-12)
    assert corr.pair_prob(spd, (0, (0, 1)), (2,), 1) == 0.0


def test_run_length_distribution_mass_identity():
    """On a ring, every 'inside' symbol belongs to exactly one maximal
    bounded run unless the whole ring is inside: sum_l l*P_start(l) +
    L*P(all-inside)/L == p(inside), exactly."""
    size_a, cl_k, L = 3, 3, 10
    spd = _random_markov_spd(size_a, cl_k, seed=8)
    inside = (1, 2)
    lens = np.arange(1, L)
    p_run = corr.run_length_distribution(spd, inside, lens, ring=L)
    p_all = corr.pair_prob(spd, (inside,) * L, (), 0, ring=L)
    p_inside = sum(corr.pair_prob(spd, (m,), (), 0, ring=L)
                   for m in inside)
    np.testing.assert_allclose(
        float((lens * p_run).sum()) + p_all, p_inside,
        rtol=1e-11, atol=1e-14)


def test_run_length_distribution_matches_brute_force_chain():
    """Chain mode P(boundary, inside^l, boundary) vs direct enumeration
    of all words of that length."""
    import itertools

    spd = _random_markov_spd(2, 3, seed=9)
    for ell in (1, 2, 4):
        got = corr.run_length_distribution(spd, (1,), [ell])[0]
        want = 0.0
        for word in itertools.product((0,), *[(1,)] * ell, (0,)):
            want += markov.seq_prob(spd, list(word))[0]
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-16)
