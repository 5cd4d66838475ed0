"""Unit tests for the Markov math layer (SURVEY §4 item: closed forms)."""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import markov


def test_mpp_from_spd_uniform():
    spd = np.full([2, 2, 2], 0.125)
    mpp = markov.mpp_from_spd(spd)
    np.testing.assert_allclose(mpp, 0.5)


def test_mpp_from_spd_impossible_prefix_uniform_followup():
    spd = np.zeros([2, 2])
    spd[1, 0] = spd[1, 1] = 0.5
    mpp = markov.mpp_from_spd(spd)
    # Row 0 has zero mass -> eps-clipped to a uniform follow-up.
    np.testing.assert_allclose(mpp[0], [0.5, 0.5])
    np.testing.assert_allclose(mpp[1], [0.5, 0.5])


def test_ctm_columns_are_distributions():
    rng = np.random.RandomState(0)
    spd = rng.dirichlet(np.ones(16)).reshape(2, 2, 2, 2)
    mpp = markov.mpp_from_spd(spd)
    ctm = markov.ctm_from_mpp(2, 3, mpp)
    # Every context transitions somewhere with total probability 1.
    np.testing.assert_allclose(ctm.sum(axis=0), 1.0)


def test_ctm_matches_explicit_loop():
    import itertools

    rng = np.random.RandomState(1)
    a, c = 3, 2
    spd = rng.dirichlet(np.ones(a ** (c + 1))).reshape([a] * (c + 1))
    mpp = markov.mpp_from_spd(spd)
    got = markov.ctm_from_mpp(a, c, mpp)
    want = np.zeros([a**c, a**c])
    want_s = want.reshape([a] * (2 * c))
    mpp_s = mpp.reshape([a] * (c + 1))
    for idx in itertools.product(range(a), repeat=c + 1):
        want_s[idx[1:] + idx[:-1]] += mpp_s[idx]
    np.testing.assert_allclose(got, want)


def test_eigen_gate_accepts_product_measure():
    # An IID tape (product measure) is a valid order-k Markov process.
    q = np.array([0.7, 0.3])
    spd = np.einsum("i,j,k->ijk", q, q, q)
    deviation, eigenspace = markov.get_ctm_eigenvalue1_eigenspace(spd)
    assert eigenspace is not None
    assert deviation < 1e-10


def test_eigen_gate_rejects_inconsistent_marginals():
    spd = np.zeros([2, 2])
    spd[0, 1] = 1.0  # left marginal [1,0], right [0,1]
    deviation, eigenspace = markov.get_ctm_eigenvalue1_eigenspace(spd)
    assert eigenspace is None
    assert deviation > 0.1


def test_markov_entropy_iid():
    q = np.array([0.25, 0.75])
    spd = np.einsum("i,j->ij", q, q)
    want = -(q * np.log(q)).sum()
    assert markov.markov_entropy(spd) == pytest.approx(want, rel=1e-12)


def test_seq_prob_short_and_long():
    q = np.array([0.6, 0.4])
    spd = np.einsum("i,j,k->ijk", q, q, q)
    p, _ = markov.seq_prob(spd, (1,))
    assert p == pytest.approx(0.4, rel=1e-12)
    # Longer than the tracked window: Markov-chain extension. For an IID
    # tape this is just the product of symbol probabilities.
    p, _ = markov.seq_prob(spd, (1, 0, 1, 1, 0))
    assert p == pytest.approx(0.4 * 0.6 * 0.4 * 0.4 * 0.6, rel=1e-12)


def test_seq_prob_prefix_indices():
    q = np.array([0.5, 0.5])
    spd = np.stack([np.einsum("i,j->ij", q, q)] * 3)  # [time, 2, 2]
    p, _ = markov.seq_prob(spd, (0,), num_prefix_indices=1)
    np.testing.assert_allclose(p, [0.5, 0.5, 0.5])


def test_pyramid_levels():
    rng = np.random.RandomState(2)
    p = rng.dirichlet(np.ones(8))
    pyr = np.asarray(markov.pyramid(p, 2, 3))
    offsets, total = markov.pyramid_offsets(2, 3)
    assert pyr.shape == (total,)
    np.testing.assert_allclose(pyr[offsets[3]:offsets[3] + 8], p)
    np.testing.assert_allclose(
        pyr[offsets[2]:offsets[2] + 4], p.reshape(4, 2).sum(-1)
    )
    np.testing.assert_allclose(pyr[offsets[0]], 1.0)
    assert pyr[-1] == 1.0
    np.testing.assert_allclose(pyr, markov.pyramid_np(p, 2, 3))


def test_markov_entropy_projector_matches_host():
    """Device entropy projection must equal the host markov_entropy
    (identical clipping), and stack with seq_prob columns."""
    from chemical_kinetics_and_program_execution_tpu import markov
    from chemical_kinetics_and_program_execution_tpu.ops.observables import (
        markov_entropy_projector,
        seq_prob_projector,
        stack_projectors,
    )

    rng = np.random.RandomState(0)
    size_a, cl_k, t = 3, 4, 5
    ps = rng.dirichlet(np.ones(size_a**cl_k), size=t)
    proj = markov_entropy_projector(size_a, cl_k)
    got = np.asarray(proj(ps))
    want = np.array([
        markov.markov_entropy(p.reshape([size_a] * cl_k)) for p in ps
    ])
    np.testing.assert_allclose(got[:, 0], want, rtol=1e-13)

    both = stack_projectors(
        seq_prob_projector([(0, 1)], size_a, cl_k), proj)
    out = np.asarray(both(ps))
    assert out.shape == (t, 2)
    np.testing.assert_allclose(out[:, 1], want, rtol=1e-13)
