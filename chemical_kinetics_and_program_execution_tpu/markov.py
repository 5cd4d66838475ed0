"""Markov-process math over sequence probability distributions (SPDs).

Semantics match the reference's analysis helpers
(`framework/markov_tapes.py:81-256`): an SPD is an array of shape
``B + (A,)*k`` whose entry at a k-index-tuple is the probability of reading
that symbol window at a random tape position; tape content is modeled as a
stationary order-(k-1) Markov process.

Functions here are written against ``jax.numpy`` where they can run on-device
(entropy, seq_prob, pyramid) and ``numpy`` where they are host-side validity
gates needing general eigendecomposition (`get_ctm_eigenvalue1_eigenspace`).
"""

from __future__ import annotations

import itertools

import numpy as np

from .utils import config

config.initialize()

import jax.numpy as jnp  # noqa: E402


def mpp_from_spd(spd, eps=None):
    """Markov process parameters (conditional next-symbol probs) from an SPD.

    ``r[prefix + (s,)]`` is the probability that the (k-1)-window ``prefix``
    is followed by symbol ``s``. Mirrors `markov_tapes.py:81-104`: entries
    are clipped into ``[eps, 1]`` before normalising over the last axis, so
    impossible prefixes yield a uniform follow-up distribution instead of
    0/0.
    """
    if eps is None:
        eps = 1e-100
    spd = np.clip(np.asarray(spd, dtype=np.float64), eps, 1)
    return spd / spd.sum(axis=-1, keepdims=True)


def ctm_from_mpp(num_alphabet, num_context, mpp):
    """Context transfer matrix from Markov process parameters.

    Returns an ``[A**c, A**c]`` matrix M with ``M[next_ctx, ctx]`` transition
    probabilities, built exactly like `markov_tapes.py:107-130`: for every
    (c+1)-sequence, its conditional probability is added at row index
    ``seq[1:]`` / column index ``seq[:-1]``.
    """
    dim = num_alphabet**num_context
    mpp = np.asarray(mpp, dtype=np.float64).reshape(
        [num_alphabet] * (num_context + 1)
    )
    result = np.zeros([dim, dim])
    # Vectorised form of the reference's explicit index loop: entry for
    # sequence s contributes mpp[s] at (rank(s[1:]), rank(s[:-1])).
    flat = mpp.ravel()
    seqs = np.indices([num_alphabet] * (num_context + 1)).reshape(
        num_context + 1, -1
    )
    pow_ = num_alphabet ** np.arange(num_context - 1, -1, -1)
    rows = pow_ @ seqs[1:]
    cols = pow_ @ seqs[:-1]
    np.add.at(result, (rows, cols), flat)
    return result


def get_ctm_eigenvalue1_eigenspace(spd, eps_mpp=None, eps=1e-7):
    """Validity gate for initial SPDs (`markov_tapes.py:133-175`).

    Checks that left and right (k-1)-marginals agree, then measures how well
    the marginal lies in the eigenvalue-1 eigenspace of the context transfer
    matrix. Returns ``(deviation, eigenspace)`` or
    ``(marginal_distance, None)`` when the marginals are incompatible.
    """
    spd = np.asarray(spd, dtype=np.float64)
    num_alphabet = spd.shape[0]
    num_context = spd.ndim - 1
    marg_right = spd.sum(axis=-1)
    marg_left = spd.sum(axis=0)
    marginal_distance = np.linalg.norm(marg_right.ravel() - marg_left.ravel())
    if not marginal_distance <= eps:
        return marginal_distance, None
    mpp = mpp_from_spd(spd, eps=eps_mpp)
    ctm = ctm_from_mpp(num_alphabet, num_context, mpp)
    eigvals, eigvecs = np.linalg.eig(ctm)
    eigenspace = eigvecs[:, abs(eigvals - 1.0) <= eps]
    _, residuals, *_ = np.linalg.lstsq(
        eigenspace, marg_left.ravel(), rcond=None
    )
    return np.linalg.norm(residuals**0.5), eigenspace


def markov_entropy(spd):
    """Markov-chain entropy rate of the SPD (`markov_tapes.py:178-187`)."""
    eps = 1e-280
    spd = np.clip(np.asarray(spd, dtype=np.float64), eps, 1)
    reduced = spd.sum(axis=-1)
    conditional = spd / reduced[..., np.newaxis]
    return (
        (-conditional * np.log(conditional)).sum(axis=-1).ravel()
        @ reduced.ravel()
    )


def seq_prob(spd, seq, *, num_prefix_indices=0, eps=None, mpp=None,
             want_mpp=False):
    """Probability of a symbol sequence under an SPD (`markov_tapes.py:190-233`).

    Sequences no longer than the tracked window marginalise the trailing
    axes; longer sequences are extended with the Markov chain's conditional
    probabilities. Returns ``(probability, mpp)``.
    """
    spd = np.asarray(spd, dtype=np.float64)
    num_sequence_indices = spd.ndim - num_prefix_indices
    excess = num_sequence_indices - len(seq)
    if excess >= 0:
        prob = spd[..., *seq].sum(
            axis=tuple(
                range(num_prefix_indices, num_prefix_indices + excess)
            )
        )
        return prob, (mpp_from_spd(spd, eps=eps) if want_mpp else mpp)
    if mpp is None:
        mpp = mpp_from_spd(spd, eps=eps)
    p = spd[..., *seq[:num_sequence_indices]]
    tail = seq[1:]
    while len(tail) >= num_sequence_indices:
        p = mpp[..., *tail[:num_sequence_indices]] * p
        tail = tail[1:]
    return p, mpp


def tprint(size_a, cl_k, adata, epsilon=1e-10, nmax=float("inf"), file=None):
    """Debug-prints non-negligible entries of a transition table
    (`markov_tapes.py:236-256`)."""
    num_in = cl_k - 1
    a = np.asarray(adata).reshape([size_a] * (2 * num_in))
    for n, idx in enumerate(
        itertools.product(range(size_a), repeat=2 * num_in)
    ):
        if n >= nmax:
            print("... more entries...", file=file)
            break
        val = a[idx]
        if not abs(val) < epsilon:
            print(f"{idx[:num_in]} {idx[num_in:]}: {val}", file=file)


# --- Marginal pyramid -------------------------------------------------------
#
# The TPU analogue of the reference's lazily-filled marginal tables
# (`tape_multiverse.scm:362-418`): level j is the marginal over the FIRST j
# symbols, obtained by repeatedly summing over the trailing axis. The engine
# consumes all levels as one flat buffer with a trailing constant-1 slot
# (used for padding in factor chains).


def pyramid_offsets(size_a, cl_k):
    """Offsets of each level (cl_k down to 0) in the flat pyramid buffer.

    Returns ``(offsets, total)`` where ``offsets[j]`` is the start of the
    length-``size_a**j`` level-``j`` table, and ``total`` includes the final
    constant-1 slot at index ``total - 1``.
    """
    offsets = {}
    pos = 0
    for j in range(cl_k, -1, -1):
        offsets[j] = pos
        pos += size_a**j
    return offsets, pos + 1  # + 1 for the constant-1 slot


def guarded_ratio(num, den):
    """The reference's conditional-probability noise guard
    (`tape_multiverse.scm:560-562, 1263-1269`):
    ``num > 0 ? num / max(num, den) : 0`` — elementwise, device op.

    Written with the masked denominator forced to 1 (the "double-where"
    idiom) so reverse-mode AD through the solve never forms 0/0 in the
    division VJP at lanes where a whole context has zero probability —
    the primal values are bit-identical to the single-where form.
    """
    pos = num > 0
    safe_den = jnp.where(pos, jnp.maximum(num, den), 1.0)
    return jnp.where(pos, num, 0.0) / safe_den


def guarded_ratio_prod(pyr, num_idx, den_idx):
    """Chain products of guarded ratios gathered from a flat pyramid."""
    return jnp.prod(guarded_ratio(pyr[num_idx], pyr[den_idx]), axis=-1)


def pyramid(p, size_a, cl_k):
    """Flat marginal-pyramid buffer for an SPD vector ``p`` (device op)."""
    p = jnp.asarray(p).reshape(-1)
    levels = [p]
    cur = p
    for j in range(cl_k - 1, -1, -1):
        cur = cur.reshape(size_a**j, size_a).sum(axis=-1)
        levels.append(cur)
    levels.append(jnp.ones((1,), dtype=p.dtype))
    return jnp.concatenate(levels)


def pyramid_np(p, size_a, cl_k):
    """Numpy twin of :func:`pyramid` for the host-side reference engine."""
    p = np.asarray(p, dtype=np.float64).reshape(-1)
    levels = [p]
    cur = p
    for j in range(cl_k - 1, -1, -1):
        cur = cur.reshape(size_a**j, size_a).sum(axis=-1)
        levels.append(cur)
    levels.append(np.ones((1,), dtype=np.float64))
    return np.concatenate(levels)
