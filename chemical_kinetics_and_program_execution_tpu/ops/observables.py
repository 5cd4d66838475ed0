"""Device-side observable projections over SPD trajectories.

Every example observable — ``seq_prob`` of a window no longer than
cl_k (`framework/markov_tapes.py:190-233`, the ``excess >= 0`` branch)
and per-symbol marginals — is a *linear* functional of the SPD: a
slice-sum over the window-rank axis. Evaluating these on device and
transferring only the projected rows turns a large-state solve's host
transfer from O(samples × size_a^cl_k) into O(samples × n_obs); at
cl_k=7 ex4 geometry (4.78M-dim f64 state) that is the difference
between ~2 GB and a few kB over the TPU tunnel.

Used via the ``project=`` parameter of `ode.integrate.solve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seq_prob_projector(seqs, size_a: int, cl_k: int):
    """Jitted ``[T, size_a**cl_k] -> [T, len(seqs)]`` projection.

    Column j is ``seq_prob(p, seqs[j])`` for a sequence of length
    l ≤ cl_k: marginalise the leading ``cl_k - l`` window axes and read
    the trailing-rank slice (matching `markov.seq_prob`'s short-sequence
    branch bit for bit — asserted in `tests/test_ode.py`).
    """
    plan = []
    for seq in seqs:
        length = len(seq)
        if length < 1:
            raise ValueError(f"empty sequence {seq!r}")
        if length > cl_k:
            raise ValueError(
                f"sequence {seq!r} longer than cl_k={cl_k}: the "
                "Markov-chain extension is not linear in p"
            )
        rank = 0
        for s in seq:
            if not 0 <= s < size_a:
                raise ValueError(f"symbol {s} outside alphabet "
                                 f"[0, {size_a})")
            rank = rank * size_a + s
        plan.append((length, rank))

    @jax.jit
    def project(p):
        p = jnp.asarray(p)
        t = p.shape[0]
        cols = [
            p.reshape(t, size_a ** (cl_k - length), size_a ** length)[
                :, :, rank
            ].sum(axis=1)
            for length, rank in plan
        ]
        return jnp.stack(cols, axis=1)

    return project


def markov_entropy_projector(size_a: int, cl_k: int):
    """Jitted ``[T, size_a**cl_k] -> [T, 1]`` Markov entropy-rate column.

    The ``project=`` hook of `ode.integrate.solve` is not limited to
    linear functionals; this computes `markov.markov_entropy` (the
    ex4var1 physics observable, `markov_tapes.py:178-187`) on device —
    identical clipping semantics — so entropy-production traces stay
    available in observables-only large-state solves where the full
    state never crosses the host link. Compose with
    `seq_prob_projector` via `stack_projectors`.
    """
    n_ctx = size_a ** (cl_k - 1)

    @jax.jit
    def project(p):
        p = jnp.asarray(p)
        t = p.shape[0]
        spd = jnp.clip(p.reshape(t, n_ctx, size_a), 1e-280, 1.0)
        reduced = spd.sum(axis=-1)
        conditional = spd / reduced[..., None]
        h = (-conditional * jnp.log(conditional)).sum(axis=-1)
        return jnp.sum(h * reduced, axis=-1, keepdims=True)

    return project


def stack_projectors(*projectors):
    """Concatenates projector outputs column-wise into one projection."""

    @jax.jit
    def project(p):
        return jnp.concatenate([proj(p) for proj in projectors], axis=1)

    return project
