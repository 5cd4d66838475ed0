"""Gillespie SSA (direct method) for mass-action reaction networks.

The reference treats stochastic kinetics only through the ODE mean-field
limit (`examples/autocatalysis.py`) and the lattice MC; the BASELINE
north-star additionally asks for SSA trajectory throughput ("SSA
trajectories/sec"). This module provides a TPU-native direct-method SSA:
``vmap`` over trajectories, ``lax.scan`` over reaction events, dense
propensity evaluation from stoichiometry matrices — no per-trajectory
Python control flow.

A network is defined by integer matrices ``reactants[R, S]`` and
``products[R, S]`` plus rate constants ``rates[R]``; propensity of
reaction r in state n is ``rates[r] · Π_s falling_factorial(n_s, m_rs)``
(classical mass-action combinatorics).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ReactionNetwork:
    reactants: np.ndarray  # [R, S] int
    products: np.ndarray  # [R, S] int
    rates: np.ndarray  # [R] float

    @property
    def num_species(self) -> int:
        return self.reactants.shape[1]

    @property
    def stoichiometry(self) -> np.ndarray:
        return self.products - self.reactants

    @property
    def static(self) -> tuple:
        """Hashable form for jit static arguments."""
        return (
            tuple(map(tuple, self.reactants.tolist())),
            tuple(map(tuple, self.products.tolist())),
            tuple(self.rates.tolist()),
        )


def autocatalysis_network(c_form_a, c_auto_a, c_stab_a,
                          c_form_b, c_auto_b, c_stab_b,
                          c_add, c_remove, volume=1000.0):
    """Discrete counterpart of the autocatalysis ODE
    (`autocatalysis.py:126-151`); ``volume`` converts concentration rate
    constants to stochastic ones. Species order: [A, B, M]."""
    A, B, M = (1, 0, 0), (0, 1, 0), (0, 0, 1)

    def v(*t):
        return np.array(t)

    reactants, products, rates = [], [], []

    def add(r, p, k):
        reactants.append(v(*r))
        products.append(v(*p))
        rates.append(k)

    # 2M -> A / B (spontaneous formation), A + 2M -> 2A (autocatalysis),
    # and the reverse dissociations; flow feed/removal.
    add((0, 0, 2), (1, 0, 0), c_form_a / volume)
    add((0, 0, 2), (0, 1, 0), c_form_b / volume)
    add((1, 0, 2), (2, 0, 0), c_auto_a / volume**2)
    add((0, 1, 2), (0, 2, 0), c_auto_b / volume**2)
    add((1, 0, 0), (0, 0, 2), c_form_a / c_stab_a)
    add((0, 1, 0), (0, 0, 2), c_form_b / c_stab_b)
    add((2, 0, 0), (1, 0, 2), c_auto_a / c_stab_a / volume)
    add((0, 2, 0), (0, 1, 2), c_auto_b / c_stab_b / volume)
    add((0, 0, 0), (0, 0, 1), c_add * volume)
    add((1, 0, 0), (0, 0, 0), c_remove)
    add((0, 1, 0), (0, 0, 0), c_remove)
    add((0, 0, 1), (0, 0, 0), c_remove)
    del A, B, M
    return ReactionNetwork(
        np.stack(reactants), np.stack(products), np.asarray(rates)
    )


def _propensities(n, reactants, rates, max_order):
    """Mass-action propensities with falling-factorial combinatorics."""
    prop = jnp.broadcast_to(rates, rates.shape).astype(jnp.float64)
    for j in range(max_order):
        factor = jnp.where(
            reactants > j, (n[None, :] - j).astype(jnp.float64), 1.0
        )
        prop = prop * jnp.prod(jnp.maximum(factor, 0.0), axis=1)
    return prop


@partial(jax.jit, static_argnums=(2, 3))
def ssa_trajectories(key, n0, network_static, num_events):
    """Runs one SSA trajectory per key batch entry.

    Args:
      key: PRNG key (batched via vmap outside).
      n0: initial counts [S].
      network_static: tuple of hashable tuples (reactants, products, rates)
        — static so each network compiles once.
      num_events: number of reaction events to simulate (static).

    Returns:
      (times [num_events], states [num_events, S]) — the jump chain; a
      time past the last event means the system went quiescent.
    """
    reactants_np = np.asarray(network_static[0])
    max_order = int(reactants_np.max()) if reactants_np.size else 0
    reactants, products, rates = (
        jnp.asarray(np.asarray(x)) for x in network_static
    )
    stoich = (products - reactants).astype(jnp.int64)

    def step(carry, k):
        t, n = carry
        prop = _propensities(n, reactants, rates, max_order)
        total = prop.sum()
        k1, k2 = jax.random.split(k)
        alive = total > 0
        dt = jnp.where(
            alive,
            jax.random.exponential(k1, dtype=jnp.float64)
            / jnp.maximum(total, 1e-300),
            jnp.inf,
        )
        r = jax.random.choice(
            k2, prop.shape[0],
            p=jnp.where(alive, prop / jnp.maximum(total, 1e-300),
                        jnp.ones_like(prop) / prop.shape[0]),
        )
        n_new = jnp.where(alive, n + stoich[r], n)
        t_new = t + dt
        return (t_new, n_new), (t_new, n_new)

    keys = jax.random.split(key, num_events)
    (_, _), (ts, ns) = jax.lax.scan(
        step, (jnp.asarray(0.0, jnp.float64), jnp.asarray(n0, jnp.int64)),
        keys,
    )
    return ts, ns


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ssa_batch_tm(key, n0, network_static, num_events, batch,
                 dtype=jnp.float32):
    """Batch-native SSA core, TIME-MAJOR outputs (the scan's natural
    layout): the whole ensemble advances one reaction event per scan
    step, laid out species/reaction-major (``[S, B]``/``[R, B]``) so
    the batch rides the TPU lane dimension (a ``vmap`` over the
    per-trajectory stepper leaves the tiny R/S axes innermost, padding
    every vector 10 -> 128). The state update is a one-hot
    stoichiometry matmul — gather-free.

    Round-5 speed-of-light rework (`probes/ssa_decompose.py` measured
    the old step at 137 ms/call: propensity broadcast 45 ms, threefry
    32 ms, recording+transposes 55 ms at B=65536, E=1000):

    * propensities are PER-REACTION UNROLLED over the static sparsity
      (each reaction reads its ≤2 reactant species as [B]-vector
      falling factorials) instead of materialising the [R, S, B]
      masked broadcast tensor max_order times;
    * both uniforms come from ONE threefry draw ``uniform(k, (2, B))``
      (no per-step key split, half the RNG calls); dt uses the exact
      inverse-CDF ``-log(1-u)/total``;
    * outputs stay TIME-MAJOR — ``(times [E, B] f64, states
      [E, S, B] int32)`` — because the batch-major convention cost two
      full-array device transposes (~2.6 GB of pure layout traffic per
      bench call). :func:`ssa_batch` wraps this core with the
      batch-major transposes for API compatibility.

    ``dtype`` sets the propensity/sampling precision. float32 (default)
    is the benched throughput path; its falling-factorial products lose
    resolution once counts approach 2^24 ≈ 1.7e7 — the f32/f64
    statistical parity test (`tests/test_models.py`) bounds the bias at
    the shipped workloads' count scales, and ``dtype=jnp.float64`` gives
    the exact formulation at batch layout.
    """
    reactants_np = np.asarray(network_static[0])
    rates_np = np.asarray(network_static[2])
    reactants, products, rates = (
        jnp.asarray(np.asarray(x)) for x in network_static
    )
    n_r, n_s = reactants.shape
    stoich_t = (products - reactants).astype(dtype).T  # [S, R]

    def step(carry, k):
        t, n = carry  # t [B] f64, n [S, B] int32
        nf = n.astype(dtype)
        # Per-reaction mass-action products over the STATIC sparsity:
        # reaction r touches only its nonzero-reactant species, so each
        # propensity is a short [B]-vector product (the old [R, S, B]
        # broadcast built a 30x larger masked tensor max_order times).
        props = []
        for r in range(n_r):
            p_r = jnp.full((nf.shape[1],), dtype(rates_np[r]))
            for s in range(n_s):
                m = int(reactants_np[r, s])
                for j in range(m):
                    p_r = p_r * jnp.maximum(nf[s] - j, 0.0)
            props.append(p_r)
        prop = jnp.stack(props)  # [R, B]
        total = prop.sum(axis=0)  # [B]
        alive = total > 0
        u2 = jax.random.uniform(k, (2,) + total.shape, dtype)
        dt = jnp.where(
            alive,
            -jnp.log1p(-u2[0]) / jnp.maximum(total, 1e-30),
            jnp.inf,
        ).astype(jnp.float64)
        u = u2[1] * total
        cum = jnp.cumsum(prop, axis=0)
        r = jnp.minimum((u[None, :] >= cum).sum(axis=0), n_r - 1)  # [B]
        onehot = (jnp.arange(n_r)[:, None] == r[None, :]).astype(
            dtype)  # [R, B]
        delta = (stoich_t @ onehot).astype(jnp.int32)  # [S, B]
        n_new = jnp.where(alive[None, :], n + delta, n)
        t_new = t + dt
        return (t_new, n_new), (t_new, n_new)

    n0_b = jnp.broadcast_to(
        jnp.asarray(n0, jnp.int32)[:, None], (n_s, batch)
    )
    keys = jax.random.split(key, num_events)
    _, (ts, ns) = jax.lax.scan(
        step, (jnp.zeros(batch, jnp.float64), n0_b), keys
    )
    return ts, ns


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ssa_batch(key, n0, network_static, num_events, batch,
              dtype=jnp.float32):
    """Batch-major wrapper of :func:`ssa_batch_tm`.

    Returns (times [B, E] float64, states [B, E, S] int32).
    """
    ts, ns = ssa_batch_tm(key, n0, network_static, num_events, batch,
                          dtype)
    return ts.T, jnp.transpose(ns, (2, 0, 1))


def run_ssa_ensemble(network: ReactionNetwork, n0, num_trajectories,
                     num_events, seed=0):
    """SSA ensemble: returns (times [B, E], states [B, E, S])."""
    ts, ns = ssa_batch(jax.random.PRNGKey(seed), tuple(int(x) for x in n0),
                       network.static, num_events, num_trajectories)
    return np.asarray(ts), np.asarray(ns)
