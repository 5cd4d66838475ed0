"""Ferromagnetic spin-chain companion models: analytic ODE + Metropolis MC.

The ex2 physics is computed three ways in the reference and cross-checked
on shared plots (SURVEY §4.2): the tape/MPD engine, an approximate
analytic island-population ODE (`examples/ex2_ferromagnet_analytic.py`),
and a Metropolis Monte-Carlo chain (`examples/ex2_ferromagnet_mc.py`).
This module provides the latter two, TPU-native:

- the analytic model is a small dense linear ODE (solved on device),
- the MC simulation runs all ensemble trials as one `vmap`, with each
  time step's flip trials processed in conflict-masked parallel rounds
  instead of the reference's strictly sequential loop
  (`ex2_ferromagnet_mc.py:100-121`). Within a round, trials are applied
  against the round-start state and a trial is dropped if an
  earlier-indexed trial in the same round touches a site within distance
  1 (the only case where sequential order matters). With 500 trials on a
  50,000-site ring in 20 rounds, the expected number of dropped trials is
  ≈ 0.6 per step (≈0.12% of trials) — far below the MC percentile-band
  width, so the statistics are equivalent; `rounds_per_step=trials` gives
  the exact sequential semantics if wanted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ode.dopri5 import odeint_dopri5


# --- Analytic island-population approximation -------------------------------

def island_rate_matrix(param_a, param_b, num_lengths):
    """Melt/grow rate matrix over island lengths 1..num_lengths
    (`ex2_ferromagnet_analytic.py:26-36`)."""
    m = np.zeros([num_lengths, num_lengths])
    m[0, 0] = -1.0  # a length-1 island can melt away entirely
    for k in range(1, num_lengths):
        m[k - 1, k] += 2 * param_a  # k -> k-1 melting
        m[k, k] -= 2 * param_a
        m[k, k - 1] += 2 * param_a * param_b  # growth
        m[k, k] -= 2 * param_a * param_b
    return m


def analytic_p_history(*, beta=1.0, J=1.0, h=-0.25, num_lengths=20,
                       t_max=40.0, t_steps=1001, p0_pair=1 / 250,
                       rtol=1e-10, atol=1e-10):
    """Island-length populations p(L, t) under melt/grow dynamics with
    spontaneous pair formation (`ex2_ferromagnet_analytic.py:39-61`)."""
    m = jnp.asarray(
        island_rate_matrix(np.exp(-beta * 4 * J), np.exp(beta * 2 * h),
                           num_lengths)
    )
    source = jnp.zeros(num_lengths).at[0].set(
        np.exp(-8 * beta * J + 2 * beta * h)
    )
    y0 = jnp.zeros(num_lengths).at[1].set(p0_pair)
    ts = jnp.linspace(0.0, t_max, t_steps)
    ys, _ = odeint_dopri5(
        lambda y, t: m @ y + source, y0, ts, (rtol, atol)
    )
    return np.clip(np.asarray(ys), 0, np.inf)


# --- Metropolis Monte-Carlo chain ------------------------------------------

def _flip_acceptance(chain, sites, beta_j, beta_h, h_positive):
    """Rejection-sampling thresholds for flipping ``chain[sites]``.

    Energy bookkeeping as in `ex2_ferromagnet_mc.py:102-118`: neighbor
    alignment contributes ΔE ∈ {-4J, 0, +4J}, normalised so the fastest
    flip (aligned triple) has rate 1; the field factor punishes flips out
    of the field-favored orientation.
    """
    n = chain.shape[0]
    left = chain[(sites - 1) % n]
    mid = chain[sites]
    right = chain[(sites + 1) % n]
    same = (left == mid).astype(jnp.int32) + (mid == right).astype(jnp.int32)
    e_after_minus_before = 2 * (same - (2 - same))
    rate_j = jnp.exp(-beta_j * (e_after_minus_before + 4))
    rate_h = jnp.where(
        h_positive,
        jnp.exp(-2 * beta_h * mid),
        jnp.exp(+2 * beta_h * (1 - mid)),
    )
    return rate_j * rate_h


@partial(jax.jit, static_argnums=(2, 3, 4, 8))
def simulate_metropolis(key, chain0, num_steps, trials_per_step,
                        rounds_per_step, J, h, beta,
                        observe_lengths=5):
    """Simulates the spin chain, returning island-length counts per step.

    Returns ``counts`` of shape ``[num_steps, observe_lengths + 1]`` where
    ``counts[t, L]`` is the number of up-islands of exact length L
    (column 0 unused, matching the reference's count layout,
    `ex2_ferromagnet_mc.py:172`).
    """
    chain0 = jnp.asarray(chain0, dtype=jnp.int32)
    n = chain0.shape[0]
    beta_j = beta * J
    beta_h = beta * h
    h_positive = h > 0
    round_size = trials_per_step // rounds_per_step

    def do_round(chain, sites, uniforms):
        accept = uniforms < _flip_acceptance(
            chain, sites, beta_j, beta_h, h_positive
        )
        # Drop any trial whose 3-neighborhood intersects that of an
        # earlier-indexed trial in this round (sequential-order hazard).
        d = jnp.abs(sites[:, None] - sites[None, :])
        d = jnp.minimum(d, n - d)
        earlier = jnp.tril(d <= 1, k=-1)
        conflicted = earlier.any(axis=1)
        apply = accept & ~conflicted
        flips = jnp.zeros(n, jnp.int32).at[sites].add(
            apply.astype(jnp.int32)
        )
        return chain ^ (flips & 1)

    def island_counts(chain):
        # counts[L] = number of maximal runs of ones of exact length L
        # (circular). A run of length L starts at i iff chain[i-1]=0 and
        # chain[i..i+L-1]=1 and chain[i+L]=0.
        counts = [jnp.zeros((), jnp.int32)]
        run = jnp.roll(chain, -1)  # window starting at i+... build shifts
        for L in range(1, 6):
            ok = (1 - jnp.roll(chain, 1))
            prod = ok
            for j in range(L):
                prod = prod * jnp.roll(chain, -j)
            prod = prod * (1 - jnp.roll(chain, -L))
            counts.append(prod.sum().astype(jnp.int32))
        del run
        return jnp.stack(counts)

    def step(carry, key_t):
        chain = carry
        k1, k2 = jax.random.split(key_t)
        sites = jax.random.randint(
            k1, (rounds_per_step, round_size), 0, n
        )
        uniforms = jax.random.uniform(
            k2, (rounds_per_step, round_size), dtype=jnp.float64
        )

        def body(r, ch):
            return do_round(ch, sites[r], uniforms[r])

        chain = jax.lax.fori_loop(0, rounds_per_step, body, chain)
        return chain, island_counts(chain)

    keys = jax.random.split(key, num_steps - 1)
    chain_final, counts = jax.lax.scan(step, chain0, keys)
    counts0 = island_counts(chain0)[None]
    return jnp.concatenate([counts0, counts], axis=0)


def mc_island_history(*, num_trials=100, chain_length=50_000,
                      num_steps=4000, trials_per_step=500,
                      sites_per_pair=250, J=1.0, h=-0.25, beta=1.0,
                      rounds_per_step=20, seed=1000):
    """Full MC ensemble: [num_trials, num_steps, 6] island counts.

    Replaces the reference's sequential 100-trial Python loop
    (`ex2_ferromagnet_mc.py:173-189`) with a vmapped batch on device.
    Initial chains place isolated up-pairs at density 1/sites_per_pair
    (`:178-179`).
    """
    key = jax.random.PRNGKey(seed)
    k_init, k_sim = jax.random.split(key)
    pair_pos = (
        jax.random.uniform(
            k_init, (num_trials, chain_length), dtype=jnp.float64
        ) < 1.0 / sites_per_pair
    )
    chains0 = (pair_pos | jnp.roll(pair_pos, 1, axis=1)).astype(jnp.int32)

    sim = jax.vmap(
        lambda k, c0: simulate_metropolis(
            k, c0, num_steps, trials_per_step, rounds_per_step, J, h, beta
        )
    )
    counts = sim(jax.random.split(k_sim, num_trials), chains0)
    return np.asarray(counts)


def energy(chains, J, h):
    """Total Ising energy of (batched) chains
    (`ex2_ferromagnet_mc.py:125-131`)."""
    pm = np.asarray(chains, dtype=np.float64) * 2 - 1
    e_j = -J * (
        (pm[..., 1:] * pm[..., :-1]).sum(axis=-1)
        + pm[..., 0] * pm[..., -1]
    )
    return e_j - h * pm.sum(axis=-1)


def island_length_stats(chain, is_up=True):
    """Host-side exact island statistics dict (wraparound-aware), for
    parity with `ex2_ferromagnet_mc.py:134-163`."""
    chain = np.asarray(chain).astype(np.int8)
    eff = chain if is_up else 1 - chain
    if eff.min() == 1:  # degenerate all-up chain
        return {chain.size: 1}
    prefix = int(eff.argmin())
    suffix = int(eff[::-1].argmin())
    wrap_len = prefix + suffix
    core = eff[prefix:chain.size - suffix]
    stats = {wrap_len: int(wrap_len > 0)}
    if core.size == 0:
        return stats
    swaps = np.flatnonzero(core[:-1] ^ core[1:])
    assert len(swaps) % 2 == 0
    for lo, hi in swaps.reshape(-1, 2):
        stats[hi - lo] = stats.get(hi - lo, 0) + 1
    return stats


# --- Exact Ising equilibrium (transfer matrix) -------------------------------

def ising_gibbs_windows(cl_k, *, J_eff, h, beta):
    """Exact length-``cl_k`` window probabilities of the infinite-chain
    1D Ising Gibbs measure (transfer matrix; symbol 0 = D = spin −1,
    1 = U = +1).

    This is the equilibrium the ex2 tape rule relaxes to: its bond
    factor exp(-βJ(4+2e)) (`problems.scm:36-43`, e = alignment count
    ∈ {-2,0,2}) gives a forward/backward flip-rate ratio exp(-4βJe) —
    detailed balance w.r.t. an Ising Hamiltonian with ``J_eff = 2J`` —
    and the field factor exp(-2β·max(0,±h)) gives exp(-2βh), detailed
    balance at field ``h``. The Gibbs measure of
    H = -J_eff Σ s s' − h Σ s is order-1 Markov, i.e. inside the SPD
    closure for any cl_k ≥ 2, so it is an exact root of the engine's
    dy/dt (tested at 1e-15 in `tests/test_steady.py`).
    """
    sv = np.array([-1.0, 1.0])
    T = np.exp(beta * (J_eff * np.outer(sv, sv)
                       + h * (sv[:, None] + sv[None, :]) / 2))
    w, V = np.linalg.eig(T)
    i = int(np.argmax(w.real))
    lam, r = w.real[i], V[:, i].real
    wl, Vl = np.linalg.eig(T.T)
    left = Vl[:, int(np.argmax(wl.real))].real
    if (left @ r) < 0:
        r = -r

    def window(bits):
        v = left[bits[0]] * r[bits[-1]]
        for a, b in zip(bits[:-1], bits[1:]):
            v *= T[a, b] / lam
        return v / (left @ r)

    p = np.array([window([(idx >> (cl_k - 1 - j)) & 1
                          for j in range(cl_k)])
                  for idx in range(2 ** cl_k)])
    return p / p.sum()
