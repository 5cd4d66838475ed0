"""Stochastic thermodynamics of the tape dynamics.

The reference's only thermodynamic observable is the *state* entropy
trace of ex4var1 (`examples/ex4var1_chemical_turing.py:142-154`). This
module adds the *path* functional — entropy production — which only the
concrete-tape sampling engines can measure, together with its exact
oracles:

- Per-event medium entropy ``sigma = ln R(w -> w') - ln R(w' -> w)``
  from the rule's exact outcome tables (the same enumeration the master
  equation is built from, `engine/master.py`), addressed on device by
  ``(combined window rank, fired write spec)``.
- A device ensemble runner (`run_ensemble_sigma`) that accumulates each
  member's cumulative medium entropy along the sampled dynamics, plus
  the count of absolutely irreversible events (jumps whose reverse rate
  is exactly 0 — rules like plain ex4 are *not* thermodynamically
  consistent, and the instrument reports that instead of hiding it).
- Exact master-equation rates (`master_entropy_rates`): total entropy
  production rate (zero exactly at detailed balance / Gibbs) and the
  medium (environment) part, for gating the sampled instrument.
- A closure-side rate expression (`medium_entropy_rate_spd`): the
  per-site medium entropy production is a functional of the rule-window
  marginals only, so the exact SPD closure can evaluate it along solved
  trajectories — and evaluated at the master state's site-averaged
  window marginals it equals the master rate *identically* (tested).

Validation strategy (tests/test_thermo.py): table antisymmetry, the
ex2 <-> 1D Ising detailed-balance identity (sigma per flip equals
beta*dE at J_eff = 2J), master identities (sigma_tot(gibbs) = 0,
sigma_tot = -dD(p||pi)/dt under detailed balance), a 6-sigma gate of
the sampled cumulative sigma against the exact discrete kernel, and
the integral fluctuation theorem <exp(-sigma_tot)> = 1 at trajectory
level.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import markov
from ..engine import dsl
from ..engine import ensemble as ens
from ..engine import master


# --- Outcome-rate tables over the machine's combined window -----------------


def _machine_write_specs(dm) -> tuple[np.ndarray, np.ndarray]:
    """Host decode of the DeviceMachine's packed write words.

    Returns ``(mask [num_specs, n_cells] bool, val [num_specs, n_cells]
    int32)`` — the write set of each spec over the combined window
    (cells in machine order: program cells then data cells).
    """
    from ..engine.ensemble import wr_field_host

    n = dm.n_cells
    mask = np.zeros((dm.num_specs, n), bool)
    val = np.zeros((dm.num_specs, n), np.int32)
    specs = np.arange(dm.num_specs)
    for c in range(n):
        mask[:, c], val[:, c] = wr_field_host(dm.wr_words[c], specs,
                                              dm.wr_bits)
    return mask, val


def _decode_rank(w: int, n: int, a: int) -> list[int]:
    """Big-endian digits of ``w`` (cell 0 most significant)."""
    digits = [0] * n
    for j in range(n - 1, -1, -1):
        digits[j] = w % a
        w //= a
    return digits


def outcome_rate_maps(dm, *, max_windows: int = 1 << 20):
    """Aggregated jump rates over every combined machine window.

    Returns ``rates`` with ``rates[w] = {w2: R(w -> w2)}`` over combined
    window ranks (program cells then data cells, big-endian), where
    ``R`` sums the rule's outcome probabilities producing the same
    changed window — per site per unit time, identity outcomes dropped.
    Enumerated with the master equation's concrete pair driver
    (`master.enumerate_pair_outcomes`), so two-tape rules carry the
    tethered (concrete-tape) semantics the ensemble engine implements.
    """
    problem = dsl.get_problem(dm.tag)
    a = dm.size_a
    n = dm.n_cells
    S = a**n
    if S > max_windows:
        raise ValueError(
            f"{dm.tag!r}: combined window space {a}^{n} = {S} exceeds "
            f"max_windows={max_windows}")
    rates: list[dict[int, float]] = []
    pow_ = [a ** (n - 1 - j) for j in range(n)]
    for w in range(S):
        digits = _decode_rank(w, n, a)
        wp = {dm.p_lo + j: digits[j] for j in range(dm.n_p)}
        wd = {dm.d_lo + j: digits[dm.n_p + j] for j in range(dm.n_d)}
        outs, reach_p, reach_d = master.enumerate_pair_outcomes(
            problem, wp, wd)
        if (reach_p[0] < dm.p_lo or reach_p[1] > dm.p_lo + dm.n_p - 1
                or reach_d[0] < dm.d_lo
                or reach_d[1] > dm.d_lo + dm.n_d - 1):
            raise ValueError(
                f"{dm.tag!r}: rule reach exceeds the compiled machine "
                "window — decision machine and outcome table disagree")
        r: dict[int, float] = {}
        for prob, writes_p, writes_d in outs:
            if prob <= 0.0:
                continue
            w2 = w
            for off, v in writes_p.items():
                j = off - dm.p_lo
                w2 += (v - digits[j]) * pow_[j]
            for off, v in writes_d.items():
                j = dm.n_p + off - dm.d_lo
                w2 += (v - digits[j]) * pow_[j]
            if w2 != w:
                r[w2] = r.get(w2, 0.0) + prob
        rates.append(r)
    return rates


@dataclasses.dataclass(frozen=True)
class ThermoTables:
    """Per-(window, spec) medium-entropy payload for the device runner.

    ``sigma[w, s]`` = ln R(w -> w') - ln R(w' -> w) for the jump the
    write spec ``s`` performs on window ``w`` (0 for identity specs and
    for irreversible jumps); ``irrev[w, s]`` marks jumps whose reverse
    rate is exactly zero (sigma = +inf physically). ``rates`` keeps the
    aggregated host-side jump maps for the rate-level functions.
    """

    tag: str
    size_a: int
    n_cells: int
    sigma: np.ndarray  # [S, num_specs] float64
    irrev: np.ndarray  # [S, num_specs] bool
    rates: list

    @property
    def num_windows(self) -> int:
        return self.sigma.shape[0]


def sigma_spec_tables(dm, *, max_windows: int = 1 << 20) -> ThermoTables:
    """Builds the per-(window, write-spec) medium-entropy tables."""
    rates = outcome_rate_maps(dm, max_windows=max_windows)
    a, n = dm.size_a, dm.n_cells
    S = a**n
    mask, val = _machine_write_specs(dm)
    pow_ = np.array([a ** (n - 1 - j) for j in range(n)], np.int64)
    sigma = np.zeros((S, dm.num_specs), np.float64)
    irrev = np.zeros((S, dm.num_specs), bool)
    for w in range(S):
        digits = np.array(_decode_rank(w, n, a), np.int64)
        for s in range(dm.num_specs):
            nd = np.where(mask[s], val[s], digits)
            w2 = int((nd * pow_).sum())
            if w2 == w:
                continue
            fwd = rates[w].get(w2, 0.0)
            if fwd <= 0.0:
                # (w, s) never co-fires: the spec's leaf is inconsistent
                # with this window. Leave 0 — the gather never lands here.
                continue
            rev = rates[w2].get(w, 0.0)
            if rev <= 0.0:
                irrev[w, s] = True
            else:
                sigma[w, s] = math.log(fwd) - math.log(rev)
    return ThermoTables(tag=dm.tag, size_a=a, n_cells=n, sigma=sigma,
                        irrev=irrev, rates=rates)


# --- Rate-level functionals ---------------------------------------------------


def medium_entropy_rate_from_window_probs(pw, tables: ThermoTables):
    """Per-site medium entropy production rate at combined-window
    marginals ``pw`` ([S], summing to 1): ``sum_w pw[w] sum_w2
    R(w->w2) ln(R(w->w2)/R(w2->w))``.

    Returns ``(rate, irrev_flux)`` — the finite part and the probability
    flux through absolutely irreversible jumps (whose entropy rate is
    +inf physically; zero for detailed-balance-consistent rules).
    """
    pw = np.asarray(pw, np.float64)
    rate = 0.0
    irrev_flux = 0.0
    for w, r in enumerate(tables.rates):
        if pw[w] == 0.0 or not r:
            continue
        for w2, fwd in r.items():
            rev = tables.rates[w2].get(w, 0.0)
            if rev <= 0.0:
                irrev_flux += pw[w] * fwd
            else:
                rate += pw[w] * fwd * (math.log(fwd) - math.log(rev))
    return rate, irrev_flux


def window_probs_from_spd(spd, dm, *, spd_prog=None):
    """Combined-window probabilities ``[S]`` under the closure's
    well-mixed reveal semantics: program and data windows are
    independent draws from their tape's SPD (the shared engine uses one
    SPD for both — pass ``spd_prog`` for dual-SPD problems).

    Window probabilities beyond the stored ``cl_k`` use the SPD's
    Markov extension (`markov.seq_prob`), exactly like the engines.
    """
    spd = np.asarray(spd, np.float64)
    a, n = dm.size_a, dm.n_cells
    spd_p = spd if spd_prog is None else np.asarray(spd_prog, np.float64)

    def tape_probs(spd_t, m):
        if m <= 0:
            return np.ones(1)
        cl_k = round(math.log(spd_t.size) / math.log(a))
        arr = spd_t.reshape([a] * cl_k)
        out = np.empty(a**m)
        mpp = None
        for r in range(a**m):
            seq = _decode_rank(r, m, a)
            p, mpp = markov.seq_prob(arr, seq, mpp=mpp)
            out[r] = float(p)
        return out

    pp = tape_probs(spd_p, dm.n_p)
    pd = tape_probs(spd, dm.n_d)
    return (pp[:, None] * pd[None, :]).reshape(-1)


def medium_entropy_rate_spd(spd, dm, tables: ThermoTables, *,
                            spd_prog=None):
    """Closure-side per-site medium entropy production rate at an SPD
    state (see `medium_entropy_rate_from_window_probs`)."""
    pw = window_probs_from_spd(spd, dm, spd_prog=spd_prog)
    return medium_entropy_rate_from_window_probs(pw, tables)


def master_entropy_rates(Q, p):
    """Exact entropy production rates of the master equation at state
    ``p``: returns ``(total, medium)`` with

    ``medium = sum_{x != y} p_x W(x->y) ln[W(x->y)/W(y->x)]``
    ``total  = sum_{x != y} p_x W(x->y) ln[(p_x W(x->y))/(p_y W(y->x))]``

    where ``W(x->y) = Q[y, x]`` (columns are from-states). ``total`` is
    the non-negative Schnakenberg rate, exactly zero iff detailed
    balance holds at ``p``. Raises on absolutely irreversible flux
    (W forward > 0 with W reverse = 0 and p_x > 0).
    """
    import scipy.sparse as sp

    p = np.asarray(p, np.float64)
    C = sp.coo_matrix(Q)
    S = C.shape[0]
    off = (C.row != C.col) & (C.data > 0)
    rows = C.row[off].astype(np.int64)
    cols = C.col[off].astype(np.int64)
    vals = C.data[off]
    # Vectorized reverse-entry lookup: match (row, col) with (col, row).
    keys = rows * S + cols
    order = np.argsort(keys)
    rev_keys = cols * S + rows
    pos = np.searchsorted(keys[order], rev_keys)
    pos_c = np.minimum(pos, len(keys) - 1)
    found = keys[order][pos_c] == rev_keys
    w_rev = np.where(found, vals[order][pos_c], 0.0)
    px = p[cols]
    live = (px > 0) & (vals > 0)
    if np.any(live & (w_rev <= 0.0)):
        raise ValueError("absolutely irreversible flux: entropy "
                         "production rate is infinite at this state")
    flux = np.where(live, px * vals, 0.0)
    lr = np.where(live, np.log(vals / np.maximum(w_rev, 1e-300)), 0.0)
    medium = float(np.sum(flux * lr))
    py = np.maximum(p[rows], 1e-300)
    lt = np.where(live,
                  np.log(np.maximum(px, 1e-300) / py), 0.0)
    total = float(np.sum(flux * (lr + lt)))
    return total, medium


def relative_entropy(p, q):
    """D(p || q) = sum p ln(p/q) (nats); entries with p = 0 contribute 0."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    m = p > 0
    return float(np.sum(p[m] * (np.log(p[m]) - np.log(np.maximum(q[m],
                                                                 1e-300)))))


def relative_entropy_rate(Q, p, pi):
    """Exact d/dt D(p || pi) along dp/dt = Q p: ``sum (Qp) ln(p/pi)``
    (the +1 term of the derivative vanishes since columns of Q sum to
    0). For detailed-balanced Q with stationary pi this equals
    ``-sigma_tot(p)`` pointwise — the identity the entropy-production
    example gates at machine precision."""
    p = np.asarray(p, np.float64)
    pi = np.asarray(pi, np.float64)
    pdot = np.asarray(Q @ p)
    m = np.abs(pdot) > 0
    return float(np.sum(pdot[m] * (np.log(np.maximum(p[m], 1e-300))
                                   - np.log(np.maximum(pi[m], 1e-300)))))


# --- The device instrument ----------------------------------------------------


def _round_sigma(dm, tables_dev, spec, cells):
    """Per-member (sigma increment, irreversible-event count) of one
    round, from the pre-write window cells and the fired specs."""
    sigma_dev, irrev_dev = tables_dev
    a, n = dm.size_a, dm.n_cells
    w = jnp.zeros(spec.shape, jnp.int32)
    for j in range(n):
        w = w * a + cells[..., j].astype(jnp.int32)
    s32 = spec.astype(jnp.int32)
    sig = sigma_dev[w, s32]
    irr = irrev_dev[w, s32]
    sig = jnp.where(irr, 0.0, sig)
    return sig.sum(axis=-1), irr.sum(axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(4,),
         static_argnames=("independent_sites",))
def run_ensemble_sigma(key, tapes, dm, tables_dev, steps_events, *,
                       independent_sites: bool = False):
    """`ensemble.run_ensemble` twin that accumulates each member's
    cumulative medium entropy production along the sampled dynamics.

    Args:
      key: PRNG key.
      tapes: (ptape [B, L] int32, dtape [B, L] int32) ring pair.
      dm: compiled :class:`ensemble.DeviceMachine`.
      tables_dev: ``(sigma [S, num_specs] f64, irrev bool)`` device
        arrays from :class:`ThermoTables` (pass
        ``(jnp.asarray(t.sigma), jnp.asarray(t.irrev))``).
      steps_events: (num_steps, events_per_step), static; same round
        geometry rules as `run_ensemble`.
      independent_sites: per-member lattice phases (the rare-pattern
        instrument mode), as in `run_ensemble`.

    Returns ``((ptape, dtape), sigma [B] f64, n_irrev [B] int32,
    times [num_steps] f64)`` — cumulative per-member medium entropy,
    count of absolutely irreversible events fired (sigma excludes
    them; nonzero means the rule is not thermodynamically consistent),
    and the cumulative Poisson-calibrated time grid.
    """
    num_steps, events = steps_events
    ptape, dtape = tapes
    B, L = ptape.shape
    ens._check_round_geometry(L, events, dm.span)
    stride = L // events
    keys = jax.random.split(key, num_steps)

    def apply_round(pt, dt_, shift, uniforms):
        rp = ens._roll_cols(pt, shift + dm.p_lo).reshape(B, events, stride)
        rd = ens._roll_cols(dt_, shift + dm.d_lo).reshape(B, events,
                                                          stride)
        cells = jnp.concatenate(
            [rp[:, :, :dm.n_p], rd[:, :, :dm.n_d]], axis=-1)
        spec = ens._machine_specs(dm, cells, uniforms)
        sig, nirr = _round_sigma(dm, tables_dev, spec, cells)
        new_cells = ens._machine_writes(dm, spec, cells)
        rp = rp.at[:, :, :dm.n_p].set(new_cells[..., :dm.n_p])
        rd = rd.at[:, :, :dm.n_d].set(new_cells[..., dm.n_p:])
        pt = ens._roll_cols(rp.reshape(B, L), -(shift + dm.p_lo))
        dt_ = ens._roll_cols(rd.reshape(B, L), -(shift + dm.d_lo))
        return pt, dt_, sig, nirr

    def step(carry, k):
        pt, dt_, phase, sig, nirr = carry
        k1, k2 = jax.random.split(k)
        uniforms = jax.random.uniform(k2, (B, events), jnp.float32)
        if independent_sites:
            shifts = jax.random.randint(k1, (B,), 0, L, dtype=jnp.int32)
            delta = (shifts - phase) % L
            pt = ens._roll_rows(pt, delta)
            dt_ = ens._roll_rows(dt_, delta)
            pt, dt_, ds, dn = apply_round(pt, dt_, jnp.int32(0), uniforms)
            phase = shifts
        else:
            shift = jax.random.randint(k1, (), 0, L, dtype=jnp.int32)
            pt, dt_, ds, dn = apply_round(pt, dt_, shift, uniforms)
        return (pt, dt_, phase, sig + ds, nirr + dn), None

    phase0 = (jnp.zeros((B,), jnp.int32)
              + (keys[0].sum() * 0).astype(jnp.int32))
    carry = (ptape, dtape, phase0, jnp.zeros((B,), jnp.float64),
             jnp.zeros((B,), jnp.int32))
    (ptape, dtape, phase, sigma, n_irrev), _ = jax.lax.scan(
        step, carry, keys)
    if independent_sites:
        ptape = ens._roll_rows(ptape, -phase)
        dtape = ens._roll_rows(dtape, -phase)
    dt_round = -jnp.log1p(-events / L)
    times = dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)
    return (ptape, dtape), sigma, n_irrev, times


def device_tables(tables: ThermoTables):
    """Device payload for :func:`run_ensemble_sigma`."""
    return (jnp.asarray(tables.sigma), jnp.asarray(tables.irrev))


# --- The free-enthalpy ledger (rules with a per-symbol G landscape) ----------


@partial(jax.jit, static_argnums=(4,),
         static_argnames=("independent_sites",))
def run_ensemble_ledger(key, tapes, dm, ledger, steps_events, *,
                        independent_sites: bool = False):
    """`run_ensemble` twin that accumulates each member's dissipated
    free enthalpy through a per-symbol G landscape.

    For rules whose rates derive from per-symbol free enthalpies with
    local detailed balance — ex4var2's construction satisfies
    ``ln(r_fwd/r_rev) = -2 beta dG`` exactly per outcome-resolved
    channel (`tests/test_thermo.py::test_ex4var2_channel_affinities`) —
    the per-event entropy production is the cell-additive ledger
    ``sigma = beta_eff * sum_changed (G[old] - G[new])``, so no
    (window, spec) table is needed: one G gather per touched cell.

    Args:
      ledger: ``(g_prog [size_a], g_data [size_a], beta_eff)`` — the
        per-symbol potentials per tape (usually identical) and the
        effective inverse temperature (2*beta for the reference's
        choose-encoded rate construction).
    Returns ``((ptape, dtape), sigma [B] f64, (spec_counts
    [B, num_specs] int32, spec_sigma [B, num_specs] f64),
    times [num_steps])`` — cumulative per-member entropy production
    (nats), per-member counts of each fired write spec, and each
    spec's share of the accumulated sigma. Per-spec sigma is NOT
    constant in general (the machine dedups write specs across guard
    paths with different overwritten symbols — e.g. ex4var2's
    S,A->E and S,D->E share one spec), so the decomposition is
    accumulated exactly rather than inferred from counts.
    """
    num_steps, events = steps_events
    g_prog, g_data, beta_eff = ledger
    ptape, dtape = tapes
    B, L = ptape.shape
    ens._check_round_geometry(L, events, dm.span)
    stride = L // events
    keys = jax.random.split(key, num_steps)
    g_cells = ([g_prog] * dm.n_p) + ([g_data] * dm.n_d)

    def apply_round(pt, dt_, shift, uniforms):
        rp = ens._roll_cols(pt, shift + dm.p_lo).reshape(B, events, stride)
        rd = ens._roll_cols(dt_, shift + dm.d_lo).reshape(B, events,
                                                          stride)
        cells = jnp.concatenate(
            [rp[:, :, :dm.n_p], rd[:, :, :dm.n_d]], axis=-1)
        spec = ens._machine_specs(dm, cells, uniforms)
        new_cells = ens._machine_writes(dm, spec, cells)
        dg = jnp.zeros(spec.shape, jnp.float64)
        for c in range(dm.n_cells):
            dg = dg + (g_cells[c][cells[..., c]]
                       - g_cells[c][new_cells[..., c]])
        sig_ev = beta_eff * dg  # [B, E]
        sig = sig_ev.sum(axis=-1)
        onehot = (spec[..., None] ==
                  jnp.arange(dm.num_specs, dtype=spec.dtype))
        counts = onehot.sum(axis=1).astype(jnp.int32)
        spec_sig = (sig_ev[..., None] * onehot).sum(axis=1)
        rp = rp.at[:, :, :dm.n_p].set(new_cells[..., :dm.n_p])
        rd = rd.at[:, :, :dm.n_d].set(new_cells[..., dm.n_p:])
        pt = ens._roll_cols(rp.reshape(B, L), -(shift + dm.p_lo))
        dt_ = ens._roll_cols(rd.reshape(B, L), -(shift + dm.d_lo))
        return pt, dt_, sig, counts, spec_sig

    def step(carry, k):
        pt, dt_, phase, sig, counts, ssig = carry
        k1, k2 = jax.random.split(k)
        uniforms = jax.random.uniform(k2, (B, events), jnp.float32)
        if independent_sites:
            shifts = jax.random.randint(k1, (B,), 0, L, dtype=jnp.int32)
            delta = (shifts - phase) % L
            pt = ens._roll_rows(pt, delta)
            dt_ = ens._roll_rows(dt_, delta)
            pt, dt_, ds, dc, dss = apply_round(pt, dt_, jnp.int32(0),
                                               uniforms)
            phase = shifts
        else:
            shift = jax.random.randint(k1, (), 0, L, dtype=jnp.int32)
            pt, dt_, ds, dc, dss = apply_round(pt, dt_, shift, uniforms)
        return (pt, dt_, phase, sig + ds, counts + dc, ssig + dss), None

    phase0 = (jnp.zeros((B,), jnp.int32)
              + (keys[0].sum() * 0).astype(jnp.int32))
    carry = (ptape, dtape, phase0, jnp.zeros((B,), jnp.float64),
             jnp.zeros((B, dm.num_specs), jnp.int32),
             jnp.zeros((B, dm.num_specs), jnp.float64))
    (ptape, dtape, phase, sigma, counts, spec_sig), _ = jax.lax.scan(
        step, carry, keys)
    if independent_sites:
        ptape = ens._roll_rows(ptape, -phase)
        dtape = ens._roll_rows(dtape, -phase)
    dt_round = -jnp.log1p(-events / L)
    times = dt_round * jnp.arange(1, num_steps + 1, dtype=jnp.float64)
    return (ptape, dtape), sigma, (counts, spec_sig), times


def tape_potential(ptape, dtape, g_prog, g_data, beta_eff):
    """``beta_eff * (sum G over both tapes)`` per member — the state
    function whose decrease the ledger accumulates exactly (the
    bookkeeping identity ``sigma == Phi(0) - Phi(T)``, tested
    bit-level)."""
    return beta_eff * (jnp.asarray(g_prog)[ptape].sum(axis=-1)
                       + jnp.asarray(g_data)[dtape].sum(axis=-1))
