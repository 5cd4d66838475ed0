"""Weighted-ensemble splitting for the BFF soup: rare-event emergence.

The weighted frontier (`ensemble.weighted_first_passage`) gives the
decision-machine engine a rare-event instrument; this module gives the
same capability to the BFF interpreter engine, whose rules no decision
machine can hold (`bff.py`). The scientific target is *emergence*: the
first appearance of a self-replicator (a long contiguous 'dot' run —
'dot' on a one-ring machine copies cell d0 one head-separation
downstream, so an L-run is self-maintaining code) in a soup where that
event is too rare for brute force, e.g. near or above the mutation
error threshold (RESULTS.md "Error threshold").

Method — classic weighted-ensemble splitting (Huber & Kim 1996;
PAPERS.md), host-orchestrated over jitted device blocks:

  * K walkers (rings) carry weights summing to 1; blocks of lattice
    rounds advance them under `bff.run_ensemble_bff` (one jit compile
    total — shapes never change).
  * After each block, walkers are binned by a progress coordinate
    (default: the max cyclic 'dot' run length) and each occupied bin
    is systematically resampled to its slot allocation with the bin's
    total weight preserved — splitting enriches the leading edge
    without biasing any weighted observable.
  * Walkers whose coordinate reaches ``q_target`` contribute their
    weight to the first-passage flux, then are recycled to the initial
    distribution (steady-state rate mode, Hill relation) or frozen
    out (``recycle=False``: survival-curve mode, directly comparable
    to brute force).

Splitting-off (``split=False`` → no resampling) IS brute force inside
the same harness; the unbiasedness test gates the two against each
other (`tests/test_bff.py::test_we_emergence_unbiased`), and the
recycle mode is gated against the Hill relation
(`test_we_emergence_recycle_satisfies_hill_relation`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

from . import bff as bff_mod


def max_cyclic_run(tapes, sym: int) -> np.ndarray:
    """[B] length of the longest CYCLIC run of ``sym`` per ring.

    Doubling the ring resolves wrap-around runs; a full-ring run is
    capped at L.
    """
    t = np.asarray(tapes)
    B, L = t.shape
    m = (t == sym)
    d = np.concatenate([m, m[:, : L - 1]], axis=1).astype(np.int32)
    acc = np.zeros(B, np.int32)
    best = np.zeros(B, np.int32)
    for j in range(d.shape[1]):
        acc = (acc + 1) * d[:, j]
        best = np.maximum(best, acc)
    return np.minimum(best, L)


class WEResult(NamedTuple):
    times: np.ndarray      # [n_blocks] cumulative soup time
    flux: np.ndarray       # [n_blocks] weight absorbed per block
    survival: np.ndarray   # [n_blocks] 1 - cumulative flux
    occupancy: np.ndarray  # [n_blocks] occupied bins per block
    q_max: np.ndarray      # [n_blocks] best coordinate seen per block


def _systematic(idx, w, n, rng):
    """Systematic resampling of ``n`` slots from walkers ``idx`` with
    weights ``w`` (bin-total preserved, equal output weights)."""
    W = w.sum()
    cum = np.cumsum(w) / W
    pos = (rng.random() + np.arange(n)) / n
    # cum[-1] can sit 1 ulp below 1 (pairwise vs sequential summation);
    # clip so a stratified position landing past it cannot IndexError.
    j = np.minimum(np.searchsorted(cum, pos, side="right"),
                   len(idx) - 1)
    return idx[j], np.full(n, W / n)


def we_emergence(key, mach, sample_init: Callable[[int], np.ndarray],
                 *, plan: tuple, q_target: int,
                 q_fn: Callable | None = None,
                 mutation_rate: float = 0.0, recycle: bool = False,
                 split: bool = True, seed: int = 0,
                 runner: Callable | None = None) -> WEResult:
    """Weighted-ensemble first-passage of the soup to ``q_target``.

    Args:
      key: jax PRNG key driving the device dynamics.
      mach: a SELF-MODIFYING :class:`bff.BffMachine`.
      sample_init: ``n -> [n, L] int32`` initial-ring sampler (called
        for the initial ensemble and for recycling; use a
        seeded-closure for reproducibility).
      plan: ``(K, n_blocks, rounds_per_block, events_per_round)``.
      q_target: absorbing value of the progress coordinate.
      q_fn: ``[K, L] tapes -> [K]`` progress coordinate (default:
        :func:`max_cyclic_run` of the machine's 'dot' symbol).
      mutation_rate: passed through to `run_ensemble_bff`.
      recycle: absorbed walkers re-enter from ``sample_init`` keeping
        their weight (steady-flux mode); otherwise their weight leaves
        circulation (survival mode) and their slot is refilled by the
        resampler.
      split: ``False`` disables resampling entirely — plain Monte
        Carlo in the same harness (the unbiasedness reference).
      seed: host RNG seed for the resampler.
      runner: optional ``(key, tapes) -> (tapes, aux)`` block driver
        replacing the default `run_ensemble_bff` call — pass
        `parallel.sharding.make_sharded_ensemble_bff(mach, mesh,
        (rounds_per_block, events), independent_sites=True)` to run
        the walkers batch-sharded over a device mesh (K must divide
        by the mesh size; the WE host logic is unchanged).

    Returns a :class:`WEResult`; ``flux``/``survival`` are unbiased
    for P(first passage ≤ t) checked at block boundaries.
    """
    import jax

    if not mach.self_modifying:
        raise ValueError("we_emergence drives self-modifying machines"
                         " (single-ring soups)")
    K, n_blocks, rounds, events = plan
    if q_fn is None:
        q_fn = lambda t: max_cyclic_run(t, mach.dot)  # noqa: E731
    rng = np.random.default_rng(seed)
    tapes = np.asarray(sample_init(K), np.int32)
    if tapes.shape[0] != K:
        raise ValueError("sample_init(n) must return n rings")
    L = tapes.shape[1]
    w = np.full(K, 1.0 / K)
    live = np.ones(K, bool)
    dt_block = -np.log1p(-events / L) * rounds

    times = np.zeros(n_blocks)
    flux = np.zeros(n_blocks)
    occupancy = np.zeros(n_blocks, np.int64)
    q_best = np.zeros(n_blocks, np.int64)

    def absorb(q):
        """Records/recycles walkers at the target until none remain —
        t=0 and freshly recycled walkers count too (the docstring's
        'checked at block boundaries' includes the boundary they are
        born on). Returns the absorbed weight and up-to-date q."""
        nonlocal tapes, w, live
        total = 0.0
        for _ in range(100):
            hit = live & (q >= q_target)
            if not hit.any():
                return total, q
            total += w[hit].sum()
            tapes[hit] = np.asarray(sample_init(int(hit.sum())),
                                    np.int32)
            q = q.copy()
            q[hit] = q_fn(tapes[hit])
            if not recycle:
                w[hit] = 0.0
                live[hit] = False
        raise RuntimeError(
            "sample_init keeps drawing rings at q_target; emergence "
            "from such an initial distribution is not a first-passage "
            "problem")

    if runner is None:
        def runner(k, t):
            return bff_mod.run_ensemble_bff(
                k, t, mach, (rounds, events), independent_sites=True,
                mutation_rate=mutation_rate)

    # Walkers born absorbed register at t=0 (flux[0]'s boundary).
    flux0, q = absorb(q_fn(tapes))
    for b in range(n_blocks):
        out, _ = runner(jax.random.fold_in(key, b), tapes)
        tapes = np.array(out, np.int32)  # writable host copy
        q = q_fn(tapes)
        q_best[b] = int(q[live].max()) if live.any() else 0
        times[b] = (b + 1) * dt_block
        flux[b], q = absorb(q)
        if b == 0:
            flux[0] += flux0
        if split and live.any():
            # Bin by coordinate value (clipped below target), allocate
            # the K slots across occupied bins — extra slots to the
            # leading edge — and systematically resample each bin.
            qb = np.minimum(q, q_target - 1)
            vals = np.unique(qb[live])  # sorted ascending
            n_occ = len(vals)
            base = K // n_occ
            extra = K - base * n_occ
            new_tapes = np.empty_like(tapes)
            new_w = np.zeros(K)
            pos = 0
            for vi, v in enumerate(vals):
                n_v = base + (1 if vi >= n_occ - extra else 0)
                sel = np.flatnonzero(live & (qb == v))
                src, sw = _systematic(sel, w[sel], n_v, rng)
                new_tapes[pos:pos + n_v] = tapes[src]
                new_w[pos:pos + n_v] = sw
                pos += n_v
            assert pos == K
            tapes, w = new_tapes, new_w
            live = w > 0.0
            occupancy[b] = n_occ  # every occupied bin keeps >=1 slot
        else:
            occupancy[b] = len(np.unique(
                np.minimum(q, q_target - 1)[live])) if live.any() \
                else 0
        if not live.any():
            times[b + 1:] = times[b] + dt_block * np.arange(
                1, n_blocks - b)
            break
    return WEResult(times=times, flux=flux,
                    survival=1.0 - np.cumsum(flux) if not recycle
                    else np.full(n_blocks, np.nan),
                    occupancy=occupancy, q_max=q_best)
