"""Three formulations, one physics: master equation vs closure vs
sampled ensemble on the ferromagnetic chain.

The framework now computes the same dynamics three structurally
unrelated ways:

- EXACT MICROSCOPIC (`engine/master.py`, new): the full master
  equation over all 2^L ring configurations, outcome rates enumerated
  straight from the DSL rule, evolved by Krylov expm — no closure, no
  sampling, no time-step error;
- EXACT MACROSCOPIC: the reference's window-closure ODE at cl_k=5
  (infinite chain);
- SAMPLED: the headline ensemble kernel on B bridge-sampled rings.

Panel 1 overlays the island probability p(DUD)(t) from all three at
L=12: the ensemble must track the MASTER curve (same finite ring, same
initial law — agreement is gated at the Monte-Carlo floor), while the
closure sits a visible finite-size gap away: at L=12 that gap is real
physics (the ring feels its own periodicity), not any engine's error.
Panel 2 quantifies it — with a surprise the exact solver exposes: the
gap |master_L(t=2) − closure| decays in L along each COMMENSURABILITY
family separately (L ≡ 0 and 2 mod 4; the p0 seeds spin PAIRS, and how
an even ring accommodates the pair pattern alternates with L mod 4),
each family gated monotone. The three formulations reunite as L → ∞ —
each engine oracling the others where its assumptions are exact.

Runs in ~2 min on one CPU. Output: `ex2_master_oracle.pdf`.
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.engine import master
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    ferromagnet_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, SIZE_A, CL_K = "ex2-ferromagnetic-chain", 2, 5
L, E = 12, 1
ROUNDS_PER_SNAP, N_SNAPS = 2, 24
B = int(os.environ.get("CKPE_EX2MO_B", "8192"))
SUFFIX = "" if B == 8192 else f"_b{B}"
DUD = (0, 1, 0)
L_SWEEP = (6, 8, 10, 12, 14, 16)


def _word_prob_states(p_states, L, word):
    marg = master.state_window_marginals(p_states, L, SIZE_A, len(word))
    rank = 0
    for s in word:
        rank = rank * SIZE_A + s
    return float(marg[rank])


def ensemble_traj(spd, ts_rounds):
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    dm = ensemble.compile_decision_machine(TAG)
    key = jax.random.PRNGKey(12)
    dtape = ensemble.sample_tapes_from_spd(
        jax.random.fold_in(key, 0), spd, SIZE_A, CL_K, B, L,
        ring=True).astype(np.int32)
    ptape = np.zeros((B, L), np.int32)

    def dud(tape):
        spd_e = np.asarray(ensemble.weighted_window_counts(
            np.asarray(tape), np.full(B, 1.0 / B), SIZE_A, len(DUD)))
        rank = 0
        for s in DUD:
            rank = rank * SIZE_A + s
        return float(spd_e[rank])

    out = [dud(dtape)]
    for snap in range(N_SNAPS):
        # independent_sites: per-member site histories, so the members
        # are genuinely independent draws and the binomial-floor gate
        # below is honest (the default shared-site mode would leave a
        # cross-member correlated component that does not shrink with
        # B — see RESULTS.md "master equation").
        (ptape, dtape), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 1 + snap), (ptape, dtape), dm,
            (ROUNDS_PER_SNAP, E), independent_sites=True)
        out.append(dud(dtape))
    return np.asarray(out)


def main():
    dt_snap = ROUNDS_PER_SNAP * (-math.log1p(-E / L))
    ts = np.arange(N_SNAPS + 1) * dt_snap
    spd = ferromagnet_p0(CL_K, p_pair=0.1).reshape((2,) * CL_K)

    # Microscopic exact at L.
    p0 = master.ring_trace_measure(spd, SIZE_A, CL_K, L)
    Q = master.build_ring_generator(TAG, L)
    p_states = master.solve_master(Q, p0, ts)
    exact_fin = np.array([_word_prob_states(p_states[i], L, DUD)
                          for i in range(len(ts))])

    # Infinite-chain closure.
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    ys = np.asarray(solve(lambda y, t: fn(y), spd.ravel(), ts,
                          rtol=1e-11, atol=1e-14))
    closure_tr = np.array([
        float(ys[i].reshape((2,) * CL_K).sum(axis=(3, 4))[DUD])
        for i in range(len(ts))
    ])

    # Sampled ensemble on the same finite rings.
    emp = _common.cached(f"ex2_master_oracle{SUFFIX}.npz",
                         lambda: ensemble_traj(spd, ts), ts=ts)

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))
    ax1.plot(ts, exact_fin, "-", color="C0",
             label=f"master equation (exact, L={L})")
    ax1.plot(ts, emp, "o", ms=4, mfc="none", color="C1",
             label=f"ensemble (B={B}, same rings)")
    ax1.plot(ts, closure_tr, "--", color="C2",
             label=f"closure cl_k={CL_K} (infinite chain)")
    ax1.set_xlabel("t")
    ax1.set_ylabel("p(DUD)")
    ax1.set_title("three engines, one observable")
    ax1.legend(fontsize=11)
    ax1.grid(alpha=0.3)

    se = np.sqrt(np.maximum(exact_fin, 1e-9) / (B * L / len(DUD)))
    z = np.abs(emp - exact_fin) / np.maximum(se, 1e-9)
    print(f"ensemble vs master: max z over {len(ts)} snapshots = "
          f"{z.max():.2f}")
    gate = 6.0 * max(1.0, math.sqrt(8192 / B))
    assert z.max() < gate, (z.max(), gate)

    # Finite-size scaling at t = 2: every ring starts from the SAME
    # cl_k=5 measure (its cyclic trace restriction), and the infinite-
    # chain reference is the cl_k=5 closure marginalised to 3-windows.
    closure5_t2 = np.asarray(solve(lambda y, t: fn(y), spd.ravel(),
                                   np.array([0.0, 2.0]),
                                   rtol=1e-11, atol=1e-14))[-1]
    closure3 = closure5_t2.reshape((2,) * CL_K).sum(axis=(3, 4)).ravel()
    gaps = []
    for Ls in L_SWEEP:
        p0s = master.ring_trace_measure(spd, SIZE_A, CL_K, Ls)
        Qs = master.build_ring_generator(TAG, Ls)
        pt = master.solve_master(Qs, p0s, [0.0, 2.0])[-1]
        marg = master.state_window_marginals(pt, Ls, SIZE_A, 3)
        gaps.append(float(np.abs(marg - closure3).sum()))
        print(f"L={Ls}: |master - closure|_1 at t=2: {gaps[-1]:.3e}")
    fam0 = [(Ls, g) for Ls, g in zip(L_SWEEP, gaps) if Ls % 4 == 0]
    fam2 = [(Ls, g) for Ls, g in zip(L_SWEEP, gaps) if Ls % 4 == 2]
    ax2.semilogy(*zip(*fam2), "o-", color="C0",
                 label=r"$L \equiv 2\ (\mathrm{mod}\ 4)$")
    ax2.semilogy(*zip(*fam0), "s-", color="C1",
                 label=r"$L \equiv 0\ (\mathrm{mod}\ 4)$")
    ax2.set_xlabel("ring length L")
    ax2.set_ylabel(r"$\|p^{master}_L - p^{closure}\|_1$ at $t=2$")
    ax2.set_title("finite-size gap: exponential decay per\n"
                  "pair-pattern commensurability family")
    ax2.legend(fontsize=11)
    ax2.grid(alpha=0.3)
    for fam in (fam0, fam2):
        gs = [g for _, g in fam]
        assert all(a > b for a, b in zip(gs, gs[1:])), (fam0, fam2)

    fig.suptitle("ex2: master equation / closure / ensemble "
                 "cross-validation")
    fig.tight_layout()
    out = _common.out_path(f"ex2_master_oracle{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
