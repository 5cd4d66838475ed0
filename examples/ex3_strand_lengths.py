"""Copolymer strand-length distributions: run statistics of the
closure state at ANY length, validated against exact identities and
sampled rings.

The reference reports probabilities of specific sequences up to cl_k
(`examples/ex3_copolymerization.py`); a polymer chemist's first
question — the full strand-LENGTH distribution and its evolution — is
out of its reach. The Markov extension of the closure state determines
it exactly at every length: P(maximal run of monomers = ℓ) is a
class-word probability (`ops/correlations.run_length_distribution`,
boundary O, inside {A, M, N}), one transfer matvec per extra monomer.

Validations built in, per snapshot:
- the RING MASS IDENTITY holds exactly: every monomer on a ring lies
  in exactly one maximal strand, so Σ_ℓ ℓ·P_start(ℓ) + P(all-monomer
  ring) = p(monomer) — an end-to-end check of the class-word trace
  machinery against the solved state (gated at 1e-10);
- the distribution's tail slope equals the dominant eigenvalue of the
  monomer-restricted transfer operator (asymptotically geometric
  tails are a theorem for Markov measures; the plot shows both);
- bridge-sampled rings (`ensemble.sample_tapes_from_spd`) reproduce
  the final-time distribution by direct strand counting (statistical
  gate) — the sampler honours run statistics it was never built for.

Runs in ~2 min on one CPU. Output: `ex3_strand_lengths.pdf`.
"""

import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    copolymerization_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve
from chemical_kinetics_and_program_execution_tpu.ops import (
    correlations as corr,
)

TAG, SIZE_A, CL_K = "ex3-copolymerization", 4, 5
INSIDE = (1, 2, 3)  # A, M, N monomers; O=0 is the solvent/boundary
T_SNAPS = (10.0, 50.0, 200.0, 1000.0)
N_TS = 41
LENS = np.arange(1, 25)
B_RINGS = int(os.environ.get("CKPE_EX3SL_B", "8192"))
L_RING = 64
SUFFIX = "" if B_RINGS == 8192 else f"_b{B_RINGS}"


def solve_snapshots():
    fn = make_dy_dt(compile_problem(TAG, CL_K))
    p0 = copolymerization_p0(CL_K).ravel()
    ts = np.unique(np.concatenate([
        np.linspace(0.0, T_SNAPS[-1], N_TS), np.asarray(T_SNAPS)]))
    ys = np.asarray(solve(lambda y, t: fn(y), p0, ts,
                          rtol=1e-10, atol=1e-13, method="dop853"))
    return ts, ys


def count_strands(tapes):
    """Per-length counts of maximal monomer runs on sampled rings."""
    inside = np.isin(tapes, INSIDE)
    counts = np.zeros(len(LENS))
    for j, ell in enumerate(LENS):
        ok = ~np.roll(inside, 1, axis=1) & ~np.roll(
            inside, -ell, axis=1)
        run = np.ones_like(ok)
        for i in range(ell):
            run &= np.roll(inside, -i, axis=1)
        counts[j] = (ok & run).sum()
    return counts / tapes.size  # per-site start probability


def main():
    # The trajectory is B-independent: one shared cache, so reduced
    # smoke runs reuse the committed full-scale solve.
    path = _common.out_path("ex3_strand_lengths.npz")
    if os.access(path, os.R_OK):
        with np.load(path) as z:
            ts, ys = z["ts"], z["ys"]
    else:
        ts, ys = solve_snapshots()
        np.savez_compressed(path, ts=ts, ys=ys)

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))

    # Panel 1: distribution evolution + exact identities per snapshot.
    worst_id = 0.0
    for i, t_snap in enumerate(T_SNAPS):
        k = int(np.argmin(np.abs(ts - t_snap)))
        spd = ys[k].reshape((SIZE_A,) * CL_K)
        # Ring mass identity: strands partition the monomers. LENS is
        # a prefix of all_lens, so one sweep serves both uses.
        all_lens = np.arange(1, L_RING)
        p_all = corr.run_length_distribution(spd, INSIDE, all_lens,
                                             ring=L_RING)
        p_run = p_all[:len(LENS)]
        full = corr.pair_prob(spd, (INSIDE,) * L_RING, (), 0,
                              ring=L_RING)
        p_mono = sum(corr.pair_prob(spd, (m,), (), 0, ring=L_RING)
                     for m in INSIDE)
        ident = abs(float((all_lens * p_all).sum()) + full - p_mono)
        worst_id = max(worst_id, ident)
        cond = p_run / p_run.sum()
        ax1.semilogy(LENS, cond, "o-", ms=4, color=f"C{i}",
                     label=f"t={t_snap:g}")
    # Asymptotic tail: dominant eigenvalue of the monomer-restricted
    # transfer operator at the final snapshot.
    spd = ys[-1].reshape((SIZE_A,) * CL_K)
    mpp, nctx, _ = corr.context_arrays(spd)
    t_in = corr._step_matrix(INSIDE, mpp, nctx)
    lam_in = float(np.max(np.abs(np.linalg.eigvals(t_in))))
    ref = 0.3 * lam_in ** (LENS - LENS[0])
    ax1.semilogy(LENS, ref, "k--", lw=1,
                 label=rf"geometric tail $\lambda_{{in}}^\ell$, "
                       rf"$\lambda_{{in}}$={lam_in:.3f}")
    ax1.set_xlabel(r"strand length $\ell$")
    ax1.set_ylabel(r"P($\ell$ | a strand starts)")
    ax1.set_title("strand-length distribution vs time "
                  f"(ring L={L_RING})")
    ax1.legend(fontsize=11)
    ax1.grid(alpha=0.3)
    print(f"worst ring mass-identity deviation over snapshots: "
          f"{worst_id:.2e}")
    assert worst_id < 1e-10, worst_id

    # Panel 2: mean strand length vs time + sampled-ring twin at t_max.
    mean_len = []
    for k in range(len(ts)):
        spd = ys[k].reshape((SIZE_A,) * CL_K)
        p_run = corr.run_length_distribution(spd, INSIDE,
                                             np.arange(1, L_RING),
                                             ring=L_RING)
        tot = p_run.sum()
        mean_len.append(float((np.arange(1, L_RING) * p_run).sum()
                              / tot) if tot > 0 else 0.0)
    ax2.plot(ts, mean_len, "-", color="C0",
             label=r"exact $\langle\ell\rangle$ (closure state)")

    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    spd_f = ys[-1].reshape((SIZE_A,) * CL_K)
    tapes = np.asarray(ensemble.sample_tapes_from_spd(
        jax.random.PRNGKey(3), spd_f, SIZE_A, CL_K, B_RINGS, L_RING,
        ring=True))
    emp = count_strands(tapes)
    p_run_f = corr.run_length_distribution(spd_f, INSIDE, LENS,
                                           ring=L_RING)
    # Compare means on the SAME length support (1..LENS[-1]).
    emp_mean = float((LENS * emp).sum() / emp.sum())
    exact_mean_r = float((LENS * p_run_f).sum() / p_run_f.sum())
    ax2.plot([ts[-1]], [emp_mean], "s", ms=9, mfc="none", color="C1",
             label=f"sampled rings at t={ts[-1]:g} (B={B_RINGS})")
    ax2.set_xlabel("t")
    ax2.set_ylabel(r"mean strand length $\langle\ell\rangle$")
    ax2.set_title("chain growth; sampled-ring twin at the endpoint")
    ax2.legend(fontsize=11)
    ax2.grid(alpha=0.3)

    # Statistical gate on the full distribution (per-length binomial).
    n_sites = B_RINGS * L_RING
    se = np.sqrt(np.maximum(p_run_f, 1e-12) / n_sites)
    z = np.abs(emp - p_run_f) / np.maximum(se, 1e-12)
    print(f"sampled-ring strand counts: max z-score over lengths "
          f"1..{LENS[-1]}: {z.max():.2f}; mean length (support-matched) "
          f"{emp_mean:.3f} vs exact {exact_mean_r:.3f}")
    assert z.max() < 6.0, z.max()

    fig.suptitle("ex3 copolymerization: strand-length statistics "
                 "beyond the stored windows")
    fig.tight_layout()
    out = _common.out_path(f"ex3_strand_lengths{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
