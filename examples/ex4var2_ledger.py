"""The free-enthalpy ledger of the chemical computer (ex4var2).

ex4var2 builds its rates from a per-symbol free-enthalpy landscape
(`problems.scm:310-347`). This example turns that landscape into exact
thermodynamic instrumentation, resting on two measured identities
(`tests/test_thermo.py`):

- **Channel-level local detailed balance**: every outcome-resolved
  reaction channel satisfies ln(r_fwd/r_rev) = -2 beta dG exactly
  (the factor 2 is the same structural doubling as ex2's J_eff = 2J —
  the choose-encoding of rates), so the per-event entropy production
  is the cell-additive ledger 2 beta (G_old - G_new).
- **The machine's equilibrium is the per-symbol Boltzmann product** at
  beta_eff = 2 beta: the iid measure p_s ~ exp(-2 beta G_s) is
  stationary under the dual closure to ~1e-10 (guard conditions
  correlate the DYNAMICS, but the potential is cell-additive, so the
  detailed-balance measure is a product).

Panels:
1. Dual-SPD closure (cl_k=3): cumulative dissipated heat
   beta_eff*(⟨G⟩0 − ⟨G⟩t), tape entropy, and the free energy
   F = beta_eff ⟨G⟩ − S relaxing MONOTONICALLY onto the Boltzmann
   product's F — an H-theorem the closure inherits from the rule's
   detailed balance.
2. The flagship committed trajectory (cl_k=5, 100k-dim, t to 1e4):
   total dissipated heat of the reference's own production run — the
   power bill of the chemical computer, read off an artifact the
   reference could produce but never account.
3. The tethered ensemble ledger (`thermo.run_ensemble_ledger`,
   B=4096 x L=128): per-member cumulative sigma with the exact
   bookkeeping identity sigma = Phi(0) - Phi(T), the per-channel
   dissipation decomposition accumulated exactly on device (per-spec
   sigma is NOT constant — the machine dedups write specs across
   guard paths; S,A->E and S,D->E share one spec), and the headline:
   each fuel stroke dissipates exactly -2 beta dG (12, 12, 7 kT for
   the A->B, B->C, C->D strokes, guard-pinned), so a full 3-bit
   instruction cycle burns 31 kT against Landauer's 3 ln 2 — the
   machine computes at ~15x the Landauer bound.

Runs in ~3 min on one CPU. Outputs `ex4var2_ledger.pdf` +
`ex4var2_ledger.npz` (CI-gated by
`tests/test_thermo.py::test_ex4var2_ledger_artifacts_claims`).
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu import markov
from chemical_kinetics_and_program_execution_tpu.engine import (
    dense,
    ensemble,
)
from chemical_kinetics_and_program_execution_tpu.models.initial_states import (
    chemical_turing_v2_p0,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve
from chemical_kinetics_and_program_execution_tpu.ops import thermo

TAG = "ex4var2-chemical-turing"
SYMS = ("A", "B", "C", "D", "I", "O", "P", "X", "S", "E")
G = {"A": -1.0, "B": -1.0, "C": -1.0, "D": 1.5, "I": 0.0, "O": 0.0,
     "P": 6.0, "X": 0.0, "S": 0.0, "E": 1.0}
BETA = 1.0
BETA_EFF = 2.0 * BETA
G_VEC = np.array([G[s] for s in SYMS])
SIZE_A = 10
B = int(os.environ.get("CKPE_EX4L_B", "4096"))
L_RING, ROUNDS, EVENTS = 128, 512, 4
SUFFIX = "" if B == 4096 else f"_b{B}"


def mean_g(spd, cl_k):
    """Per-site ⟨G⟩ of an SPD via its single-symbol marginal."""
    marg = np.asarray(spd).reshape((SIZE_A,) * cl_k)
    for _ in range(cl_k - 1):
        marg = marg.sum(axis=-1)
    return float(marg @ G_VEC)


def entropy(spd, cl_k):
    return float(markov.markov_entropy(
        np.asarray(spd).reshape((SIZE_A,) * cl_k)))


def gibbs_product(cl_k):
    w = np.exp(-BETA_EFF * G_VEC)
    p1 = w / w.sum()
    spd = p1.copy()
    for _ in range(cl_k - 1):
        spd = np.multiply.outer(spd, p1)
    return spd.ravel()


def dual_panel():
    cl_k = 3
    dual = dense.compile_dense_dual(TAG, cl_k)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    p0 = chemical_turing_v2_p0(cl_k).ravel()
    y0 = np.concatenate([p0, p0])
    ts = np.concatenate([[0.0], np.geomspace(0.1, 2000.0, 40)])
    ys = _common.cached("ex4var2_ledger_dual.npz",
                        lambda: np.asarray(solve(
                            lambda y, t: fn(y), y0, ts,
                            rtol=1e-10, atol=1e-13)), ts=ts)
    half = SIZE_A**cl_k
    gsum = np.array([mean_g(y[:half], cl_k) + mean_g(y[half:], cl_k)
                     for y in ys])
    s_sum = np.array([entropy(y[:half], cl_k) + entropy(y[half:], cl_k)
                      for y in ys])
    heat = BETA_EFF * (gsum[0] - gsum)
    F = BETA_EFF * gsum - s_sum

    gb = gibbs_product(cl_k)
    F_gibbs = BETA_EFF * 2 * mean_g(gb, cl_k) - 2 * entropy(gb, cl_k)
    res = float(np.abs(np.asarray(fn(np.concatenate([gb, gb])))).max())
    print(f"dual closure: ||F(gibbs product)||_inf = {res:.2e}; "
          f"F(t) drops {F[0]:.4f} -> {F[-1]:.4f}, F_gibbs = "
          f"{F_gibbs:.4f}")
    return ts, heat, s_sum - s_sum[0], F, F_gibbs, res


def flagship_panel():
    """Heat curve off the committed cl_k=5 production artifact."""
    path = _common.out_path("ex4var2_chemical_turing_k5.npz")
    if not os.access(path, os.R_OK):
        return None
    d = np.load(path)
    ys = d["ode_ys"]
    ts = _common.sample_grid("ex4var2_chemical_turing_k5.npz", 0.0,
                             10000.0, ys.shape[0])
    gsum = np.array([mean_g(y, 5) for y in ys])
    heat = BETA_EFF * (gsum[0] - gsum)  # both tapes share the SPD:
    # the shared dy/dt sums both tapes' flows, so d<G>/dt of the shared
    # marginal IS the per-site-pair G-change rate (DESIGN.md).
    return ts, heat


def ensemble_panel(dm):
    import jax
    import jax.numpy as jnp

    ledger = (jnp.asarray(G_VEC), jnp.asarray(G_VEC), BETA_EFF)
    key = jax.random.PRNGKey(11)
    ptape = jax.random.choice(
        jax.random.fold_in(key, 0),
        jnp.asarray([6, 7, 8, 9], jnp.int32), (B, L_RING),
        p=jnp.asarray([0.45, 0.05, 0.42, 0.08]))
    dtape = jax.random.choice(
        jax.random.fold_in(key, 1),
        jnp.asarray([0, 4, 5], jnp.int32), (B, L_RING),
        p=jnp.asarray([0.08, 0.46, 0.46]))
    phi0 = thermo.tape_potential(ptape, dtape, G_VEC, G_VEC, BETA_EFF)

    n_chunks = 16
    sig = np.zeros(B)
    counts = np.zeros((B, dm.num_specs), np.int64)
    spec_sig = np.zeros((B, dm.num_specs))
    sig_hist = [0.0]
    pt, dt_ = ptape, dtape
    for c in range(n_chunks):
        (pt, dt_), ds, (dc, dss), _ = thermo.run_ensemble_ledger(
            jax.random.fold_in(key, 2 + c), (pt, dt_), dm, ledger,
            (ROUNDS // n_chunks, EVENTS))
        sig += np.asarray(ds)
        counts += np.asarray(dc)
        spec_sig += np.asarray(dss)
        sig_hist.append(sig.mean())
    phiT = thermo.tape_potential(pt, dt_, G_VEC, G_VEC, BETA_EFF)
    book = np.abs(sig - np.asarray(phi0 - phiT)).max()
    decomp = np.abs(spec_sig.sum(axis=1) - sig).max()
    print(f"ensemble ledger: bookkeeping |sigma - dPhi| max = "
          f"{book:.2e}; per-channel decomposition residual = "
          f"{decomp:.2e}")
    assert book < 1e-8 and decomp < 1e-8

    # Exact per-channel accounting (per-spec sigma is NOT constant in
    # general: the machine dedups write specs across guard paths —
    # ex4var2's S,A->E and S,D->E share one spec with different
    # overwritten-cursor G; the accumulated sums resolve it exactly).
    fired = counts.sum(axis=0) > 0
    tot_counts = counts.sum(axis=0)
    tot_sig = spec_sig.sum(axis=0)
    sigma_spec = np.where(tot_counts > 0,
                          tot_sig / np.maximum(tot_counts, 1), 0.0)

    mask, val = thermo._machine_write_specs(dm)
    labels = []
    advance = np.zeros(dm.num_specs, bool)
    for s in range(dm.num_specs):
        cells = np.flatnonzero(mask[s])
        if cells.size == 0:
            labels.append("(no write)")
            continue
        parts = []
        for c in cells:
            tape = "P" if c < dm.n_p else "D"
            off = (c + dm.p_lo) if c < dm.n_p else (c - dm.n_p
                                                    + dm.d_lo)
            parts.append(f"{tape}[{off:+d}]<-{SYMS[val[s, c]]}")
            if tape == "P" and SYMS[val[s, c]] == "X":
                advance[s] = True  # fuel stroke: P consumed -> X
        labels.append(" ".join(parts))
    return (ptape, phi0, np.asarray(sig_hist), counts, sigma_spec,
            labels, fired, advance, book, decomp)


def main():
    dm = ensemble.compile_decision_machine(TAG)
    ts_d, heat_d, dS_d, F_d, F_gibbs, gibbs_res = dual_panel()
    flag = flagship_panel()
    (ptape, phi0, sig_hist, counts, sigma_spec, labels, fired,
     advance, book, decomp) = ensemble_panel(dm)

    # Instruction accounting: every fuel stroke (P->X advance)
    # dissipates exactly -2 beta dG of ITS stroke, guard-pinned:
    # A->B and B->C burn 12 nats, C->D burns 7 (G_D = 1.5). A full
    # A->D instruction cycle = 31 nats for 3 erased bits.
    adv = advance & fired
    n_adv = int(counts[:, adv].sum())
    n_events = int(counts.sum())
    heat_total = float(sig_hist[-1]) * B
    mask, val = thermo._machine_write_specs(dm)
    prev_cursor = {"B": "A", "C": "B", "D": "C"}
    for s in np.flatnonzero(adv):
        d1 = dm.n_p + 1 - dm.d_lo  # cell index of D[+1]
        nxt = SYMS[val[s, d1]]
        want = BETA_EFF * ((G["P"] - G["X"])
                           + G[prev_cursor[nxt]] - G[nxt])
        assert abs(sigma_spec[s] - want) < 1e-9, (nxt, sigma_spec[s],
                                                  want)
    cycle_heat = BETA_EFF * 3 * (G["P"] - G["X"]) + BETA_EFF * (
        G["A"] - G["D"])  # telescoped over A->B->C->D
    landauer = cycle_heat / (3 * math.log(2.0))
    print(f"instructions executed (fuel strokes): {n_adv} of "
          f"{n_events} events; stroke heats (12, 12, 7) kT exact; "
          f"cycle heat {cycle_heat:.0f} kT for 3 erased bits = "
          f"{landauer:.1f}x the ln2 Landauer bound")

    np.savez_compressed(
        _common.out_path(f"ex4var2_ledger{SUFFIX}.npz"),
        ts_dual=ts_d, heat_dual=heat_d, dS_dual=dS_d, F_dual=F_d,
        F_gibbs=F_gibbs, gibbs_res=gibbs_res,
        sig_hist=sig_hist, counts_total=counts.sum(axis=0),
        sigma_spec=sigma_spec, fired=fired, advance=advance,
        book_err=book, decomp_err=decomp)

    fig, (ax1, ax2, ax3) = _common.pyplot.subplots(
        1, 3, figsize=(18, 5.6))
    ax1.plot(ts_d[1:], heat_d[1:], "-", color="C3",
             label=r"dissipated heat $\beta_{eff}(\langle G\rangle_0"
                   r"-\langle G\rangle_t)$")
    ax1.plot(ts_d[1:], dS_d[1:], "-", color="C0",
             label=r"tape entropy change $\Delta S$")
    ax1.plot(ts_d[1:], F_d[1:] - F_gibbs, "-", color="C2",
             label=r"$F(t) - F_{gibbs}$ (monotone $\downarrow$)")
    ax1.set_xscale("log")
    ax1.set_xlabel("t")
    ax1.set_ylabel("nats per site pair")
    ax1.set_title("dual closure (cl_k=3): the H-theorem\n"
                  rf"$\|F(\mathrm{{gibbs\ product}})\|_\infty$ = "
                  rf"{gibbs_res:.1e}")
    ax1.legend(fontsize=9)
    ax1.grid(alpha=0.3)

    if flag is not None:
        ts_f, heat_f = flag
        ax2.plot(ts_f[1:], heat_f[1:], "-", color="C3")
        ax2.set_xscale("log")
        ax2.set_xlabel("t")
        ax2.set_ylabel("nats per site pair")
        ax2.set_title("flagship committed run (cl_k=5, 100k-dim,\n"
                      "t to 1e4): total dissipated heat")
        ax2.grid(alpha=0.3)

    order = np.argsort(-np.abs(sigma_spec * counts.sum(axis=0)))
    top = [s for s in order if fired[s]][:6]
    share = [sigma_spec[s] * counts[:, s].sum() / max(heat_total, 1e-9)
             for s in top]
    ax3.barh([labels[s] + f"  ({sigma_spec[s]:+.1f} nats/event)"
              for s in top][::-1], share[::-1], color="C3")
    ax3.set_xlabel("share of total dissipated heat")
    ax3.set_title(f"tethered ensemble (B={B}): exact channel "
                  f"decomposition\nbookkeeping error {book:.1e}; "
                  f"31 kT / 3-bit cycle = {landauer:.1f}x Landauer")
    ax3.grid(alpha=0.3)

    fig.suptitle("ex4var2: the free-enthalpy ledger of the chemical "
                 "computer")
    fig.tight_layout()
    out = _common.out_path(f"ex4var2_ledger{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)

    # Gates (mirrored by the CI artifact test).
    assert gibbs_res < 1e-8
    dF = np.diff(F_d)
    assert (dF <= 1e-9).all(), dF.max()
    assert F_d[-1] >= F_gibbs - 1e-9
    assert n_adv > 0


if __name__ == "__main__":
    main()
