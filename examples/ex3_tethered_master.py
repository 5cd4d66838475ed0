"""Tethered vs well-mixed two-tape kinetics: the pair master equation
as microscopic oracle on ex3 copolymerization.

DESIGN.md "tethered vs well-mixed": the closure's reveal semantics
model a WELL-MIXED solution — every firing draws fresh program/data
windows, fuel effectively diffuses infinitely fast, and the dual-SPD
engine (`engine/dense.compile_dense_dual`) evolves the two tapes as
SEPARATE distributions with zero cross-tape correlation by
construction. Concrete tape pairs are the opposite physical limit:
each data site is tethered to its own program neighborhood, consuming
it builds joint structure the closure cannot represent. Round 2's
pair-ring master equation (`engine/master.build_pair_ring_generator`)
makes that limit EXACT at finite L, so this example can:

1. validate the sampled tape-pair ensemble against approximation-free
   tethered ground truth (joint site distribution gated at the MC
   floor — branch sampling, cross-tape writes, and time calibration
   with no closure anywhere), and
2. measure the tethering physics itself: the same-site cross-tape
   mutual information I(P;D), identically ZERO in the dual closure at
   every t, grows to a plateau in the tethered system — and the
   monomer-consumption curves split accordingly (the tethered soup
   depletes only where its own strand can accept, the well-mixed
   closure keeps feeding every strand site from the global soup).

The master-closure observable gap mixes tethering with L=5 finite-size
effects; I(P;D) > 0 is unambiguous — product initial laws carry zero
cross-tape information, the dual closure keeps it zero, only tethered
dynamics can create it.

Runs in ~2 min on one CPU. Output: `ex3_tethered_master.pdf`.

Reference twin: none — the reference (problems.scm ex3) has neither a
pair master equation nor dual SPDs nor concrete-pair ensembles.
"""

import math
import os

import numpy as np

import _common
from chemical_kinetics_and_program_execution_tpu.engine import (
    dense,
    master,
)
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, SIZE_A = "ex3-copolymerization", 4
L, E = 5, 1
ROUNDS_PER_SNAP, N_SNAPS = 3, 10
CL_K = 4  # dual closure context length
B = int(os.environ.get("CKPE_EX3TM_B", "8192"))
SUFFIX = "" if B == 8192 else f"_b{B}"
P_PROG = np.array([0.55, 0.15, 0.15, 0.15])  # monomer-rich soup
P_DATA = np.array([0.82, 0.06, 0.06, 0.06])  # dilute strand tape


def iid_ring_measure(probs):
    w = np.ones(SIZE_A ** L)
    d = master._ring_digits(L, SIZE_A)
    for i in range(L):
        w = w * probs[d[:, i]]
    return w


def joint_site(p_states):
    """[4, 4] same-site joint (program, data) symbol distribution."""
    return master.pair_state_window_marginals(
        p_states, L, SIZE_A, 1).reshape(SIZE_A, SIZE_A)


def mutual_information(j):
    pP, pD = j.sum(axis=1), j.sum(axis=0)
    m = j > 0
    return float((j[m] * np.log(j[m]
                                / (pP[:, None] * pD[None, :])[m])).sum())


def ensemble_joints(ts):
    import jax

    from chemical_kinetics_and_program_execution_tpu.engine import (
        ensemble,
    )

    dm = ensemble.compile_decision_machine(TAG)
    assert dm.span <= L, dm.span  # E=1: one site per round, no conflicts
    key = jax.random.PRNGKey(7)
    ptape = np.asarray(jax.random.choice(
        jax.random.fold_in(key, 0), SIZE_A, (B, L),
        p=P_PROG)).astype(np.int32)
    dtape = np.asarray(jax.random.choice(
        jax.random.fold_in(key, 1), SIZE_A, (B, L),
        p=P_DATA)).astype(np.int32)

    def joint(pt, dt):
        comb = np.asarray(pt) * SIZE_A + np.asarray(dt)
        return np.asarray(ensemble.weighted_window_counts(
            comb, np.full(B, 1.0 / B), SIZE_A * SIZE_A, 1)
        ).reshape(SIZE_A, SIZE_A)

    out = [joint(ptape, dtape)]
    for snap in range(N_SNAPS):
        (ptape, dtape), _ = ensemble.run_ensemble(
            jax.random.fold_in(key, 2 + snap), (ptape, dtape), dm,
            (ROUNDS_PER_SNAP, E), independent_sites=True)
        out.append(joint(ptape, dtape))
    return np.stack(out)


def main():
    dt_snap = ROUNDS_PER_SNAP * (-math.log1p(-E / L))
    ts = np.arange(N_SNAPS + 1) * dt_snap

    # EXACT TETHERED: pair master equation at L=5 (4^10 states) — the
    # continuous-time law for the physics panels, and the DISCRETE
    # round kernel (I + Q/L)^r for the ensemble gate (the ensemble IS
    # r rounds; gating it against e^{Qt} would mix in the O(1/(2L^2))
    # same-site-repeat term, ~2%/round at L=5).
    p0 = np.kron(iid_ring_measure(P_PROG), iid_ring_measure(P_DATA))
    Q = master.build_pair_ring_generator(TAG, L)
    p_states = master.solve_master(Q, p0, ts)
    joints = np.stack([joint_site(p_states[i]) for i in range(len(ts))])
    mi_exact = np.array([mutual_information(j) for j in joints])
    p_disc = p0.copy()
    joints_disc = [joint_site(p_disc)]
    for _ in range(N_SNAPS):
        for _ in range(ROUNDS_PER_SNAP):
            p_disc = p_disc + (Q @ p_disc) / L
        joints_disc.append(joint_site(p_disc))
    joints_disc = np.stack(joints_disc)

    # WELL-MIXED: dual-SPD closure (infinite chain, zero cross-tape
    # correlation by construction).
    dual = dense.compile_dense_dual(TAG, CL_K)
    fn = dense.make_dense_dy_dt(dual, jit=False)
    half = SIZE_A ** CL_K
    y0 = np.concatenate([
        _common.iid_spd(P_PROG, CL_K).ravel(),
        _common.iid_spd(P_DATA, CL_K).ravel(),
    ])
    ys = np.asarray(solve(lambda y, t: fn(y), y0, ts,
                          rtol=1e-10, atol=1e-13))
    prog_marg = ys[:, :half].reshape(-1, *((SIZE_A,) * CL_K)).sum(
        axis=tuple(range(2, CL_K + 1)))
    data_marg = ys[:, half:].reshape(-1, *((SIZE_A,) * CL_K)).sum(
        axis=tuple(range(2, CL_K + 1)))

    # SAMPLED TETHERED: concrete pairs on the same initial laws.
    emp = _common.cached(f"ex3_tethered_master{SUFFIX}.npz",
                         lambda: ensemble_joints(ts), ts=ts)

    # Gate the ensemble against the DISCRETE kernel at the MC floor.
    # se counts each member once (members iid under independent_sites;
    # the L sites within a member are correlated, so B samples is the
    # conservative count) — no systematic term, so the 6-sigma gate is
    # honest at ANY B.
    se = np.sqrt(np.maximum(joints_disc, 1e-9)
                 * np.clip(1.0 - joints_disc, 0, 1) / B)
    z = np.abs(emp - joints_disc) / np.maximum(se, 1e-9)
    print(f"ensemble vs discrete pair kernel: max z over "
          f"{len(ts)}x16 joint-site entries = {z.max():.2f}")
    assert z.max() < 6.0, z.max()
    disc_vs_cont = np.abs(joints_disc - joints).max()
    print(f"discrete-round vs continuous master (same-site-repeat "
          f"term): max |Δ| = {disc_vs_cont:.4f}")

    mi_emp = np.array([mutual_information(j) for j in emp])
    prog_nonO = 1.0 - joints.sum(axis=2)[:, 0]
    data_nonO = 1.0 - joints.sum(axis=1)[:, 0]
    cl_prog_nonO = 1.0 - prog_marg[:, 0]
    cl_data_nonO = 1.0 - data_marg[:, 0]
    print(f"tethered MI(P;D): 0 -> {mi_exact[-1]:.3e} nats "
          f"(closure: identically 0)")
    print(f"final soup monomer mass: tethered {prog_nonO[-1]:.4f} vs "
          f"well-mixed closure {cl_prog_nonO[-1]:.4f}")
    assert mi_exact[-1] > 20 * abs(mi_exact[0]) + 1e-4

    fig, (ax1, ax2) = _common.pyplot.subplots(1, 2, figsize=(14, 6))
    ax1.plot(ts, prog_nonO, "-", color="C0",
             label="soup mass (tethered, exact master L=5)")
    ax1.plot(ts, 1 - emp.sum(axis=2)[:, 0], "o", ms=4, mfc="none",
             color="C0", label=f"soup mass (ensemble, B={B})")
    ax1.plot(ts, cl_prog_nonO, "--", color="C0", alpha=0.6,
             label="soup mass (well-mixed dual closure)")
    ax1.plot(ts, data_nonO, "-", color="C1",
             label="strand mass (tethered)")
    ax1.plot(ts, 1 - emp.sum(axis=1)[:, 0], "s", ms=4, mfc="none",
             color="C1", label="strand mass (ensemble)")
    ax1.plot(ts, cl_data_nonO, "--", color="C1", alpha=0.6,
             label="strand mass (well-mixed)")
    ax1.set_xlabel("t")
    ax1.set_ylabel("non-O symbol mass")
    ax1.set_title("fuel and chain mass: tethered vs well-mixed")
    ax1.legend(fontsize=9)
    ax1.grid(alpha=0.3)

    ax2.plot(ts, mi_exact, "-", color="C2",
             label="I(P;D) exact tethered (pair master)")
    ax2.plot(ts, mi_emp, "o", ms=4, mfc="none", color="C2",
             label="I(P;D) ensemble estimate")
    ax2.axhline(0.0, color="C3", linestyle="--",
                label="dual closure (zero by construction)")
    ax2.set_xlabel("t")
    ax2.set_ylabel("same-site mutual information (nats)")
    ax2.set_title("cross-tape correlation: the tethering signature")
    ax2.legend(fontsize=10)
    ax2.grid(alpha=0.3)

    fig.suptitle("ex3: tethered (exact pair master + sampled pairs) "
                 "vs well-mixed (dual closure)")
    fig.tight_layout()
    out = _common.out_path(f"ex3_tethered_master{SUFFIX}.pdf")
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
