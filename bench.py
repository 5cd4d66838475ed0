"""Headline benchmark: tape transitions/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

"Tape transition" = one reaction event applied to a concrete tape (one
firing of the reaction rule at one site: window gather -> transition-table
lookup -> outcome sample -> scatter), measured on the ensemble engine
(`engine/ensemble.py`) in the BASELINE config-5 setting (ex5 MSRTF,
batched tape ensemble). North-star target: 1e8 transitions/sec/chip
(BASELINE.md); vs_baseline = value / 1e8.

Also reports (stderr) the exact-engine RHS throughput in accumulation
events/sec — the unit of work of the reference's Scheme accumulator
(`tape_multiverse.scm:1271-1301`).
"""

import json
import os
import sys
import time

NORTH_STAR = 1e8


def _steady_rate(time_call, per_step, s_hi, *, n_rep=3):
    """Differenced steady-state stepping rate over two scan lengths.

    ``time_call(steps, rep) -> elapsed_s`` must run one fully synced
    ensemble call of ``steps`` rounds (compile warm-up is handled here:
    the first call at each length is discarded). The reported rate is

        per_step * (s_hi - s_lo) / (t(s_hi) - t(s_lo)),  s_lo = s_hi//5

    with MINIMA over ``n_rep`` reps per length — the per-call constant
    (tape<->bit-plane pack/unpack, tunnel dispatch, checksum sync)
    cancels EXACTLY, leaving the marginal per-round cost that any
    multi-thousand-round run pays. Finite-call rates kept climbing with
    the call length (headline: 5.1e10 at 1250 rounds/call, 7.0e10 at
    2500, 9.8e10 at 10000 — measured 2026-08-20) because the constant
    was still 10-50% of the call; the differenced rate is the number
    those converge to, and the constant is reported alongside so
    short-burst callers can price their own amortisation.

    Min, not median: tunnel noise is strictly one-sided (a congested
    round-trip only ever ADDS time), and it arrives in bursts that can
    hit 2 of 3 reps — the round-3 driver capture recorded bff calls
    [0.284, 0.346, 0.347] s at 1000 rounds whose median (0.346) said
    3.43e9 events/s while the same kernel times 0.25-0.27 s in every
    clean session (5.4-6.0e9; `probes/bff_variance.py`, measured
    2026-08-20 fresh/repeat/after-families). The min of n_rep reps is
    the standard robust estimator for a deterministic kernel under
    additive noise; the full sorted rep list is reported alongside so
    a noisy session is visible in the capture.
    """
    s_lo = max(1, s_hi // 5)
    best, raw = {}, {}
    for s in (s_lo, s_hi):
        time_call(s, -1)  # compile this scan length, untimed
        ts = sorted(time_call(s, i) for i in range(n_rep))
        best[s] = ts[0]
        raw[s] = [round(t, 4) for t in ts]
    dt_round = (best[s_hi] - best[s_lo]) / (s_hi - s_lo)
    if dt_round <= 0:  # timer-noise floor (CPU smoke runs): bulk rate
        dt_round = best[s_hi] / s_hi
    overhead = max(0.0, best[s_lo] - dt_round * s_lo)
    return per_step / dt_round, {
        "us_per_round": round(dt_round * 1e6, 2),
        "per_call_overhead_s": round(overhead, 4),
        "call_s": {s: raw[s] for s in (s_lo, s_hi)},
    }


def bench_ensemble():
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    # Gather-free decision-machine kernel (the transition-table kernel is
    # its bit-exact cross-check, `tests/test_ensemble.py`). float32
    # outcome sampling; resolution loss only matters for outcome
    # probabilities below ~1e-7.
    dt = ensemble.compile_decision_machine("ex5-msrtf-machine")

    # ~67M tape sites per batch; events at ~6% density per round.
    B = int(os.environ.get("CKPE_BENCH_B", "16384"))
    L = int(os.environ.get("CKPE_BENCH_L", "4096"))
    steps = int(os.environ.get("CKPE_BENCH_STEPS", "5000"))
    events = max(1, L // 16)

    key = jax.random.PRNGKey(0)
    state = [jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int32),
             jnp.zeros((B, L), jnp.int32)]

    def checksum(pt, dtp):
        # Forces materialisation of the final tapes with an 8-byte
        # transfer: `block_until_ready` alone is not a reliable sync on
        # the experimental TPU tunnel, and transferring the full [B, L]
        # tapes would time the link, not the kernel.
        return int(jnp.sum(pt.astype(jnp.int64)) +
                   jnp.sum(dtp.astype(jnp.int64)))

    def time_call(s, i):
        t0 = time.time()
        (pt, dtp), _ = ensemble.run_ensemble(
            jax.random.fold_in(jax.random.PRNGKey(1), s * 131 + i),
            tuple(state), dt, (s, events))
        checksum(pt, dtp)
        elapsed = time.time() - t0
        state[:] = [pt, dtp]
        return elapsed

    rate, info = _steady_rate(time_call, B * events, steps)
    info.update({
        "B": B, "L": L, "events_per_step": events,
        "machine": f"{dt.tag}: {len(dt.nodes)} decision nodes, "
                   f"{dt.num_specs} write specs, span {dt.span}",
    })
    return rate, info


def bench_exact_rhs(tag="ex5-msrtf-machine", cl_k=5, num_events=None):
    """Times the dense exact engine in chained on-device iterations.

    Unit: reference-equivalent accumulation events/s — the dense engine
    does no per-event work, so the rate is (events the reference's
    accumulator would execute for the same RHS call) / time.

    ``num_events`` short-circuits the chain-engine compile when the
    caller already knows the reference-equivalent event count (the
    flagship ex4 caller: the count is fixed by the rule + geometry and
    the chain compile that produces it costs ~100 s uncached).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu import (
        build_dy_dt,
        compile_problem,
    )
    from chemical_kinetics_and_program_execution_tpu.engine.dense import (
        dy_dt_dense,
    )

    fn, prog = build_dy_dt(tag, cl_k, jit=False)
    if num_events is None:
        num_events = compile_problem(tag, cl_k).num_events

    n_iter = 50

    @jax.jit
    def chained(p):
        def body(y, _):
            return y + 1e-12 * fn(y), None
        y, _ = jax.lax.scan(body, p, None, length=n_iter)
        return jnp.sum(y)

    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.dirichlet(np.ones(prog.state_size)))
    float(chained(p))  # compile + run
    t0 = time.time()
    float(chained(p))
    dt = (time.time() - t0) / n_iter
    return num_events / dt, {
        "tag": tag, "cl_k": cl_k, "equiv_events": num_events,
        "rhs_ms": round(dt * 1e3, 3),
    }


# ex4 cl_k=5 chain-engine event count (fixed by rule + geometry):
# `compile_problem("ex4-chemical-turing", 5).num_events` == 11,756,826
# (measured 2026-08-20, 100 s uncached compile — too slow to recompute
# per bench run for a constant).
EX4_K5_REF_EVENTS = 11_756_826


def bench_clk8_rhs():
    """One group-streamed dense RHS at ex4 cl_k=8 (43,046,721-dim f64)
    — the single-chip scaling frontier (RESULTS "ex4 at cl_k=8").

    The streamed engine runs one signature group per jit call with the
    accumulator donated (`dense.make_dense_dy_dt_streamed`), so the
    8-group first call pays 8 compiles (~260 s uncached, persistently
    cached thereafter); the reported number is the steady wall per RHS.
    Skipped on CPU backends (the 43M-dim f64 sweeps take minutes per
    group off-accelerator).
    """
    import jax
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import dense

    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        raise RuntimeError("cl_k=8 streamed RHS needs the accelerator")
    prog = dense.compile_dense("ex4-chemical-turing", 8)
    fn = dense.make_dense_dy_dt_streamed(prog)
    p0 = np.full(prog.state_size, 1.0 / prog.state_size)
    # Device-resident input: every real consumer (the round-5 on-device
    # DOP853 driver in ode/streamed_solve.py) keeps the state on the
    # chip between RHS calls; feeding numpy here would time the tunnel's
    # ~5 s 344 MB host->device copy, not the kernel (round-5 probe
    # `probes/clk8_rhs_decompose.py`: 8.7 s numpy-fed vs 1.98 s
    # device-fed at identical kernels).
    p_dev = jnp.asarray(p0)
    t0 = time.time()
    dy = np.asarray(fn(p_dev))
    first = time.time() - t0
    assert abs(dy.sum()) < 1e-12  # conservation at uniform p0
    walls = []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(fn(p_dev)))  # device-side checksum sync
        walls.append(time.time() - t0)
    dt = min(walls)
    # Reference-equivalent events scale ~A per cl_k step on this rule
    # (11.76M at k=5); report state-dims/s — an honest, self-contained
    # unit for the streamed sweep — and the wall per RHS alongside.
    return prog.state_size / dt, {
        "state": prog.state_size, "groups": len(fn.group_fns),
        "rhs_s": round(dt, 2), "first_call_s": round(first, 1),
        "unit": "state dims/s",
    }


def bench_config5():
    """BASELINE config 5: a 10^7-tape ex5 ensemble in lockstep."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    B = int(os.environ.get("CKPE_BENCH_C5_B", "10000000"))
    # Differenced steady-state rate (see _steady_rate): the per-call
    # constant at B=10^7 is large (tape<->bit-plane conversion ~0.36 s
    # each way plus dispatch/checksum — fitted ~0.9 s total), so
    # finite-call rates climbed 9.9e9 (500 rounds/call) -> 3.25e10
    # (2500) -> 5.7e10 (10000); the differencing cancels the constant
    # exactly. At 50 rounds the measurement was conversion-bound at
    # 1.24e9/s for BOTH tape paths.
    L, E = 32, 2
    steps = int(os.environ.get("CKPE_BENCH_C5_STEPS", "5000"))
    key = jax.random.PRNGKey(0)
    state = [jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int32),
             jnp.zeros((B, L), jnp.int32)]

    def time_call(s, i):
        t0 = time.time()
        (pt, dtp), _ = ensemble.run_ensemble(
            jax.random.fold_in(jax.random.PRNGKey(2), s * 131 + i),
            tuple(state), dm, (s, E))
        int(jnp.sum(pt.astype(jnp.int64)))  # sync
        elapsed = time.time() - t0
        state[:] = [pt, dtp]
        return elapsed

    rate, info = _steady_rate(time_call, B * E, steps)
    info.update({"tapes": B, "L": L})
    return rate, info


def bench_ssa():
    """SSA trajectory throughput (BASELINE: "SSA trajectories/sec")."""
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.models import gillespie

    import jax
    import jax.numpy as jnp

    net = gillespie.autocatalysis_network(
        1.0, 100.0, 1.0, 1.0, 100.0, 1.0, 10.0, 2.0
    )
    n0 = (0, 0, 2000)
    static = net.static
    B = int(os.environ.get("CKPE_BENCH_SSA_B", "65536"))
    E = int(os.environ.get("CKPE_BENCH_SSA_E", "1000"))

    def run(seed):
        # Time-major core (round 5): the batch-major [B, E, S]
        # convention cost two full-chain device transposes (~2.6 GB of
        # pure layout traffic) per call; the simulation being timed is
        # identical (`gillespie.ssa_batch` wraps this core).
        ts, ns = gillespie.ssa_batch_tm(jax.random.PRNGKey(seed), n0,
                                        static, E, B)
        # Device-side checksum: times the simulation, not the transfer
        # of the full jump chains over the host link.
        return float(jnp.sum(ns[-1].astype(jnp.int64)) +
                     jnp.sum(ts[-1]))

    run(0)  # compile
    t0 = time.time()
    run(1)
    dt = time.time() - t0
    return B / dt, {"trajectories": B, "events_each": E,
                    "events_per_s": f"{B * E / dt:.3e}"}


def bench_frontier(tag="ex5-msrtf-machine", K=None, blocks=None,
                   n_rep=3, init_hi=3):
    """Weighted frontier throughput (branch-steps/s), blocked mode.

    Stratified multi-site rounds between merge/re-rank blocks
    (`ensemble.run_weighted_frontier_blocked`): every member fires the
    rule at E lattice sites per round with sampled branching +
    importance weights; each block ends with merge-by-key + systematic
    slot resampling. One selection pass per rounds*E transitions
    instead of the per-step beam's sort-per-transition.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dm = ensemble.compile_decision_machine(tag)
    if K is None:
        K = int(os.environ.get("CKPE_BENCH_FRONTIER_K", "1000000"))
    # Merge every rounds*events = 2048 transitions: the cadence probe
    # (RESULTS.md "merge cadence"; long-horizon mode of
    # probes/merge_cadence.py) measured estimator L1 error FLAT in the
    # merge interval through 2048 (at tau=1 weights stay uniform —
    # sampling the true branch law — so merging is pure dedup and its
    # cadence is a cost knob, not a quality knob).
    L, rounds, events = 64, 512, 4
    if blocks is None:
        # Differenced over the BLOCK count (the block — rounds*events
        # transitions + one merge/resample pass — is the frontier's
        # repeating unit): per-call constants cancel, like the
        # ensemble benches. 6 blocks at K=10^6 is ~3 s per call; the
        # K=10^7 config-5 caller passes blocks=3 to bound call time.
        blocks = 6
    pt = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0, init_hi,
                            dtype=jnp.int8)
    dtp = jnp.zeros((K, L), jnp.int8)
    state = [pt, dtp, jnp.full((K,), -np.log(K), jnp.float64)]
    last_nu = [0]

    def time_call(b, i):
        t0 = time.time()
        (pt, dtp), lw, nu = ensemble.run_weighted_frontier_blocked(
            jax.random.fold_in(jax.random.PRNGKey(2), b * 131 + i),
            (state[0], state[1]), state[2], dm, (b, rounds, events))
        float(jnp.sum(pt.astype(jnp.int64))) + float(jnp.sum(lw))
        elapsed = time.time() - t0
        state[:] = [pt, dtp, lw]
        last_nu[0] = int(np.asarray(nu)[-1])
        return elapsed

    rate, info = _steady_rate(time_call, K * rounds * events, blocks,
                              n_rep=n_rep)
    info.update({
        "tag": tag, "K": K, "rounds": rounds, "events": events,
        "n_unique_last": last_nu[0],
    })
    return rate, info


def bench_frontier_per_step():
    """The per-step exact-branch beam (reference formulation for the
    blocked mode's parity tests): one global top-k + parent gather per
    transition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dtab = ensemble.device_table(
        ensemble.compile_transition_table("ex5-msrtf-machine"))
    K = int(os.environ.get("CKPE_BENCH_FRONTIER_K", "1000000"))
    L, steps = 32, 50
    pt = jax.random.randint(jax.random.PRNGKey(0), (K, L), 0, 3,
                            dtype=jnp.int32)
    dtp = jnp.zeros((K, L), jnp.int32)
    lw = jnp.full((K,), -np.log(K), jnp.float64)
    (pt, dtp), lw = ensemble.run_weighted_frontier(
        jax.random.PRNGKey(1), (pt, dtp), lw, dtab, steps, K)
    float(jnp.sum(lw))  # sync
    t0 = time.time()
    (pt, dtp), lw = ensemble.run_weighted_frontier(
        jax.random.PRNGKey(2), (pt, dtp), lw, dtab, steps, K)
    float(jnp.sum(pt.astype(jnp.int64))) + float(jnp.sum(lw))
    dt = time.time() - t0
    return K * steps / dt, {"K": K, "steps": steps,
                            "ms_per_step": round(dt / steps * 1e3, 1)}


def bench_branching_ensemble():
    """Ensemble rate for a rule WITH choose nodes (ex4 chemical Turing:
    nested chooses, rate tables) — the uniform renormalisation /
    branch-sampling path of the decision machine in anger (VERDICT
    round-1 weak item #2)."""
    import jax
    import jax.numpy as jnp

    from chemical_kinetics_and_program_execution_tpu.engine import ensemble

    dm = ensemble.compile_decision_machine("ex4-chemical-turing")
    assert any(isinstance(n, ensemble._Choose) for n in dm.nodes)
    # CKPE_BENCH_EX4_B overrides; otherwise follow the main ensemble's
    # CKPE_BENCH_B so one knob reduces the whole bench (CPU smoke runs).
    B = int(os.environ.get("CKPE_BENCH_EX4_B",
                           os.environ.get("CKPE_BENCH_B", "16384")))
    L = int(os.environ.get("CKPE_BENCH_L", "4096"))
    # Differenced steady-state rate, like bench_ensemble: at 250
    # rounds/call the sampling-circuit round's per-call pack/dispatch
    # cost was ~2/3 of the call (1.35e10 vs 3.5e10 at 1250 rounds).
    steps = int(os.environ.get("CKPE_BENCH_STEPS", "5000"))
    events = max(1, L // 16)
    # ex4 alphabet order (`models/problems.py:_EX4_SYMBOLS`):
    # A(0) B(1) C(2) D(3) I(4) O(5) P(6) X(7) S(8). The rule fires off
    # the PROGRAM tape (P -> unconditional 50/50 choose; X -> guarded
    # reverse chooses), so put the fuel mix there and a cursor/bit mix
    # on the data tape.
    kp, kd = jax.random.split(jax.random.PRNGKey(0))
    ptape = jax.random.choice(
        kp, jnp.asarray([6, 7, 5], jnp.int32), (B, L),
        p=jnp.asarray([0.45, 0.45, 0.10]))
    dtape = jax.random.choice(
        kd, jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32), (B, L),
        p=jnp.asarray([0.10, 0.10, 0.10, 0.10, 0.30, 0.30]))
    (pt, dtp), _ = ensemble.run_ensemble(
        jax.random.PRNGKey(1), (ptape, dtape), dm, (64, events))
    # The point of this bench is the choose/renormalisation path: the
    # rule must actually fire (P-sites execute a choose and may write
    # X back to the program tape). Guard against a regression where an
    # inert tape mix turns the rule into a no-op.
    n_changed = int(jnp.sum(pt != ptape))
    assert n_changed > 0, "ex4 rule never wrote — inert bench tape mix"
    int(jnp.sum(pt.astype(jnp.int64)))
    state = [pt, dtp]

    def time_call(s, i):
        t0 = time.time()
        (pt, dtp), _ = ensemble.run_ensemble(
            jax.random.fold_in(jax.random.PRNGKey(2), s * 131 + i),
            tuple(state), dm, (s, events))
        int(jnp.sum(pt.astype(jnp.int64)) + jnp.sum(dtp.astype(jnp.int64)))
        elapsed = time.time() - t0
        state[:] = [pt, dtp]
        return elapsed

    rate, info = _steady_rate(time_call, B * events, steps)
    info.update({"B": B, "L": L,
                 "machine": f"{dm.tag}: {len(dm.nodes)} nodes"})
    return rate, info


def bench_bff():
    """Faithful mini-BFF interpreter throughput (`engine/bff.py`): the
    rule no other engine can run un-pruned. Site events/s, with 10
    executed register-machine ops per event."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import bff

    m = bff.compile_bff("ex6-mini-bff")
    B = int(os.environ.get("CKPE_BENCH_BFF_B",
                           os.environ.get("CKPE_BENCH_B", "16384")))
    L = int(os.environ.get("CKPE_BENCH_L", "4096"))
    steps = int(os.environ.get("CKPE_BENCH_STEPS", "1000"))
    events = max(1, L // 64)  # stride 64 > 2*span = 62

    key = jax.random.PRNGKey(0)
    state = [jax.random.randint(key, (B, L), 0, m.size_a,
                                dtype=jnp.int32),
             jax.random.randint(jax.random.fold_in(key, 1), (B, L), 0,
                                m.size_a, dtype=jnp.int32)]

    # The faithful rule's bit-sliced circuit is too big for CI's CPU
    # backend (`bff_bitslice.CPU_MAX_CIRCUIT_OPS`), so ITS cross-engine
    # bit-identity gate lives here, on the accelerator, ahead of the
    # timing: 2 rounds on a 32-member slice, tapes AND opcode totals
    # exactly equal between the circuit and the int8 scan.
    engine_used = "scan"
    if jax.default_backend() != "cpu":
        engine_used = "bitslice"
        kchk = jax.random.PRNGKey(99)
        sl = tuple(t[:32, :512] for t in state)
        ev_chk = max(1, 512 // 64)
        a = bff.run_ensemble_bff(kchk, sl, m, (2, ev_chk),
                                 engine="bitslice")
        b = bff.run_ensemble_bff(kchk, sl, m, (2, ev_chk),
                                 engine="scan")
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            if not np.array_equal(np.asarray(x), np.asarray(y)):
                raise RuntimeError(
                    "bff bitslice/scan cross-engine parity FAILED on "
                    "the faithful rule")

    def time_call(s, i):
        t0 = time.time()
        (pt, dtp), _ = bff.run_ensemble_bff(
            jax.random.fold_in(jax.random.PRNGKey(2), s * 131 + i),
            tuple(state), m, (s, events))
        int(jnp.sum(pt.astype(jnp.int64)) + jnp.sum(dtp.astype(jnp.int64)))
        elapsed = time.time() - t0
        state[:] = [pt, dtp]
        return elapsed

    # n_rep=5: the headline-bearing family gets extra noise headroom
    # (calls are ~0.1-0.35 s; see the round-3 median-vs-min incident
    # in `_steady_rate`'s docstring).
    rate, info = _steady_rate(time_call, B * events, steps, n_rep=5)
    info.update({
        "B": B, "L": L, "events_per_step": events,
        "ops_per_event": m.fuel,
        "ops_per_s": f"{rate * m.fuel:.3e}",
        "machine": m.summary(),
        "engine": engine_used,
    })
    return rate, info


def _probe_backend(timeout_s: int = 240) -> None:
    """Fail fast when the accelerator tunnel is dead.

    A dead axon tunnel makes jax's backend init retry for ~30 minutes
    before raising (measured 2026-08-17); probing in a killable
    subprocess bounds that to ``timeout_s`` with a clear message.
    Skipped when the run explicitly targets CPU.
    """
    if os.environ.get("CKPE_PLATFORM", "").lower() == "cpu":
        return
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except Exception as e:
        print(f"# accelerator backend unavailable ({type(e).__name__}); "
              "set CKPE_PLATFORM=cpu for a CPU run", file=sys.stderr)
        raise SystemExit(2)


def main():
    """Run every family bench; print the driver headline JSON line LAST.

    Round-2 regression: the headline was printed FIRST and the stderr
    detail grew long enough to push it out of the driver's tail capture
    (`BENCH_r02.json` ``"parsed": null``). The headline is therefore
    printed twice — once up front (humans watching the stream) and once
    as the FINAL stdout line (the driver parses the tail) — preceded by
    one compact ``{"families": ...}`` JSON line with every family rate.
    """
    _probe_backend()
    families = {}
    tps, info = bench_ensemble()
    families["ensemble_ex5"] = tps
    result = {
        "metric": "tape transitions/sec/chip",
        "value": tps,
        "unit": "transitions/s",
        "vs_baseline": tps / NORTH_STAR,
    }
    print(json.dumps(result), flush=True)
    print(f"# ensemble: {info}", file=sys.stderr)
    try:
        eps, einfo = bench_exact_rhs()
        families["exact_rhs"] = eps
        print(f"# exact RHS: {eps:.3e} accumulation events/s {einfo}",
              file=sys.stderr)
    except Exception as e:  # secondary metric must never fail the bench
        print(f"# exact RHS bench skipped: {e}", file=sys.stderr)
    try:
        # The flagship exact engine: ex4 cl_k=5 dense RHS (the direct
        # TPU replacement for the reference's hot loop,
        # tape_multiverse.scm:1464-1500) — driver-captured every round
        # (round-3 verdict missing item #1).
        eps4, einfo4 = bench_exact_rhs("ex4-chemical-turing", 5,
                                       num_events=EX4_K5_REF_EVENTS)
        families["exact_rhs_ex4"] = eps4
        print(f"# exact RHS (flagship ex4 cl_k=5): {eps4:.3e} "
              f"accumulation events/s {einfo4}", file=sys.stderr)
    except Exception as e:
        print(f"# exact RHS ex4 bench skipped: {e}", file=sys.stderr)
    try:
        sps, sinfo = bench_ssa()
        families["ssa"] = sps
        print(f"# SSA: {sps:.3e} trajectories/s {sinfo}", file=sys.stderr)
    except Exception as e:
        print(f"# SSA bench skipped: {e}", file=sys.stderr)
    try:
        c5, cinfo = bench_config5()
        families["config5"] = c5
        print(f"# config5 (1e7-tape ensemble): {c5:.3e} transitions/s "
              f"{cinfo}", file=sys.stderr)
    except Exception as e:
        print(f"# config5 bench skipped: {e}", file=sys.stderr)
    try:
        br, binfo = bench_branching_ensemble()
        families["ensemble_branching_ex4"] = br
        print(f"# ensemble (branching rule, ex4): {br:.3e} transitions/s "
              f"{binfo}", file=sys.stderr)
    except Exception as e:
        print(f"# branching ensemble bench skipped: {e}", file=sys.stderr)
    try:
        bf, bfinfo = bench_bff()
        families["bff"] = bf
        print(f"# bff interpreter (faithful ex6): {bf:.3e} site "
              f"events/s {bfinfo}", file=sys.stderr)
    except Exception as e:
        print(f"# bff bench skipped: {e}", file=sys.stderr)
    for tag in ("ex5-msrtf-machine", "ex2-ferromagnetic-chain"):
        try:
            fr, finfo = bench_frontier(tag)
            families[f"frontier_{tag.split('-')[0]}"] = fr
            print(f"# frontier (blocked, {tag}): {fr:.3e} branch-steps/s "
                  f"{finfo}", file=sys.stderr)
        except Exception as e:
            print(f"# frontier bench ({tag}) skipped: {e}",
                  file=sys.stderr)
    try:
        # Wide-WINDOW machine (ex6-mini-bff-lite: 85 specs, level-2
        # reads 5 distinct cells): FSM-only until round 4's split
        # sampling-circuit synthesis; driver-captured so the wide-rule
        # fast path is scored every round (round-3 verdict weak #4).
        # Accelerator-only: on CPU the auto path keeps the FSM walk
        # (11k-op circuit > CPU_MAX_CIRCUIT_OPS) whose lite rounds are
        # ~10 min even at smoke K — and the family exists to score the
        # CIRCUIT.
        import jax as _jax
        if _jax.default_backend() == "cpu":
            raise RuntimeError("wide-lite frontier scores the sampling "
                               "circuit; CPU keeps the FSM walk")
        fw, fwinfo = bench_frontier("ex6-mini-bff-lite", init_hi=12)
        families["frontier_wide_lite"] = fw
        print(f"# frontier (blocked, wide-window ex6-lite): {fw:.3e} "
              f"branch-steps/s {fwinfo}", file=sys.stderr)
    except Exception as e:
        print(f"# frontier wide-lite bench skipped: {e}",
              file=sys.stderr)
    try:
        # When a reduced frontier K is set (CPU smoke runs), scale the
        # config-5 width with it instead of silently running the full
        # 1e7-tape beam for tens of minutes off-TPU.
        k_reduced = os.environ.get("CKPE_BENCH_FRONTIER_K")
        k7 = int(os.environ.get(
            "CKPE_BENCH_FRONTIER_K7",
            k_reduced if k_reduced is not None else "10000000"))
        fr, finfo = bench_frontier("ex2-ferromagnetic-chain", K=k7,
                                   blocks=3, n_rep=2)
        families["frontier_1e7"] = fr
        print(f"# frontier (blocked, 1e7-tape config 5): {fr:.3e} "
              f"branch-steps/s {finfo}", file=sys.stderr)
    except Exception as e:
        print(f"# frontier 1e7 bench skipped: {e}", file=sys.stderr)
    try:
        # cl_k=8 streamed RHS: the single-chip scaling frontier,
        # driver-captured (round-3 verdict missing item #2). Runs LAST:
        # its 43M-dim f64 buffers + 8 compiled groups would otherwise
        # sit in HBM under every later family.
        c8, c8info = bench_clk8_rhs()
        families["clk8_rhs"] = c8
        print(f"# cl_k=8 streamed RHS: {c8:.3e} state dims/s {c8info}",
              file=sys.stderr)
    except Exception as e:
        print(f"# cl_k=8 streamed RHS bench skipped: {e}",
              file=sys.stderr)
    # Final two stdout lines, in this order: the compact family rates,
    # then the driver-parseable headline (MUST be last — see docstring).
    print(json.dumps(
        {"families": {k: float(f"{v:.4e}") for k, v in families.items()},
         "unit": "events/s (per family)"}), flush=True)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
