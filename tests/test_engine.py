"""Engine correctness: canary golden vector, compiled-vs-reference
cross-validation, and probability conservation (SURVEY §4)."""

import numpy as np
import pytest

from chemical_kinetics_and_program_execution_tpu import (
    compile_problem,
    make_dy_dt,
)
from chemical_kinetics_and_program_execution_tpu import markov_tapes
from chemical_kinetics_and_program_execution_tpu.engine.reference import (
    dy_dt_reference,
)

# Small context lengths keep compile times in milliseconds; the engine
# semantics are identical at every cl_k.
CROSS_VALIDATION_CASES = [
    ("ex1-radioactive-decay", 3),
    ("ex1-radioactive-decay", 5),
    ("ex2-ferromagnetic-chain", 3),
    ("ex2-ferromagnetic-chain", 5),
    ("ex3-copolymerization", 4),
    ("ex3var1-copolymerization", 4),
    ("ex3var2-copolymerization", 4),
    ("ex4-chemical-turing", 3),
    ("ex4var1-chemical-turing", 3),
    ("ex4var2-chemical-turing", 3),
    ("ex5-msrtf-machine", 3),
    ("ex5var1-msrtf-machine", 3),
    ("ex6-mini-bff-lite", 2),
]


def _random_spd(rng, size, concentrated=False):
    p = rng.dirichlet(np.ones(size) * (0.2 if concentrated else 1.0))
    return p


def test_canary_golden_vector_exact():
    """The single most valuable regression oracle in the reference
    (`markov_tapes.py:357-365`): must match EXACTLY, not approximately."""
    markov_tapes._run_validation()


@pytest.mark.parametrize("engine", ["dense", "tree"])
@pytest.mark.parametrize("tag,cl_k", CROSS_VALIDATION_CASES)
def test_compiled_matches_reference(tag, cl_k, engine):
    from chemical_kinetics_and_program_execution_tpu import build_dy_dt

    fn, prog = build_dy_dt(tag, cl_k, engine=engine)
    rng = np.random.RandomState(hash(tag) % 2**31)
    for concentrated in (False, True):
        p = _random_spd(rng, prog.state_size, concentrated)
        got = np.asarray(fn(p))
        want = dy_dt_reference(tag, cl_k, p)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_dense_long_signature_pops():
    """Signatures longer than cl_k exercise the dense engine's interior
    (fully revealed) emissions — `tape_multiverse.scm` ln>cl_k branch."""
    from chemical_kinetics_and_program_execution_tpu.engine import (
        dense,
        dsl,
        rhs,
    )

    tag = "_test-long-sig"
    if tag not in dsl.registered_problems():
        @dsl.register_problem(tag, symbols=("A", "B"))
        def long_sig_rule(t):
            # Reads cells 0..3 (revealed length 4 > cl_k=3), writes two
            # separated cells so orig/adj differ at non-adjacent digits.
            a = t.get(True, 0)
            b = t.get(True, 3)
            if a == 1:
                t.set(True, 0, 0)
            if b == 0:
                t.set(True, 3, 1)

    cl_k = 3
    prog = dense.compile_dense(tag, cl_k)
    assert max(p.length for p in prog.plans) > cl_k
    f_dense = dense.make_dense_dy_dt(prog)
    f_chain = rhs.make_chain_dy_dt(compile_problem(tag, cl_k,
                                                   use_cache=False))
    rng = np.random.RandomState(11)
    p = _random_spd(rng, prog.state_size)
    np.testing.assert_allclose(
        np.asarray(f_dense(p)), np.asarray(f_chain(p)),
        rtol=1e-12, atol=1e-15,
    )
    want = dy_dt_reference(tag, cl_k, p)
    np.testing.assert_allclose(
        np.asarray(f_dense(p)), want, rtol=1e-12, atol=1e-14,
    )


@pytest.mark.parametrize("tag,cl_k", CROSS_VALIDATION_CASES[:8])
def test_probability_conservation(tag, cl_k):
    """Each dy/dt must sum to zero — guaranteed by the ± pairing in the
    accumulator (`tape_multiverse.scm:1285-1291`)."""
    compiled = compile_problem(tag, cl_k, use_cache=False)
    fn = make_dy_dt(compiled)
    rng = np.random.RandomState(42)
    p = _random_spd(rng, compiled.state_size)
    assert abs(float(np.asarray(fn(p)).sum())) < 1e-13


def test_engine_handles_invalid_probabilities():
    """ODE interpolation can transiently feed negative/unnormalised p
    (`tape_multiverse.scm:524-554`); the noise guards must keep the result
    finite and matching the reference semantics."""
    compiled = compile_problem("ex2-ferromagnetic-chain", 4, use_cache=False)
    fn = make_dy_dt(compiled)
    rng = np.random.RandomState(3)
    p = rng.dirichlet(np.ones(compiled.state_size))
    p[0] = -1e-13  # slightly invalid, as interpolants produce
    got = np.asarray(fn(p))
    want = dy_dt_reference("ex2-ferromagnetic-chain", 4, p)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("tag,cl_k", CROSS_VALIDATION_CASES[:8])
def test_tree_kernel_matches_chain_kernel(tag, cl_k):
    """The levelized prefix-tree kernel (default) must agree with the
    structure-independent padded-chain kernel on the same tables."""
    from chemical_kinetics_and_program_execution_tpu.engine import rhs

    compiled = compile_problem(tag, cl_k, use_cache=False)
    f_tree = rhs.make_dy_dt(compiled)
    f_chain = rhs.make_chain_dy_dt(compiled)
    rng = np.random.RandomState(7)
    p = _random_spd(rng, compiled.state_size)
    p[0] = -1e-13  # include the noise-guard regime
    np.testing.assert_allclose(
        np.asarray(f_tree(p)), np.asarray(f_chain(p)),
        rtol=1e-12, atol=1e-15,
    )


def test_batched_rhs_matches_single():
    from chemical_kinetics_and_program_execution_tpu import make_batched_dy_dt

    compiled = compile_problem("ex2-ferromagnetic-chain", 4, use_cache=False)
    single = make_dy_dt(compiled)
    batched = make_batched_dy_dt(compiled)
    rng = np.random.RandomState(4)
    batch = np.stack([rng.dirichlet(np.ones(16)) for _ in range(5)])
    got = np.asarray(batched(batch))
    want = np.stack([np.asarray(single(p)) for p in batch])
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=0)


def test_compile_cache_roundtrip(tmp_path, monkeypatch):
    from chemical_kinetics_and_program_execution_tpu.engine import compile as cmod
    from chemical_kinetics_and_program_execution_tpu.utils import config

    monkeypatch.setattr(config, "CACHE_DIR", str(tmp_path))
    a = cmod.compile_problem("ex1-radioactive-decay", 4, use_cache=True)
    b = cmod.compile_problem("ex1-radioactive-decay", 4, use_cache=True)
    for name in cmod._ARRAY_FIELDS:
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name))


def test_cache_key_tracks_closure_state():
    """Editing a closed-over rate table (e.g. `_ex4var2_tables`) must
    invalidate the compiled-problem cache (round-1 weakness: the key
    hashed bytecode only)."""
    from chemical_kinetics_and_program_execution_tpu.engine import (
        compile as cmod,
        dsl,
    )

    def make(rate):
        table = {"rate": rate}

        def rule(t):
            if t.get(True, 0) == 1 and table["rate"] > 0.5:
                t.set(True, 0, 0)

        return dsl.Problem(tag="_cachetest", symbols=("A", "B"), rule=rule)

    path_a = cmod._cache_path(make(0.25), 3)
    path_b = cmod._cache_path(make(0.75), 3)
    path_a2 = cmod._cache_path(make(0.25), 3)
    assert path_a == path_a2
    assert path_a != path_b


def test_pruned_enumeration_exact_at_tiny_threshold():
    """A prune threshold below every world's weight must reproduce the
    exact engine bit-for-bit and report mass == 1."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense

    full = dense.compile_dense("ex5-msrtf-machine", 3)
    beam = dense.compile_dense("ex5-msrtf-machine", 3,
                               prune_threshold=1e-30)
    assert beam.num_worlds == full.num_worlds
    f_full = dense.make_dense_dy_dt(full)
    f_beam = dense.make_dense_dy_dt(beam, with_mass=True)
    rng = np.random.RandomState(5)
    p = rng.dirichlet(np.ones(full.state_size))
    dy0 = np.asarray(f_full(p))
    dy1, mass = f_beam(p)
    np.testing.assert_array_equal(dy0, np.asarray(dy1))
    assert abs(float(mass) - 1.0) < 1e-12


def test_faithful_ex6_pruned_mode_with_measured_mass():
    """The faithful (non-enumerable) ex6 mini-BFF runs in pruned exact
    mode: enumeration bounded by a reference-weight threshold, runtime
    mass measured (VERDICT round-1 item #7)."""
    import itertools

    from chemical_kinetics_and_program_execution_tpu.engine import dense, dsl

    prob = dsl.get_problem("ex6-mini-bff")
    a, k = prob.size_a, 3
    psym = np.full(a, 0.1 / (a - 1))
    psym[0] = 0.9
    p_ref = np.array([
        np.prod([psym[s] for s in w])
        for w in itertools.product(range(a), repeat=k)
    ])
    prog = dense.compile_dense("ex6-mini-bff", k, p_ref=p_ref,
                               prune_threshold=1e-4,
                               max_worlds=100_000)
    assert prog.pruned and prog.num_worlds > 0
    fn = dense.make_dense_dy_dt(prog, with_mass=True)
    dy, mass = fn(p_ref)
    dy = np.asarray(dy)
    assert np.isfinite(dy).all()
    assert abs(dy.sum()) < 1e-12  # probability conservation still exact
    assert 0.0 < float(mass) < 1.0  # bounded, measured weight loss


def test_get_dy_dt_validates_sizes():
    with pytest.raises(ValueError, match="alphabet size"):
        markov_tapes.get_dy_dt(tag="ex1-radioactive-decay", size_a=3, cl_k=3)
    fn = markov_tapes.get_dy_dt(tag="ex1-radioactive-decay", size_a=2, cl_k=3)
    with pytest.raises(ValueError, match="should have size"):
        fn(np.zeros(7), 0.0)


def test_dense_roll_emit_matches_subslice_emit(monkeypatch):
    """The large-state masked-roll emission (layout guard for states
    >= _ROLL_EMIT_MIN_STATE where the 3-D sub-slice form tile-pads up
    to 14x) must be bit-equivalent to the sub-slice form."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense

    rng = np.random.RandomState(7)
    for tag, cl_k in [("ex4-chemical-turing", 4),
                      ("ex2-ferromagnetic-chain", 5),
                      ("ex5-msrtf-machine", 4)]:
        prog = dense.compile_dense(tag, cl_k)
        fn_sub = dense.make_dense_dy_dt(prog)
        p = _random_spd(rng, prog.state_size)
        want = np.asarray(fn_sub(p))
        monkeypatch.setattr(dense, "_ROLL_EMIT_MIN_STATE", 1)
        fn_roll = dense.make_dense_dy_dt(prog)
        got = np.asarray(fn_roll(p))
        monkeypatch.undo()
        np.testing.assert_allclose(got, want, rtol=1e-14, atol=1e-16)


def test_dump_worlds_debug_mode(capsys):
    """The world-dump debug tool prints every execution path with its
    probability, decision program, and old->new sequences (reference
    parity: tape_multiverse.scm:1006-1028)."""
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine.reference import (
        dump_worlds,
    )

    n = dump_worlds("ex2-ferromagnetic-chain", 3, np.full(8, 0.125))
    out = capsys.readouterr().out
    lines = [l for l in out.strip().split("\n") if l]
    assert len(lines) == n and n > 4
    assert all("p_world=" in l and "prog[" in l for l in lines)
    # Worlds evaluated against the uniform SPD must carry total
    # probability size_a (one multiverse per tape site of each tape...
    # exactly: sum over worlds of p_world = 1 per rule evaluation).
    tot = sum(float(l.split("p_world=")[1].split()[0]) for l in lines)
    np.testing.assert_allclose(tot, 1.0, rtol=1e-6)
    # A write shows as an old -> new sequence.
    assert any("->" in l for l in lines)
    # Probability-free variant still prints.
    n2 = dump_worlds("ex1-radioactive-decay", 3, None, limit=3)
    assert 0 < n2 <= 3


def test_native_ex6_enumeration_parity():
    """The C++ guided enumerator (native/enumerate6.cc) must emit
    bit-identical worlds in identical DFS order to the Python odometer,
    for both uniform and concentrated reference distributions (the
    latter exercises >int64 tape-signature spans via the 128-bit
    path)."""
    import itertools

    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import (
        dsl,
        enumerate as em,
        native,
    )

    if not native.available():  # pragma: no cover - toolchain-less env
        import pytest

        pytest.skip("native library unavailable")

    prob = dsl.get_problem("ex6-mini-bff")
    a = prob.size_a
    for cl_k, p_ref, thr in (
        (4, np.full(a**4, a**-4.0), 1e-4),
        (3, None, 1e-5),
    ):
        if p_ref is None:  # concentrated: long zero-runs stay alive
            psym = np.full(a, 0.1 / (a - 1))
            psym[0] = 0.9
            p_ref = np.array([
                np.prod([psym[s] for s in w])
                for w in itertools.product(range(a), repeat=3)
            ])
        g = em.BeamGuide(p_ref, a, cl_k, thr)
        ws_native = em.enumerate_worlds(prob, cl_k, guide=g)
        params = prob.rule.native_ex6
        del prob.rule.native_ex6
        try:
            ws_python = em.enumerate_worlds(prob, cl_k, guide=g)
        finally:
            prob.rule.native_ex6 = params
        assert len(ws_native) == len(ws_python) > 0
        for w_n, w_p in zip(ws_native, ws_python):
            assert w_n.factors == w_p.factors
            assert w_n.tape_sigs == w_p.tape_sigs
            assert w_n.const == w_p.const


def test_native_ex6_self_enumeration_parity():
    """The native DFS also covers the single-tape SELF-MODIFYING
    variants (code_tape=1: opcode fetch on the live data ring) —
    bit-identical worlds in identical DFS order to the Python odometer
    for both the lite and the faithful fuel-10 rule. The faithful rule
    is the one that NEEDS the native path: guided enumeration near a
    replicator monoculture takes ~2 s/thousand worlds in Python and
    ~100 ns/node natively (probes/self_faithful_gate.py)."""
    import numpy as np

    from chemical_kinetics_and_program_execution_tpu.engine import (
        dsl,
        enumerate as em,
        native,
    )

    if not native.available():  # pragma: no cover - toolchain-less env
        import pytest

        pytest.skip("native library unavailable")

    for tag, cl_k, thr, concentrated in (
        ("ex6-mini-bff-self-lite", 3, 1e-6, False),
        ("ex6-mini-bff-self", 3, 1e-4, True),
    ):
        prob = dsl.get_problem(tag)
        a = prob.size_a
        if concentrated:
            # Dot-heavy: the regime the faithful self rule is pruned
            # in (replicator monoculture neighbourhood).
            psym = np.full(a, 0.02)
            psym[prob.symbols.index("dot")] = 1.0 - 0.02 * (a - 1)
        else:
            psym = np.full(a, 1.0 / a)
        p_ref = np.array([1.0])
        for _ in range(cl_k):
            p_ref = np.kron(p_ref, psym)
        g = em.BeamGuide(p_ref, a, cl_k, thr)
        ws_native = em.enumerate_worlds(prob, cl_k, guide=g)
        params = prob.rule.native_ex6_self
        del prob.rule.native_ex6_self
        try:
            ws_python = em.enumerate_worlds(prob, cl_k, guide=g)
        finally:
            prob.rule.native_ex6_self = params
        assert len(ws_native) == len(ws_python) > 0
        # Tape 0 (PROG) is untouched by the single-tape rule.
        assert all(w.tape_sigs[0] == (0, 0, 0) for w in ws_native)
        for w_n, w_p in zip(ws_native, ws_python):
            assert w_n.factors == w_p.factors
            assert w_n.tape_sigs == w_p.tape_sigs
            assert w_n.const == w_p.const


def test_dense_streamed_matches_fused():
    """`make_dense_dy_dt_streamed` (the group-per-jit, donated-dy form
    that crosses the cl_k=8 single-chip HBM wall — RESULTS round 3)
    must be BIT-EXACT against the fused RHS; also pins the dual-program
    rejection."""
    import jax.numpy as jnp  # noqa: F401

    from chemical_kinetics_and_program_execution_tpu.engine import dense

    prog = dense.compile_dense("ex4-chemical-turing", 4)
    f1 = dense.make_dense_dy_dt(prog)
    f2 = dense.make_dense_dy_dt_streamed(prog)
    rng = np.random.RandomState(0)
    for _ in range(2):
        p = rng.dirichlet(np.ones(prog.state_size))
        np.testing.assert_array_equal(np.asarray(f1(p)),
                                      np.asarray(f2(p)))
    import pytest as _pytest

    dual = dense.compile_dense_dual("ex3-copolymerization", 3)
    with _pytest.raises(ValueError, match="single-tape"):
        dense.make_dense_dy_dt_streamed(dual)


def test_bench_ex4_k5_event_constant_matches_compiler():
    """`bench.EX4_K5_REF_EVENTS` short-circuits the chain-engine compile
    for the flagship exact-RHS rate; if the ex4 rule or geometry ever
    changed, the constant would silently drift and the reported rate
    would be wrong with no check (round-4 advisor)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ckpe_bench", os.path.join(os.path.dirname(__file__), "..",
                                   "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from chemical_kinetics_and_program_execution_tpu.engine.compile import (
        compile_problem,
    )

    assert bench.EX4_K5_REF_EVENTS == \
        compile_problem("ex4-chemical-turing", 5).num_events
