"""Problem compiler: multiverse → dense event tables.

Orchestrates `enumerate.py` (execution-path enumeration) and
`accumulate.py` (window-sweep expansion) into the static arrays consumed by
the runtime kernel (`rhs.py`). The compiled representation has three
stages, mirroring the algebraic structure of the reference computation:

1. **worlds** ``w[i] = const_i · Π ratio`` — one row per execution path
   (`tape_multiverse.scm` world probability at path termination),
2. **signatures** ``s[k] = Σ_{worlds with signature k} w`` — worlds sharing
   a revealed-window pair share their entire accumulation sweep, so their
   weights are summed *before* the sweep (a pure optimization; the
   reference re-runs `lr-rec-extend-1` per world, `:1416-1443`),
3. **events** ``v[e] = s[sig_e] · Π ratio`` scattered as ``-v`` at the
   original-window rank and ``+v`` at the adjusted-window rank
   (`:1271-1301`).

Compiled problems are cached on disk (keyed by tag, geometry, and the
rule's bytecode) because enumeration of the larger problems takes seconds
to minutes on the host while the resulting tables are reused for every
RHS call of every solve.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np

from ..markov import pyramid_offsets
from ..utils import config
from . import accumulate, dsl, enumerate as enum_mod, native

_FORMAT_VERSION = 3

_ARRAY_FIELDS = (
    "w_num", "w_den", "w_const",
    "pair_world", "pair_sig",
    "e_num", "e_den", "e_sig",
    "ev_idx", "ev_sign", "ev_tgt",
)


@dataclasses.dataclass
class CompiledProblem:
    tag: str
    size_a: int
    cl_k: int
    pyramid_size: int
    num_signatures: int
    # Stage 1: per-world factor chains, padded with the constant-1 slot.
    w_num: np.ndarray  # [W, Lw] int32
    w_den: np.ndarray  # [W, Lw] int32
    w_const: np.ndarray  # [W] float64
    # Stage 2: world→signature segment mapping.
    pair_world: np.ndarray  # [M] int32
    pair_sig: np.ndarray  # [M] int32
    # Stage 3: per-event factor chains and the pre-sorted signed scatter.
    e_num: np.ndarray  # [E, Le] int32
    e_den: np.ndarray  # [E, Le] int32
    e_sig: np.ndarray  # [E] int32
    ev_idx: np.ndarray  # [2E] int32  (event index per signed contribution)
    ev_sign: np.ndarray  # [2E] float64
    ev_tgt: np.ndarray  # [2E] int32  (sorted window ranks)

    @property
    def state_size(self) -> int:
        return self.size_a**self.cl_k

    @property
    def num_worlds(self) -> int:
        return len(self.w_const)

    @property
    def num_events(self) -> int:
        return len(self.e_sig)

    def summary(self) -> str:
        return (
            f"{self.tag}[A={self.size_a},k={self.cl_k}]: "
            f"{self.num_worlds} worlds, {self.num_signatures} signatures, "
            f"{self.num_events} events "
            f"(chains: worlds≤{self.w_num.shape[1]}, "
            f"events≤{self.e_num.shape[1]})"
        )


def _stable_argsort_i32(values: np.ndarray) -> np.ndarray:
    """Stable argsort of window ranks.

    Ranks fit in int32 (state sizes ≤ ~1e7); numpy's stable kind uses a
    radix sort on integer keys, and halving the key width roughly halves
    the passes over the 10^7-element scatter arrays.
    """
    return np.argsort(values.astype(np.int32), kind="stable")


def _pad_chains(chains, one_slot, dtype=np.int32):
    """Packs ragged (num, den) chains into dense padded arrays."""
    n = len(chains)
    width = max((len(c) for c in chains), default=0)
    width = max(width, 1)
    num = np.full((n, width), one_slot, dtype=dtype)
    den = np.full((n, width), one_slot, dtype=dtype)
    for i, chain in enumerate(chains):
        for j, (a, b) in enumerate(chain):
            num[i, j] = a
            den[i, j] = b
    return num, den


def collect_signatures(worlds):
    """Stage 1-2 collection shared by the compilers: keeps worlds that can
    contribute (nonzero choose-weight product, at least one changed tape)
    and maps each changed tape view to a deduplicated signature id.

    Zero-weight and unchanged worlds contribute exactly 0 in the
    reference as well.

    Returns (live_worlds, sig_ids, pair_world, pair_sig).
    """
    live = []
    sig_ids: dict[tuple[int, int, int], int] = {}
    pair_world: list[int] = []
    pair_sig: list[int] = []
    for world in worlds:
        changed = [s for s in world.tape_sigs if s[0] != s[1]]
        if world.const == 0.0 or not changed:
            continue
        wi = len(live)
        live.append(world)
        for sig in changed:
            pair_world.append(wi)
            pair_sig.append(sig_ids.setdefault(sig, len(sig_ids)))
    return live, sig_ids, pair_world, pair_sig


def collect_signatures_dual(tag: str, worlds, half: int, one_slot: int):
    """Stage 1-2 collection for the dual-SPD compilers (`collect_signatures`
    sibling): signatures are keyed by (tape, sig) so each tape's changed
    windows accumulate into its own dy/dt half, and world factor chains
    are remapped into the per-tape concatenated pyramid (program first,
    data offset by ``half``, constant-1 at ``one_slot``).

    Returns (live, sig_ids, pair_world, pair_sig, w_num, w_den, w_const).
    Raises when the worlds lack per-factor tape provenance (guided/native
    enumerations do not carry it; dual compilation needs the plain
    odometer path).
    """
    live, sig_ids = [], {}
    pair_world, pair_sig = [], []
    for world in worlds:
        changed = [
            (ti, s) for ti, s in enumerate(world.tape_sigs)
            if s[0] != s[1]
        ]
        if world.const == 0.0 or not changed:
            continue
        if len(world.factor_tapes) != len(world.factors):
            raise ValueError(
                f"{tag!r}: worlds lack per-factor tape provenance "
                "(guided/native enumeration); dual-SPD compilation "
                "needs the plain odometer path"
            )
        wi = len(live)
        live.append(world)
        for ti, sig in changed:
            pair_world.append(wi)
            pair_sig.append(sig_ids.setdefault((ti, sig), len(sig_ids)))

    w_chains = [
        tuple(
            (a + (half if dt else 0), b + (half if dt else 0))
            for (a, b), dt in zip(w.factors, w.factor_tapes)
        )
        for w in live
    ]
    w_num, w_den = _pad_chains(w_chains, one_slot)
    w_const = np.array([w.const for w in live], dtype=np.float64)
    return live, sig_ids, pair_world, pair_sig, w_num, w_den, w_const


def compile_problem(tag: str, cl_k: int, *, max_worlds: int | None = None,
                    use_cache: bool = True) -> CompiledProblem:
    problem = dsl.get_problem(tag)
    cache_path = _cache_path(problem, cl_k)
    if use_cache and cache_path and os.path.exists(cache_path):
        cached = _load_cache(cache_path, problem, cl_k)
        if cached is not None:
            return cached
    compiled = _compile(problem, cl_k, max_worlds=max_worlds)
    if use_cache and cache_path:
        _store_cache(cache_path, compiled)
    return compiled


def _compile(problem: dsl.Problem, cl_k: int,
             max_worlds: int | None) -> CompiledProblem:
    size_a = problem.size_a
    _, pyr_total = pyramid_offsets(size_a, cl_k)
    one_slot = pyr_total - 1

    worlds = enum_mod.enumerate_worlds(problem, cl_k, max_worlds=max_worlds)
    live, sig_ids, pair_world, pair_sig = collect_signatures(worlds)

    w_num, w_den = _pad_chains([w.factors for w in live], one_slot)
    w_const = np.array([w.const for w in live], dtype=np.float64)

    # Window-sweep expansion: native C++ when available (the hot phase —
    # big problems expand to 10^7+ events), bit-identical Python fallback.
    expanded = native.expand_signatures(
        size_a, cl_k, np.array(list(sig_ids), dtype=np.int64), one_slot
    )
    if expanded is not None:
        e_num, e_den, e_sig, tgt_orig, tgt_adj = expanded
    else:
        expander = accumulate.Expander(size_a, cl_k)
        e_chains: list[tuple[tuple[int, int], ...]] = []
        e_sig = []
        tgt_orig = []
        tgt_adj = []
        for sig, sid in sig_ids.items():
            for event in expander.expand(*sig):
                e_chains.append(event.factors)
                e_sig.append(sid)
                tgt_orig.append(event.target_orig)
                tgt_adj.append(event.target_adj)
        e_num, e_den = _pad_chains(e_chains, one_slot)
    num_events = len(e_sig)

    # Pre-sorted signed scatter: contribution +v[e] at the adjusted rank,
    # -v[e] at the original rank. Sorting at compile time lets the runtime
    # use a sorted segment-sum instead of random scatter-adds.
    all_tgt = np.concatenate(
        [np.asarray(tgt_adj, dtype=np.int64),
         np.asarray(tgt_orig, dtype=np.int64)]
    ) if num_events else np.zeros((0,), dtype=np.int64)
    all_sign = np.concatenate(
        [np.ones(num_events), -np.ones(num_events)]
    )
    order = _stable_argsort_i32(all_tgt)

    if config.IS_DEBUG:
        print(f"[ckpe] compiled {problem.tag} cl_k={cl_k}: "
              f"{len(worlds)} paths → {len(live)} live worlds, "
              f"{len(sig_ids)} signatures, {num_events} events")

    return CompiledProblem(
        tag=problem.tag,
        size_a=size_a,
        cl_k=cl_k,
        pyramid_size=pyr_total,
        num_signatures=len(sig_ids),
        w_num=w_num,
        w_den=w_den,
        w_const=w_const,
        pair_world=np.asarray(pair_world, dtype=np.int32),
        pair_sig=np.asarray(pair_sig, dtype=np.int32),
        e_num=e_num,
        e_den=e_den,
        e_sig=np.asarray(e_sig, dtype=np.int32),
        ev_idx=(order % max(num_events, 1)).astype(np.int32),
        ev_sign=all_sign[order],
        ev_tgt=all_tgt[order].astype(np.int32),
    )


@dataclasses.dataclass
class CompiledDualProblem(CompiledProblem):
    """Dual-SPD compilation: program and data tapes draw from SEPARATE
    sequence distributions.

    The reference shares one SPD between both tapes (both tape views
    index the same accumulator, `tape_multiverse.scm:1424-1443`,
    :441-442) — an implementation choice, not a law of the model. This
    mode generalizes: the state is the concatenation
    ``[p_program (A^k), p_data (A^k)]``, reveals on each tape draw
    conditional ratios from that tape's own marginal pyramid, and each
    tape's changed windows accumulate into its own dy/dt half. Factor
    and target indices are offset at compile time (program pyramid
    first, then data, then the shared constant-1 slot), so the runtime
    kernel shape is IDENTICAL to the shared case.

    Exact consistency oracle (tested): at equal distributions
    ``p_prog = p_data = p`` the two output halves sum to the shared
    engine's dy/dt — the reference's single accumulator is exactly the
    sum of per-tape contributions.
    """

    @property
    def state_size(self) -> int:
        return 2 * self.size_a**self.cl_k


def compile_problem_dual(tag: str, cl_k: int, *,
                         max_worlds: int | None = None
                         ) -> CompiledDualProblem:
    """Compiles ``tag`` with separate program/data SPDs (see
    :class:`CompiledDualProblem`). Not disk-cached (compiles are fast;
    guided/native enumerations are unsupported because they do not
    carry per-factor tape provenance)."""
    problem = dsl.get_problem(tag)
    size_a = problem.size_a
    _, pyr_total = pyramid_offsets(size_a, cl_k)
    half = pyr_total - 1  # per-tape pyramid entries (sans the 1-slot)
    one_slot = 2 * half
    window_mod = size_a**cl_k

    worlds = enum_mod.enumerate_worlds(problem, cl_k,
                                       max_worlds=max_worlds)

    def remap(idx: int, data_tape: bool) -> int:
        return idx + (half if data_tape else 0)

    # Stages 1-2 with per-tape signature provenance.
    (live, sig_ids, pair_world, pair_sig,
     w_num, w_den, w_const) = collect_signatures_dual(
        tag, worlds, half, one_slot)

    expander = accumulate.Expander(size_a, cl_k)
    e_chains, e_sig, tgt_orig, tgt_adj = [], [], [], []
    for (ti, sig), sid in sig_ids.items():
        dt = ti == 1
        off = window_mod if dt else 0
        for event in expander.expand(*sig):
            e_chains.append(tuple(
                (remap(a, dt), remap(b, dt)) for a, b in event.factors
            ))
            e_sig.append(sid)
            tgt_orig.append(event.target_orig + off)
            tgt_adj.append(event.target_adj + off)
    e_num, e_den = _pad_chains(e_chains, one_slot)
    num_events = len(e_sig)

    all_tgt = np.concatenate(
        [np.asarray(tgt_adj, dtype=np.int64),
         np.asarray(tgt_orig, dtype=np.int64)]
    ) if num_events else np.zeros((0,), dtype=np.int64)
    all_sign = np.concatenate([np.ones(num_events), -np.ones(num_events)])
    order = _stable_argsort_i32(all_tgt)

    return CompiledDualProblem(
        tag=problem.tag,
        size_a=size_a,
        cl_k=cl_k,
        pyramid_size=one_slot + 1,
        num_signatures=len(sig_ids),
        w_num=w_num,
        w_den=w_den,
        w_const=w_const,
        pair_world=np.asarray(pair_world, dtype=np.int32),
        pair_sig=np.asarray(pair_sig, dtype=np.int32),
        e_num=e_num,
        e_den=e_den,
        e_sig=np.asarray(e_sig, dtype=np.int32),
        ev_idx=(order % max(num_events, 1)).astype(np.int32),
        ev_sign=all_sign[order],
        ev_tgt=all_tgt[order].astype(np.int32),
    )


# --- Disk cache -------------------------------------------------------------

def _rule_fingerprint(fn) -> bytes:
    """Stable fingerprint of a rule: bytecode + constants + closure state.

    Bytecode alone is not enough — e.g. the ex4var2 ΔG rate tables live in
    a closed-over dict (`models/problems.py`), so editing them must
    invalidate the cache. Nested code objects (inner functions, lambdas)
    are walked recursively; closure cells and non-code constants are
    folded in via repr (floats repr at full precision).
    """
    h = hashlib.sha1()

    def fold_code(code):
        h.update(code.co_code)
        for const in code.co_consts:
            if hasattr(const, "co_code"):
                fold_code(const)
            else:
                h.update(repr(const).encode())

    fold_code(fn.__code__)
    for cell in fn.__closure__ or ():
        contents = cell.cell_contents
        if callable(contents) and hasattr(contents, "__code__"):
            fold_code(contents.__code__)
        else:
            h.update(repr(contents).encode())
    return h.digest()


def _cache_path(problem: dsl.Problem, cl_k: int) -> str | None:
    try:
        code = _rule_fingerprint(problem.rule)
    except AttributeError:
        return None
    key = hashlib.sha1(
        f"{_FORMAT_VERSION}:{problem.tag}:{problem.size_a}:{cl_k}:".encode()
        + code
    ).hexdigest()[:16]
    safe_tag = problem.tag.replace("/", "_")
    return os.path.join(config.CACHE_DIR, f"{safe_tag}-k{cl_k}-{key}.npz")


def _load_cache(path: str, problem: dsl.Problem,
                cl_k: int) -> CompiledProblem | None:
    try:
        with np.load(path) as data:
            return CompiledProblem(
                tag=problem.tag,
                size_a=problem.size_a,
                cl_k=cl_k,
                pyramid_size=int(data["pyramid_size"]),
                num_signatures=int(data["num_signatures"]),
                **{name: data[name] for name in _ARRAY_FIELDS},
            )
    except Exception:
        return None


def _store_cache(path: str, compiled: CompiledProblem) -> None:
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        arrays = {name: getattr(compiled, name) for name in _ARRAY_FIELDS}
        total_bytes = sum(a.nbytes for a in arrays.values())
        # zlib on the 10^8-byte tables costs a minute for disk savings we
        # don't need; compress only small tables.
        save = np.savez_compressed if total_bytes < 1 << 26 else np.savez
        save(
            tmp,
            pyramid_size=compiled.pyramid_size,
            num_signatures=compiled.num_signatures,
            **arrays,
        )
        os.replace(tmp + ".npz", path)
    except OSError:
        pass
