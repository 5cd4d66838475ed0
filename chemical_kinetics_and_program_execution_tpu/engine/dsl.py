"""Reaction-rule DSL and the problem registry.

The reference expresses reaction rules as Scheme closures over
``tape-get`` / ``tape-set!`` / ``vector-choose`` plus symbol-name sugar
(`framework/gambit_macros.scm:99-125`) and keeps them in a global registry
(`framework/tapes_py_interface.scm:24-36`). Here a rule is a plain Python
function ``rule(t)`` over a :class:`Tape` context:

    @register_problem("ex1-radioactive-decay", symbols=("A", "B"))
    def ex1(t):
        if t.get_sym(DATA, 0) == "B":
            t.set_sym(DATA, 0, "A")

Rules must be *replayable*: deterministic given the values returned by
``t.get*`` and ``t.choose`` (no other sources of nondeterminism and no side
effects). The engine re-executes them many times during compilation
(`engine/enumerate.py`); they never run during ODE integration.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

# Tape selectors, mirroring the reference's `data-tape?` boolean
# (`tape_multiverse.scm:441-442`).
PROGRAM = False
DATA = True


@dataclasses.dataclass(frozen=True)
class Problem:
    tag: str
    symbols: tuple[str, ...]
    rule: Callable
    doc: str = ""
    # Declared rate parameters as ((name, default), ...) or None. A
    # parametric rule has signature ``rule(t, params)`` with ``params``
    # a dict; its weight arithmetic must be traced-safe (no Python
    # branching on parameter values) so `engine/parametric.py` can
    # rebuild path weights under `jax.grad`.
    params: tuple[tuple[str, float], ...] | None = None
    # Optional derived-parameter transform ``prepare(params) -> derived``
    # (e.g. ΔG landscape -> rate tables, `problems.scm:310-347`). The
    # rule then receives the derived object. Declaring it lets callers
    # that run the rule once per enumerated world (`engine/parametric.py`)
    # hoist the transform out of the world loop — under `jax.grad` the
    # difference is one traced table build per RHS instead of one per
    # world (68× smaller graphs for ex4var2).
    prepare: Callable | None = None

    @property
    def size_a(self) -> int:
        return len(self.symbols)

    @property
    def param_defaults(self) -> dict[str, float] | None:
        return None if self.params is None else dict(self.params)

    def symbol_index(self, sym: str) -> int:
        return self.symbols.index(sym)

    def prepare_params(self, params: dict):
        """Applies the declared derived-parameter transform (identity
        when none is declared)."""
        return params if self.prepare is None else self.prepare(params)

    def call(self, t, params: dict | None = None, *,
             prepared: bool = False) -> None:
        """Runs the rule on tape context ``t`` (with ``params`` when
        the problem is parametric; defaults otherwise). ``prepared``
        marks ``params`` as already transformed by
        :meth:`prepare_params` — the hoisting channel for per-world
        replay loops."""
        if self.params is None:
            self.rule(t)
        else:
            if params is None:
                params = self.param_defaults
            if not prepared:
                params = self.prepare_params(params)
            self.rule(t, params)


_REGISTRY: dict[str, Problem] = {}


def register_problem(tag: str, symbols: Sequence[str], doc: str = "",
                     params: dict[str, float] | None = None,
                     prepare: Callable | None = None):
    """Decorator registering a reaction rule under ``tag``.

    ``params`` declares named rate parameters with default values; the
    decorated function then takes ``(t, params)`` and becomes eligible
    for the parametric-gradient path (`engine/parametric.py`).
    ``prepare`` optionally maps the declared params to a derived object
    (rate tables) built once per RHS trace; the rule receives its
    output instead of the raw dict.
    """

    def deco(fn):
        _REGISTRY[tag] = Problem(
            tag=tag, symbols=tuple(symbols), rule=fn,
            doc=doc or (fn.__doc__ or ""),
            params=None if params is None else tuple(params.items()),
            prepare=prepare,
        )
        return fn

    return deco


def get_problem(tag: str) -> Problem:
    _ensure_builtin_problems()
    if tag not in _REGISTRY:
        raise KeyError(
            f"Unknown problem {tag!r}. Registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[tag]


def registered_problems() -> list[str]:
    _ensure_builtin_problems()
    return sorted(_REGISTRY)


_builtin_loaded = False


def _ensure_builtin_problems() -> None:
    """Loads the built-in problem library on first registry access."""
    global _builtin_loaded
    if not _builtin_loaded:
        _builtin_loaded = True
        from ..models import problems  # noqa: F401  (registers via decorator)


class Tape:
    """Execution context passed to reaction rules.

    Backed by a driver (the enumerator's replay machinery) that supplies
    the outcome of every tape reveal and every ``choose``.
    """

    def __init__(self, driver, symbols: tuple[str, ...]):
        self._driver = driver
        self._symbols = symbols
        self._index = {s: k for k, s in enumerate(symbols)}

    # Raw (alphabet-index) operations, like the reference's
    # `tape-get`/`tape-set!` (`tape_multiverse.scm:1480-1487`).
    def get(self, data_tape: bool, index: int) -> int:
        return self._driver.tape_get(bool(data_tape), int(index))

    def set(self, data_tape: bool, index: int, value: int) -> None:
        self._driver.tape_set(bool(data_tape), int(index), int(value))

    # Symbol-name sugar, like `tape-get-sym` (`gambit_macros.scm:113-118`).
    def get_sym(self, data_tape: bool, index: int) -> str:
        return self._symbols[self.get(data_tape, index)]

    def set_sym(self, data_tape: bool, index: int, sym: str) -> None:
        self.set(data_tape, index, self._index[sym])

    def choose(self, weight_option_pairs):
        """Weighted nondeterministic choice (`gambit_macros.scm:119-124`).

        Takes ``[(weight, option), ...]``; weights are normalised by their
        sum in list order, exactly like
        `probs-from-weights-and-options-1` (`gambit_macros.scm:75-87`).
        """
        pairs = list(weight_option_pairs)
        total = 0.0
        for w, _ in pairs:
            total = total + w
        probs = [w / total for w, _ in pairs]
        options = [o for _, o in pairs]
        k = self._driver.choose(probs)
        return options[k]

    def vector_choose(self, probs, options):
        """Raw choice taking pre-normalised probabilities."""
        k = self._driver.choose([float(p) for p in probs])
        return list(options)[k]
