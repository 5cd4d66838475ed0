"""Parametric rate constants: gradients through the multiverse compile.

The dense engine bakes each enumerated world's choose-weight product
into a constant vector ``w_const`` at compile time
(`dense.compile_dense`), which is the right call when rates are fixed —
but it erases the dependence of dp/dt on the rule's rate parameters.
This module reconstructs that dependence **without re-enumerating**:

1. The multiverse STRUCTURE (which cells are revealed, which branch of
   each choose is taken, the window signatures, the conditional-
   probability factor chains) does not depend on the parameter values —
   only the choose weights do. So the enumeration at the default
   parameters fixes, per world, a complete decision script.
2. Replaying each world's script with the rule's weight arithmetic
   traced by JAX (``_TracedReplay``) rebuilds ``w_const`` as a
   differentiable function of the parameters; everything else in
   `dense.dy_dt_dense` already takes tables as runtime inputs.

The result, :class:`ParametricDense`, is a ``(p, params) -> dp/dt``
callable differentiable in BOTH arguments — composed with
`ode/fixed.odeint_fixed` it yields rate-constant sensitivities of whole
trajectories (:func:`rate_sensitivity`), a capability the reference's
architecture (weights consumed inside a Scheme interpreter,
`tape_multiverse.scm:594-626`) cannot express.

Validity domain: the parameters must keep every enumerated branch's
weight sign fixed (a weight crossing zero changes which worlds exist —
the compile at the defaults is then the wrong structure). Parametric
rules declare `params` in `register_problem` and must compute weights
with traced-safe arithmetic (`jnp` ops or plain ``+ * /``; no Python
branching on parameter values).

Cost: one host rule re-execution per live world at trace time — use at
parameter-study scale (≤ ~10⁵ worlds); closure convergence (README)
justifies studying sensitivities at reduced cl_k.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import dense as dense_mod
from . import dsl
from .compile import collect_signatures
from .enumerate import _Replay, enumerate_worlds


class _TracedReplay(_Replay):
    """Replays one world's recorded decision sequence, accumulating the
    choose-weight product with JAX-traced arithmetic."""

    def __init__(self, problem, cl_k, decisions):
        super().__init__(problem, problem.size_a, cl_k, list(decisions))
        self.t_const = 1.0  # becomes traced on first traced weight

    def choose(self, probs):
        k = self._decide(len(probs))
        # Weight clipping as in the enumerator (`tape_multiverse.scm:617`),
        # traced-safe.
        self.t_const = self.t_const * jnp.maximum(probs[k], 0.0)
        return k


def traced_consts(problem: dsl.Problem, cl_k: int, worlds, params):
    """[len(worlds)] jnp vector of choose-weight products under
    ``params`` (which may be traced), in world order."""
    # Hoist the derived-parameter transform (rate-table build) out of
    # the world loop: traced once here, not once per world — without
    # this, ex4var2's ΔG tables rebuild 68× per trace and the scalar
    # graph makes XLA's gradient compile pathological (minutes).
    params = problem.prepare_params(params)
    out = []
    for w in worlds:
        r = _TracedReplay(problem, cl_k, w.decisions)
        t = dsl.Tape(r, problem.symbols)
        problem.call(t, params, prepared=True)
        if r.values != list(w.decisions):
            raise RuntimeError(
                f"decision script mismatch replaying {problem.tag}: "
                "the rule is not replay-deterministic"
            )
        out.append(r.t_const)
    return jnp.stack([jnp.asarray(c, jnp.float64) for c in out])


class ParametricDense:
    """``fn(p, params) -> dp/dt``, differentiable in both arguments.

    Also exposes the factored form for solves: ``consts(params)`` (one
    device vector per parameter set — hoist it out of the RK stages)
    and ``dy_dt(p, w_const)``.
    """

    def __init__(self, tag: str, cl_k: int):
        problem = dsl.get_problem(tag)
        if problem.params is None:
            raise ValueError(
                f"{tag!r} declares no parameters; register it with "
                "register_problem(..., params={...}) to use the "
                "parametric path"
            )
        prog = dense_mod.compile_dense(tag, cl_k)
        worlds = enumerate_worlds(problem, cl_k)
        live, _sig_ids, _pw, _ps = collect_signatures(worlds)
        if len(live) != len(prog.w_const):
            raise RuntimeError(
                "live-world count mismatch vs compiled program "
                f"({len(live)} != {len(prog.w_const)}); stale compile "
                "cache?"
            )
        # Cross-check the replay against the baked constants at defaults.
        base = np.asarray(
            traced_consts(problem, cl_k, live, problem.param_defaults),
            np.float64)
        if not np.allclose(base, prog.w_const, rtol=1e-12, atol=0):
            raise RuntimeError(
                f"parametric replay of {tag!r} disagrees with the "
                "compiled w_const at default parameters"
            )
        self.problem = problem
        self.prog = prog
        self.cl_k = cl_k
        self.live = live
        self._w_num = jnp.asarray(prog.w_num, jnp.int32)
        self._w_den = jnp.asarray(prog.w_den, jnp.int32)
        self._pair_world = jnp.asarray(prog.pair_world, jnp.int32)
        self._pair_sig = jnp.asarray(prog.pair_sig, jnp.int32)

    def consts(self, params):
        return traced_consts(self.problem, self.cl_k, self.live, params)

    def dy_dt(self, p, w_const):
        tables = (self._w_num, self._w_den, w_const,
                  self._pair_world, self._pair_sig)
        return dense_mod.dy_dt_dense(self.prog, tables, p)

    def __call__(self, p, params):
        return self.dy_dt(p, self.consts(params))


def make_parametric_dense(tag: str, cl_k: int):
    """Builds ``(pd, prog)``: a :class:`ParametricDense` and its
    compiled program. At the declared defaults ``pd(p, defaults)``
    agrees with the baked `dense.make_dense_dy_dt` path to float64
    round-off (parity-tested in tests/test_parametric.py)."""
    pd = ParametricDense(tag, cl_k)
    return pd, pd.prog


def rate_sensitivity(tag: str, cl_k: int, p0, ts, observable,
                     params=None, n_sub: int = 8):
    """``(value, grads)`` of a scalar observable of the final state
    w.r.t. every declared rate parameter, via reverse-mode through a
    fixed-grid solve (`ode/fixed.odeint_fixed`)."""
    from ..ode.fixed import odeint_fixed

    pd = ParametricDense(tag, cl_k)
    if params is None:
        params = pd.problem.param_defaults
    params = {k: jnp.asarray(v, jnp.float64) for k, v in params.items()}
    p0 = jnp.asarray(p0, jnp.float64).reshape(-1)
    ts = jnp.asarray(ts, jnp.float64)

    def rhs(y, t, w_const):
        return pd.dy_dt(y, w_const)

    def loss(prm):
        # Hoist the parametric table build out of the RK stages: one
        # consts() per solve, carried through `args`.
        ys = odeint_fixed(rhs, p0, ts, n_sub, args=pd.consts(prm))
        return observable(ys[-1])

    return jax.value_and_grad(loss)(params)
