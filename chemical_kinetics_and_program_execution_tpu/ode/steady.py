"""Direct steady states: pseudo-transient Newton–Krylov on dp/dt = 0,
with implicit-function-theorem gradients.

The reference reaches long-time behaviour only by integrating to large
t (ex4var2 runs t∈[0,10⁴] at rtol 1e-11,
`examples/ex4var2_chemical_turing.py:131,149`). For questions about the
*stationary* SPD — equilibrium window probabilities, their parameter
sensitivities — that detour costs thousands of RHS evaluations and its
gradient costs a reverse pass through all of them. This module solves
F(p) = dp/dt = 0 directly:

- **Invariant-manifold augmentation.** F's Jacobian is structurally
  singular in THREE ways, all of which must be cured before Newton-type
  methods or implicit differentiation are well-posed:
  1. total probability is conserved (the ± accumulation pairing,
     `tape_multiverse.scm:1285-1291`) — the classic 1-null direction;
  2. the marginal-consistency manifold (first-axis window marginal =
     last-axis marginal, the validity condition `markov_tapes.py:133-175`
     gates p0 on) is flow-invariant, which makes J rank-deficient along
     p-dependent directions (measured: cond 3·10¹⁶ at the ex2
     equilibrium with sum-augmentation alone, NaN implicit gradients);
  3. reaction rules conserve symbol-class counts — linear functionals
     of the single-symbol marginal (ex4var2 conserves fuel p(P)+p(X),
     evaluator p(S)+p(E), and the tape-cell total; ex3 conserves every
     single-symbol marginal) — detected automatically at build time by
     probing d(marginal)/dt at random states (`detect_conserved_marginals`).
  We solve the augmented system
  G(p) = F(p) − Cᵀ(Cp) − (Σp − 1)·1/S − Σⱼ ĉⱼ(ĉⱼᵀp − ĉⱼᵀp_guess),
  where C is the consistency-defect operator and ĉⱼ the lifted
  conserved functionals. Every added term vanishes on the physical
  branch — consistency defects and normalization error are zero for
  valid SPDs, and the conserved-count targets come from the caller's
  guess (equilibrium *at the guess's fuel content* is the physically
  meaningful question) — so no root moves, while J_G becomes
  well-conditioned (4·10³ instead of 3·10¹⁶ for ex2) with every
  eigenvalue's real part negative: the PTC pseudo-flow *damps*
  constraint defects instead of riding the singular directions.
- **Matrix-free pseudo-transient continuation.** Plain Newton stalls
  on these problems: SPD equilibria often sit at simplex corners
  behind slow manifolds (ex2's domain-coarsening dynamics is still
  drifting at t=2000 while its equilibrium has p(DDD)=0.998). PTC
  steps (I − δ·J_G) dp = δ·G are implicit-Euler steps of the flow —
  forward-Euler-like for small δ, exactly Newton as δ→∞ — with δ
  adapted by switched-evolution relaxation (δ ← δ·‖G_prev‖/‖G_new‖;
  Kelley & Keyes, SINUM 35(2), 1998). Each linear system is solved by
  GMRES on `jax.jvp` products — no Jacobian is ever materialised
  (dense would be 80 GB at the 100,000-dim ex4var2 state), the same
  approach as the stiff stepper's stages (`kvaerno3.py:77-83`).
- **Implicit gradients.** The solve is wrapped in `jax.custom_vjp`:
  for a steady state p∞(θ) defined by G(p∞, θ) = 0, the cotangent pull
  back is one *transposed* GMRES solve J_Gᵀ u = ḡ followed by one VJP
  of F in θ — O(1) linear solves instead of differentiating through an
  entire t→10⁴ integration. Composed with the parametric engine
  (`engine/parametric.py`) this yields d(steady state)/d(rate
  constants) — e.g. equilibrium sensitivities to ex2's (J, h, β) or
  ex4var2's free-enthalpy landscape. The guess cotangent is the
  conserved-content sensitivity: d(equilibrium)/d(initial fuel) flows
  through the targets ĉⱼᵀp_guess.

The whole solve (PTC, Krylov, δ control) is one jitted
`lax.while_loop` program; everything runs on device.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class SteadyInfo(NamedTuple):
    converged: jax.Array   # bool: residual tolerance met
    iterations: jax.Array  # int32: PTC iterations taken
    residual: jax.Array    # float: final rms of the augmented residual


def _rms(x):
    return jnp.sqrt(jnp.mean(x * x))


def detect_support_invariants(fn, size_a: int, cl_k: int, guess,
                              args=None, floor: float = 1e-20,
                              n_extra: int = 40, rel_tol: float = 1e-10):
    """``(mask [S] bool, W [n_c, S])``: the guess's live support and ALL
    linear functionals conserved by the dynamics restricted to it.

    Machine-like rules (the ex4 family) evolve on a reachable window
    set that is a small invariant subset of the full state (ex4var2 at
    cl_k=3: 120 of 1000 windows, and F vanishes identically off it),
    and that subset carries conserved pattern counts invisible to
    single-symbol marginals (measured: 11 invariants on ex4var2's
    support vs 3 marginal combos). This probes F at ~(L + n_extra)
    random support states and takes the numerical left-null space —
    O(L) RHS evaluations plus an O(L³) SVD, fine up to L of a few
    thousand; prefer `detect_conserved_marginals` for larger states
    whose rules conserve only symbol classes."""
    S = size_a ** cl_k
    guess = np.asarray(guess, np.float64).reshape(-1)
    mask = guess > floor
    live = np.flatnonzero(mask)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(len(live) + n_extra):
        p = np.zeros(S)
        p[live] = rng.random(len(live))
        p /= p.sum()
        rows.append(np.asarray(fn(jnp.asarray(p), args))[live])
    _, s, Vt = np.linalg.svd(np.asarray(rows))
    null = Vt[np.concatenate([s, np.zeros(max(0, len(live) - len(s)))])
              < rel_tol * max(float(s.max()), 1e-30)]
    W = np.zeros((null.shape[0], S))
    W[:, live] = null
    return mask, W


def detect_conserved_marginals(fn, size_a: int, cl_k: int, args=None,
                               n_probes: int | None = None,
                               rel_tol: float = 1e-10):
    """[n_c, size_a] orthonormal weight vectors w with
    d/dt (Σ_s w(s)·marginal(s)) = 0 identically — the rule's conserved
    symbol-class counts — found by probing d(marginal)/dt at random
    SPD states and taking the numerical null space. The total
    (w ∝ 1) direction is projected out (handled separately as the
    normalization constraint)."""
    # Fewer probes than size_a would leave unprobed marginal directions
    # that the SVD null space would misclassify as conserved.
    n_probes = max(n_probes or 0, size_a + 6)
    rng = np.random.default_rng(0)
    S = size_a ** cl_k
    rows = []
    for _ in range(n_probes):
        p = rng.random(S)
        p /= p.sum()
        try:
            f = np.asarray(fn(jnp.asarray(p, jnp.float64), args))
        except Exception as e:
            raise ValueError(
                "conserved-functional probing called the RHS with "
                f"args={args!r} and failed ({e!r}); pass probe_args "
                "(e.g. a ParametricDense consts vector at defaults) "
                "or conserved=None"
            ) from e
        rows.append(f.reshape((size_a,) * cl_k)
                    .sum(axis=tuple(range(1, cl_k))))
    R = np.asarray(rows)
    _, s, Vt = np.linalg.svd(R)
    null = Vt[np.concatenate([s, np.zeros(max(0, size_a - len(s)))])
              < rel_tol * max(float(s.max()), 1e-30)]
    if null.size == 0:
        return np.zeros((0, size_a))
    # Project out the ones direction (normalization is a separate,
    # fixed-target constraint) and re-orthonormalize.
    ones = np.ones(size_a) / np.sqrt(size_a)
    null = null - np.outer(null @ ones, ones)
    q, r = np.linalg.qr(null.T)
    keep = np.abs(np.diag(r)) > 1e-8
    return q.T[keep]


def _build_augmentation(fn, size_a, cl_k, conserved, probe_args,
                        support_guess, support_floor):
    """Shared constructor of the invariant-manifold augmented system
    (used by `make_steady_state` and `relaxation_modes`).

    Returns ``(aug(p, args, targets), targets(p_guess), mask,
    has_conserved, cons_vals, cons_embed)``; ``mask`` is None unless
    support mode pins dead windows."""
    support = isinstance(conserved, str) and conserved == "support"
    mask = None
    if size_a is not None:

        def _ctcp(pm):
            """C^T(Cp): the consistency defect (first-axis window
            marginal − last-axis marginal; zero on any valid SPD)
            embedded back through the adjoint."""
            q = pm.reshape((size_a,) * cl_k)
            defect = q.sum(axis=0) - q.sum(axis=-1)
            ct = (jnp.broadcast_to(defect[None, ...], q.shape)
                  - jnp.broadcast_to(defect[..., None], q.shape))
            return ct.reshape(pm.shape)

        if support:
            if support_guess is None:
                raise ValueError(
                    "conserved='support' needs support_guess (a concrete "
                    "state whose live windows define the invariant set)")
            mask_np, w_full = detect_support_invariants(
                fn, size_a, cl_k, support_guess, probe_args,
                floor=support_floor)
            mask = jnp.asarray(mask_np)
            w_dense = jnp.asarray(w_full)
        elif isinstance(conserved, str) and conserved == "auto":
            cons_w = detect_conserved_marginals(fn, size_a, cl_k,
                                                probe_args)
        elif conserved is None:
            cons_w = np.zeros((0, size_a))
        else:
            cons_w = np.asarray(conserved, np.float64)
            ones = np.ones(size_a) / np.sqrt(size_a)
            cons_w = cons_w - np.outer(cons_w @ ones, ones)
            q, r = np.linalg.qr(cons_w.T)
            cons_w = q.T[np.abs(np.diag(r)) > 1e-8]

        if support:

            def _cons_vals(p):
                return w_dense @ p

            def _cons_embed(vals):
                return w_dense.T @ vals

            def _aug(p, args, targets):
                # Dead windows pinned to 0: their equation becomes
                # p_i = 0 and the RHS never sees nonzero mass there
                # (F vanishes identically off the support — measured).
                pm = jnp.where(mask, p, 0.0)
                out = (fn(pm, args) - _ctcp(pm)
                       - _cons_embed(_cons_vals(pm) - targets))
                return jnp.where(mask, out, p)

            def _targets(p_guess):
                return _cons_vals(jnp.where(mask, p_guess, 0.0))
        else:
            cons_w = jnp.asarray(cons_w)
            # Lifted functionals ĉ_j (w_j broadcast over the first
            # window axis) have 2-norm sqrt(size_a^(cl_k-1)).
            c_norm = float(size_a) ** ((cl_k - 1) / 2.0)

            def _cons_vals(p):
                """[n_c] values ĉ_jᵀ p via the single-symbol marginal."""
                m1 = p.reshape((size_a,) * cl_k).sum(
                    axis=tuple(range(1, cl_k)))
                return (cons_w @ m1) / c_norm

            def _cons_embed(vals):
                """Σ_j vals_j · ĉ_j."""
                w = (cons_w.T @ vals) / c_norm  # [size_a]
                out = jnp.broadcast_to(
                    w.reshape((size_a,) + (1,) * (cl_k - 1)),
                    (size_a,) * cl_k)
                return out.reshape(-1)

            def _aug(p, args, targets):
                out = (fn(p, args) - _ctcp(p)
                       - (jnp.sum(p) - 1.0) / p.shape[0])
                return out - _cons_embed(_cons_vals(p) - targets)

            def _targets(p_guess):
                return _cons_vals(p_guess)

        has_conserved = (w_dense.shape[0] > 0 if support
                         else cons_w.shape[0] > 0)
    else:
        has_conserved = False
        _cons_vals = _cons_embed = None

        def _aug(p, args, targets):
            return fn(p, args)

        def _targets(p_guess):
            return jnp.zeros((0,), p_guess.dtype)

    return _aug, _targets, mask, has_conserved, _cons_vals, _cons_embed


def make_steady_state(fn, *, size_a: int | None = None,
                      cl_k: int | None = None,
                      conserved="auto", probe_args=None,
                      support_guess=None, support_floor: float = 1e-20,
                      tol: float = 1e-12, max_iter: int = 200,
                      delta0: float = 1.0, delta_max: float = 1e14,
                      delta_min: float = 1e-10,
                      gmres_tol: float = 1e-8, gmres_restart: int = 50,
                      gmres_maxiter: int = 8,
                      gmres_tol_bwd: float = 1e-13):
    """Builds ``solve(p_guess, args) -> (p_inf, info)`` for
    ``dp/dt = fn(p, args)``.

    ``args`` is an arbitrary pytree of (possibly traced) arrays the RHS
    closes over — e.g. a `ParametricDense` const vector. The returned
    solve is differentiable in BOTH arguments via the implicit function
    theorem (`jax.custom_vjp`): the ``args`` cotangent is the rate-
    parameter sensitivity; the ``p_guess`` cotangent flows only through
    the conserved-count targets (zero when the rule conserves nothing
    beyond normalization).

    ``size_a``/``cl_k`` identify the state as an SPD and enable the
    invariant-manifold augmentation (module docstring) — REQUIRED for
    SPD dynamics, whose raw Jacobian is structurally singular. Omit
    both only for generic ODE systems (e.g. mass-action kinetics) with
    nonsingular Jacobians. ``p_guess`` must then be a valid normalized
    SPD: its conserved symbol-class counts SELECT which equilibrium is
    computed. ``conserved`` is ``"auto"`` (probe the rule via
    `detect_conserved_marginals`, passing ``probe_args`` to the RHS —
    required then if the RHS needs concrete args), ``"support"``
    (exhaustive: mask to ``support_guess``'s live windows above
    ``support_floor``, pin the dead ones to 0, and augment with EVERY
    linear invariant of the support-restricted dynamics via
    `detect_support_invariants` — needed for machine-like rules whose
    reachable set carries pattern invariants, e.g. the ex4 family;
    requires ``support_guess``), an explicit [n_c, size_a] weight
    matrix, or None to disable.

    Honest convergence semantics: for boundary-degenerate driven
    machines the residual may plateau above ``tol`` (ex4var2 at cl_k=3
    plateaus near 7e-9 — still 6x below the reference's t=10⁴
    integration endpoint). ``info.residual`` IS the guarantee: it
    bounds |dp/dt| at the returned state, i.e. the drift per unit time
    if integration were continued.

    Convergence: rms of the augmented residual ≤ ``tol`` (absolute; SPD
    entries live on [0, 1] so an absolute scale is meaningful).
    ``delta0`` is the initial pseudo-time step: a residual-increasing
    step rejects and quarters δ; an accepting step grows δ by the
    residual ratio (SER), so the iteration turns into full Newton near
    the root. ``converged=False`` with δ at ``delta_min`` means the
    iteration found a non-root attractor of ‖G‖ — restart from a
    better-relaxed guess (`steady_state`'s ``warm_t``).
    """
    if (size_a is None) != (cl_k is None):
        raise ValueError("pass size_a and cl_k together (or neither)")

    _aug, _targets, mask, has_conserved, _cons_vals, _cons_embed = (
        _build_augmentation(fn, size_a, cl_k, conserved, probe_args,
                            support_guess, support_floor))

    def _ptc(p0, args, targets):
        p0 = jnp.asarray(p0)
        f64 = p0.dtype

        def cond(st):
            p, g, gn, delta, it, done = st
            return (~done) & (delta >= delta_min) & (it < max_iter)

        def body(st):
            # The residual VECTOR g = _aug(p) rides the carry (set by
            # the accepting line-search trial), so each iteration costs
            # exactly one augmented-RHS evaluation per line-search
            # trial and none elsewhere.
            p, g, gn, delta, it, _ = st

            def matvec(v):
                # (I - delta*J_G) v via a jvp at the current iterate.
                jv = jax.jvp(lambda q: _aug(q, args, targets),
                             (p,), (v,))[1]
                return v - delta * jv

            dp, _ = jax.scipy.sparse.linalg.gmres(
                matvec, delta * g, tol=gmres_tol, atol=0.0,
                restart=gmres_restart, maxiter=gmres_maxiter,
                solve_method="batched")
            # jax's GMRES can NaN on happy breakdown (residual hits 0
            # mid-restart); a NaN step becomes a no-step, which the
            # reject branch turns into a delta cut and retry.
            dp = jnp.where(jnp.isfinite(dp), dp, 0.0)

            # Backtracking on the PTC step: at large delta this is
            # damped Newton (which converges 400x further than the
            # raw accept/reject on boundary-degenerate problems like
            # ex4var2); at small delta alpha=1 follows the flow.
            def ls_cond(ls):
                alpha, g_cand, ok, k = ls
                return (~ok) & (k < 30)

            def ls_body(ls):
                alpha, _, _, k = ls
                g_cand = _aug(p + alpha * dp, args, targets)
                nn = _rms(g_cand)
                ok = jnp.isfinite(nn) & (nn < gn)
                return (jnp.where(ok, alpha, alpha * 0.5), g_cand,
                        ok, k + 1)

            alpha, g_cand, accept, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(1.0, p.dtype), g, jnp.bool_(False),
                 jnp.int32(0)))
            new_n = _rms(g_cand)
            p_new = jnp.where(accept, p + alpha * dp, p)
            g_new = jnp.where(accept, g_cand, g)
            gn_new = jnp.where(accept, new_n, gn)
            # SER: grow delta by the achieved residual ratio on accept
            # (clamped to 1e3x per step), quarter it when even the
            # backtracked step fails.
            grow = jnp.clip(gn / jnp.maximum(new_n, 1e-300), 1.0, 1e3)
            delta_new = jnp.where(accept,
                                  jnp.minimum(delta * grow, delta_max),
                                  delta * 0.25)
            done = gn_new <= tol
            return p_new, g_new, gn_new, delta_new, it + 1, done

        g0 = _aug(p0, args, targets)
        gn0 = _rms(g0)
        p, g, res, delta, it, done = jax.lax.while_loop(
            cond, body, (p0, g0, gn0, jnp.asarray(delta0, f64),
                         jnp.int32(0), gn0 <= tol))
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        return p, SteadyInfo(converged=res <= tol, iterations=it,
                             residual=res)

    @jax.custom_vjp
    def solve(p_guess, args):
        return _ptc(p_guess, args, _targets(p_guess))

    def solve_fwd(p_guess, args):
        targets = _targets(p_guess)
        p_inf, info = _ptc(p_guess, args, targets)
        return (p_inf, info), (p_inf, args, targets)

    def solve_bwd(residuals, cotangents):
        p_inf, args, targets = residuals
        g_p, _g_info = cotangents  # info is diagnostics; cotangent unused

        # u solves J_G(p_inf)^T u = g_p; the transposed matvec is one
        # VJP of the augmented RHS at the solution.
        _, vjp_p = jax.vjp(lambda q: _aug(q, args, targets), p_inf)

        def matvec_t(v):
            return vjp_p(v)[0]

        # Tighter tolerance than the forward Newton systems: gradient
        # error scales as cond(J_G)·tol, and unlike a forward iterate a
        # backward solve is not self-correcting.
        u, _ = jax.scipy.sparse.linalg.gmres(
            matvec_t, g_p, tol=gmres_tol_bwd, atol=0.0,
            restart=gmres_restart, maxiter=gmres_maxiter,
            solve_method="batched")
        u = jnp.where(jnp.isfinite(u), u, 0.0)

        # p_inf(args, targets) satisfies G(p_inf, args, targets) = 0:
        # args_bar = -(dF/dargs)^T u (the augmentation terms carry no
        # args dependence); the guess cotangent flows through the
        # conserved targets m_j = ĉ_jᵀ p_guess with dG/dm_j = +ĉ_j,
        # so p_guess_bar = -Σ_j (ĉ_jᵀu)·ĉ_j.
        _, vjp_args = jax.vjp(lambda a: fn(p_inf, a), args)
        args_bar = jax.tree_util.tree_map(jnp.negative, vjp_args(u)[0])
        if has_conserved:
            p_guess_bar = -_cons_embed(_cons_vals(u))
            if mask is not None:
                p_guess_bar = jnp.where(mask, p_guess_bar, 0.0)
        else:
            p_guess_bar = jnp.zeros_like(p_inf)
        return p_guess_bar, args_bar

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def steady_state(tag: str, cl_k: int, p_guess, *, warm_t: float = 0.0,
                 n_sub: int = 64, **kwargs):
    """Convenience wrapper: steady state of a registered problem's
    exact dense SPD dynamics.

    ``warm_t > 0`` first integrates the guess forward by that much time
    (fixed-grid RK5) — the PTC basin is wide but a short relaxation
    makes convergence from crude guesses (e.g. uniform) robust. The
    (possibly relaxed) guess also sets the conserved-count targets
    (time evolution preserves them, so ``warm_t`` doesn't change which
    equilibrium is selected). Returns ``(p_inf, info)``.

    Every call rebuilds and recompiles the solve (plus the host-side
    invariant probing); for sweeps, build once with
    `make_steady_state` and reuse it (continuation pattern —
    `examples/ex2_equilibrium.py`).
    """
    from ..engine import build_dy_dt
    from ..engine.dsl import get_problem
    from .fixed import odeint_fixed

    dfn, _ = build_dy_dt(tag, cl_k)
    p_guess = jnp.asarray(p_guess, jnp.float64).reshape(-1)
    if warm_t > 0.0:
        ys = odeint_fixed(lambda y, t: dfn(y), p_guess,
                          jnp.asarray([0.0, warm_t]), n_sub=n_sub)
        p_guess = ys[-1]
    if (kwargs.get("conserved") == "support"
            and "support_guess" not in kwargs):
        # The warmed guess defines the live support (time evolution
        # preserves it).
        kwargs["support_guess"] = np.maximum(np.asarray(p_guess), 0.0)
    solve = make_steady_state(lambda p, _a: dfn(p),
                              size_a=get_problem(tag).size_a, cl_k=cl_k,
                              **kwargs)
    return jax.jit(solve)(p_guess, None)


def relaxation_modes(fn, p_inf, args=None, *, size_a: int, cl_k: int,
                     n_modes: int = 6, krylov_m: int = 40,
                     conserved="auto", probe_args=None,
                     support_guess=None, support_floor: float = 1e-20,
                     gmres_tol: float = 1e-11, gmres_restart: int = 60,
                     gmres_maxiter: int = 8):
    """Slowest relaxation modes of the linearized dynamics at a steady
    state: eigenvalues λ of the Jacobian closest to 0 (relaxation times
    τ = −1/Re λ), by shift-invert Arnoldi on matrix-free Krylov solves.

    Each Arnoldi step applies J_G⁻¹ (one GMRES solve on `jax.jvp`
    products of the augmented system — the same machinery as
    `make_steady_state`; nothing is materialised). Shift-inversion maps
    the physically slow modes (|λ| ≪ 1) to the DOMINANT eigenvalues of
    J_G⁻¹, which Arnoldi finds first — and automatically suppresses the
    augmentation's artificial O(1)-eigenvalue directions, so no
    subspace projection is needed. The m×m Hessenberg eigenproblem is
    solved on host (numpy).

    Returns ``(eigenvalues, residuals)`` sorted by |λ| ascending
    (slowest first) — up to ``n_modes`` entries, FEWER when Arnoldi
    exhausts an invariant subspace smaller than ``n_modes`` (e.g. a
    support-masked problem with a small live set); check ``len``.
    ``residuals`` are the relative Ritz residuals ‖J_G v − λ v‖/|λ| —
    trust a mode when its residual is small. The reference has no linear-response capability
    at all; this quantifies e.g. ex2's coarsening time
    (`tests/test_steady.py::test_relaxation_modes_match_dense_eigs`).
    """
    p_inf = jnp.asarray(p_inf, jnp.float64).reshape(-1)
    aug, targets_fn, mask, _hc, _cv, _ce = _build_augmentation(
        fn, size_a, cl_k, conserved, probe_args, support_guess,
        support_floor)
    targets = targets_fn(p_inf)

    def matvec(v):
        return jax.jvp(lambda q: aug(q, args, targets), (p_inf,), (v,))[1]

    @jax.jit
    def inv_apply(v):
        x, _ = jax.scipy.sparse.linalg.gmres(
            matvec, v, tol=gmres_tol, atol=0.0, restart=gmres_restart,
            maxiter=gmres_maxiter, solve_method="batched")
        return jnp.where(jnp.isfinite(x), x, 0.0)

    # Host-driven Arnoldi (m is small; one device solve per step).
    S = p_inf.shape[0]
    rng = np.random.default_rng(0)
    v = rng.standard_normal(S)
    if mask is not None:
        v = np.where(np.asarray(mask), v, 0.0)
    v /= np.linalg.norm(v)
    V = [jnp.asarray(v)]
    H = np.zeros((krylov_m + 1, krylov_m))
    for j in range(krylov_m):
        w = inv_apply(V[j])
        for i in range(j + 1):  # modified Gram-Schmidt, one re-pass
            h = float(jnp.vdot(V[i], w))
            H[i, j] += h
            w = w - h * V[i]
        for i in range(j + 1):
            h = float(jnp.vdot(V[i], w))
            H[i, j] += h
            w = w - h * V[i]
        nrm = float(jnp.linalg.norm(w))
        H[j + 1, j] = nrm
        if nrm < 1e-13:  # invariant subspace found
            H = H[: j + 2, : j + 1]
            break
        V.append(w / nrm)
    m = H.shape[1]
    mu, Y = np.linalg.eig(H[:m, :m])
    order = np.argsort(-np.abs(mu))  # dominant μ = slowest λ
    lams, resids = [], []
    for idx in order[: n_modes]:
        lam = 1.0 / mu[idx]
        y = Y[:, idx]
        vec = sum(complex(c) * np.asarray(V[i]) for i, c in enumerate(y))
        vec /= np.linalg.norm(vec)
        jv = np.asarray(matvec(jnp.asarray(vec.real))) + 1j * np.asarray(
            matvec(jnp.asarray(vec.imag)))
        resids.append(float(np.linalg.norm(jv - lam * vec)
                            / max(abs(lam), 1e-300)))
        lams.append(lam)
    return np.asarray(lams), np.asarray(resids)
