"""Engine package: problem DSL, multiverse compilers, and RHS kernels.

Three interchangeable exact kernels compute the same dy/dt:

- ``dense``  (`dense.py`)  — transfer-matrix window sweep, pure dense
  vector ops; the TPU hot path. Graph size grows with the signature
  count, so it is auto-selected when that count is modest (covers every
  reference workload).
- ``tree``   (`rhs.py`)    — levelized prefix-tree gather kernel over the
  compiled event tables; handles problems with thousands of signatures.
- ``chains`` (`rhs.py`)    — padded-chain gather kernel; the
  structure-independent cross-check.
"""

from __future__ import annotations

# Above this many signature *groups* (same-(length, changed-positions)
# signatures share one sweep and batched emissions) the unrolled dense
# graph stops being worth its compile time; fall back to the tree kernel.
DENSE_GROUP_LIMIT = 600


def build_dy_dt(tag: str, cl_k: int, *, dtype=None, jit: bool = True,
                engine: str = "auto", max_worlds: int | None = None):
    """Compiles ``tag`` and returns ``(device_fn, program)``.

    ``device_fn`` maps an SPD vector to dp/dt on device; ``program`` is
    the compiled representation (:class:`dense.DenseProgram` or
    :class:`compile.CompiledProblem`) exposing ``state_size``/``size_a``/
    ``summary()``.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    if engine in ("auto", "dense"):
        from . import dense as dense_mod

        prog = dense_mod.compile_dense(tag, cl_k, max_worlds=max_worlds)
        n_groups = len(dense_mod._group_plans(
            prog.plans, prog.size_a, prog.cl_k))
        if engine == "dense" or n_groups <= DENSE_GROUP_LIMIT:
            return dense_mod.make_dense_dy_dt(prog, dtype=dtype, jit=jit), prog
    from . import rhs
    from .compile import compile_problem

    compiled = compile_problem(tag, cl_k, max_worlds=max_worlds)
    if engine == "chains":
        return rhs.make_chain_dy_dt(compiled, dtype=dtype, jit=jit), compiled
    return rhs.make_dy_dt(compiled, dtype=dtype, jit=jit), compiled
