"""TPU-native framework for chemical-kinetics-meets-program-execution.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`paradigms-of-intelligence/chemical-kinetics-and-program-execution`
(see SURVEY.md / DESIGN.md at the repository root).

Quick start (drop-in replacement for the reference's `markov_tapes`):

    from chemical_kinetics_and_program_execution_tpu import markov_tapes
    ys = markov_tapes.ode_integrate(
        tag="ex2-ferromagnetic-chain", size_a=2, cl_k=5, p0=p0, ts=ts)
"""

from .utils import config as _config

_config.initialize()

from . import markov  # noqa: E402,F401
from .engine import build_dy_dt  # noqa: E402,F401
from .engine.compile import compile_problem  # noqa: E402,F401
from .engine.dense import compile_dense, make_dense_dy_dt  # noqa: E402,F401
from .engine.dsl import (  # noqa: E402,F401
    DATA,
    PROGRAM,
    register_problem,
    registered_problems,
)
from .engine.rhs import make_batched_dy_dt, make_dy_dt  # noqa: E402,F401

__version__ = "0.1.0"
