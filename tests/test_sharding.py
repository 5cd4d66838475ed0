"""Multi-device tests on the virtual 8-CPU mesh (SURVEY §4 last item)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def compiled():
    from chemical_kinetics_and_program_execution_tpu import compile_problem

    return compile_problem("ex2-ferromagnetic-chain", 5, use_cache=False)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(compiled):
    from chemical_kinetics_and_program_execution_tpu import make_dy_dt
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dy_dt,
    )

    mesh = make_mesh(n_batch=2, n_event=4)
    sharded = make_sharded_dy_dt(compiled, mesh)
    single = make_dy_dt(compiled)

    rng = np.random.RandomState(0)
    batch = np.stack(
        [rng.dirichlet(np.ones(compiled.state_size)) for _ in range(4)]
    )
    got = np.asarray(sharded(batch))
    want = np.stack([np.asarray(single(p)) for p in batch])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_dense_state_sharding_matches_single_ex4var2_geometry():
    """Window-rank (state-axis) sharding parity at the reference's
    largest geometry (ex4var2: size_a=10, cl_k=5, 100,000-dim state) on
    the virtual mesh — VERDICT round-1 item #5."""
    from chemical_kinetics_and_program_execution_tpu.engine import dense
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dense_dy_dt,
    )

    prog = dense.compile_dense("ex4var2-chemical-turing", 5)
    assert prog.state_size == 100_000
    mesh = make_mesh(n_batch=2, n_event=4)
    sharded = make_sharded_dense_dy_dt(prog, mesh)
    single = dense.make_dense_dy_dt(prog)

    rng = np.random.RandomState(1)
    batch = np.stack(
        [rng.dirichlet(np.ones(prog.state_size)) for _ in range(2)]
    )
    got = np.asarray(sharded(batch))
    want = np.stack([np.asarray(single(p)) for p in batch])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_sharded_event_axis_only(compiled):
    from chemical_kinetics_and_program_execution_tpu import make_dy_dt
    from chemical_kinetics_and_program_execution_tpu.parallel.mesh import (
        make_mesh,
    )
    from chemical_kinetics_and_program_execution_tpu.parallel.sharding import (
        make_sharded_dy_dt,
    )

    mesh = make_mesh(n_batch=1, n_event=8)
    sharded = make_sharded_dy_dt(compiled, mesh)
    single = make_dy_dt(compiled)
    rng = np.random.RandomState(1)
    p = rng.dirichlet(np.ones(compiled.state_size))
    got = np.asarray(sharded(p[None]))[0]
    np.testing.assert_allclose(got, np.asarray(single(p)),
                               rtol=1e-12, atol=1e-15)
