"""Decompose the ensemble plane-round cost: FSM walk vs write decode vs
plane plumbing. Informs the speed-of-light audit (probes/speed_of_light.py
measured the round at ~32% of the HBM copy roofline => compute-bound).

Run: timeout 900 python probes/round_decompose.py   (TPU, ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chemical_kinetics_and_program_execution_tpu.utils import config  # noqa: E402

config.initialize()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chemical_kinetics_and_program_execution_tpu.engine import ensemble  # noqa: E402


def timed(fn, *args, iters=100, reps=3):
    @jax.jit
    def scanned(*a):
        def body(c, _):
            return fn(*c), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return jax.tree.reduce(
            lambda s, x: s + jnp.sum(x[..., :1].astype(jnp.float32)),
            c, jnp.float32(0))

    float(scanned(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(scanned(*args))
        ts.append((time.time() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    dm = ensemble.compile_decision_machine("ex5-msrtf-machine")
    B, E, stride = 16384, 256, 16
    L = E * stride
    key = jax.random.PRNGKey(0)
    pt = jax.random.randint(key, (B, L), 0, 3, dtype=jnp.int8)
    dtp = jnp.zeros((B, L), jnp.int8)
    pp = ensemble._tape_to_planes(pt, stride)
    dd = ensemble._tape_to_planes(dtp, stride)
    n_cells = dm.n_p + dm.n_d
    cells = tuple(jax.random.randint(jax.random.fold_in(key, i),
                                     (B, E), 0, 3, dtype=jnp.int8)
                  for i in range(n_cells))
    u = jax.random.uniform(jax.random.fold_in(key, 99), (B, E),
                           jnp.float32)
    spec0 = jax.random.randint(jax.random.fold_in(key, 7), (B, E), 0,
                               dm.num_specs, dtype=jnp.int8)
    shift = jnp.int32(3)

    # 1. Full round (tuple/switch formulation).
    def full(pp, dd, u):
        np_, nd = ensemble._apply_plane_round_fsm(dm, pp, dd, shift, u)
        return np_, nd, u + 1e-9

    t_full = timed(full, pp, dd, u)
    n_sites = B * E
    print(f"full round (tuple/switch): {t_full * 1e3:.3f} ms "
          f"({n_sites / t_full:.3e} sites/s)", flush=True)

    # 1b. Full round, stacked formulation (the hot path), with a
    # genuinely DYNAMIC shift (iteration-varying, so XLA cannot fold
    # the plane selection like it folds a constant switch index).
    pst, dst = jnp.stack(pp), jnp.stack(dd)

    def full_stacked(pst, dst, u, sh):
        np_, nd = ensemble._apply_plane_round_fsm_stacked(
            dm, pst, dst, sh[0] % stride, u)
        return np_, nd, u + 1e-9, sh + 1

    t_st = timed(full_stacked, pst, dst, u, jnp.zeros((1,), jnp.int32))
    print(f"full round (stacked, dynamic shift): {t_st * 1e3:.3f} ms "
          f"({n_sites / t_st:.3e} sites/s)", flush=True)

    # 2. FSM walk alone (fixed cells, no plane plumbing).
    def walk(cells, u):
        spec = ensemble._machine_specs_planes(dm, cells, u)
        return tuple(c ^ spec for c in cells), u + 1e-9

    t_walk = timed(walk, cells, u)
    print(f"FSM walk (specs): {t_walk * 1e3:.3f} ms", flush=True)

    # 3. Write decode alone.
    def wr(cells, spec0):
        outs = ensemble._machine_writes_planes(dm, spec0, list(cells))
        return tuple(outs), (spec0 + 1) % dm.num_specs

    t_wr = timed(wr, cells, spec0)
    print(f"write decode: {t_wr * 1e3:.3f} ms", flush=True)

    # 4. Plane plumbing alone: read switch + write switch with a no-op
    # in between.
    coords = ensemble._plane_coords(dm, stride)

    def plumbing(pp, dd):
        def rb(phase):
            def body(pp, dd):
                out = []
                for tape, c, extra in coords[phase]:
                    x = (pp if tape == 0 else dd)[c]
                    if extra:
                        x = jnp.roll(x, -extra, axis=1)
                    out.append(x)
                return tuple(out)
            return body

        cells2 = jax.lax.switch(shift, [rb(s) for s in range(stride)],
                                pp, dd)

        def wb(phase):
            def body(pp, dd, new):
                outs = (list(pp), list(dd))
                for i, (tape, c, extra) in enumerate(coords[phase]):
                    v = new[i]
                    if extra:
                        v = jnp.roll(v, extra, axis=1)
                    outs[tape][c] = v
                return tuple(outs[0]), tuple(outs[1])
            return body

        new = tuple(c ^ jnp.int8(1) for c in cells2)
        return jax.lax.switch(shift, [wb(s) for s in range(stride)],
                              pp, dd, new)

    t_pl = timed(plumbing, pp, dd)
    print(f"plane plumbing (read+write switch, xor body): "
          f"{t_pl * 1e3:.3f} ms", flush=True)
    print(f"sum of parts: {(t_walk + t_wr + t_pl) * 1e3:.3f} ms vs "
          f"full {t_full * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
