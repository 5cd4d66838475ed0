"""Merge-cadence quality probe: blocked frontier estimator error vs
merge interval at matched total transitions (CPU)."""
import math, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CKPE_PLATFORM", "cpu")
from chemical_kinetics_and_program_execution_tpu.utils import config
config.initialize()
import numpy as np, jax, jax.numpy as jnp
from chemical_kinetics_and_program_execution_tpu import compile_problem, make_dy_dt
from chemical_kinetics_and_program_execution_tpu.engine import ensemble
from chemical_kinetics_and_program_execution_tpu.models.initial_states import ferromagnet_p0
from chemical_kinetics_and_program_execution_tpu.ode.integrate import solve

TAG, CL_K, K, L, E = "ex2-ferromagnetic-chain", 3, 1024, 128, 8
SEEDS = 8
PLANS = [(8, 4), (4, 8), (2, 16), (1, 32)]
if os.environ.get("CKPE_PROBE_LONG"):
    # Long-horizon variant covering the bench's merge-every-1024 cadence
    # and the candidate 2048: same machinery, E=4 (the bench's events per
    # round), 512 total rounds per member.
    E = 4
    PLANS = [(32, 16), (8, 64), (2, 256), (1, 512)]
p0 = ferromagnet_p0(CL_K, p_pair=0.05, corrected=True).ravel()
dm = ensemble.compile_decision_machine(TAG)
dt_round = -math.log1p(-E / L)
TOTAL_ROUNDS = PLANS[0][0] * PLANS[0][1]
t_eff = TOTAL_ROUNDS * dt_round
fn = make_dy_dt(compile_problem(TAG, CL_K))
ys = solve(lambda y, t: fn(y), p0, np.linspace(0.0, t_eff, 3), rtol=1e-10, atol=1e-12)
p_exact = np.asarray(ys[-1])

for blocks, rounds in PLANS:
    l1s = []
    for s in range(SEEDS):
        key = jax.random.PRNGKey(s)
        dtape = ensemble.sample_tapes_from_spd(jax.random.fold_in(key, 0), p0, 2, CL_K, K, L)
        pt = jnp.zeros((K, L), jnp.int8)
        lw = jnp.full((K,), -math.log(K), jnp.float64)
        (_, dt2), lw, nu = ensemble.run_weighted_frontier_blocked(
            jax.random.fold_in(key, 1), (pt, dtape), lw, dm, (blocks, rounds, E))
        emp = ensemble.weighted_window_counts(dt2, jnp.exp(lw), 2, CL_K)
        l1s.append(float(np.abs(np.asarray(emp) - p_exact).sum()))
    l1s = np.array(l1s)
    print(f"merge every {rounds*E:4d} transitions (blocks={blocks:2d}): "
          f"L1 = {l1s.mean():.4f} +- {l1s.std():.4f}", flush=True)
