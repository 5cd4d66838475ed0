"""Mass-action autocatalysis kinetics (reference `examples/autocatalysis.py`).

Three sweeps of four parameter sets each (competition, flow response,
bistability), run as ONE vmapped on-device batch instead of the
reference's Python loop over scipy.odeint (`autocatalysis.py:167-176`),
plus the equilibrium finder. Rows pack as [ca0, cb0, cm0,
c_form_a, c_auto_a, c_stab_a, c_form_b, c_auto_b, c_stab_b,
c_add, c_remove] (`autocatalysis.py:50-123`).
"""

import numpy as np

import _common
from _common import finish, new_fig, out_path
from chemical_kinetics_and_program_execution_tpu.models import autocatalysis

PARAM_SETS = {
    # Spontaneous-formation competition, closed reactor.
    "autocatalysis1": [
        [0.0, 0.0, 1.0, 0.001, 20.0, 10.0, 0.001, 50.0, 20.0, 0.0, 0.0],
        [0.2, 0.1, 0.4, 0.001, 20.0, 10.0, 0.001, 50.0, 20.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.001, 20.0, 10.0, 0.001, 80.0, 20.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.001, 50.0, 10.0, 0.001, 20.0, 20.0, 0.0, 0.0],
    ],
    # Increasing flow rates.
    "autocatalysis2": [
        [0.0, 0.0, 1.0, 0.001, 20.0, 10.0, 0.001, 50.0, 20.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.01, 20.0, 10.0, 0.01, 50.0, 20.0, 0.1, 0.1],
        [0.0, 0.0, 1.0, 0.01, 20.0, 10.0, 0.01, 50.0, 20.0, 0.5, 0.5],
        [0.0, 0.0, 1.0, 0.01, 20.0, 10.0, 0.01, 50.0, 20.0, 10.0, 10.0],
    ],
    # Near-equal autocatalysts at several flow rates.
    "autocatalysis3": [
        [0.0, 0.0, 1.0, 0.05, 20.0, 10.0, 0.05, 25.0, 10.0, 0.1, 0.1],
        [0.0, 0.0, 1.0, 0.05, 20.0, 10.0, 0.05, 25.0, 10.0, 1.0, 1.0],
        [0.0, 0.0, 1.0, 0.05, 20.0, 10.0, 0.05, 25.0, 10.0, 5.0, 5.0],
        [0.0, 0.0, 1.0, 0.05, 20.0, 10.0, 0.05, 25.0, 10.0, 30.0, 30.0],
    ],
}

STYLES = ["-", "--", "-.", ":"]


def main():
    ts = np.linspace(0.0, 100.0, 10001)
    rows = np.array(sum(PARAM_SETS.values(), []))
    ys_all = autocatalysis.integrate_sweep(rows, ts)  # one vmapped solve

    i = 0
    for name, rows_here in PARAM_SETS.items():
        fig, ax = new_fig(figsize=(16, 8), grid=False)
        for n, style in enumerate(STYLES[: len(rows_here)]):
            ys = ys_all[i]
            i += 1
            ax.plot(ts, ys[:, 0], style + "b", label=f"[A] #{n}")
            ax.plot(ts, ys[:, 1], style + "r", label=f"[B] #{n}")
            ax.plot(ts, ys[:, 2], style + "k", label=f"[M] #{n}")
        finish(fig, ax, f"{name}.pdf", ylabel="concentration")

    # Equilibrium of the last param set (cf. `autocatalysis.py:191-209`).
    row = PARAM_SETS["autocatalysis3"][0]
    y_eq, residual = autocatalysis.find_equilibrium(
        ys_all[-4][-1], row[3:]
    )
    print(f"equilibrium from t_final state: y={y_eq}, |dy/dt|^2={residual}")


if __name__ == "__main__":
    main()
