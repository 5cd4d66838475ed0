"""Shared plumbing for the example scripts.

Gives every example the reference scripts' conveniences — idempotent .npz
caching (`ex5_msrtf_machine.py:63-76` pattern), sequence-probability plot
helpers (`ex4_chemical_turing.py:121-128`), figure styling — without
repeating them per script. Examples run headless (Agg backend) and write
PDFs next to themselves unless ``CKPE_EXAMPLES_OUT`` says otherwise.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
matplotlib.rcParams.update({"font.size": 18})

from matplotlib import pyplot  # noqa: E402

from chemical_kinetics_and_program_execution_tpu import markov_tapes  # noqa: E402,F401

OUT_DIR = os.environ.get(
    "CKPE_EXAMPLES_OUT", os.path.dirname(os.path.abspath(__file__))
)


def out_path(name: str) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    return os.path.join(OUT_DIR, name)


def iid_spd(probs, cl_k: int):
    """``[size_a]^cl_k`` product SPD of iid per-site symbols."""
    probs = np.asarray(probs, dtype=np.float64)
    out = probs
    for _ in range(cl_k - 1):
        out = np.multiply.outer(out, probs)
    return out


def cached(filename: str, compute, key: str = "ode_ys",
           ts: np.ndarray | None = None) -> np.ndarray:
    """Idempotent .npz cache: recompute only if the file is absent.

    ``ts`` (when given) is stored alongside the trajectory so a later
    `sample_grid` call can reconcile the full time axis, not just the
    sample count.
    """
    path = out_path(filename)
    if os.access(path, os.R_OK):
        return np.load(path)[key]
    value = compute()
    extra = {} if ts is None else {"ts": np.asarray(ts)}
    np.savez_compressed(path, **{key: value}, **extra)
    return value


def sample_grid(filename: str, t0: float, t_max: float, n_samples: int,
                key: str = "ode_ys") -> np.ndarray:
    """Sample grid for a (possibly cached) solve.

    The .npz caches are keyed by filename alone (the reference's
    idempotence pattern), so rerunning a script with different grid
    flags than the committed artifact would misalign ``ts`` with the
    cached rows. When a cache exists, its grid wins outright: caches
    that stored their time axis (``ts`` key) return it verbatim —
    covering a changed ``--t-max`` too — and older count-only caches
    fall back to reconciling the sample count.
    """
    path = out_path(filename)
    if os.access(path, os.R_OK):
        data = np.load(path)
        if "ts" in data:
            ts = np.asarray(data["ts"])
            if (len(ts) != n_samples or ts[0] != t0
                    or ts[-1] != t_max):
                print(f"[examples] {filename}: using the cached time "
                      f"grid ({len(ts)} samples, t∈[{ts[0]:g},"
                      f"{ts[-1]:g}])", flush=True)
            return ts
        n = int(data[key].shape[0])
        if n != n_samples:
            print(f"[examples] {filename}: cached trajectory has {n} "
                  f"samples; using its grid", flush=True)
            n_samples = n
    return np.linspace(t0, t_max, n_samples)


def new_fig(figsize=(16, 8), grid=True):
    fig = pyplot.figure(figsize=figsize)
    ax = fig.gca()
    if grid:
        ax.grid()
    return fig, ax


def log10(ys):
    return np.log(1e-100 + np.asarray(ys)) / np.log(10)


class SeqProbPlotter:
    """Plots per-window sequence probabilities over an SPD trajectory and
    prints the final value (the reference's de-facto regression output,
    `ex4_chemical_turing.py:121-128`)."""

    def __init__(self, ax, ode_ys, ts, size_a, cl_k, logy=True, logx=False):
        self.ax = ax
        self.ys = np.asarray(ode_ys)
        self.ts = np.asarray(ts)
        self.shape = [size_a] * cl_k
        self.logy = logy
        self.logx = logx

    def seq_prob(self, seq):
        return np.array([
            markov_tapes.seq_prob(spd.reshape(self.shape), seq)[0]
            for spd in self.ys
        ])

    def plot(self, seq, style, label, scale=1.0, **extra):
        ys = self.seq_prob(seq) * scale
        xs = self.ts[1:]
        if self.logx:
            xs = np.log(xs) / np.log(10)
        self.ax.plot(xs, log10(ys[1:]) if self.logy else ys[1:],
                     style, label=label, **extra)
        print(f"{label}: p_final={ys[-1]}")
        return ys


def finish(fig, ax, filename, xlabel="time", ylabel=r"$\log_{10}(p)$"):
    ax.set_ylabel(ylabel)
    ax.set_xlabel(xlabel)
    ax.legend(loc="best")
    path = out_path(filename)
    fig.savefig(path)
    print(f"wrote {path}")
