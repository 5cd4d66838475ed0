"""ctypes bindings for the native compile-phase helpers.

The reference's native surface is its compiled Scheme+C engine
(`framework/MAKE.sh` building `tapes_py_interface.so`, loaded via ctypes
at `markov_tapes.py:40-56`). Here the hot compile phase — the
window-sweep expansion that produces 10^7+ accumulation events for the
big problems — is a small C++ library (`native/expander.cc`) with the
same loading pattern: built on demand with `make`, loaded with ctypes,
and entirely optional (the pure-Python expander in `accumulate.py` is
the fallback and the correctness oracle; both produce bit-identical
event tables).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils import config

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libckpe_expander.so")

_lib = None
_load_failed = False


def _load():
    """Loads (building if necessary) the native library, or returns None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("CKPE_NO_NATIVE"):
        _load_failed = True
        return None
    try:
        # Always invoke make: the Makefile's source dependencies turn
        # this into a no-op when the library is current, and rebuild it
        # when the sources changed under an existing .so. In read-only
        # checkouts make may fail with the .so present — tolerated, the
        # ABI check below still guards against calling a stale build
        # through a mismatched prototype.
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                raise
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ckpe_abi_version.restype = ctypes.c_int64
        lib.ckpe_abi_version.argtypes = []
        if lib.ckpe_abi_version() != 2:
            raise RuntimeError(
                f"native library ABI {lib.ckpe_abi_version()} != 2; "
                f"rebuild {_LIB_PATH}")
        lib.ckpe_expand.restype = ctypes.c_void_p
        lib.ckpe_expand.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ckpe_num_events.restype = ctypes.c_int64
        lib.ckpe_num_events.argtypes = [ctypes.c_void_p]
        lib.ckpe_max_chain.restype = ctypes.c_int64
        lib.ckpe_max_chain.argtypes = [ctypes.c_void_p]
        lib.ckpe_fill.restype = None
        lib.ckpe_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ckpe_free.restype = None
        lib.ckpe_free.argtypes = [ctypes.c_void_p]
        lib.ckpe_enum6.restype = ctypes.c_void_p
        lib.ckpe_enum6.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64,
        ]
        for name in ("ckpe_enum6_num_worlds", "ckpe_enum6_num_factors",
                     "ckpe_enum6_status"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.ckpe_enum6_fill.restype = None
        lib.ckpe_enum6_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ckpe_enum6_free.restype = None
        lib.ckpe_enum6_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # missing toolchain, sandbox, etc.
        if config.IS_DEBUG:
            print(f"[ckpe] native expander unavailable ({e}); "
                  f"using the Python expander")
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def enumerate_ex6(size_a: int, cl_k: int, fuel: int, d1_start: int,
                  threshold: float, pyramid: np.ndarray,
                  max_worlds: int | None, *, code_tape: int = 0,
                  tag: str = "ex6-mini-bff"):
    """Native guided enumeration of the ex6 mini-BFF rule, or None.

    ``code_tape=1`` selects the single-tape SELF-MODIFYING variant
    (opcode fetch on the live data ring, `problems.py:_ex6_self`);
    ``tag`` only labels the max_worlds error for Python parity.

    Returns (chain_len [W] int32, num [F] int32, den [F] int32,
    sigs [W, 10] int64 — per tape io_hi, io_lo, ia_hi, ia_lo, len; the
    128-bit halves reassemble into Python bignums) — worlds in the
    exact DFS order of the Python odometer. Raises RuntimeError on
    max_worlds overflow (matching `enumerate.enumerate_worlds`);
    returns None when the native library is unavailable or a tape span
    exceeds the 128-bit signature range (caller falls back to Python's
    bignum path).
    """
    lib = _load()
    if lib is None:
        return None
    pyr = np.ascontiguousarray(np.asarray(pyramid, dtype=np.float64))
    handle = lib.ckpe_enum6(
        size_a, cl_k, fuel, d1_start, float(threshold),
        pyr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        -1 if max_worlds is None else int(max_worlds),
        int(code_tape),
    )
    try:
        status = lib.ckpe_enum6_status(handle)
        if status == 2:
            raise RuntimeError(
                f"Problem {tag!r} exceeds max_worlds={max_worlds} "
                f"execution paths at cl_k={cl_k}."
            )
        if status == 1:
            return None  # signature overflow: Python bignums handle it
        n = lib.ckpe_enum6_num_worlds(handle)
        f = lib.ckpe_enum6_num_factors(handle)
        chain_len = np.empty(n, dtype=np.int32)
        num = np.empty(f, dtype=np.int32)
        den = np.empty(f, dtype=np.int32)
        sigs = np.empty((n, 10), dtype=np.int64)
        lib.ckpe_enum6_fill(
            handle,
            chain_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            den.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sigs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.ckpe_enum6_free(handle)
    return chain_len, num, den, sigs


def expand_signatures(size_a: int, cl_k: int, sigs: np.ndarray,
                      one_slot: int):
    """Expands signatures [K, 3] into padded event tables, or None.

    Returns (e_num [E, Le] int32, e_den [E, Le] int32, e_sig [E] int32,
    tgt_orig [E] int64, tgt_adj [E] int64), with factor chains padded by
    ``one_slot`` — identical layout and ordering to the Python expander
    path in `compile.py`.
    """
    lib = _load()
    if lib is None:
        return None
    sigs = np.ascontiguousarray(np.asarray(sigs, dtype=np.int64))
    handle = lib.ckpe_expand(
        size_a, cl_k, len(sigs),
        sigs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    try:
        n = lib.ckpe_num_events(handle)
        le = max(int(lib.ckpe_max_chain(handle)), 1)
        e_num = np.full((n, le), one_slot, dtype=np.int32)
        e_den = np.full((n, le), one_slot, dtype=np.int32)
        e_sig = np.empty(n, dtype=np.int32)
        tgt_orig = np.empty(n, dtype=np.int64)
        tgt_adj = np.empty(n, dtype=np.int64)
        lib.ckpe_fill(
            handle, le,
            e_num.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            e_den.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            e_sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tgt_orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tgt_adj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.ckpe_free(handle)
    return e_num, e_den, e_sig, tgt_orig, tgt_adj
