"""ctypes bindings for the native (C++) runtime components.

``make native`` (repo root) builds ``libpst_native.so`` from tmscore.cc +
featurize.cc.  Every binding has a pure-Python fallback so the framework
works without the build step; ``available()`` reports the fast path.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libpst_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pst_tm_score.restype = ctypes.c_int
    lib.pst_tm_score.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pst_rmsd.restype = ctypes.c_int
    lib.pst_rmsd.argtypes = lib.pst_tm_score.argtypes
    lib.pst_tm_align.restype = ctypes.c_int
    lib.pst_tm_align.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pst_featurize.restype = ctypes.c_int
    lib.pst_featurize.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_c(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def tm_score(model_xyz: np.ndarray, native_xyz: np.ndarray) -> Optional[dict]:
    """TM-score & friends for 1:1-corresponding coordinate sets (N, 3).

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    model = np.ascontiguousarray(model_xyz, dtype=np.float64)
    native_arr = np.ascontiguousarray(native_xyz, dtype=np.float64)
    assert model.shape == native_arr.shape and model.shape[1] == 3
    out = np.zeros(6, np.float64)
    rc = lib.pst_tm_score(
        _as_c(model, ctypes.c_double),
        _as_c(native_arr, ctypes.c_double),
        model.shape[0],
        _as_c(out, ctypes.c_double),
    )
    if rc != 0:
        return None
    return {
        "tm": float(out[0]),
        "rmsd": float(out[1]),
        "maxsub": float(out[2]),
        "gdt_ts": float(out[3]),
        "gdt_ha": float(out[4]),
        "d0": float(out[5]),
    }


def tm_align(a_xyz: np.ndarray, b_xyz: np.ndarray) -> Optional[dict]:
    """Sequence-independent structural alignment of chain A onto chain B.

    Chains may differ in length; no residue correspondence is assumed
    (TMalign semantics).  Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a_xyz, dtype=np.float64)
    b = np.ascontiguousarray(b_xyz, dtype=np.float64)
    assert a.ndim == 2 and a.shape[1] == 3 and b.ndim == 2 and b.shape[1] == 3
    out = np.zeros(6, np.float64)
    ali = np.full((a.shape[0],), -1, np.int32)
    rc = lib.pst_tm_align(
        _as_c(a, ctypes.c_double),
        a.shape[0],
        _as_c(b, ctypes.c_double),
        b.shape[0],
        _as_c(out, ctypes.c_double),
        _as_c(ali, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return {
        "tm_norm_a": float(out[0]),
        "tm_norm_b": float(out[1]),
        "rmsd_aligned": float(out[2]),
        "n_aligned": int(out[3]),
        "d0_a": float(out[4]),
        "d0_b": float(out[5]),
        "alignment": ali,
    }


def rmsd(model_xyz: np.ndarray, native_xyz: np.ndarray) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    model = np.ascontiguousarray(model_xyz, dtype=np.float64)
    native_arr = np.ascontiguousarray(native_xyz, dtype=np.float64)
    out = np.zeros(1, np.float64)
    rc = lib.pst_rmsd(
        _as_c(model, ctypes.c_double),
        _as_c(native_arr, ctypes.c_double),
        model.shape[0],
        _as_c(out, ctypes.c_double),
    )
    return float(out[0]) if rc == 0 else None


def featurize(pos37: np.ndarray, mask37: np.ndarray, k: int, padding: int):
    """Native k-NN graph featurization; returns (edges, senders, receivers)
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos37, dtype=np.float64)
    mask = np.ascontiguousarray(mask37, dtype=np.uint8)
    n = pos.shape[0]
    edges = np.zeros((padding * k, 27), np.float64)
    senders = np.zeros((padding * k,), np.int32)
    receivers = np.zeros((padding * k,), np.int32)
    rc = lib.pst_featurize(
        _as_c(pos, ctypes.c_double),
        _as_c(mask, ctypes.c_uint8),
        n,
        k,
        padding,
        _as_c(edges, ctypes.c_double),
        _as_c(senders, ctypes.c_int32),
        _as_c(receivers, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return edges, senders, receivers
