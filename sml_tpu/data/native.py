"""ctypes bindings for the native host-side data kernels (native/sampler.cpp).

Build-on-demand: the shared library is compiled with g++ the first time it
is needed and cached next to the source. Every entry point has a pure-numpy
fallback, so the framework works without a toolchain; the native path is
~100x faster on the offline eval-row builder (the reference's
``select_neg_forinteraction`` analogue, ``data/dataset2.py:356-414``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "sampler.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libsml_sampler.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:  # toolchain missing → fallback path
        print(f"sml_tpu: native sampler build failed ({e}); "
              f"using numpy fallback", file=sys.stderr)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        have_lib = os.path.exists(_LIB_PATH)
        fresh = (have_lib and os.path.exists(_SRC)
                 and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC))
        path = _LIB_PATH if fresh else None
        if path is None and os.path.exists(_SRC):
            path = _build()
        if path is None and have_lib:
            # stale (or source-less) prebuilt library beats the numpy
            # fallback when a rebuild isn't possible
            print("sml_tpu: using prebuilt native library (rebuild "
                  "unavailable)", file=sys.stderr)
            path = _LIB_PATH
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        p64 = ctypes.POINTER(ctypes.c_int64)
        lib.sml_build_eval_rows.restype = ctypes.c_int
        lib.sml_build_eval_rows.argtypes = [
            p64, p64, ctypes.c_int64, p64, p64, ctypes.c_int64,
            p64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, p64]
        lib.sml_sample_negatives.restype = ctypes.c_int
        lib.sml_sample_negatives.argtypes = [
            p64, ctypes.c_int64, p64, p64, ctypes.c_int64,
            p64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, p64]
        pd = ctypes.POINTER(ctypes.c_double)
        lib.sml_count_csv_rows.restype = ctypes.c_int64
        lib.sml_count_csv_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.sml_parse_csv_log.restype = ctypes.c_int64
        lib.sml_parse_csv_log.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_char, ctypes.c_int64, p64, p64, pd]
        _lib = lib
        return _lib


def _c64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_eval_rows_native(interactions: np.ndarray,
                           history: np.ndarray,
                           catalog: np.ndarray,
                           neg_num: int,
                           seed: int = 0) -> Optional[np.ndarray]:
    """Attach ``neg_num`` distinct negatives per interaction, excluding the
    user's history. Returns None if the native library is unavailable.

    ``interactions``: (N, 2) [user, pos]; ``history``: (H, 2) all known
    (user, item) pairs; ``catalog``: (C,) candidate item ids.
    """
    lib = get_lib()
    if lib is None:
        return None
    inter = np.ascontiguousarray(interactions, dtype=np.int64)
    hist = np.ascontiguousarray(history, dtype=np.int64)
    cat = np.ascontiguousarray(catalog, dtype=np.int64)
    out = np.empty((inter.shape[0], 2 + neg_num), dtype=np.int64)
    u = np.ascontiguousarray(inter[:, 0])
    i = np.ascontiguousarray(inter[:, 1])
    hu = np.ascontiguousarray(hist[:, 0])
    hi = np.ascontiguousarray(hist[:, 1])
    rc = lib.sml_build_eval_rows(
        _c64(u), _c64(i), inter.shape[0], _c64(hu), _c64(hi), hist.shape[0],
        _c64(cat), cat.shape[0], neg_num, seed, _c64(out))
    if rc != 0:
        raise ValueError(
            "catalog too small to draw the requested distinct negatives")
    return out


def sample_negatives_native(users: np.ndarray, history: np.ndarray,
                            pool: np.ndarray, tries: int = 16,
                            seed: int = 0) -> Optional[np.ndarray]:
    """One negative per user from ``pool``, rejecting the user's positives."""
    lib = get_lib()
    if lib is None:
        return None
    u = np.ascontiguousarray(users, dtype=np.int64)
    hist = np.ascontiguousarray(history, dtype=np.int64)
    p = np.ascontiguousarray(pool, dtype=np.int64)
    out = np.empty(u.shape[0], dtype=np.int64)
    hu = np.ascontiguousarray(hist[:, 0])
    hi = np.ascontiguousarray(hist[:, 1])
    lib.sml_sample_negatives(_c64(u), u.shape[0], _c64(hu), _c64(hi),
                             hist.shape[0], _c64(p), p.shape[0],
                             tries, seed, _c64(out))
    return out


def parse_csv_log_native(path: str, user_col: int = 0, item_col: int = 1,
                         time_col: int = 2, delimiter: str = ",",
                         skip_header: int = 1):
    """Parse a (user, item, timestamp) delimited log natively.

    Returns ``(users int64, items int64, times float64)`` or None if the
    native path does not apply (library unavailable, or a multi-character
    delimiter — the C parser splits on one byte; callers fall back to
    numpy). ``#``-prefixed lines are skipped like genfromtxt's default.
    Raises ValueError on a malformed line (missing column / unparsable or
    garbage-suffixed number), a strictness the numpy fallback lacks
    (genfromtxt silently yields NaN rows).
    """
    if len(delimiter) != 1:
        return None
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        buf = fh.read()
    n = lib.sml_count_csv_rows(buf, len(buf), skip_header)
    users = np.empty(n, dtype=np.int64)
    items = np.empty(n, dtype=np.int64)
    times = np.empty(n, dtype=np.float64)
    rc = lib.sml_parse_csv_log(
        buf, len(buf), user_col, item_col, time_col,
        delimiter.encode()[:1], skip_header, _c64(users), _c64(items),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc < 0:
        raise ValueError(
            f"malformed log line {-(rc + 1) + 1} (1-based) in {path}")
    return users[:rc], items[:rc], times[:rc]
