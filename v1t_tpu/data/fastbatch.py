"""ctypes loader for the native batch-assembly kernels (_fastbatch.c).

Builds the shared library with the system C compiler on first use (cached
next to the source, keyed by a source hash) and exposes numpy-friendly
wrappers. Everything degrades gracefully: if no compiler is available or the
build fails, ``lib()`` returns None and callers keep the pure-numpy path.

The C side releases the GIL for the whole call (ctypes), so batch assembly
overlaps the training step even from the BatchLoader prefetch thread.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
import typing as t

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastbatch.c")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")

_lock = threading.Lock()
_lib: t.Optional[ctypes.CDLL] = None
_lib_attempted = False

_I64 = ctypes.c_int64
_PD = ctypes.POINTER(ctypes.c_double)
_PF = ctypes.POINTER(ctypes.c_float)
_PI = ctypes.POINTER(_I64)


def _compile() -> t.Optional[str]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"fastbatch-{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    base = ["-O3", "-shared", "-fPIC", "-fvisibility=default", "-o"]
    for cc, extra in (("g++", ["-fopenmp"]), ("g++", []), ("cc", [])):
        with tempfile.TemporaryDirectory(dir=_BUILD_DIR) as tmp:
            tmp_so = os.path.join(tmp, "fastbatch.so")
            cmd = [cc, "-x", "c", _SRC] + extra + base + [tmp_so]
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=120
                )
            except (OSError, subprocess.TimeoutExpired):
                continue
            if proc.returncode == 0 and os.path.exists(tmp_so):
                # atomic publish so concurrent builders can't race
                os.replace(tmp_so, so_path)
                return so_path
    return None


def lib() -> t.Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable. Set
    ``V1T_HOST_FASTPATH=0`` to force the numpy path."""
    global _lib, _lib_attempted
    if os.environ.get("V1T_HOST_FASTPATH", "1") == "0":
        return None
    with _lock:
        if _lib_attempted:
            return _lib
        _lib_attempted = True
        try:
            so_path = _compile()
            if so_path is None:
                return None
            cdll = ctypes.CDLL(so_path)
            cdll.v1t_gather_image.argtypes = [
                _PF, _I64, _PI, _I64, _PD, _PD, ctypes.c_int,
                _I64, _I64, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            cdll.v1t_gather_scale.argtypes = [_PF, _I64, _PI, _I64, _PF, _PF]
            cdll.v1t_gather_rows.argtypes = [_PF, _I64, _PI, _I64, _PF]
            cdll.v1t_fastbatch_abi_version.restype = ctypes.c_int
            if cdll.v1t_fastbatch_abi_version() != 1:
                return None
            _lib = cdll
        except Exception:
            _lib = None
        return _lib


def _as_f32_rows(a: np.ndarray) -> t.Optional[np.ndarray]:
    """View a packed (n, ...) array as contiguous float32 rows, or None if
    the layout disqualifies it from the native path."""
    if a.dtype != np.float32 or not a.flags["C_CONTIGUOUS"]:
        return None
    return a


def gather_image(
    packed: np.ndarray,
    idx: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    reduce_gray: bool,
    out_bf16: bool,
) -> t.Optional[np.ndarray]:
    """Fused rows-gather + (x - mean)/std [+ channel mean] [+ bf16 cast].

    ``packed`` is the (num_trials, C, H, W) float32 packed array (memmap ok);
    ``mean``/``std`` broadcast against one (C, H, W) sample. Returns the
    assembled (n, C|1, H, W) batch, or None when the native path cannot be
    used (caller falls back to numpy).
    """
    cdll = lib()
    src = _as_f32_rows(packed)
    if cdll is None or src is None or packed.ndim != 4:
        return None
    n_trials, c, h, w = packed.shape
    hw = h * w
    row_elems = c * hw
    # numpy computes (f32 - stat) in float64 iff the stats are float64
    use_double = np.result_type(np.float32, mean.dtype, std.dtype) == np.float64
    try:
        mean_full = np.ascontiguousarray(
            np.broadcast_to(np.asarray(mean, np.float64), (c, h, w))
        ).reshape(-1)
        std_full = np.ascontiguousarray(
            np.broadcast_to(np.asarray(std, np.float64), (c, h, w))
        ).reshape(-1)
    except ValueError:  # stats don't broadcast over one sample
        return None
    idx64 = np.ascontiguousarray(idx, np.int64)
    out_c = 1 if reduce_gray else c
    if out_bf16:
        import ml_dtypes

        out = np.empty((len(idx64), out_c, h, w), ml_dtypes.bfloat16)
    else:
        out = np.empty((len(idx64), out_c, h, w), np.float32)
    cdll.v1t_gather_image(
        src.ctypes.data_as(_PF), _I64(row_elems),
        idx64.ctypes.data_as(_PI), _I64(len(idx64)),
        mean_full.ctypes.data_as(_PD), std_full.ctypes.data_as(_PD),
        ctypes.c_int(int(use_double)), _I64(c), _I64(hw),
        ctypes.c_int(int(reduce_gray)), ctypes.c_int(int(out_bf16)),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def gather_scale(
    packed: np.ndarray, idx: np.ndarray, scale: np.ndarray
) -> t.Optional[np.ndarray]:
    """Fused rows-gather + per-column scale (the response-precision
    transform). Returns None when the native path cannot be used."""
    cdll = lib()
    src = _as_f32_rows(packed)
    if cdll is None or src is None or packed.ndim != 2:
        return None
    scale32 = np.ascontiguousarray(scale, np.float32)
    if scale32.shape != (packed.shape[1],):
        return None
    idx64 = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx64), packed.shape[1]), np.float32)
    cdll.v1t_gather_scale(
        src.ctypes.data_as(_PF), _I64(packed.shape[1]),
        idx64.ctypes.data_as(_PI), _I64(len(idx64)),
        scale32.ctypes.data_as(_PF), out.ctypes.data_as(_PF),
    )
    return out


def gather_rows(packed: np.ndarray, idx: np.ndarray) -> t.Optional[np.ndarray]:
    """Plain rows gather for small trailing fields."""
    cdll = lib()
    src = _as_f32_rows(packed)
    if cdll is None or src is None or packed.ndim < 2:
        return None
    cols = int(np.prod(packed.shape[1:]))
    flat = src.reshape(packed.shape[0], cols)
    if not flat.flags["C_CONTIGUOUS"]:
        return None
    idx64 = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx64),) + packed.shape[1:], np.float32)
    cdll.v1t_gather_rows(
        flat.ctypes.data_as(_PF), _I64(cols),
        idx64.ctypes.data_as(_PI), _I64(len(idx64)),
        out.ctypes.data_as(_PF),
    )
    return out
