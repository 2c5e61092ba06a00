"""ctypes bindings for the native runtime components (C++, built by
`sh emoasr_tpu/native/build.sh`).

- `edit_distance_native`: batched Levenshtein with the reference's S/I/D
  backtrace priorities (replaces the Python DP for corpus scoring).
- `load_feat_batch_native`: multithreaded .npy -> padded (B, T, F) float32
  batch assembly (replaces per-utterance np.load in the host input path).

Both degrade gracefully: importers fall back to pure Python/numpy when the
shared library has not been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libemoasr_native.so")
_lib = None
_build_attempted = False


def _ensure_built() -> bool:
    """Build the .so from source if missing (the binary is not tracked in
    git).  Returns True when the library is present afterwards."""
    global _build_attempted
    if os.path.exists(_LIB_PATH):
        return True
    if _build_attempted:
        return False
    _build_attempted = True
    import subprocess

    try:
        subprocess.run(
            ["sh", os.path.join(_DIR, "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is None:
        _ensure_built()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.load_feat_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built()


def _pack(seqs: Sequence[Sequence[int]]):
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.zeros(int(offsets[-1]), np.int32)
    for i, s in enumerate(seqs):
        flat[offsets[i] : offsets[i + 1]] = s
    return flat, offsets


def edit_distance_native(
    hyps: Sequence[Sequence[int]],
    refs: Sequence[Sequence[int]],
    num_threads: int = 0,
) -> np.ndarray:
    """(n, 4) int32 rows [n_sub, n_ins, n_del, n_ref] per pair."""
    lib = _load()
    rflat, roff = _pack(refs)
    hflat, hoff = _pack(hyps)
    out = np.zeros((len(refs), 4), np.int32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.batch_edit_distance(
        rflat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        roff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hflat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(refs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    return out


def load_feat_batch_native(
    paths: List[str], max_rows: int, cols: int, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Padded (B, max_rows, cols) float32 + per-file row counts."""
    lib = _load()
    B = len(paths)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    out = np.zeros((B, max_rows, cols), np.float32)
    lens = np.zeros(B, np.int64)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.load_feat_batch(
        blob, B,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, cols,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads,
    )
    if (lens < 0).any():
        bad = [paths[i] for i in np.flatnonzero(lens < 0)]
        raise IOError(f"native loader failed for: {bad[:3]}...")
    return out, lens
