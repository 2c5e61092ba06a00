"""Small token/array conversion helpers (numpy-based, torch-free).

Parity target: `/root/reference/utils/converters.py:5-48`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def str2ints(s: str) -> List[int]:
    return list(map(int, s.split()))


def str2floats(s: str) -> List[float]:
    return list(map(float, s.split()))


def ints2str(ints: Sequence[int]) -> str:
    return " ".join(map(str, ints))


def get_utt_id_nosp(utt_id: str) -> str:
    """Strip a speed-perturbation prefix (`sp0.9-`, `sp1.0-`, `sp1.1-`)."""
    if utt_id.startswith(("sp0.9", "sp1.0", "sp1.1")):
        return "-".join(utt_id.split("-")[1:])
    return utt_id


def strip_eos(tokens: Sequence[int], eos_id: int) -> List[int]:
    return [t for t in tokens if t != eos_id]


def pad_to(arr: np.ndarray, length: int, value=0) -> np.ndarray:
    """Pad axis-0 of `arr` up to `length` with `value` (static-shape helper)."""
    if arr.shape[0] >= length:
        return arr[:length]
    pad = [(0, length - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=value)


def add_sos_eos_np(
    ys: np.ndarray, ylens: np.ndarray, eos_id: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Frame targets with <sos>=<eos> on both sides, padding with eos.

    ys: (B, U) int array padded with anything beyond ylens.
    Returns (B, U+2) framed array and ylens+2, matching
    `utils/converters.py:33-40`.
    """
    B, U = ys.shape
    out = np.full((B, U + 2), eos_id, dtype=ys.dtype)
    out[:, 0] = eos_id
    for b in range(B):
        n = int(ylens[b])
        out[b, 1 : 1 + n] = ys[b, :n]
        out[b, 1 + n] = eos_id
    return out, ylens + 2
