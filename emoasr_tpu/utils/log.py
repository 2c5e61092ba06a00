"""Logging helpers.

Parity target: `/root/reference/utils/log.py` — result TSVs self-document by
carrying their WER line as a leading ``#`` comment, plus provenance logging
like `asr/train_asr.py:205-212`.
"""

from __future__ import annotations

import logging
import os
import socket
import subprocess
import sys


def insert_comment(file_path: str, comment: str) -> None:
    with open(file_path) as f:
        lines = f.readlines()
    if lines and lines[0] == f"# {comment}\n":
        return
    lines.insert(0, f"# {comment}\n")
    lines.insert(1, "#\n")
    with open(file_path, "w") as f:
        f.writelines(lines)


def setup_logging(log_path: str | None = None, level=logging.INFO) -> None:
    handlers = [logging.StreamHandler(sys.stderr)]
    if log_path:
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
        handlers.append(logging.FileHandler(log_path))
    logging.basicConfig(
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        level=level,
        handlers=handlers,
        force=True,
    )


def print_topk_probs(probs, vocab, k: int = 5) -> None:
    """Debug printer: per-position top-k tokens and probs (log.py:36-45)."""
    import numpy as np

    for prob in np.asarray(probs):
        order = np.argsort(-prob)[:k]
        print(
            " | ".join(f"{vocab.i2t[int(v)]}: {prob[v]:.3f}" for v in order)
        )


def log_provenance() -> None:
    """Log host/devices/pid/commit, mirroring train_asr.py:205-212."""
    import jax

    logging.info(f"host: {socket.gethostname()} pid: {os.getpid()}")
    try:
        logging.info(f"jax devices: {jax.devices()}")
    except Exception as e:  # pragma: no cover
        logging.info(f"jax devices unavailable: {e}")
    try:
        commit = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=os.path.dirname(__file__), text=True
        ).strip()
        logging.info(f"commit: {commit}")
    except Exception:
        pass
