"""Checkpoint save / resume / epoch-range averaging (orbax).

Parity targets:
- per-epoch `model.ep{N}` + `optim.ep{N}` under `<run>/checkpoints`
  (`asr/train_asr.py:290-303`, `utils/paths.py:54-78`) — here orbax
  directories with the same names.
- `--resume` finds the latest epoch pair (`utils/paths.py:81-129`).
- post-hoc weight averaging over epoch ranges "91-100" or lists "1+2+5"
  (`utils/average_checkpoints.py:16-52`), triggered lazily at test time.
- warm start from `model_path` (`asr/train_asr.py:215-227`).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from emoasr_tpu.utils.paths import get_model_path


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_model(path: str, params: Any, batch_stats: Any = None) -> None:
    tree = {"params": params}
    if batch_stats:
        tree["batch_stats"] = batch_stats
    _ckptr().save(os.path.abspath(path), tree, force=True)


def load_model(path: str) -> dict:
    """Restore a model checkpoint as host numpy arrays.

    Restoring as numpy is deliberate: a checkpoint saved on one
    platform (e.g. the remote TPU) records device shardings that a
    process on another platform (e.g. a CPU-pinned f32 parity decode)
    cannot materialize — orbax then raises "sharding ... Got None".
    Callers device_put as needed (eval/test_asr.py maps jnp.asarray)."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    meta = ckptr.metadata(path)
    # orbax returns either the metadata tree directly or a StepMetadata
    # wrapper depending on checkpoint layout/version
    tree = getattr(meta, "tree", None)
    if tree is None:
        tree = getattr(meta, "item_metadata", None)
    if tree is None:
        tree = meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
    )


def save_optim(path: str, opt_state: Any, step, epoch_scale, skipped) -> None:
    tree = {
        "opt_state": opt_state,
        "step": np.asarray(step),
        "epoch_scale": np.asarray(epoch_scale),
        "skipped": np.asarray(skipped),
    }
    _ckptr().save(os.path.abspath(path), tree, force=True)


def load_optim(path: str, target_opt_state: Any = None) -> dict:
    if target_opt_state is not None:
        tree = {
            "opt_state": target_opt_state,
            "step": np.asarray(0, np.int32),
            "epoch_scale": np.asarray(1.0, np.float32),
            "skipped": np.asarray(0, np.int32),
        }
        return _ckptr().restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(tree)
        )
    return _ckptr().restore(os.path.abspath(path))


def parse_epochs(ep: str) -> Optional[List[int]]:
    """"91-100" -> range; "1+2+5" -> list; plain ints -> None (no averaging)
    (average_checkpoints.py:19-27)."""
    if "-" in ep:
        a, b = ep.split("-")
        return list(range(int(a), int(b) + 1))
    if "+" in ep:
        return list(map(int, ep.split("+")))
    return None


def model_average(conf_path: str, ep: str) -> Optional[str]:
    """Average `model.ep{N}` over an epoch range; saves `model.ep{ep}`.

    Handles both our orbax checkpoint directories and imported reference
    torch `state_dict` files (`utils/average_checkpoints.py:16-52` averages
    torch pickles; the reference's published WERs come from such averaged
    files, so `-ep 91-100` over imported checkpoints must work too).

    Returns the save path (or None if `ep` is a single epoch)."""
    epochs = parse_epochs(ep)
    if epochs is None:
        return None
    save_path = get_model_path(conf_path, ep)
    if os.path.exists(save_path):
        logging.info(f"checkpoint: {save_path} already exists")
        return save_path

    logging.info(f"average checkpoints... (epochs: {epochs})")
    first = get_model_path(conf_path, epochs[0])
    if os.path.isfile(first):
        return _model_average_torch(conf_path, epochs, save_path)
    avg = None
    for e in epochs:
        tree = load_model(get_model_path(conf_path, e))
        if avg is None:
            avg = tree
        else:
            avg = jax.tree_util.tree_map(lambda a, b: a + b, avg, tree)
    avg = jax.tree_util.tree_map(lambda a: a / len(epochs), avg)
    _ckptr().save(os.path.abspath(save_path), avg, force=True)
    logging.info(f"checkpoints saved to: {save_path}")
    return save_path


def _model_average_torch(conf_path: str, epochs: List[int], save_path: str) -> str:
    """Average torch `state_dict` files in numpy; save a torch file.

    Saving as a torch pickle keeps the averaged checkpoint on the same
    import path as its inputs (`eval/test_asr.py::load_asr_variables`
    dispatches on file-vs-directory). Float tensors are averaged in
    float64 then cast back; integer/bool buffers (e.g. BatchNorm
    `num_batches_tracked`) are taken from the first epoch, matching the
    effective behavior of in-place `+=` integer division in the reference.
    """
    import torch

    avg: dict = {}
    dtypes: dict = {}
    for i, e in enumerate(epochs):
        sd = torch.load(
            get_model_path(conf_path, e), map_location="cpu", weights_only=True
        )
        for k, v in sd.items():
            a = v.numpy()
            if i == 0:
                dtypes[k] = a.dtype
                avg[k] = (
                    a.astype(np.float64)
                    if np.issubdtype(a.dtype, np.floating)
                    else a
                )
            elif np.issubdtype(dtypes[k], np.floating):
                avg[k] = avg[k] + a.astype(np.float64)
    out = {}
    for k, a in avg.items():
        if np.issubdtype(dtypes[k], np.floating):
            a = (a / len(epochs)).astype(dtypes[k])
        out[k] = torch.from_numpy(np.ascontiguousarray(a))
    torch.save(out, save_path)
    logging.info(f"checkpoints saved to: {save_path}")
    return save_path


def resolve_model_checkpoint(conf_path: str, ep: str) -> str:
    """Path for `-ep`, averaging lazily when a range is requested
    (test_asr.py:170-172)."""
    path = get_model_path(conf_path, ep)
    if not os.path.exists(path) and parse_epochs(ep) is not None:
        model_average(conf_path, ep)
    return path
