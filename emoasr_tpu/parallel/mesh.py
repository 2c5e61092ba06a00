"""Device mesh and sharding helpers.

The reference's only parallelism is single-process `torch.nn.DataParallel`
replication (`asr/train_asr.py:236-242`, SURVEY.md §2.4).  The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`: parameters replicated,
batches sharded over the `data` axis, gradient all-reduce compiled by XLA
onto ICI.  The mesh shape is config-driven (`mesh_shape`/`mesh_axes`) so a
model-parallel axis can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axes: Tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    use = int(np.prod(shape))
    return Mesh(np.asarray(devices[:use]).reshape(shape), axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis split over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put array leaves of a batch dict with batch-axis sharding;
    non-array fields (utt_ids, texts) pass through."""
    single = mesh.devices.size == 1
    ds = None if single else data_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v) if single else jax.device_put(v, ds)
        else:
            out[k] = v
    return out
