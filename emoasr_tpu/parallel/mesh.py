"""Device mesh and sharding helpers.

The reference's only parallelism is single-process `torch.nn.DataParallel`
replication (`asr/train_asr.py:236-242`, SURVEY.md §2.4).  The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`: batches sharded over the
`data` axis with the gradient all-reduce compiled by XLA onto ICI, and —
beyond the reference — an optional Megatron-style tensor-parallel `model`
axis (`param_partition_specs` below).  The mesh shape is config-driven
(`mesh_shape`/`mesh_axes`).
"""

from __future__ import annotations

from typing import Tuple

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
    if use > n:
        raise ValueError(
            f"mesh_shape {tuple(shape)} ({axes}) needs {use} devices, "
            f"only {n} available: {devices}"
        )
    return Mesh(np.asarray(devices[:use]).reshape(shape), axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis split over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor parallelism (Megatron-style, GSPMD-compiled)
# ---------------------------------------------------------------------------
#
# The reference has no model parallelism (SURVEY.md §2.4); this is the
# TPU-native extension for models that outgrow one chip.  We only ANNOTATE
# parameter layouts over the mesh's "model" axis — XLA GSPMD propagates the
# shardings through the computation and inserts the all-reduces on ICI
# (column-parallel first FFN/QKV matmul, row-parallel second/out matmul, the
# canonical Megatron pairing).  Anything un-matched (LayerNorm, convs,
# LSTMs, biases of row-parallel layers) stays replicated.

_COL_PARALLEL = (
    "w1", "linear_q", "linear_k", "linear_v", "linear_pos",
    "query", "key", "value", "intermediate",  # BERT-stack naming
)
_ROW_PARALLEL = ("w2", "linear_out", "attn_output")


def _tp_spec(name: str, shape, tp: int):
    """PartitionSpec for one param, by flax module-path substring.

    `name` is the joined key path (e.g. "encoder/layers_0/feed_forward/w1/
    kernel").  A dim is only sharded when divisible by the model-axis size;
    otherwise that param stays replicated."""
    parts = name.split("/")
    module = parts[-2] if len(parts) >= 2 else ""
    leafname = parts[-1]

    def ok(d):
        return shape[d] % tp == 0

    if leafname == "embedding" and len(shape) == 2 and ok(0):
        return P("model", None)  # vocab-dim sharded embedding table
    grandparent = parts[-3] if len(parts) >= 3 else ""
    if module == "output" and grandparent.startswith("layers"):
        # BERT-stack per-layer FFN down-projection: row-parallel
        if leafname == "kernel" and ok(0):
            return P(*(["model"] + [None] * (len(shape) - 1)))
        return P()
    if module in _COL_PARALLEL or (
        module == "output" and grandparent != "conv"
    ):
        # column-parallel: shard the output features (last dim)
        if leafname == "kernel" and ok(len(shape) - 1):
            return P(*([None] * (len(shape) - 1) + ["model"]))
        if leafname == "bias" and ok(0):
            return P("model")
    if module in _ROW_PARALLEL:
        # row-parallel: shard the input features (first dim); bias replicated
        if leafname == "kernel" and ok(0):
            return P(*(["model"] + [None] * (len(shape) - 1)))
    return P()


def param_partition_specs(params, mesh: Mesh):
    """Tree of NamedShardings mirroring `params` for the mesh's model axis.

    With no model axis (or model=1) everything is replicated — callers can
    use this unconditionally."""
    from jax.tree_util import keystr, tree_map_with_path

    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params
        )
    tp = mesh.shape["model"]

    def f(path, leaf):
        name = keystr(path).replace("']['", "/").strip("'[]")
        return NamedSharding(mesh, _tp_spec(name, leaf.shape, tp))

    return tree_map_with_path(f, params)


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
