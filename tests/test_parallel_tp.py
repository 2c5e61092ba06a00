"""Tensor-parallel (dp x tp) training equivalence.

The reference has no model parallelism (torch.nn.DataParallel only,
asr/train_asr.py:236-242); the TP axis is a TPU-native extension.  Since TP
is pure layout annotation compiled by GSPMD, a (4, 2) data x model mesh must
produce the SAME losses and parameters as the 8-way data-parallel mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emoasr_tpu.parallel.mesh import (
    make_mesh,
    param_partition_specs,
    shard_batch,
)
from emoasr_tpu.train.optim import build_optimizer
from emoasr_tpu.train.step import init_train_state, make_train_step

import __graft_entry__ as graft


@pytest.fixture(scope="module")
def setup():
    from emoasr_tpu.models.asr import ASR

    cfg = graft._flagship_cfg(tiny=True)
    model = ASR(cfg)
    b = graft._example_batch(cfg, B=8, T=64, U=8)
    variables = model.init(
        jax.random.PRNGKey(0),
        b["xs"], b["xlens"], b["ys"], b["ylens"], b["ys_in"], b["ys_out"],
    )
    return cfg, model, b, variables


def _run_steps(cfg, model, b, variables, mesh, n_steps=2):
    tx = build_optimizer(cfg)
    state = init_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step_fn = make_train_step(
        model, cfg, tx, mesh=mesh, params=state.params
    )
    np_batch = {k: np.asarray(v) for k, v in b.items()}
    losses = []
    for i in range(n_steps):
        state, metrics = step_fn(
            state, shard_batch(mesh, np_batch), jax.random.PRNGKey(i)
        )
        losses.append(float(metrics["loss_total"]))
    return losses, jax.device_get(state.params)


def test_tp_specs_cover_megatron_pairs(setup):
    cfg, model, b, variables = setup
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = param_partition_specs(variables["params"], mesh)
    flat = {
        jax.tree_util.keystr(p): s.spec
        for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    enc_ff = [k for k in flat if "feed_forward']['w1']['kernel" in k]
    assert enc_ff and all(flat[k][-1] == "model" for k in enc_ff)
    enc_ff2 = [k for k in flat if "feed_forward']['w2']['kernel" in k]
    assert enc_ff2 and all(flat[k][0] == "model" for k in enc_ff2)
    qkv = [k for k in flat if "linear_q']['kernel" in k]
    assert qkv and all(flat[k][-1] == "model" for k in qkv)
    out = [k for k in flat if "linear_out']['kernel" in k]
    assert out and all(flat[k][0] == "model" for k in out)
    # decoder vocab projection column-parallel; conv subsampler replicated
    assert flat["['decoder']['output']['kernel']"][-1] == "model"
    assert all(
        flat[k] == jax.sharding.PartitionSpec()
        for k in flat
        if "['conv']" in k and "pointwise" not in k
    )


def test_tp_matches_dp(setup):
    cfg, model, b, variables = setup
    dp_mesh = make_mesh((8,), ("data",))
    tp_mesh = make_mesh((4, 2), ("data", "model"))
    dp_losses, dp_params = _run_steps(cfg, model, b, variables, dp_mesh)
    tp_losses, tp_params = _run_steps(cfg, model, b, variables, tp_mesh)
    np.testing.assert_allclose(dp_losses, tp_losses, rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(a, c, atol=2e-4, rtol=2e-3),
        dp_params, tp_params,
    )


def test_tp_state_actually_sharded(setup):
    cfg, model, b, variables = setup
    mesh = make_mesh((4, 2), ("data", "model"))
    tx = build_optimizer(cfg)
    state = init_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step_fn = make_train_step(model, cfg, tx, mesh=mesh, params=state.params)
    np_batch = {k: np.asarray(v) for k, v in b.items()}
    state, _ = step_fn(
        state, shard_batch(mesh, np_batch), jax.random.PRNGKey(0)
    )
    k = state.params["encoder"]["layers_0"]["feed_forward"]["w1"]["kernel"]
    assert k.sharding.spec[-1] == "model"
    # each device holds only 1/tp of the column-parallel kernel
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2
