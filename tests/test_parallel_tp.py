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


def test_lm_bert_tp_matches_dp():
    """BERT LM training with the (data, model) mesh == pure DP; BERT-stack
    naming (query/key/value/attn_output/intermediate/per-layer output) maps
    to the Megatron pairs."""
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.lm.lm import LM
    from emoasr_tpu.train.train_lm import make_lm_train_step

    cfg = config_from_dict(
        dict(
            lm_type="bert", vocab_size=32, hidden_size=32, num_layers=2,
            num_attention_heads=2, intermediate_size=64, max_seq_len=16,
            eos_id=2, mask_id=31, learning_rate=3e-3,
            lr_schedule_type="lindecay", warmup_proportion=0.1,
            weight_decay=0.01, batch_size=8,
        )
    )
    model = LM(cfg)
    rng = np.random.default_rng(0)
    B, L = 8, 12
    ys = rng.integers(3, 30, (B, L)).astype(np.int32)
    # mask half the positions: with a single masked token the gradients are
    # dominated by float-reassociation noise and Adam's first step is
    # ~sign(g)*lr, so DP-vs-TP reduction order would flip signs
    labels = np.full((B, L), -100, np.int32)
    labels[:, ::2] = ys[:, ::2]
    ys_masked = ys.copy()
    ys_masked[:, ::2] = 31
    batch = {
        "ys_in": ys_masked,
        "ylens": np.full((B,), L, np.int32),
        "labels": labels,
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["ys_in"]),
        jnp.asarray(batch["ylens"]), jnp.asarray(batch["labels"]),
    )
    from emoasr_tpu.train.optim import build_optimizer

    tx = build_optimizer(cfg, 100)

    def run(mesh):
        state = init_train_state(variables["params"], {}, tx)
        step_fn = make_lm_train_step(
            model, cfg, tx, 100, mesh, params=state.params
        )
        losses = []
        for i in range(2):
            state, metrics = step_fn(
                state, shard_batch(mesh, batch), jax.random.PRNGKey(i)
            )
            losses.append(float(metrics["loss_total"]))
        return losses, jax.device_get(state.params)

    dp_losses, dp_params = run(make_mesh((8,), ("data",)))
    tp_losses, tp_params = run(make_mesh((4, 2), ("data", "model")))
    np.testing.assert_allclose(dp_losses, tp_losses, rtol=2e-4)
    # the attention `key` bias is mathematically inert (a constant added to
    # every key shifts all logits by the same q.b, which softmax cancels),
    # so its gradient is exact-zero + float noise and Adam's first steps
    # amplify the noise's sign to +-lr; exclude it from the strict compare
    dp_flat = jax.tree_util.tree_flatten_with_path(dp_params)[0]
    tp_flat = jax.tree_util.tree_flatten_with_path(tp_params)[0]
    skipped = []
    for (path, a), (_, c) in zip(dp_flat, tp_flat):
        name = jax.tree_util.keystr(path)
        if "key']['bias" in name:
            skipped.append(name)
            continue
        np.testing.assert_allclose(a, c, atol=2e-4, rtol=2e-3, err_msg=name)
    # pin the carve-out to EXACTLY the per-layer self-attention key biases
    # (one per encoder layer) so a growing exclusion can't hide a layout bug
    import re

    assert len(skipped) == cfg.num_layers, skipped
    assert all(
        re.search(r"layers_\d+'\]\['self_attn'\]\['key'\]\['bias", s)
        for s in skipped
    ), skipped

    # BERT-stack rule coverage: intermediate col-, per-layer output row-
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = param_partition_specs(variables["params"], mesh)
    flat = {
        jax.tree_util.keystr(p): s.spec
        for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    inter = [k for k in flat if "intermediate']['kernel" in k]
    assert inter and all(flat[k][-1] == "model" for k in inter)
    ffn_out = [
        k for k in flat
        if "']['output']['kernel" in k and "layers_" in k
    ]
    assert ffn_out and all(flat[k][0] == "model" for k in ffn_out)
