"""Gradient-accumulation x tensor-parallel training and multi-device
decode under the 8-device CPU mesh (VERDICT r1: accum x TP and mesh decode
were not exercised anywhere).

- accum_grad=2 on the (4 data x 2 model) mesh must equal accum_grad=2 on
  pure DP (8,) — and both must equal a single full-batch step (MultiSteps
  averages micro-grads; LR counting is per optimizer update,
  `train/step.py` opt_step = ceil(step/accum)).
- batched beam decode with data-sharded inputs under the mesh must equal
  the single-device decode bit-for-bit (same program, GSPMD partitioned).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.parallel.mesh import make_mesh, shard_batch
from emoasr_tpu.train.optim import build_optimizer
from emoasr_tpu.train.step import init_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(**kw):
    base = dict(
        encoder_type="transformer", decoder_type="ctc", input_layer="linear",
        feat_dim=8, enc_hidden_size=16, enc_num_attention_heads=2,
        enc_num_layers=2, enc_intermediate_size=32, vocab_size=12,
        dropout_enc_rate=0.0, dropout_attn_rate=0.0, spec_augment=False,
        learning_rate=3e-2, lr_schedule_type="noam", num_warmup_steps=100,
        clip_grad_norm=0.0,
    )
    base.update(kw)
    return config_from_dict(base)


def _batch(cfg, B, T=16, U=4, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(B, T, cfg.feat_dim)).astype(np.float32)
    ys = rng.integers(3, cfg.vocab_size, (B, U)).astype(np.int32)
    ys_in = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_in[:, 1:] = ys
    ys_out = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_out[:, :U] = ys
    return dict(
        xs=xs, xlens=np.full((B,), T, np.int32), ys=ys,
        ylens=np.full((B,), U, np.int32), ys_in=ys_in, ys_out=ys_out,
    )


def test_accum_grad_dp_tp_and_full_batch_agree():
    cfg = _cfg(accum_grad=2)
    model = ASR(cfg)
    full = _batch(cfg, B=16)
    micro = [
        {k: v[:8] for k, v in full.items()},
        {k: v[8:] for k, v in full.items()},
    ]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(full["xs"]), jnp.asarray(full["xlens"]),
        jnp.asarray(full["ys"]), jnp.asarray(full["ylens"]),
        jnp.asarray(full["ys_in"]), jnp.asarray(full["ys_out"]),
    )

    def run_accum(mesh):
        tx = build_optimizer(cfg)
        state = init_train_state(variables["params"], {}, tx)
        step = make_train_step(model, cfg, tx, mesh=mesh, params=state.params)
        lrs = []
        for i, mb in enumerate(micro):
            state, metrics = step(
                state, shard_batch(mesh, mb), jax.random.PRNGKey(9)
            )
            lrs.append(float(metrics["lr"]))
        return jax.device_get(state.params), lrs

    dp_params, dp_lrs = run_accum(make_mesh((8,), ("data",)))
    tp_params, tp_lrs = run_accum(make_mesh((4, 2), ("data", "model")))
    # both micro-steps belong to optimizer update #1 -> identical LR
    assert dp_lrs[0] == dp_lrs[1] == tp_lrs[0] == tp_lrs[1]

    flat_dp = jax.tree_util.tree_flatten_with_path(dp_params)[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(tp_params)[0]
    for (path, a), (_, b) in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            a, b, atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )

    # accum over 2 half-batches == 1 step on the full batch (loss is
    # batch-mean; MultiSteps averages micro-grads)
    cfg1 = _cfg(accum_grad=1)
    tx1 = build_optimizer(cfg1)
    state1 = init_train_state(variables["params"], {}, tx1)
    step1 = make_train_step(model, cfg1, tx1)
    state1, _ = step1(state1, full, jax.random.PRNGKey(9))
    flat_full = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state1.params)
    )[0]
    for (path, a), (_, b) in zip(flat_dp, flat_full):
        np.testing.assert_allclose(
            a, b, atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("decoder,beam", [("ctc", 4), ("transformer", 3)])
def test_mesh_decode_matches_single_device(decoder, beam):
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.parallel.mesh import data_sharding

    kw = {}
    if decoder == "transformer":
        kw = dict(
            dec_hidden_size=16, dec_num_attention_heads=2, dec_num_layers=1,
            dec_intermediate_size=32, max_decode_ylen=6,
        )
    cfg = _cfg(decoder_type=decoder, **kw)
    model = ASR(cfg)
    b = _batch(cfg, B=8, T=16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]), jnp.asarray(b["ys"]),
        jnp.asarray(b["ylens"]), jnp.asarray(b["ys_in"]),
        jnp.asarray(b["ys_out"]),
    )
    dec = build_decode_fn(model, variables, cfg, beam_width=beam)

    single = dec(jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]))

    mesh = make_mesh((8,), ("data",))
    ds = data_sharding(mesh)
    xs_sh = jax.device_put(b["xs"], ds)
    xlens_sh = jax.device_put(b["xlens"], ds)
    sharded = dec(xs_sh, xlens_sh)

    for a, b_, name in zip(single, sharded, ("hyps", "lens", "scores")):
        if name == "scores":
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
            )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
