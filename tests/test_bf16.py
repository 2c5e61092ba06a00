"""Mixed-precision (compute_dtype: bfloat16) policy tests.

The reference trains implicitly in float32 (`asr/train_asr.py:35-98`); the
TPU rebuild adds a jmp-style policy (utils/precision.py): f32 master params,
bf16 forward activations, f32 softmax/losses/norm stats.  These tests pin:

- one bf16 train step stays numerically close to the f32 step,
- master params / optimizer moments remain float32,
- a full bf16 train->decode round trip still overfits (loss-curve
  equivalence at the acceptance level), through the real CLI paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from emoasr_tpu.config import config_from_dict


def _tiny_cfg(**kw):
    base = dict(
        encoder_type="transformer",
        decoder_type="ctc",
        input_layer="linear",
        feat_dim=16,
        enc_hidden_size=32,
        enc_num_attention_heads=2,
        enc_num_layers=2,
        enc_intermediate_size=64,
        vocab_size=16,
        dropout_enc_rate=0.0,
        dropout_attn_rate=0.0,
        learning_rate=1.0,
        lr_schedule_type="noam",
        num_warmup_steps=100,
        spec_augment=False,
    )
    base.update(kw)
    return config_from_dict(base)


def _batch(cfg, B=4, T=32, U=6, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(B, T, cfg.feat_dim)).astype(np.float32)
    xlens = np.full((B,), T, np.int32)
    ys = rng.integers(3, cfg.vocab_size, size=(B, U)).astype(np.int32)
    ylens = np.full((B,), U, np.int32)
    ys_in = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_in[:, 1:] = ys
    ys_out = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_out[:, :U] = ys
    return dict(xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in,
                ys_out=ys_out)


def _one_step(cfg):
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    model = ASR(cfg)
    b = _batch(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]), jnp.asarray(b["ys"]),
        jnp.asarray(b["ylens"]), jnp.asarray(b["ys_in"]),
        jnp.asarray(b["ys_out"]),
    )
    tx = build_optimizer(cfg)
    state = init_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step = make_train_step(model, cfg, tx)
    state, metrics = step(state, b, jax.random.PRNGKey(1))
    return state, metrics


def test_bf16_step_close_to_f32_and_masters_stay_f32():
    s32, m32 = _one_step(_tiny_cfg(compute_dtype="float32"))
    s16, m16 = _one_step(_tiny_cfg(compute_dtype="bfloat16"))
    l32, l16 = float(m32["loss_total"]), float(m16["loss_total"])
    assert np.isfinite(l16)
    # bf16 has ~3 decimal digits; forward loss must agree to ~1%
    assert abs(l16 - l32) / abs(l32) < 0.02, (l32, l16)

    # master params and Adam moments stay float32 under the half policy
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(s16.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype

    # and the update actually moved the params (grads flowed through cast)
    d32 = jax.tree_util.tree_leaves(s32.params)[0]
    d16 = jax.tree_util.tree_leaves(s16.params)[0]
    assert np.isfinite(np.asarray(d16)).all()
    np.testing.assert_allclose(
        np.asarray(d16), np.asarray(d32), atol=5e-3, rtol=0.3
    )


def test_bf16_encoder_activations_are_bf16():
    """The forward pass really runs in bf16 (not silently promoted)."""
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.utils.precision import cast_floating

    cfg = _tiny_cfg(compute_dtype="bfloat16")
    model = ASR(cfg)
    b = _batch(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]), jnp.asarray(b["ys"]),
        jnp.asarray(b["ylens"]), jnp.asarray(b["ys_in"]),
        jnp.asarray(b["ys_out"]),
    )
    vars16 = cast_floating(variables, jnp.bfloat16)
    eouts, _, _ = model.apply(
        vars16, jnp.asarray(b["xs"], jnp.bfloat16), jnp.asarray(b["xlens"]),
        method=ASR.encode,
    )
    assert eouts.dtype == jnp.bfloat16


def test_bf16_overfit_train_and_decode(tmp_path):
    """Full bf16 round trip via the real CLIs: train -> checkpoint ->
    batched greedy decode -> WER collapses like the f32 overfit test."""
    from emoasr_tpu.eval.test_asr import build_argparser
    from emoasr_tpu.eval.test_asr import test_main as run_test_main
    from emoasr_tpu.train.loop import train
    from tests.test_e2e_overfit import _make_corpus

    tsv, vocab = _make_corpus(tmp_path, n_utts=16)
    conf = dict(
        encoder_type="transformer",
        decoder_type="ctc",
        input_layer="linear",
        feat_dim=16,
        enc_hidden_size=32,
        enc_num_attention_heads=2,
        enc_num_layers=1,
        enc_intermediate_size=64,
        vocab_size=12,
        vocab_path=vocab,
        train_path=tsv,
        test_path=tsv,
        buckets=[[32, 8]],
        batch_size=8,
        max_xlens_batch=512,
        max_ylens_batch=64,
        num_epochs=60,
        learning_rate=5.0,
        lr_schedule_type="noam",
        num_warmup_steps=60,
        dropout_enc_rate=0.0,
        dropout_attn_rate=0.0,
        spec_augment=False,
        clip_grad_norm=5.0,
        log_step=50,
        save_step=60,
        seed=0,
        compute_dtype="bfloat16",
    )
    conf_path = tmp_path / "overfit_bf16.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    state = train(str(conf_path))
    assert int(state.step) > 0

    args = build_argparser().parse_args(
        ["-conf", str(conf_path), "-ep", "60", "--beam_width", "0"]
    )
    out = run_test_main(args)
    assert out is not None
    wer = out[2]
    assert wer < 15.0, out[3]
