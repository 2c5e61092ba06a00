"""Fused Pallas decoder-step kernel == dense decode_step.

The kernel (ops/decoder_step_pallas.py) runs an entire pre-norm decoder
layer step (LN1 -> QKV -> cached self-attn -> +res -> LN2 -> beam-shared
cross-attn -> +res -> LN3 -> FF -> +res) in one program; these tests pin
it element-wise to `TransformerDecoderLayer.decode_step` (the dense
~25-op path) and hyp-for-hyp through the real attention beam search
(`build_decode_fn` with cfg.dec_step_mode).  Interpret mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emoasr_tpu.ops.decoder_step_pallas as dsp
from emoasr_tpu.models.layers import TransformerDecoderLayer, make_pad_mask


def _layer_and_inputs(rng, dtype, H=4, D=64, F=128, Bu=3, W=5, Lmax=16,
                      T=37):
    dk = D // H
    N = Bu * W
    layer = TransformerDecoderLayer(
        num_heads=H, hidden_size=D, intermediate_size=F,
        dropout_rate=0.0, dropout_attn_rate=0.0,
    )
    x0 = jnp.asarray(rng.normal(size=(2, 4, D)).astype(np.float32))
    mem0 = jnp.asarray(rng.normal(size=(2, T, D)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x0, None, mem0, None, True)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t
    )
    variables = cast(variables)
    arr = lambda *s: jnp.asarray(
        rng.normal(size=s).astype(np.float32)
    ).astype(dtype)
    inputs = dict(
        h=arr(N, 1, D),
        ck=arr(N, Lmax, H, dk),
        cv=arr(N, Lmax, H, dk),
        pos=jnp.asarray(rng.integers(0, Lmax, size=(N,)), dtype=jnp.int32),
        memory=arr(Bu, T, D),
        elens=jnp.asarray(
            rng.integers(3, T + 1, size=(Bu,)), dtype=jnp.int32
        ),
    )
    return layer, variables, inputs, (Bu, W, Lmax, T, N)


def _run_both(layer, variables, inp, W, Lmax, T, N):
    emask = make_pad_mask(inp["elens"], T)[:, None, None, :]
    self_mask = (
        jnp.arange(Lmax)[None, :] <= inp["pos"][:, None]
    )[:, None, None, :]
    cross_kv = layer.apply(
        variables, inp["memory"],
        method=TransformerDecoderLayer.compute_cross_kv,
    )
    y_d, ck_d, cv_d = layer.apply(
        variables, inp["h"], inp["ck"], inp["cv"], inp["pos"], self_mask,
        emask, cross_kv, W, method=TransformerDecoderLayer.decode_step,
    )
    y_f, ck_f, cv_f = layer.apply(
        variables, inp["h"], inp["ck"], inp["cv"], inp["pos"], self_mask,
        emask, cross_kv, W, True, inp["elens"],
        method=TransformerDecoderLayer.decode_step,
    )
    return (y_d, ck_d, cv_d), (y_f, ck_f, cv_f)


@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 5e-6), (jnp.bfloat16, 0.06)]
)
def test_layer_step_parity(dtype, tol):
    rng = np.random.default_rng(0)
    layer, variables, inp, (Bu, W, Lmax, T, N) = _layer_and_inputs(
        rng, dtype
    )
    dense, fused = _run_both(layer, variables, inp, W, Lmax, T, N)
    for d, f in zip(dense, fused):
        err = float(
            jnp.max(jnp.abs(d.astype(jnp.float32) - f.astype(jnp.float32)))
        )
        assert err < tol, err


def test_layer_step_parity_multiblock(monkeypatch):
    """A tiny VMEM budget forces u_block < Bu: multi-program grid plus
    utterance padding must not change the result."""
    monkeypatch.setattr(dsp, "_VMEM_BUDGET", 40_000)
    rng = np.random.default_rng(1)
    layer, variables, inp, (Bu, W, Lmax, T, N) = _layer_and_inputs(
        rng, jnp.float32, Bu=5, W=3
    )
    dense, fused = _run_both(layer, variables, inp, W, Lmax, T, N)
    for d, f in zip(dense, fused):
        assert float(jnp.max(jnp.abs(d - f))) < 5e-6


def test_attention_beam_fused_matches_dense():
    """Full search parity: cfg.dec_step_mode='fused' produces the same
    hyps (and near-identical scores) as 'dense' through the real
    build_decode_fn attention-beam path, joint CTC weight included."""
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR

    rng = np.random.default_rng(2)
    base = dict(
        encoder_type="transformer", decoder_type="transformer",
        input_layer="conv2d", feat_dim=16, enc_hidden_size=32,
        enc_num_attention_heads=2, enc_num_layers=2,
        enc_intermediate_size=64, dec_hidden_size=32,
        dec_num_attention_heads=2, dec_num_layers=2,
        dec_intermediate_size=64, vocab_size=40, mtl_ctc_weight=0.3,
        max_decode_ylen=10, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
        dropout_dec_rate=0.0,
    )
    B, T = 3, 50
    xs = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    xlens = jnp.asarray([50, 41, 33], jnp.int32)

    cfg_d = config_from_dict(dict(base, dec_step_mode="dense"))
    model = ASR(cfg_d)
    variables = model.init(
        jax.random.PRNGKey(3), xs, xlens, jnp.ones((B, 4), jnp.int32),
        jnp.full((B,), 4), jnp.ones((B, 5), jnp.int32),
        jnp.ones((B, 5), jnp.int32),
    )
    outs = {}
    for mode in ("dense", "fused", "indirect", "fused_indirect"):
        cfg = config_from_dict(dict(base, dec_step_mode=mode))
        dec = build_decode_fn(
            ASR(cfg), variables, cfg, beam_width=4, len_weight=0.5,
            decode_ctc_weight=0.3,
        )
        outs[mode] = dec(xs, xlens)
    hyps_d, lens_d, scores_d = outs["dense"]
    for mode in ("fused", "indirect", "fused_indirect"):
        hyps_f, lens_f, scores_f = outs[mode]
        np.testing.assert_array_equal(
            np.asarray(lens_d), np.asarray(lens_f), err_msg=mode
        )
        np.testing.assert_array_equal(
            np.asarray(hyps_d), np.asarray(hyps_f), err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(scores_d), np.asarray(scores_f), rtol=1e-4,
            atol=1e-4, err_msg=mode,
        )


def test_fused_indirect_multiblock(monkeypatch):
    """fused_indirect search parity under a tiny VMEM budget (forces a
    multi-program utterance grid with padding)."""
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR

    monkeypatch.setattr(dsp, "_VMEM_BUDGET", 60_000)
    rng = np.random.default_rng(7)
    base = dict(
        encoder_type="transformer", decoder_type="transformer",
        input_layer="conv2d", feat_dim=16, enc_hidden_size=32,
        enc_num_attention_heads=2, enc_num_layers=1,
        enc_intermediate_size=64, dec_hidden_size=32,
        dec_num_attention_heads=2, dec_num_layers=2,
        dec_intermediate_size=64, vocab_size=40, mtl_ctc_weight=0.3,
        max_decode_ylen=8, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
        dropout_dec_rate=0.0,
    )
    B, T = 3, 40
    xs = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    xlens = jnp.asarray([40, 29, 33], jnp.int32)
    cfg_i = config_from_dict(dict(base, dec_step_mode="indirect"))
    model = ASR(cfg_i)
    variables = model.init(
        jax.random.PRNGKey(5), xs, xlens, jnp.ones((B, 4), jnp.int32),
        jnp.full((B,), 4), jnp.ones((B, 5), jnp.int32),
        jnp.ones((B, 5), jnp.int32),
    )
    outs = {}
    for mode in ("indirect", "fused_indirect"):
        cfg = config_from_dict(dict(base, dec_step_mode=mode))
        dec = build_decode_fn(
            ASR(cfg), variables, cfg, beam_width=3, len_weight=0.4,
        )
        outs[mode] = dec(xs, xlens)
    np.testing.assert_array_equal(
        np.asarray(outs["indirect"][0]), np.asarray(outs["fused_indirect"][0])
    )
    np.testing.assert_allclose(
        np.asarray(outs["indirect"][2]),
        np.asarray(outs["fused_indirect"][2]), rtol=1e-4, atol=1e-4,
    )
