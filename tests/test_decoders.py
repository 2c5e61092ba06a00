"""Decoder tests: reference-parity fixtures (Transformer/LAS) and
functional checks for all decoder heads through the ASR facade."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.models.decoders.transformer import TransformerDecoder
from emoasr_tpu.models.decoders.las import LASDecoder
from emoasr_tpu.utils import torch_import as ti

FIXDIR = os.path.dirname(os.path.abspath(__file__))

DEC_BASE = dict(
    vocab_size=30,
    dec_hidden_size=32,
    dec_num_attention_heads=4,
    dec_num_layers=2,
    dec_intermediate_size=64,
    dropout_dec_rate=0.0,
    dropout_attn_rate=0.0,
    lsm_prob=0.1,
    enc_hidden_size=32,
)


def test_transformer_decoder_parity():
    fx = np.load(os.path.join(FIXDIR, "fixtures_dec_transformer.npz"))
    sd = ti.npz_state_dict(fx)
    cfg = config_from_dict(dict(DEC_BASE, decoder_type="transformer"))
    dec = TransformerDecoder(cfg)
    params = ti.transformer_decoder(sd, 2)
    loss, loss_dict, logits = dec.apply(
        {"params": params},
        jnp.asarray(fx["eouts"]), jnp.asarray(fx["elens"]), None,
        jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"]),
        jnp.asarray(fx["ys_in"]), jnp.asarray(fx["ys_out"]),
    )
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-4)
    # valid positions of logits match
    for b, l in enumerate(fx["ylens"] + 1):
        np.testing.assert_allclose(
            np.asarray(logits)[b, :l], fx["logits"][b, :l], rtol=1e-4, atol=1e-4
        )
    # one-step forward parity (beam-search building block)
    U1 = fx["ys_in"].shape[1]
    one = dec.apply(
        {"params": params},
        jnp.asarray(fx["ys_in"]), jnp.full((3,), U1, jnp.int32),
        jnp.asarray(fx["eouts"]),
        method=TransformerDecoder.forward_one_step,
    )
    np.testing.assert_allclose(
        np.asarray(one), fx["logits_one"], rtol=1e-4, atol=1e-4
    )


def test_las_decoder_parity():
    fx = np.load(os.path.join(FIXDIR, "fixtures_dec_las.npz"))
    sd = ti.npz_state_dict(fx)
    cfg = config_from_dict(
        dict(DEC_BASE, decoder_type="las", embedding_size=24)
    )
    dec = LASDecoder(cfg, attn_dim=20)
    params = ti.las_decoder(sd, 2)
    loss, loss_dict, logits = dec.apply(
        {"params": params},
        jnp.asarray(fx["eouts"]), jnp.asarray(fx["elens"]), None,
        jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"]),
        jnp.asarray(fx["ys_in"]), jnp.asarray(fx["ys_out"]),
    )
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-4)
    for b, l in enumerate(fx["ylens"] + 1):
        np.testing.assert_allclose(
            np.asarray(logits)[b, :l], fx["logits"][b, :l], rtol=1e-3, atol=1e-4
        )


def _toy_batch(rng, V=30, B=2, T=33, F=20, U=5):
    xs = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    xlens = jnp.array([T, T - 12])
    ys = jnp.asarray(rng.integers(3, V, size=(B, U)))
    ylens = jnp.array([U, U - 2])
    ys_in = jnp.full((B, U + 1), 2, jnp.int32)
    ys_out = jnp.full((B, U + 1), 2, jnp.int32)
    ys_in = ys_in.at[:, 1:].set(ys)
    ys_out = ys_out.at[:, :U].set(ys)
    return xs, xlens, ys, ylens, ys_in, ys_out


@pytest.mark.parametrize(
    "decoder_type", ["ctc", "rnn_transducer", "transformer", "las"]
)
def test_asr_facade_train_step(decoder_type):
    rng = np.random.default_rng(0)
    cfg = config_from_dict(
        dict(
            DEC_BASE,
            encoder_type="transformer",
            decoder_type=decoder_type,
            input_layer="conv2d",
            feat_dim=20,
            enc_hidden_size=32,
            enc_num_attention_heads=4,
            enc_num_layers=2,
            enc_intermediate_size=64,
            embedding_size=24,
            joint_hidden_size=32,
            mtl_ctc_weight=0.3 if decoder_type == "transformer" else 0.0,
            max_decode_ylen=16,
        )
    )
    model = ASR(cfg)
    xs, xlens, ys, ylens, ys_in, ys_out = _toy_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), xs, xlens, ys, ylens, ys_in, ys_out
    )

    def loss_fn(params):
        loss, loss_dict = model.apply(
            {"params": params}, xs, xlens, ys, ylens, ys_in, ys_out
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)), decoder_type
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.parametrize("decoder_type", ["ctc", "rnn_transducer"])
def test_asr_greedy_decode(decoder_type):
    rng = np.random.default_rng(1)
    cfg = config_from_dict(
        dict(
            DEC_BASE,
            encoder_type="transformer",
            decoder_type=decoder_type,
            input_layer="conv2d",
            feat_dim=20,
            enc_num_attention_heads=4,
            enc_num_layers=1,
            enc_intermediate_size=64,
            embedding_size=24,
            joint_hidden_size=32,
            max_decode_ylen=16,
        )
    )
    model = ASR(cfg)
    xs, xlens, ys, ylens, ys_in, ys_out = _toy_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), xs, xlens, ys, ylens, ys_in, ys_out
    )
    hyps, hyp_lens, _, aligns = jax.jit(
        lambda v, x, l: model.apply(v, x, l, method=ASR.decode_greedy)
    )(variables, xs, xlens)
    assert hyps.shape[0] == 2
    assert (hyp_lens >= 0).all()
    # no blanks inside the valid hyp region
    for b in range(2):
        h = np.asarray(hyps)[b, : int(hyp_lens[b])]
        assert (h != cfg.blank_id).all()


def test_ctc_greedy_collapse_semantics():
    from emoasr_tpu.models.decoders.ctc import greedy_collapse

    paths = jnp.array([[0, 1, 1, 0, 2, 2, 2, 0], [3, 3, 0, 3, 0, 0, 4, 4]])
    elens = jnp.array([8, 6])
    hyps, lens = greedy_collapse(paths, elens, blank_id=0)
    assert lens.tolist() == [2, 2]
    assert np.asarray(hyps)[0, :2].tolist() == [1, 2]
    assert np.asarray(hyps)[1, :2].tolist() == [3, 3]  # blank-separated repeat


def test_las_greedy_decode():
    from emoasr_tpu.models.decoders.las import LASDecoder

    cfg = config_from_dict(
        dict(DEC_BASE, decoder_type="las", embedding_size=24, max_decode_ylen=8)
    )
    dec = LASDecoder(cfg, attn_dim=20)
    rng = np.random.default_rng(9)
    eouts = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    elens = jnp.asarray([10, 7])
    ys = jnp.asarray(rng.integers(3, 30, (2, 4)))
    ys_in = jnp.pad(ys, ((0, 0), (1, 0)), constant_values=2)
    ys_out = jnp.pad(ys, ((0, 0), (0, 1)), constant_values=2)
    v = dec.init(
        jax.random.PRNGKey(0), eouts, elens, None, ys, jnp.asarray([4, 3]),
        ys_in, ys_out,
    )
    hyps, lens = jax.jit(
        lambda v, e, l: dec.apply(v, e, l, method=LASDecoder.decode_greedy)
    )(v, eouts, elens)
    assert hyps.shape == (2, 8)
    assert (np.asarray(lens) <= 8).all()
    # greedy on an untrained model still terminates and emits no eos tokens
    for b in range(2):
        h = np.asarray(hyps)[b, : int(lens[b])]
        assert (h != 2).all()
