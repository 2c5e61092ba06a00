"""Encoder parity tests: JAX encoders with imported reference weights must
reproduce the reference's outputs (fixtures from tools/gen_encoder_fixtures.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.encoders import RNNEncoder, TransformerEncoder
from emoasr_tpu.utils import torch_import as ti

FIXDIR = os.path.dirname(os.path.abspath(__file__))

BASE = dict(
    input_layer="conv2d",
    feat_dim=20,
    num_framestacks=1,
    enc_hidden_size=32,
    enc_num_attention_heads=4,
    enc_num_layers=2,
    enc_intermediate_size=64,
    dropout_enc_rate=0.0,
    dropout_attn_rate=0.0,
)


def _load(name):
    fx = np.load(os.path.join(FIXDIR, name))
    return fx, ti.npz_state_dict(fx)


def test_transformer_encoder_parity():
    fx, sd = _load("fixtures_enc_transformer.npz")
    cfg = config_from_dict(dict(BASE, encoder_type="transformer"))
    enc = TransformerEncoder(cfg, is_conformer=False)
    params, _ = ti.transformer_encoder(sd, 2, is_conformer=False)
    eouts, elens, _ = enc.apply(
        {"params": params}, jnp.asarray(fx["xs"]), jnp.asarray(fx["xlens"])
    )
    np.testing.assert_array_equal(np.asarray(elens), fx["elens"])
    # compare only valid frames (reference zeros differ in padding)
    for b, l in enumerate(fx["elens"]):
        np.testing.assert_allclose(
            np.asarray(eouts)[b, :l], fx["eouts"][b, :l], rtol=1e-4, atol=1e-4
        )


def test_conformer_encoder_parity():
    fx, sd = _load("fixtures_enc_conformer.npz")
    cfg = config_from_dict(
        dict(BASE, encoder_type="conformer", pos_encode_type="rel")
    )
    enc = TransformerEncoder(cfg, is_conformer=True)
    params, stats = ti.transformer_encoder(sd, 2, is_conformer=True)
    eouts, elens, _ = enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(fx["xs"]),
        jnp.asarray(fx["xlens"]),
    )
    np.testing.assert_array_equal(np.asarray(elens), fx["elens"])
    for b, l in enumerate(fx["elens"]):
        np.testing.assert_allclose(
            np.asarray(eouts)[b, :l], fx["eouts"][b, :l], rtol=1e-4, atol=1e-4
        )


def test_rnn_encoder_parity():
    fx, sd = _load("fixtures_enc_rnn.npz")
    cfg = config_from_dict(
        dict(
            input_layer="conv2d",
            feat_dim=20,
            num_framestacks=1,
            enc_hidden_size=32,
            enc_num_layers=2,
            dropout_enc_rate=0.0,
            encoder_type="rnn",
        )
    )
    enc = RNNEncoder(cfg)
    params = ti.rnn_encoder(sd, 2)
    eouts, elens, _ = enc.apply(
        {"params": params}, jnp.asarray(fx["xs"]), jnp.asarray(fx["xlens"])
    )
    np.testing.assert_array_equal(np.asarray(elens), fx["elens"])
    for b, l in enumerate(fx["elens"]):
        np.testing.assert_allclose(
            np.asarray(eouts)[b, :l], fx["eouts"][b, :l], rtol=1e-4, atol=1e-4
        )


def test_encoder_init_and_jit():
    """From-scratch init + jitted apply on a bucket shape."""
    cfg = config_from_dict(
        dict(BASE, encoder_type="conformer", pos_encode_type="rel")
    )
    enc = TransformerEncoder(cfg, is_conformer=True)
    xs = jnp.zeros((2, 37, 20))
    xlens = jnp.array([37, 20])
    variables = enc.init(jax.random.PRNGKey(0), xs, xlens)
    fn = jax.jit(lambda v, x, l: enc.apply(v, x, l))
    eouts, elens, _ = fn(variables, xs, xlens)
    assert eouts.shape == (2, 8, 32)
    assert jnp.isfinite(eouts).all()
