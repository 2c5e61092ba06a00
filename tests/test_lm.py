"""LM suite tests: reference-parity fixtures (TransformerLM / BERT / RNNLM /
ELECTRA) plus functional train-step checks for ELECTRA / P-ELECTRA / P2W."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.lm.lm import (
    BERTMaskedLM,
    ELECTRAModel,
    LM,
    P2W,
    PELECTRAModel,
    RNNLM,
    TransformerLM,
)
from emoasr_tpu.utils import torch_import as ti

FIXDIR = os.path.dirname(os.path.abspath(__file__))

BASE = dict(
    vocab_size=40,
    hidden_size=32,
    num_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_seq_len=24,
    mask_id=39,
)


def _load(name):
    fx = np.load(os.path.join(FIXDIR, name))
    return fx, ti.npz_state_dict(fx)


def test_transformer_lm_parity():
    fx, sd = _load("fixtures_lm_transformer.npz")
    cfg = config_from_dict(dict(BASE, lm_type="transformer"))
    m = TransformerLM(cfg)
    params = ti.bert_masked_lm(sd, 2, "transformer.")
    ys, ylens = jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"])

    logits = m.apply({"params": params}, ys, ylens)
    for b, l in enumerate(fx["ylens"]):
        np.testing.assert_allclose(
            np.asarray(logits)[b, :l], fx["logits"][b, :l], rtol=1e-4, atol=1e-4
        )
    loss, _ = m.apply({"params": params}, ys, ylens, jnp.asarray(fx["labels"]))
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-4)

    scores = m.apply({"params": params}, ys, ylens, method=TransformerLM.score)
    np.testing.assert_allclose(np.asarray(scores), fx["scores"], rtol=1e-4)

    preds, _ = m.apply(
        {"params": params}, ys, ylens, method=TransformerLM.predict
    )
    np.testing.assert_allclose(np.asarray(preds), fx["preds"], rtol=1e-3, atol=1e-5)


def test_bert_lm_parity():
    fx, sd = _load("fixtures_lm_bert.npz")
    cfg = config_from_dict(dict(BASE, lm_type="bert"))
    m = BERTMaskedLM(cfg)
    params = ti.bert_masked_lm(sd, 2, "bert.")
    ys, ylens = jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"])

    loss, _ = m.apply({"params": params}, ys, ylens, jnp.asarray(fx["labels"]))
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-4)

    # PLL score: reference masks each position (bert.py:54-86).
    scores = m.apply({"params": params}, ys, ylens, method=BERTMaskedLM.score)
    np.testing.assert_allclose(np.asarray(scores), fx["scores"], rtol=1e-4)


def test_rnn_lm_parity():
    fx, sd = _load("fixtures_lm_rnn.npz")
    cfg = config_from_dict(
        dict(
            lm_type="rnn", vocab_size=40, embedding_size=16, hidden_size=24,
            num_layers=2, dropout_rate=0.0,
        )
    )
    m = RNNLM(cfg)
    params = ti.rnnlm(sd, 2)
    ys, ylens = jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"])

    logits = m.apply({"params": params}, ys, ylens)
    np.testing.assert_allclose(
        np.asarray(logits), fx["logits"], rtol=1e-4, atol=1e-5
    )
    loss, _ = m.apply({"params": params}, ys, ylens, jnp.asarray(fx["labels"]))
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-4)

    states = m.apply({"params": params}, 3, method=RNNLM.zero_states)
    preds, new_states = m.apply(
        {"params": params}, ys, ylens, states, method=RNNLM.predict
    )
    np.testing.assert_allclose(np.asarray(preds), fx["preds"], rtol=1e-3, atol=1e-5)
    # states: torch (num_layers, B, H) h/c vs ours (layers, 2, B, H)
    np.testing.assert_allclose(
        np.asarray(new_states)[:, 0], fx["h"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_states)[:, 1], fx["c"], rtol=1e-4, atol=1e-5
    )


ELECTRA_CFG = dict(
    lm_type="electra",
    vocab_size=40,
    max_seq_len=24,
    mask_id=39,
    gen_hidden_size=32, gen_embedding_size=16, gen_num_layers=2,
    gen_num_attention_heads=4, gen_intermediate_size=64,
    disc_hidden_size=32, disc_embedding_size=16, disc_num_layers=2,
    disc_num_attention_heads=4, disc_intermediate_size=64,
    electra_disc_weight=50,
)


def test_electra_parity():
    fx, sd = _load("fixtures_lm_electra.npz")
    cfg = config_from_dict(ELECTRA_CFG)
    m = ELECTRAModel(cfg)
    params = ti.electra_model(sd, 2, 2)
    ys, ylens = jnp.asarray(fx["ys"]), jnp.asarray(fx["ylens"])

    scores = m.apply({"params": params}, ys, ylens, method=ELECTRAModel.score)
    np.testing.assert_allclose(np.asarray(scores), fx["scores"], rtol=1e-4)

    dloss, _ = m.apply(
        {"params": params}, ys, ylens, jnp.asarray(fx["error_labels"]),
        method=ELECTRAModel.forward_disc,
    )
    np.testing.assert_allclose(float(dloss), float(fx["dloss"]), rtol=1e-4)


def test_electra_joint_training_step():
    cfg = config_from_dict(ELECTRA_CFG)
    m = ELECTRAModel(cfg)
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.integers(3, 39, (4, 12)))
    ylens = jnp.array([12, 10, 8, 6])
    labels = jnp.where(
        jnp.asarray(rng.random((4, 12)) < 0.3), ys, -100
    )
    ys_masked = jnp.where(labels != -100, cfg.mask_id, ys)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ys_masked, ylens, labels,
    )

    def loss_fn(p):
        loss, ld = m.apply(
            {"params": p}, ys_masked, ylens, labels,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return loss, ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert "loss_gen" in ld and "loss_disc" in ld
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )


P2W_CFG = dict(
    vocab_size=40,
    src_vocab_size=15,
    enc_hidden_size=32,
    enc_num_attention_heads=4,
    enc_num_layers=2,
    enc_intermediate_size=64,
    dec_hidden_size=32,
    dec_num_attention_heads=4,
    dec_num_layers=2,
    dec_intermediate_size=64,
    input_layer="embed",
    eos_id=2,
    mask_id=39,
    max_seq_len=24,
)


@pytest.mark.parametrize("lm_type", ["pbert", "pctc", "ptransformer"])
def test_p2w_training(lm_type):
    cfg = config_from_dict(dict(P2W_CFG, lm_type=lm_type))
    m = P2W(cfg)
    rng = np.random.default_rng(1)
    B, L, PL = 3, 8, 12
    ys = jnp.asarray(rng.integers(3, 39, (B, L)))
    ylens = jnp.array([8, 6, 5])
    ps = jnp.asarray(rng.integers(3, 15, (B, PL)))
    plens = jnp.array([12, 9, 7])
    labels = jnp.where(jnp.asarray(rng.random((B, L)) < 0.4), ys, -100)

    variables = m.init(
        jax.random.PRNGKey(0), ys, ylens, labels, ps, plens
    )
    loss, ld = m.apply({"params": variables["params"]}, ys, ylens, labels, ps, plens)
    assert np.isfinite(float(loss)), lm_type


def test_pelectra_training_step():
    cfg = config_from_dict(
        dict(
            P2W_CFG,
            lm_type="pelectra",
            disc_hidden_size=32, disc_embedding_size=16, disc_num_layers=2,
            disc_num_attention_heads=4, disc_intermediate_size=64,
            electra_disc_weight=50,
        )
    )
    m = PELECTRAModel(cfg)
    rng = np.random.default_rng(2)
    B, L, PL = 2, 8, 12
    ys = jnp.asarray(rng.integers(3, 39, (B, L)))
    ylens = jnp.array([8, 6])
    ps = jnp.asarray(rng.integers(3, 15, (B, PL)))
    plens = jnp.array([12, 9])
    labels = jnp.where(jnp.asarray(rng.random((B, L)) < 0.4), ys, -100)
    ys_masked = jnp.where(labels != -100, cfg.mask_id, ys)

    variables = m.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ys_masked, ylens, labels, ps, plens,
    )
    loss, ld = m.apply(
        {"params": variables["params"]}, ys_masked, ylens, labels, ps, plens,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(loss))
    assert "loss_disc" in ld


def test_lm_facade_dispatch():
    cfg = config_from_dict(dict(BASE, lm_type="transformer"))
    m = LM(cfg)
    ys = jnp.asarray(np.random.default_rng(0).integers(3, 39, (2, 6)))
    ylens = jnp.array([6, 4])
    variables = m.init(jax.random.PRNGKey(0), ys, ylens)
    scores = m.apply(variables, ys, ylens, method=LM.score)
    assert scores.shape == (2,)
