"""Parity: fused Pallas LM layer step (ops/lm_step_pallas.py) vs the
XLA ancestor-indirect path (models/lm/bert.py::step_indirect), through
the real TransformerLM predict surface and the full fused beam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emoasr_tpu.models.lm.bert as bert_mod
from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.lm.lm import TransformerLM


@pytest.fixture()
def lm():
    cfg = config_from_dict(
        dict(
            lm_type="transformer", vocab_size=40, hidden_size=32,
            num_layers=2, num_attention_heads=2, intermediate_size=64,
            max_seq_len=16, dropout_rate=0.0,
        )
    )
    m = TransformerLM(cfg)
    v = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32),
        jnp.asarray([3]),
    )
    return cfg, m, v


def _episode(cfg, m, v, fused, seed=1, B=2, W=3, Lc=10, steps=6):
    """Random label-sync episode with random parent permutations —
    exactly the search's cache/ancestor protocol."""
    bert_mod.FUSED_INDIRECT_STEP = fused
    try:
        rng = np.random.default_rng(seed)
        caches = m.apply(
            v, B * W, Lc, method=type(m).init_cache
        )
        caches = [
            tuple(x.reshape(B, W, Lc, *x.shape[2:]) for x in kv)
            for kv in caches
        ]
        anc = jnp.zeros((B, W, Lc), jnp.int32)
        bidx = jnp.arange(B)[:, None]
        widx = jnp.arange(W)[None, :]
        outs = []
        for t in range(steps):
            tokens = jnp.asarray(
                rng.integers(3, 40, size=(B, W)), jnp.int32
            )
            pos = jnp.full((B, W), t, jnp.int32)
            anc = anc.at[bidx, widx, pos].set(
                jnp.broadcast_to(widx, (B, W))
            )
            logp, caches = m.apply(
                v, tokens, pos, caches, anc,
                method=type(m).predict_step_indirect,
            )
            outs.append(logp)
            # random beam permutation: compose into anc only
            parent = jnp.asarray(
                rng.integers(0, W, size=(B, W)), jnp.int32
            )
            anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
        return jnp.stack(outs)
    finally:
        bert_mod.FUSED_INDIRECT_STEP = None


def test_fused_lm_step_matches_xla(lm):
    cfg, m, v = lm
    ref = _episode(cfg, m, v, fused=False)
    got = _episode(cfg, m, v, fused=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=3e-5
    )


def test_fused_lm_step_bf16(lm):
    from emoasr_tpu.utils.precision import cast_floating

    cfg, m, v = lm
    vb = cast_floating(v, jnp.bfloat16)
    ref = _episode(cfg, m, vb, fused=False, seed=2)
    got = _episode(cfg, m, vb, fused=True, seed=2)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(got, np.float32),
        atol=0.08,
    )


def test_full_beam_with_fused_lm(lm):
    """Whole L3-3-style fused beam (joint CTC + LM SF, indirect) with the
    fused LM step vs the XLA LM step: identical hypotheses."""
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.search.common import make_lm_fusion

    cfg_lm, m, v = lm
    acfg = config_from_dict(
        dict(
            encoder_type="transformer", decoder_type="transformer",
            input_layer="conv2d", feat_dim=16, enc_hidden_size=32,
            enc_num_attention_heads=2, enc_num_layers=1,
            enc_intermediate_size=64, dec_hidden_size=32,
            dec_num_attention_heads=2, dec_num_layers=2,
            dec_intermediate_size=64, vocab_size=40, mtl_ctc_weight=0.3,
            max_decode_ylen=8,
        )
    )
    model = ASR(acfg)
    rng = np.random.default_rng(4)
    B, T = 2, 40
    xs = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    xlens = jnp.asarray([40, 31], jnp.int32)
    av = model.init(
        jax.random.PRNGKey(5), xs, xlens, jnp.ones((B, 4), jnp.int32),
        jnp.full((B,), 4), jnp.ones((B, 5), jnp.int32),
        jnp.ones((B, 5), jnp.int32),
    )
    fusion = make_lm_fusion(m, v, 0.5, max_len=12, mode="indirect")
    outs = {}
    for fused in (False, True):
        bert_mod.FUSED_INDIRECT_STEP = fused
        try:
            dec = build_decode_fn(
                model, av, acfg, beam_width=3, len_weight=0.3,
                decode_ctc_weight=0.3, lm=fusion,
            )
            outs[fused] = dec(xs, xlens)
        finally:
            bert_mod.FUSED_INDIRECT_STEP = None
    np.testing.assert_array_equal(
        np.asarray(outs[False][0]), np.asarray(outs[True][0])
    )
    np.testing.assert_allclose(
        np.asarray(outs[False][2]), np.asarray(outs[True][2]),
        rtol=1e-4, atol=1e-4,
    )
