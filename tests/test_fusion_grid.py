"""Fusion-grid on one compiled program: (lm_weight, len_weight) are traced
inputs of the decode program (eval/decode.py `with_weights`), so the grid
(eval/fusion_grid.py) reuses a single compile where the reference fans out
CPU pool workers (fusion/test_fusion_grid.py:41-49).

Pins: with_weights == a freshly built decode_fn at those weights, and the
grid CLI returns the same per-point WERs as independent test_main calls.
"""

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import yaml

from emoasr_tpu.config import config_from_dict


def _lm_setup():
    from emoasr_tpu.models.lm.lm import LM

    lm_cfg = config_from_dict(
        dict(lm_type="rnn", vocab_size=12, embedding_size=8, hidden_size=12,
             num_layers=1, dropout_rate=0.0)
    )
    lm = LM(lm_cfg)
    lvars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )
    return lm, lvars, lm_cfg


def test_with_weights_equals_fresh_build():
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.search.common import make_lm_fusion

    cfg = config_from_dict(
        dict(encoder_type="transformer", decoder_type="ctc",
             input_layer="linear", feat_dim=8, enc_hidden_size=16,
             enc_num_attention_heads=2, enc_num_layers=1,
             enc_intermediate_size=32, vocab_size=12,
             dropout_enc_rate=0.0, dropout_attn_rate=0.0)
    )
    model = ASR(cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(2, 24, 8)).astype(np.float32))
    xlens = jnp.full((2,), 24, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), xs, xlens, method=ASR.decode_greedy)

    lm, lvars, _ = _lm_setup()
    fusion = make_lm_fusion(lm, lvars, 0.3)

    base = build_decode_fn(model, v, cfg, beam_width=3, len_weight=0.5,
                           lm=fusion)
    rebound = base.with_weights(lm_w=0.8, len_w=2.0)

    fusion2 = make_lm_fusion(lm, lvars, 0.8)
    fresh = build_decode_fn(model, v, cfg, beam_width=3, len_weight=2.0,
                            lm=fusion2)

    out_a = rebound(xs, xlens)
    out_b = fresh(xs, xlens)
    for a, b, name in zip(out_a, out_b, ("hyps", "lens", "scores")):
        if name == "scores":
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the default binding differs (weights actually flow)
    assert not np.allclose(np.asarray(base(xs, xlens)[2]),
                           np.asarray(out_a[2]))


def _make_eval_setup(tmp_path, n_utts=6, batch_size=6):
    """Tiny conf + orbax ASR checkpoint + eval tsv + RNNLM checkpoint."""
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train import checkpoint as ckpt

    V, F, T = 12, 8, 24
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(n_utts):
        x = rng.normal(size=(T, F)).astype(np.float32)
        p = feat_dir / f"u{i}.npy"
        np.save(p, x)
        rows.append(dict(feat_path=str(p), utt_id=f"s-u{i}-{i}00-{i}99",
                         token_id="3 4 5", text="w3 w4 w5", xlen=T, ylen=3))
    tsv = tmp_path / "test.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["<blank> 0", "<unk> 1", "<eos> 2"]
        + [f"▁w{i} {i}" for i in range(3, V)]) + "\n", encoding="utf-8")

    conf = dict(encoder_type="transformer", decoder_type="ctc",
                input_layer="linear", feat_dim=F, enc_hidden_size=16,
                enc_num_attention_heads=2, enc_num_layers=1,
                enc_intermediate_size=32, vocab_size=V,
                vocab_path=str(vocab), test_path=str(tsv),
                buckets=[[T, batch_size]], batch_size=batch_size,
                max_xlens_batch=512, max_ylens_batch=64,
                dropout_enc_rate=0.0, dropout_attn_rate=0.0)
    conf_path = tmp_path / "grid.yaml"
    conf_path.write_text(yaml.safe_dump(conf))
    cfg = config_from_dict(conf)
    model = ASR(cfg)
    xs = jnp.zeros((2, T, F)); xlens = jnp.full((2,), T, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), xs, xlens, method=ASR.decode_greedy)
    (tmp_path / "grid" / "checkpoints").mkdir(parents=True)
    ckpt.save_model(str(tmp_path / "grid/checkpoints/model.ep1"),
                    v["params"], v.get("batch_stats", {}))

    lm, lvars, lm_cfg = _lm_setup()
    lm_conf = dict(lm_type="rnn", vocab_size=V, embedding_size=8,
                   hidden_size=12, num_layers=1, dropout_rate=0.0,
                   vocab_path=str(vocab), test_path=str(tsv))
    lm_conf_path = tmp_path / "lm.yaml"
    lm_conf_path.write_text(yaml.safe_dump(lm_conf))
    (tmp_path / "lm" / "checkpoints").mkdir(parents=True)
    ckpt.save_model(str(tmp_path / "lm/checkpoints/model.ep1"),
                    lvars["params"], {})
    return str(conf_path), str(lm_conf_path)


def _args(conf, lm_conf):
    return SimpleNamespace(
        conf=conf, ep="1", beam_width=3, decode_ctc_weight=0.0,
        lm_conf=lm_conf, lm_ep="1", lm_tag=None, data=None, data_tag="test",
        save_dir=None, cpu=False, nbest=False, debug=False, utt_id=None,
        runtime=False, len_weight=None, lm_weight=None,
        decode_phone=False,
        lm_min=0.0, lm_max=0.5, lm_step=0.5,
        len_min=0.0, len_max=1.0, len_step=1.0,
    )


def test_fusion_grid_cli_matches_independent_points(tmp_path):
    from emoasr_tpu.eval import fusion_grid, test_asr

    conf, lm_conf = _make_eval_setup(tmp_path)
    args = _args(conf, lm_conf)

    # grid smoke: runs all 4 points on one cached setup (one compile)
    best = fusion_grid.main(args)
    assert isinstance(best, tuple) and len(best) == 4

    # per-point: cached-setup evaluation (grid behavior) == fresh setup
    points = [(lm_w, len_w) for lm_w in (0.0, 0.5) for len_w in (0.0, 1.0)]
    cached_wers = {}
    for lm_w, len_w in points:  # shared cache, like the grid
        out = test_asr.test_main(args, lm_w, len_w)
        assert out is not None
        cached_wers[(lm_w, len_w)] = out[2]
    # weights must matter: not all points identical
    assert len(set(cached_wers.values())) > 1, cached_wers
    for lm_w, len_w in points:
        test_asr._SETUP_CACHE.clear()
        out = test_asr.test_main(args, lm_w, len_w)
        assert out[2] == pytest.approx(cached_wers[(lm_w, len_w)]), (
            lm_w, len_w, out[2], cached_wers,
        )


def test_fusion_grid_data_parallel_mesh(tmp_path):
    """Multi-chip grid eval (VERDICT r4 weak #8): the REAL grid CLI with
    --dp shards every decode batch over the full device mesh (8 virtual
    CPU devices here, conftest) and must return the same per-point WERs
    as the single-device grid."""
    from emoasr_tpu.eval import fusion_grid, test_asr

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    # 8 utts / batch 8: divisible by the mesh so batches actually shard
    conf, lm_conf = _make_eval_setup(tmp_path, n_utts=8, batch_size=8)
    args = _args(conf, lm_conf)

    test_asr._SETUP_CACHE.clear()
    best_single = fusion_grid.main(args)

    args.dp = True
    test_asr._SETUP_CACHE.clear()
    best_dp = fusion_grid.main(args)

    assert best_dp[0] == pytest.approx(best_single[0])
    assert (best_dp[1], best_dp[2]) == (best_single[1], best_single[2])
