"""End-to-end error-correction CLI test (mask + BERT fill).

The Corrector's mask-and-fill path (greedy CTC -> per-token confidence ->
mask below threshold -> jitted LM fill mixing (1-w)*ASR + w*LM — semantics
of `asr/test_asr_correct.py:75-152`) had no end-to-end coverage; this
drives the real `eval/correct.py::test_main` over a tiny setup.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from emoasr_tpu.config import config_from_dict


def _setup(tmp_path):
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.models.lm.lm import LM
    from emoasr_tpu.train import checkpoint as ckpt

    V, F, T = 12, 8, 24
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(5):
        x = rng.normal(size=(T, F)).astype(np.float32)
        np.save(feat_dir / f"u{i}.npy", x)
        rows.append(dict(feat_path=str(feat_dir / f"u{i}.npy"),
                         utt_id=f"s-u{i}-{i}00-{i}99",
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
                buckets=[[T, 8]], batch_size=5,
                max_xlens_batch=512, max_ylens_batch=64,
                dropout_enc_rate=0.0, dropout_attn_rate=0.0)
    conf_path = tmp_path / "corr.yaml"
    conf_path.write_text(yaml.safe_dump(conf))
    cfg = config_from_dict(conf)
    model = ASR(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, T, F)),
                   jnp.full((2,), T, jnp.int32), method=ASR.decode_greedy)
    (tmp_path / "corr" / "checkpoints").mkdir(parents=True)
    ckpt.save_model(str(tmp_path / "corr/checkpoints/model.ep1"),
                    v["params"], v.get("batch_stats", {}))

    lm_conf = dict(lm_type="bert", vocab_size=V, hidden_size=16,
                   num_layers=1, num_attention_heads=2, intermediate_size=32,
                   max_seq_len=64, mask_id=V - 1, dropout_rate=0.0,
                   vocab_path=str(vocab), test_path=str(tsv))
    lm_conf_path = tmp_path / "bert.yaml"
    lm_conf_path.write_text(yaml.safe_dump(lm_conf))
    lm_cfg = config_from_dict(lm_conf)
    lm = LM(lm_cfg)
    lv = lm.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                 jnp.full((1,), 4, jnp.int32),
                 jnp.full((1, 4), -100, jnp.int32))
    (tmp_path / "bert" / "checkpoints").mkdir(parents=True)
    ckpt.save_model(str(tmp_path / "bert/checkpoints/model.ep1"),
                    lv["params"], {})
    return str(conf_path), str(lm_conf_path)


def test_correct_cli_mask_and_fill(tmp_path):
    from emoasr_tpu.eval.correct import test_main

    conf, lm_conf = _setup(tmp_path)
    args = SimpleNamespace(
        conf=conf, ep="1", lm_conf=lm_conf, lm_ep="1",
        mask_th=0.9, lm_weight=0.5, data=None, data_tag="test",
        debug=False, runtime=False, runtime_num_samples=20,
        runtime_num_repeats=5, wavtime_factor=1000,
    )
    out = test_main(args)
    assert out is not None
    wer, wer_info = out
    assert np.isfinite(wer)
    assert "WER" in wer_info
    # a high mask threshold on an untrained model must mask something;
    # result TSV written through the real path
    import glob
    import os

    results = glob.glob(os.path.join(
        str(tmp_path), "corr/results/result_correct_*.tsv"))
    assert results
    df = pd.read_table(results[0], comment="#")
    assert len(df) == 5
