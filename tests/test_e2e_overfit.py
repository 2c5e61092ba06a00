"""Full-pipeline overfit test: synthetic corpus on disk -> train via the
real training CLI loop -> decode via the real eval CLI -> WER must collapse.

This is the end-to-end acceptance test the reference lacks entirely
(SURVEY.md §4): it exercises manifest reading, bucketing, the jitted SPMD
train step, checkpointing, resume-compatible layout, batched greedy decode,
TSV emission, and WER scoring in one flow.
"""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from emoasr_tpu.config import load_config
from emoasr_tpu.eval.test_asr import build_argparser
from emoasr_tpu.eval.test_asr import test_main as run_test_main
from emoasr_tpu.train.loop import train


def _make_corpus(tmp_path, n_utts=32, V=12, F=16):
    """Features carry the label identity (one active channel per segment)."""
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(n_utts):
        U = int(rng.integers(2, 5))
        seg = 6
        T = U * seg
        toks = rng.integers(3, V, size=U)
        x = np.zeros((T, F), np.float32)
        for u, t in enumerate(toks):
            x[u * seg : (u + 1) * seg, t % F] = 2.0
        x += rng.normal(size=x.shape).astype(np.float32) * 0.05
        p = feat_dir / f"u{i}.npy"
        np.save(p, x)
        rows.append(
            dict(
                feat_path=str(p),
                utt_id=f"spk-u{i}-{i * 1000}-{i * 1000 + T * 10}",
                token_id=" ".join(map(str, toks)),
                text=" ".join(f"w{t}" for t in toks),
                xlen=T,
                ylen=U,
            )
        )
    tsv = tmp_path / "train.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(
        "\n".join(
            ["<blank> 0", "<unk> 1", "<eos> 2"]
            + [f"▁w{i} {i}" for i in range(3, V)]
        ) + "\n",
        encoding="utf-8",
    )
    return str(tsv), str(vocab)


@pytest.mark.parametrize("decoder", ["ctc"])
def test_train_cli_then_eval_cli_overfits(tmp_path, decoder):
    tsv, vocab = _make_corpus(tmp_path)
    conf = dict(
        encoder_type="transformer",
        decoder_type=decoder,
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
    )
    conf_path = tmp_path / "overfit.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    state = train(str(conf_path))
    assert int(state.step) > 0

    args = build_argparser().parse_args(
        ["-conf", str(conf_path), "-ep", "60", "--beam_width", "0"]
    )
    out = run_test_main(args)
    assert out is not None
    _, _, wer, wer_info = out
    # 20 epochs on 32 deterministic utterances: near-perfect transcription
    assert wer < 15.0, wer_info


def test_overfit_model_beam_decode(tmp_path):
    """Beam decode on a trained model through the eval CLI (also covers the
    conformer batch_stats save/load path)."""
    tsv, vocab = _make_corpus(tmp_path, n_utts=16)
    conf = dict(
        encoder_type="conformer",
        pos_encode_type="rel",
        decoder_type="ctc",
        input_layer="linear",
        feat_dim=16,
        enc_hidden_size=32,
        enc_num_attention_heads=2,
        enc_num_layers=1,
        enc_intermediate_size=64,
        conv_kernel_size=7,
        vocab_size=12,
        vocab_path=vocab,
        train_path=tsv,
        test_path=tsv,
        buckets=[[32, 8]],
        batch_size=8,
        max_xlens_batch=512,
        max_ylens_batch=64,
        num_epochs=40,
        learning_rate=5.0,
        lr_schedule_type="noam",
        num_warmup_steps=40,
        dropout_enc_rate=0.0,
        dropout_attn_rate=0.0,
        spec_augment=False,
        clip_grad_norm=5.0,
        log_step=50,
        save_step=40,
        seed=0,
    )
    conf_path = tmp_path / "overfit_cf.yaml"
    conf_path.write_text(yaml.safe_dump(conf))
    train(str(conf_path))

    wers = {}
    for beam in (0, 3):
        args = build_argparser().parse_args(
            ["-conf", str(conf_path), "-ep", "40", "--beam_width", str(beam)]
        )
        out = run_test_main(args)
        assert out is not None
        wers[beam] = out[2]
    assert wers[0] < 25.0, wers
    # prefix beam must not be (much) worse than greedy on a trained model
    assert wers[3] <= wers[0] + 5.0, wers
