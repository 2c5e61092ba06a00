"""LM data pipeline + training loop + PPL tests on a synthetic corpus."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

import jax

from emoasr_tpu.config import config_from_dict, load_config
from emoasr_tpu.data.lm_dataset import (
    LMDataset,
    P2WDataset,
    TextAugment,
    create_masked_lm_label,
    create_masked_lm_label_insert,
)
from emoasr_tpu.eval.test_ppl import evaluate_ppl
from emoasr_tpu.models.lm.lm import LM
from emoasr_tpu.train.train_lm import train


def test_masked_lm_label():
    rng = np.random.default_rng(0)
    y = np.arange(3, 18, dtype=np.int32)
    ym, lab = create_masked_lm_label(
        rng, y, mask_id=100, eos_id=2, mask_proportion=0.3
    )
    masked = lab != -100
    assert masked.sum() == max(int(15 * 0.3), 1)
    assert (ym[masked] == 100).all()
    assert (lab[masked] == y[masked]).all()
    assert (ym[~masked] == y[~masked]).all()


def test_masked_lm_label_insert():
    rng = np.random.default_rng(1)
    y = np.arange(3, 18, dtype=np.int32)
    ym, lab = create_masked_lm_label_insert(
        rng, y, mask_id=100, eos_id=2, mask_proportion=0.3,
        insert_poisson_lam=0.5, pad_id=0,
    )
    assert len(ym) >= len(y)
    # inserted positions: mask token with label pad_id(0)
    ins = (ym == 100) & (lab == 0)
    orig = lab != 0
    assert len(ym) - len(y) == int(ins.sum())
    # original tokens survive in order
    kept = ym[(lab == -100)]
    assert set(kept.tolist()) <= set(y.tolist())


def test_text_augment():
    cfg = config_from_dict(
        dict(
            textaug_max_mask_prob=0.5, textaug_max_replace_prob=0.3,
            src_vocab_size=12, phone_eos_id=2, phone_mask_id=11,
        )
    )
    aug = TextAugment(cfg)
    rng = np.random.default_rng(0)
    x = np.asarray([2, 3, 4, 5, 6, 7, 8, 9, 10, 2], np.int32)
    out = aug(rng, x)
    assert out.shape == x.shape
    assert out[0] == 2 and out[-1] == 2  # eos untouched


def _lm_corpus(tmp_path, n=40, V=30, L=12):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        # learnable pattern: arithmetic sequences
        start = int(rng.integers(3, 10))
        toks = [(start + j) % (V - 4) + 3 for j in range(L)]
        rows.append(
            dict(utt_id=f"u{i}", token_id=" ".join(map(str, toks)), ylen=L)
        )
    tsv = tmp_path / "lm_train.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    return str(tsv)


def test_lm_dataset_batches(tmp_path):
    tsv = _lm_corpus(tmp_path)
    cfg = config_from_dict(
        dict(
            lm_type="transformer", vocab_size=30, max_seq_len=16,
            batch_size=8, max_ylens_batch=256, eos_id=2,
        )
    )
    ds = LMDataset(cfg, tsv, phase="train")
    batches = list(ds.batches())
    assert batches
    b = batches[0]
    assert b["ys_in"].shape[0] <= 8
    assert "labels" in b
    # causal shift: label[i] == ys_in[i+1] within valid region
    row = 0
    n = b["ylens"][row]
    np.testing.assert_array_equal(
        b["labels"][row][: n - 1], b["ys_in"][row][1:n]
    )


def test_train_lm_and_ppl(tmp_path):
    tsv = _lm_corpus(tmp_path)
    conf = dict(
        lm_type="transformer",
        vocab_size=30,
        hidden_size=32,
        num_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        max_seq_len=16,
        batch_size=8,
        max_ylens_batch=256,
        eos_id=2,
        mask_id=29,
        train_path=tsv,
        test_path=tsv,
        train_size=40,
        num_epochs=3,
        learning_rate=3e-3,
        lr_schedule_type="lindecay",
        warmup_proportion=0.1,
        weight_decay=0.01,
        log_step=5,
        save_step=3,
    )
    conf_path = tmp_path / "lm.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    state = train(str(conf_path))
    assert int(state.step) > 0

    cfg = load_config(str(conf_path))
    model = LM(cfg)
    ds = LMDataset(cfg, tsv, phase="test")
    cnt, ppl = evaluate_ppl(cfg, model, {"params": state.params}, ds)
    assert cnt > 0
    # trained on a deterministic pattern: PPL must be far below uniform (27)
    assert ppl < 15.0, ppl
    # checkpoint written
    assert os.path.isdir(str(tmp_path / "lm" / "checkpoints" / "model.ep3"))


def test_p2w_dataset(tmp_path):
    rng = np.random.default_rng(2)
    rows = []
    for i in range(10):
        U, PL = 6, 9
        rows.append(
            dict(
                utt_id=f"u{i}",
                token_id=" ".join(map(str, rng.integers(3, 28, U))),
                phone_token_id=" ".join(map(str, rng.integers(3, 10, PL))),
                ylen=U,
                plen=PL,
            )
        )
    tsv = tmp_path / "p2w.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    cfg = config_from_dict(
        dict(
            lm_type="pbert", vocab_size=30, src_vocab_size=12,
            max_seq_len=16, batch_size=4, max_ylens_batch=64,
            max_plens_batch=64, eos_id=2, mask_id=29, phone_eos_id=2,
            phone_mask_id=11, mask_proportion=0.3, random_num_to_mask=True,
            text_augment=True, textaug_max_mask_prob=0.2,
        )
    )
    ds = P2WDataset(cfg, str(tsv), phase="train")
    batches = list(ds.batches())
    assert batches
    b = batches[0]
    assert "ps" in b and "labels" in b
    assert (b["ys_in"] != 0).any()
