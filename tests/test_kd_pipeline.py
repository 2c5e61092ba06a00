"""End-to-end knowledge-distillation pipeline: LM soft labels (pickle) ->
ASRDataset with kd_label_path -> CTC training step with alignment-KD loss."""

import pickle

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.data.asr_dataset import ASRDataset, create_soft_label
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.parallel.mesh import make_mesh, shard_batch
from emoasr_tpu.train.optim import build_optimizer
from emoasr_tpu.train.step import init_train_state, make_train_step


def test_create_soft_label():
    kd_utt = [[(3, 0.7), (4, 0.3)], [(5, 1.0)]]
    soft = create_soft_label(kd_utt, ylen=2, vocab_size=10, lsm_prob=0.1,
                             add_eos=False)
    assert soft.shape == (2, 10)
    np.testing.assert_allclose(soft[0, 3], 0.7 * 0.9, rtol=1e-6)
    np.testing.assert_allclose(soft[0, 4], 0.3 * 0.9, rtol=1e-6)
    np.testing.assert_allclose(soft[0, 0], 0.1 / 8, rtol=1e-6)
    soft2 = create_soft_label(kd_utt, ylen=2, vocab_size=10, lsm_prob=0.0,
                              add_eos=True, eos_id=2)
    assert soft2.shape == (3, 10)
    np.testing.assert_allclose(soft2[2, 2], 1.0, rtol=1e-6)


def test_kd_training_step(tmp_path):
    V, F = 12, 8
    rng = np.random.default_rng(0)
    rows, kd = [], {}
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(8):
        T, U = 20, 3
        x = rng.normal(size=(T, F)).astype(np.float32)
        p = feat_dir / f"u{i}.npy"
        np.save(p, x)
        toks = rng.integers(3, V, size=U)
        rows.append(
            dict(feat_path=str(p), utt_id=f"u{i}-0-{T*10}",
                 token_id=" ".join(map(str, toks)),
                 text=" ".join(f"w{t}" for t in toks), xlen=T, ylen=U)
        )
        # top-2 soft labels per position
        kd[f"u{i}-0-{T*10}"] = [
            [(int(t), np.float32(0.8)), (int((t + 1) % V), np.float32(0.2))]
            for t in toks
        ]
    tsv = tmp_path / "train.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    pkl = tmp_path / "kd.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(kd, f)

    cfg = config_from_dict(
        dict(
            encoder_type="transformer", decoder_type="ctc",
            input_layer="linear", feat_dim=F, enc_hidden_size=16,
            enc_num_attention_heads=2, enc_num_layers=1,
            enc_intermediate_size=32, vocab_size=V,
            kd_weight=0.5, kd_ctc_position="all", reduce_main_loss_kd=False,
            lr_schedule_type="noam", learning_rate=1.0, num_warmup_steps=10,
            buckets=[[32, 8]], batch_size=8, max_xlens_batch=512,
            max_ylens_batch=64, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
            spec_augment=False,
        )
    )
    ds = ASRDataset(cfg, str(tsv), phase="train", kd_label_path=str(pkl))
    batches = list(ds.batches())
    assert batches and "soft_labels" in batches[0]
    b = batches[0]
    assert b["soft_labels"].shape[2] == V
    # soft labels sum to ~1 on valid positions
    s = b["soft_labels"][0, : b["ylens"][0]].sum(-1)
    np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-4)

    model = ASR(cfg)
    arrays = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]), jnp.asarray(b["ys"]),
        jnp.asarray(b["ylens"]), jnp.asarray(b["ys_in"]),
        jnp.asarray(b["ys_out"]), jnp.asarray(b["soft_labels"]),
    )
    tx = build_optimizer(cfg)
    state = init_train_state(variables["params"], {}, tx)
    mesh = make_mesh()
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)
    state, metrics = step_fn(state, shard_batch(mesh, arrays), jax.random.PRNGKey(1))
    assert "loss_kd" in metrics
    assert np.isfinite(float(metrics["loss_kd"]))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["loss_kd"]) != 0.0
