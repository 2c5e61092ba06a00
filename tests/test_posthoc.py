"""Post-hoc toolchain tests: rescoring grid, hypothesis alignment, KD soft
labels, error correction, analysis helpers."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.eval.align_hyps import alignment
from emoasr_tpu.eval.correct import aggregate_logits
from emoasr_tpu.eval.make_label import accuracy, make_lm_label
from emoasr_tpu.eval.rescore import grid_search, rescore, score_lm
from emoasr_tpu.models.lm.lm import LM

LM_CFG = dict(
    lm_type="transformer",
    vocab_size=30,
    hidden_size=32,
    num_layers=1,
    num_attention_heads=4,
    intermediate_size=64,
    max_seq_len=32,
    mask_id=29,
)


def _nbest_df():
    rows = []
    # utt1: correct hyp + a wrong one; utt2 likewise
    rows.append(dict(utt_id="u1", score_asr=-1.0, token_id="3 4 5",
                     text="a b c", reftext="a b c"))
    rows.append(dict(utt_id="u1", score_asr=-0.5, token_id="3 4 6",
                     text="a b d", reftext="a b c"))
    rows.append(dict(utt_id="u2", score_asr=-2.0, token_id="7 8",
                     text="e f", reftext="e f"))
    rows.append(dict(utt_id="u2", score_asr=-1.0, token_id="7 9",
                     text="e g", reftext="e f"))
    return pd.DataFrame(rows)


def test_rescore_grid():
    df = _nbest_df()
    cfg = config_from_dict(LM_CFG)
    lm = LM(cfg)
    variables = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), jnp.array([4])
    )
    scored = score_lm(df, lm, variables, max_len=16, batch_size=4)
    assert "score_lm" in scored.columns
    assert np.isfinite(scored["score_lm"]).all()

    dfref = pd.DataFrame(
        [
            dict(utt_id="u1", text="a b c", token_id="3 4 5"),
            dict(utt_id="u2", text="e f", token_id="7 8"),
        ]
    )
    # with lm_weight=0, argmax by score_asr picks the wrong hyps -> WER > 0
    wer0, _, _ = rescore(scored, dfref, 0.0, 0.0)
    assert wer0 > 0
    # force the lm column to prefer correct hyps; grid must find it
    scored.loc[[0, 2], "score_lm"] = 0.0
    scored.loc[[1, 3], "score_lm"] = -100.0
    best = grid_search(scored, dfref, [0.0, 0.5], [0.0])
    assert best[0] == 0.0  # perfect WER found
    assert best[1] == 0.5


def test_alignment_labels():
    dfhyp = pd.DataFrame(
        [dict(utt_id="u1", score_asr=-1.0, token_id="3 9 5",
              text="a X c", reftext="a b c")]
    )
    dfref = pd.DataFrame([dict(utt_id="u1", token_id="3 4 5")])
    out = alignment(dfhyp, dfref, "SID")
    assert out.iloc[0]["error_label"] == "C S C"

    # insertion case
    dfhyp2 = pd.DataFrame(
        [dict(utt_id="u1", score_asr=-1.0, token_id="3 4 9 5",
              text="a b X c", reftext="a b c")]
    )
    out2 = alignment(dfhyp2, dfref, "SID")
    assert out2.iloc[0]["error_label"] == "C C I C"

    # deletion: ref has extra token; D is passed onto a neighboring C
    dfhyp3 = pd.DataFrame(
        [dict(utt_id="u1", score_asr=-1.0, token_id="3 5",
              text="a c", reftext="a b c")]
    )
    out3 = alignment(dfhyp3, dfref, "SID")
    lab = out3.iloc[0]["error_label"].split()
    assert len(lab) == 2 and "D" in lab


def test_make_lm_label_and_accuracy(tmp_path):
    cfg = config_from_dict(LM_CFG)
    lm = LM(cfg)
    variables = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), jnp.array([4])
    )
    df = pd.DataFrame(
        [
            dict(utt_id="u1", token_id="3 4 5 6", start_pos=0, end_pos=4),
            dict(utt_id="u2", token_id="7 8 9", start_pos=0, end_pos=3),
        ]
    )
    save = str(tmp_path / "kd.pkl")
    labels = make_lm_label(df, lm, variables, save, topk=4, temp=3.0)
    assert os.path.exists(save)
    with open(save, "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == {"u1", "u2"}
    assert len(loaded["u1"]) == 4
    # position 0 is a hard label
    assert loaded["u1"][0] == [(3, 1.0)]
    for vps in loaded["u1"][1:]:
        assert len(vps) == 4
        s = sum(p for _, p in vps)
        assert 0.99 < s <= 1.01

    dfref = pd.DataFrame(
        [dict(utt_id="u1", token_id="3 4 5 6"), dict(utt_id="u2", token_id="7 8 9")]
    )
    acc1, acck, cnt = accuracy(loaded, dfref)
    assert cnt == 7
    assert 0 <= acc1 <= acck <= 100


def test_aggregate_logits():
    V = 5
    # alignment: [1, 1, 0, 2, 2] -> tokens [1, 2]
    logits = np.zeros((5, V), np.float32)
    logits[0, 1] = 1.0  # weaker frame for token 1
    logits[1, 1] = 3.0  # stronger frame for token 1
    logits[3, 2] = 2.0
    logits[4, 2] = 1.0
    aligns = np.array([1, 1, 0, 2, 2])
    tp, tv = aggregate_logits(logits, aligns, blank_id=0)
    assert tp.shape == (2, V)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    np.testing.assert_allclose(tv[0], probs[1, 1], rtol=1e-6)
    np.testing.assert_allclose(tv[1], probs[3, 2], rtol=1e-6)


def test_aggregate_logits_device_matches_host():
    """Batched device aggregation == per-utterance host reference rule
    (segment split on frame-value change, peak-frame row, first-max
    tie-break), including blank gaps between equal tokens."""
    from emoasr_tpu.eval.correct import aggregate_logits_device

    rng = np.random.default_rng(3)
    B, T, V = 4, 17, 9
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    # random alignments with blanks and repeated-token segments
    aligns = rng.integers(0, 4, size=(B, T)).astype(np.int32)
    aligns[2, :] = 0  # fully blank row (empty hyp)
    tp_d, conf_d = aggregate_logits_device(
        jnp.asarray(logits), jnp.asarray(aligns), blank_id=0
    )
    tp_d, conf_d = np.asarray(tp_d), np.asarray(conf_d)
    for b in range(B):
        tp_h, tv_h = aggregate_logits(logits[b], aligns[b], blank_id=0)
        U = len(tv_h)
        if U == 0:
            assert not np.any(np.isfinite(conf_d[b]))
            continue
        np.testing.assert_allclose(conf_d[b, :U], tv_h, rtol=1e-5)
        np.testing.assert_allclose(tp_d[b, :U], tp_h, rtol=1e-5)
        assert not np.any(np.isfinite(conf_d[b, U:]))


def test_compare_wer(tmp_path):
    from emoasr_tpu.eval.analysis import compare_wer

    df1 = pd.DataFrame(
        [dict(utt_id="u1", token_id="3 4", text="a b", reftext="a b")]
    )
    df2 = pd.DataFrame(
        [dict(utt_id="u1", token_id="3 9", text="a X", reftext="a b")]
    )
    p1, p2 = str(tmp_path / "r1.tsv"), str(tmp_path / "r2.tsv")
    df1.to_csv(p1, sep="\t", index=False)
    df2.to_csv(p2, sep="\t", index=False)
    out = compare_wer(p1, p2)
    assert len(out) == 1
    assert out.iloc[0]["wer1"] == 0.0 and out.iloc[0]["wer2"] == 50.0
