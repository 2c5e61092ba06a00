"""Front-end (kaldi fbank) and corpus-prep tool tests."""

import os
import wave

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from emoasr_tpu.corpora.prep import (
    concat_text_lm,
    map2phone,
    norm_feats,
    sort_bylen,
    split_tsv,
    wav_to_feats,
)
from emoasr_tpu.frontend.fbank import (
    FRAME_LEN,
    FRAME_SHIFT,
    load_wav,
    log_mel_fbank,
    mel_banks,
    mel_scale,
)


def _numpy_fbank_oracle(wav, num_bins=80):
    """Independent per-frame loop implementation of the kaldi pipeline."""
    N = len(wav)
    T = (N - FRAME_LEN) // FRAME_SHIFT + 1
    win = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(FRAME_LEN) / (FRAME_LEN - 1))
    banks = mel_banks(num_bins)
    out = np.zeros((T, num_bins), np.float32)
    for t in range(T):
        fr = wav[t * FRAME_SHIFT : t * FRAME_SHIFT + FRAME_LEN].astype(np.float64)
        fr = fr - fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * win
        spec = np.fft.rfft(fr, n=512)
        power = np.abs(spec) ** 2
        mel = power @ banks
        out[t] = np.log(np.maximum(mel, 1.1920928955078125e-07))
    return out


def test_fbank_matches_loop_oracle():
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=3200) * 1000).astype(np.float32)
    feats, flens = log_mel_fbank(jnp.asarray(wav)[None])
    want = _numpy_fbank_oracle(wav)
    assert int(flens[0]) == want.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : want.shape[0]], want, rtol=1e-3, atol=1e-3
    )


def test_fbank_tone_peaks_at_right_bin():
    # 1 kHz tone should peak near mel bin for 1 kHz
    t = np.arange(16000) / 16000
    wav = (np.sin(2 * np.pi * 1000 * t) * 10000).astype(np.float32)
    feats, flens = log_mel_fbank(jnp.asarray(wav)[None])
    mean_spec = np.asarray(feats)[0, : int(flens[0])].mean(0)
    peak_bin = int(np.argmax(mean_spec))
    # locate the expected bin: mel center frequencies
    mel_low, mel_high = mel_scale(20.0), mel_scale(8000.0)
    centers = mel_low + (np.arange(1, 81)) * (mel_high - mel_low) / 81
    expect = int(np.argmin(np.abs(centers - mel_scale(1000.0))))
    assert abs(peak_bin - expect) <= 1, (peak_bin, expect)


def test_fbank_batched_lengths():
    rng = np.random.default_rng(1)
    wavs = np.zeros((2, 4000), np.float32)
    wavs[0] = rng.normal(size=4000) * 100
    wavs[1, :2000] = rng.normal(size=2000) * 100
    feats, flens = log_mel_fbank(jnp.asarray(wavs), jnp.asarray([4000, 2000]))
    assert int(flens[0]) == (4000 - 400) // 160 + 1
    assert int(flens[1]) == (2000 - 400) // 160 + 1
    # padding frames are zeroed
    assert np.asarray(feats)[1, int(flens[1]) :].sum() == 0


def _write_wav(path, samples):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.astype(np.int16).tobytes())


def test_wav_to_feats_and_norm(tmp_path):
    rng = np.random.default_rng(2)
    rows = []
    for i in range(2):
        p = tmp_path / f"u{i}.wav"
        _write_wav(p, rng.normal(size=3200) * 3000)
        rows.append(dict(utt_id=f"u{i}", wav_path=str(p)))
    tsv = tmp_path / "train.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    wav_to_feats(str(tsv))
    assert os.path.exists(tmp_path / "u0.npy")
    assert os.path.exists(tmp_path / "train_norm.pkl")
    x = np.load(tmp_path / "u0.npy")
    assert x.shape[1] == 80

    norm_feats(str(tsv), str(tmp_path / "train_norm.pkl"))
    xn = np.load(tmp_path / "u0_norm.npy")
    assert xn.shape == x.shape
    # normalized corpus stats ~ zero mean unit var
    allx = np.concatenate(
        [np.load(tmp_path / f"u{i}_norm.npy") for i in range(2)]
    )
    assert abs(allx.mean()) < 0.1
    assert abs(allx.std() - 1.0) < 0.1


def test_manifest_tools(tmp_path):
    rng = np.random.default_rng(3)
    feats = []
    for i in range(4):
        p = tmp_path / f"f{i}.npy"
        np.save(p, rng.normal(size=(10 + i * 5, 8)).astype(np.float32))
        feats.append(str(p))
    df = pd.DataFrame(
        [
            dict(utt_id=f"u{i}", feat_path=feats[i],
                 token_id=" ".join(map(str, rng.integers(3, 9, 4))),
                 text=f"w{i} x{i}")
            for i in [2, 0, 3, 1]
        ]
    )
    tsv = tmp_path / "m.tsv"
    df.to_csv(tsv, sep="\t", index=False)

    out = sort_bylen(str(tsv))
    sorted_df = pd.read_table(out)
    assert sorted_df["xlen"].is_monotonic_increasing

    out_dir = split_tsv(str(tsv), 2)
    assert len(os.listdir(out_dir)) == 2

    lm_tsv = tmp_path / "lm.tsv"
    pd.DataFrame(
        [dict(utt_id=f"u{i}", token_id="3 4 5 6 7") for i in range(10)]
    ).to_csv(lm_tsv, sep="\t", index=False)
    out = concat_text_lm(str(lm_tsv), max_len=16)
    blocks = pd.read_table(out)
    assert all(len(t.split()) == 16 for t in blocks["token_id"])

    lex = tmp_path / "lex.txt"
    lex.write_text("w0 AA BB\nx0 CC\n")
    pv = tmp_path / "pv.txt"
    pv.write_text("<blank> 0\n<unk> 1\n<eos> 2\nAA 3\nBB 4\nCC 5\nNSN 6\n")
    out = map2phone(str(tsv), str(lex), str(pv))
    pdf = pd.read_table(out)
    row = pdf[pdf.utt_id == "u0"].iloc[0]
    assert row["phone_text"] == "AA BB CC"
    assert row["phone_token_id"] == "3 4 5"
    assert row["plen"] == 3
