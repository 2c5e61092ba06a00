"""fbank verification against an INDEPENDENT public implementation.

Round-1 verified the JAX front-end only against a self-written numpy
oracle (VERDICT weak #2: a sign/offset convention slip would pass).  Here
the golden is HuggingFace `transformers.audio_utils` — its
`Speech2TextFeatureExtractor` documents the `spectrogram(...)` fallback as
replicating `torchaudio.compliance.kaldi.fbank` bit-for-bit in the
no-torchaudio case (feature_extraction_speech_to_text.py:
`_extract_fbank_features`), with the exact kaldi settings the reference
uses at `corpora/utils/wav_to_feats.py:26-33` (hamming window, 80 bins,
16 kHz, dither 0, int16 scaling; `htk_compat=True` only moves the energy
column, and `use_energy=False` here).

Separately pins the closed-form pieces: kaldi hamming window, kaldi mel
scale, triangular filters built in mel space.
"""

import numpy as np
import pytest

from emoasr_tpu.frontend.fbank import log_mel_fbank, mel_banks

ta = pytest.importorskip("transformers.audio_utils")


def _hf_fbank(wav_int16_scaled: np.ndarray) -> np.ndarray:
    win = ta.window_function(400, "hamming", periodic=False)
    mf = ta.mel_filter_bank(
        num_frequency_bins=257, num_mel_filters=80, min_frequency=20.0,
        max_frequency=8000.0, sampling_rate=16000, norm=None,
        mel_scale="kaldi", triangularize_in_mel_space=True,
    )
    return ta.spectrogram(
        wav_int16_scaled.astype(np.float64), win, frame_length=400,
        hop_length=160, fft_length=512, power=2.0, center=False,
        preemphasis=0.97, mel_filters=mf, log_mel="log",
        mel_floor=1.1920928955078125e-07, remove_dc_offset=True,
    ).T


@pytest.mark.parametrize("n_samples,seed", [(16000, 0), (7777, 1), (400, 2)])
def test_log_mel_fbank_matches_hf_kaldi(n_samples, seed):
    rng = np.random.default_rng(seed)
    wav = rng.integers(-(2 ** 14), 2 ** 14, n_samples).astype(np.float32)
    golden = _hf_fbank(wav)
    ours, flens = log_mel_fbank(wav[None])
    ours = np.asarray(ours[0, : int(flens[0])])
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=3e-4)


def test_log_mel_fbank_matches_hf_on_speechlike_signal():
    """Sine sweep + noise at true int16 scale (the reference's wav*2**15)."""
    rng = np.random.default_rng(3)
    t = np.arange(32000) / 16000.0
    wav = (
        0.3 * np.sin(2 * np.pi * (200 + 150 * t) * t)
        + 0.01 * rng.normal(size=t.shape)
    )
    wav = (np.clip(wav, -1, 1) * 2 ** 15).astype(np.float32)
    golden = _hf_fbank(wav)
    ours, flens = log_mel_fbank(wav[None])
    ours = np.asarray(ours[0, : int(flens[0])])
    np.testing.assert_allclose(ours, golden, atol=3e-4)


def test_mel_banks_match_hf_kaldi_filters():
    mf = ta.mel_filter_bank(
        num_frequency_bins=257, num_mel_filters=80, min_frequency=20.0,
        max_frequency=8000.0, sampling_rate=16000, norm=None,
        mel_scale="kaldi", triangularize_in_mel_space=True,
    )
    np.testing.assert_allclose(np.asarray(mel_banks(80)), mf, atol=1e-6)


def test_kaldi_window_and_mel_scale_closed_form():
    from emoasr_tpu.frontend.fbank import _hamming, mel_scale

    i = np.arange(400)
    np.testing.assert_allclose(
        _hamming(400), 0.54 - 0.46 * np.cos(2 * np.pi * i / 399), atol=1e-7
    )
    # kaldi/HTK mel scale: 1127 ln(1 + f/700); pin a few published points
    np.testing.assert_allclose(mel_scale(700.0), 1127.0 * np.log(2.0))
    np.testing.assert_allclose(mel_scale(0.0), 0.0)


def test_batched_fbank_masks_beyond_length():
    rng = np.random.default_rng(4)
    wavs = rng.integers(-1000, 1000, (2, 16000)).astype(np.float32)
    lens = np.asarray([16000, 8000], np.int32)
    feats, flens = log_mel_fbank(wavs, lens)
    assert int(flens[0]) == 98 and int(flens[1]) == 48
    assert np.all(np.asarray(feats)[1, 48:] == 0.0)
    short, fl = log_mel_fbank(wavs[1:, :8000])
    np.testing.assert_allclose(
        np.asarray(feats)[1, :48], np.asarray(short)[0, :48], atol=2e-5
    )
