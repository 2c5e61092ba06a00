"""Kaldi-compatible log-mel filterbank front-end in JAX (batched, jittable).

TPU-native replacement for the reference's C++ feature kernel
`torchaudio.compliance.kaldi.fbank(window_type="hamming", htk_compat=True,
sample_frequency=16000, num_mel_bins=80, use_energy=False)` used at
`/root/reference/corpora/utils/wav_to_feats.py:26-33` (with the kaldi
`wav *= 2**15` scaling applied by the caller).

Implements the kaldi pipeline with its defaults: 25 ms frames / 10 ms
shift, snip_edges, per-frame DC removal, preemphasis 0.97 (first sample
against itself), non-periodic hamming window, 512-point power spectrum,
80 triangular mel bins between 20 Hz and Nyquist, log with float-eps floor.

Being pure XLA ops, the whole front-end fuses into the encoder program, so
features can be computed on device from raw audio (the reference
precomputes .npy offline on CPU).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 16000
FRAME_LEN = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
FFT_SIZE = 512
EPS = 1.1920928955078125e-07  # float32 epsilon (kaldi's log floor)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int = 80,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    sample_rate: int = SAMPLE_RATE,
    fft_size: int = FFT_SIZE,
) -> np.ndarray:
    """(num_fft_bins, num_mel_bins) triangular weights, kaldi-style."""
    nyquist = sample_rate / 2.0
    if high_freq <= 0:
        high_freq = nyquist + high_freq
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size

    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_fft_bins + 1, num_bins), np.float32)
    for m in range(num_bins):
        left = mel_low + m * mel_delta
        center = mel_low + (m + 1) * mel_delta
        right = mel_low + (m + 2) * mel_delta
        for k in range(num_fft_bins + 1):
            mel = mel_scale(fft_bin_width * k)
            if left < mel < right:
                if mel <= center:
                    bins[k, m] = (mel - left) / (center - left)
                else:
                    bins[k, m] = (right - mel) / (right - center)
    return bins


def _hamming(n: int) -> np.ndarray:
    # kaldi "hamming": 0.54 - 0.46 cos(2 pi i / (N-1))
    i = np.arange(n)
    return (0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))).astype(np.float32)


def num_frames(num_samples) -> jnp.ndarray:
    """snip_edges frame count: 1 + (N - 400) // 160 (0 if too short)."""
    return jnp.maximum((num_samples - FRAME_LEN) // FRAME_SHIFT + 1, 0)


@partial(jax.jit, static_argnames=("num_bins", "max_frames"))
def log_mel_fbank(
    wav: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    num_bins: int = 80,
    max_frames: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) int16-scaled waveforms -> (B, T, num_bins) log-mel, (B,) lens.

    Frames beyond each utterance's length are zero.
    """
    if wav.ndim == 1:
        wav = wav[None]
    B, N = wav.shape
    if wav_lens is None:
        wav_lens = jnp.full((B,), N, jnp.int32)
    T = max_frames or max(int((N - FRAME_LEN) // FRAME_SHIFT + 1), 1)

    idx = (
        jnp.arange(T)[:, None] * FRAME_SHIFT + jnp.arange(FRAME_LEN)[None, :]
    )  # (T, 400)
    frames = wav[:, jnp.clip(idx, 0, N - 1)].astype(jnp.float32)  # (B, T, 400)

    # remove DC offset per frame
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis 0.97 (first sample preemphasized against itself)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    # window
    frames = frames * jnp.asarray(_hamming(FRAME_LEN))

    spec = jnp.fft.rfft(frames, n=FFT_SIZE, axis=-1)  # (B, T, 257)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)

    banks = jnp.asarray(mel_banks(num_bins))  # (257, num_bins)
    # HIGHEST precision: the default bf16 matmul passes cost ~0.4% relative
    # error on mel energies, breaking float32-level kaldi compatibility
    mel = jnp.matmul(power, banks, precision=jax.lax.Precision.HIGHEST)
    feats = jnp.log(jnp.maximum(mel, EPS))

    flens = jnp.minimum(num_frames(wav_lens), T).astype(jnp.int32)
    mask = (jnp.arange(T)[None, :] < flens[:, None])[:, :, None]
    return jnp.where(mask, feats, 0.0), flens


def load_wav(path: str) -> np.ndarray:
    """Read 16 kHz PCM16 WAV with the kaldi int16 scaling (stdlib only)."""
    import wave

    with wave.open(path, "rb") as w:
        assert w.getframerate() == SAMPLE_RATE, w.getframerate()
        assert w.getsampwidth() == 2, "PCM16 expected"
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels())[:, 0]
    return data.astype(np.float32)
