"""LSTM layers as `lax.scan` recurrences (flax.linen).

TPU-native replacement for cuDNN `nn.LSTM`/`nn.LSTMCell` used by the
reference (`asr/modeling/encoders/rnn.py:43-50`,
`asr/modeling/decoders/rnn_transducer.py:45-52`, `asr/modeling/decoders/las.py:40-44`,
`lm/modeling/rnn.py:18-24`).

Design: the input projection x @ W_ih^T for ALL timesteps is one large
batched matmul (MXU-friendly); the scan body only carries the (B, H) state
and does the recurrent h @ W_hh^T.  Gate order is torch's (i, f, g, o) and
weights keep torch's (4H, in) layout so reference checkpoints import as-is.

Bidirectional mode reverses the *valid prefix* per utterance (replacing
pack_padded_sequence) and zero-fills outputs beyond each length, matching
`pad_packed_sequence` behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# Pallas dispatch: None = auto (fused kernel on TPU when the sequence is
# long enough to beat the launch overhead), True/False = forced.  The
# scan path stays the oracle; parity is pinned in tests/test_lstm_pallas.py.
USE_PALLAS = None
_PALLAS_MIN_STEPS = 8


def _pallas_wanted(T: int) -> bool:
    import os

    env = os.environ.get("EMOASR_LSTM_PALLAS")
    if env is not None:  # measurement override (tools/bench_lstm.py A/Bs)
        return env not in ("0", "false", "off")
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    if T < _PALLAS_MIN_STEPS:
        return False  # single-step decode calls: launch overhead loses
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def lstm_scan(
    x_proj: jnp.ndarray,
    w_hh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Scan the recurrence given precomputed input projections.

    x_proj: (B, T, 4H) = x @ W_ih^T + b_ih + b_hh
    w_hh: (4H, H) torch layout.  Returns (B, T, H) outputs + final (h, c).

    On TPU the whole recurrence runs as one fused Pallas program
    (ops/lstm_pallas.py) — the per-step `lax.scan` dispatch otherwise
    dominates the transducer prediction-net cost (tools/profile_t5.py).
    """
    if _pallas_wanted(x_proj.shape[1]):
        from emoasr_tpu.ops.lstm_pallas import lstm_scan_pallas

        return lstm_scan_pallas(x_proj, w_hh, h0, c0)
    H = h0.shape[-1]
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh_t  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(step, (h0, c0), x_proj.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), (h, c)


def reverse_by_length(x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Reverse the valid prefix of axis 1; padding stays in place (it is
    zero-masked by callers)."""
    T = x.shape[1]
    ar = jnp.arange(T)[None, :]
    idx = jnp.where(ar < lens[:, None], lens[:, None] - 1 - ar, ar)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2)).astype(jnp.int32)
    return jnp.take_along_axis(x, idx, axis=1)


class UniLSTM(nn.Module):
    """Single-direction, single-layer LSTM with torch-layout parameters."""

    hidden_size: int

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        B, T, I = xs.shape
        H = self.hidden_size
        k = 1.0 / (H ** 0.5)

        def init(key, shape):  # torch LSTM default: U(-1/sqrt(H), 1/sqrt(H))
            return jax.random.uniform(key, shape, minval=-k, maxval=k)

        w_ih = self.param("weight_ih", init, (4 * H, I))
        w_hh = self.param("weight_hh", init, (4 * H, H))
        b_ih = self.param("bias_ih", init, (4 * H,))
        b_hh = self.param("bias_hh", init, (4 * H,))

        x_proj = xs @ w_ih.T + b_ih + b_hh
        if state is None:
            h0 = jnp.zeros((B, H), xs.dtype)
            c0 = jnp.zeros((B, H), xs.dtype)
        else:
            h0, c0 = state
        return lstm_scan(x_proj, w_hh, h0, c0)


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM; output is fwd/bwd concatenated
    (B, T, 2H), with positions beyond `lens` zeroed (pad_packed parity)."""

    hidden_size: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lens: jnp.ndarray):
        fwd, _ = UniLSTM(self.hidden_size, name="fwd")(xs)
        xs_rev = reverse_by_length(xs, lens)
        bwd_rev, _ = UniLSTM(self.hidden_size, name="bwd")(xs_rev)
        bwd = reverse_by_length(bwd_rev, lens)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        mask = (jnp.arange(xs.shape[1])[None, :] < lens[:, None])[:, :, None]
        return jnp.where(mask, out, 0.0)


class StackedLSTM(nn.Module):
    """Multi-layer unidirectional LSTM with per-layer state threading and
    optional inter-layer dropout (prediction-network / RNNLM shape)."""

    hidden_size: int
    num_layers: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, xs, states=None, deterministic: bool = True):
        # states: (num_layers, 2, B, H) or None
        new_states = []
        h = xs
        for li in range(self.num_layers):
            st = None if states is None else (states[li, 0], states[li, 1])
            h, (hn, cn) = UniLSTM(self.hidden_size, name=f"layer{li}")(h, st)
            new_states.append(jnp.stack([hn, cn]))
            if li < self.num_layers - 1:
                h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h, jnp.stack(new_states)
