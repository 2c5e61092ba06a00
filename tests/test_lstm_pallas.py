"""Parity: fused Pallas LSTM (ops/lstm_pallas.py) vs the lax.scan oracle.

The scan path (`ops/lstm.py::lstm_scan`) is itself torch-golden tested
(tests/test_encoders.py RNN fixtures), so exactness vs the scan pins the
kernel to cuDNN LSTM semantics (`asr/modeling/decoders/rnn_transducer.py:45-52`).
Kernels run in interpret mode here (CPU suite); the same code lowers to
Mosaic on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emoasr_tpu.ops.lstm as lstm_mod
import emoasr_tpu.ops.lstm_pallas as lp
from emoasr_tpu.ops.lstm import lstm_scan
from emoasr_tpu.ops.lstm_pallas import lstm_scan_pallas


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _loss(fn):
    def f(xp, whh, h0, c0):
        ys, (h, c) = fn(xp, whh, h0, c0)
        w = jnp.sin(jnp.arange(ys.size, dtype=jnp.float32)).reshape(ys.shape)
        return (ys * w).sum() + (h * h).sum() + (c * 0.3).sum()

    return f


@pytest.mark.parametrize(
    "B,T,H",
    [
        (3, 7, 64),     # tail-only unroll, aligned H
        (4, 12, 160),   # unaligned H (lane padding path)
        (2, 16, 128),   # exact unroll multiple
    ],
)
def test_fwd_bwd_match_scan(B, T, H):
    rng = np.random.default_rng(0)
    xp = _rand(rng, B, T, 4 * H) * 0.5
    whh = _rand(rng, 4 * H, H) * 0.1
    h0 = _rand(rng, B, H)
    c0 = _rand(rng, B, H)

    ys0, (hf0, cf0) = lstm_scan(xp, whh, h0, c0)
    ys1, (hf1, cf1) = lstm_scan_pallas(xp, whh, h0, c0)
    np.testing.assert_allclose(ys0, ys1, atol=1e-5)
    np.testing.assert_allclose(hf0, hf1, atol=1e-5)
    np.testing.assert_allclose(cf0, cf1, atol=1e-5)

    g0 = jax.grad(_loss(lstm_scan), argnums=(0, 1, 2, 3))(xp, whh, h0, c0)
    g1 = jax.grad(_loss(lstm_scan_pallas), argnums=(0, 1, 2, 3))(
        xp, whh, h0, c0
    )
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=3e-5)


def test_multi_chunk_grid(monkeypatch):
    """Force a 4-program time grid: the (h, c) carry crosses chunk
    boundaries in VMEM scratch, fwd and (reversed) bwd."""
    monkeypatch.setattr(lp, "_time_chunk", lambda T, B, Hp, i: 3)
    rng = np.random.default_rng(1)
    B, T, H = 2, 12, 64
    xp = _rand(rng, B, T, 4 * H) * 0.5
    whh = _rand(rng, 4 * H, H) * 0.1
    h0 = _rand(rng, B, H)
    c0 = _rand(rng, B, H)

    ys0, (hf0, cf0) = lstm_scan(xp, whh, h0, c0)
    ys1, (hf1, cf1) = lstm_scan_pallas(xp, whh, h0, c0)
    np.testing.assert_allclose(ys0, ys1, atol=1e-5)
    np.testing.assert_allclose(hf0, hf1, atol=1e-5)
    np.testing.assert_allclose(cf0, cf1, atol=1e-5)

    g0 = jax.grad(_loss(lstm_scan), argnums=(0, 1, 2, 3))(xp, whh, h0, c0)
    g1 = jax.grad(_loss(lstm_scan_pallas), argnums=(0, 1, 2, 3))(
        xp, whh, h0, c0
    )
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=3e-5)


def test_bf16_storage():
    """bf16 inputs: kernel computes gates in f32 from bf16-stored
    residuals; compare against the all-f32 oracle at bf16 tolerance."""
    rng = np.random.default_rng(2)
    B, T, H = 2, 9, 64
    xp = _rand(rng, B, T, 4 * H) * 0.5
    whh = _rand(rng, 4 * H, H) * 0.1
    h0 = _rand(rng, B, H)
    c0 = _rand(rng, B, H)
    ys0, (hf0, cf0) = lstm_scan(xp, whh, h0, c0)
    ys1, (hf1, cf1) = lstm_scan_pallas(
        xp.astype(jnp.bfloat16), whh, h0.astype(jnp.bfloat16),
        c0.astype(jnp.bfloat16),
    )
    assert ys1.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        ys0, ys1.astype(jnp.float32), atol=3e-2, rtol=3e-2
    )
    np.testing.assert_allclose(
        cf0, cf1.astype(jnp.float32), atol=5e-2, rtol=5e-2
    )


def test_prediction_net_dispatch(monkeypatch):
    """StackedLSTM through the dispatcher: USE_PALLAS=True must match
    the scan path (training shape, multi-layer state threading)."""
    from emoasr_tpu.ops.lstm import StackedLSTM

    rng = np.random.default_rng(3)
    B, T, H = 2, 10, 64
    xs = _rand(rng, B, T, H)
    m = StackedLSTM(hidden_size=H, num_layers=2)
    v = m.init(jax.random.PRNGKey(0), xs)

    monkeypatch.setattr(lstm_mod, "USE_PALLAS", False)
    ys0, st0 = m.apply(v, xs)
    monkeypatch.setattr(lstm_mod, "USE_PALLAS", True)
    ys1, st1 = m.apply(v, xs)
    np.testing.assert_allclose(ys0, ys1, atol=1e-5)
    np.testing.assert_allclose(st0, st1, atol=1e-5)

    # grads through the module (what the T5 train step differentiates)
    def loss(params, use):
        monkeypatch.setattr(lstm_mod, "USE_PALLAS", use)
        ys, _ = m.apply({"params": params}, xs)
        return (ys * ys).sum()

    g0 = jax.grad(loss)(v["params"], False)
    g1 = jax.grad(loss)(v["params"], True)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, atol=3e-5)
