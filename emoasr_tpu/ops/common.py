"""Shared numeric helpers for lattice ops."""

import jax.numpy as jnp

# Finite stand-in for log(0): avoids -inf NaN propagation under autodiff.
# Matches the reference's convention (`asr/modeling/decoders/ctc.py:23`).
LOG_0 = -1e10
LOG_1 = 0.0


def logaddexp3(a, b, c):
    """Numerically-stable logsumexp of three stacked arrays (elementwise)."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def length_mask(lens, maxlen):
    """(B, maxlen) bool mask: True where index < len (model_utils.py:6-29)."""
    ar = jnp.arange(maxlen)
    return ar[None, :] < lens[:, None]


def flip_by_length(x, lens):
    """Reverse the valid prefix of axis 1 per batch element (mod wrap);
    entries at t >= len land in arbitrary positions and must be masked by
    the caller (same contract as the reference's rotate+flip helpers,
    ctc_aligner.py:27-84)."""
    import jax.numpy as _jnp

    L = x.shape[1]
    idx = ((lens[:, None] - 1 - _jnp.arange(L)[None, :]) % L).astype(_jnp.int32)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return _jnp.take_along_axis(x, idx, axis=1)
