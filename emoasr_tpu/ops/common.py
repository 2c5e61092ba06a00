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
