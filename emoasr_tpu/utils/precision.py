"""Mixed-precision policy (TPU-native; no reference equivalent — the
reference trains implicitly in float32, `asr/train_asr.py:35-98`).

Strategy (jmp-style): master parameters and optimizer moments stay float32;
inside the jitted step the params and activations are cast to
``cfg.compute_dtype`` (bfloat16 in production configs) so every matmul/conv
hits the MXU at full rate, while the numerically sensitive pieces stay
float32 by construction:

- attention softmax (`models/layers.py::MultiHeadAttention._attend`),
- all loss lattices / log-softmaxes (`ops/ctc.py`, `ops/rnnt.py`,
  `models/criteria.py` upcast at entry),
- LayerNorm/BatchNorm statistics (flax computes stats in >= float32),
- gradients (the cast's transpose casts them back to float32 before the
  optimizer update).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dtype_of(cfg) -> jnp.dtype:
    """cfg.compute_dtype as a jnp dtype."""
    return jnp.dtype(cfg.compute_dtype)


def is_half(cfg) -> bool:
    return dtype_of(cfg) != jnp.float32


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype` (int/bool
    leaves untouched).  Differentiable: d(cast)/dx casts cotangents back."""
    dtype = jnp.dtype(dtype)

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def cast_params_for_compute(cfg, params):
    """Params as seen by the forward pass: bf16 copy under a half policy,
    the float32 originals otherwise."""
    if not is_half(cfg):
        return params
    return cast_floating(params, dtype_of(cfg))


def cast_batch_for_compute(cfg, xs):
    if not is_half(cfg):
        return xs
    return xs.astype(dtype_of(cfg))
