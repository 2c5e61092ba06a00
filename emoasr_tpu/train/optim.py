"""Optimizers and LR schedules (optax).

Parity target: `/root/reference/asr/optimizers.py` —
- `noam`: lr = base * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
  (optimizers.py:57-63)
- `epdecay`: linear warmup to base, then constant; multiplied by
  `lr_decay_rate` at each epoch >= `lr_decay_start_epoch` (:52-56, 88-97)
- `lindecay`: linear warmup then linear decay to 0 over total steps (:65-77)
- ASR uses torch Adam with *coupled* L2 weight_decay; the LM path uses AdamW
  with bias/LayerNorm excluded from decay (:128-146).
- NaN/inf grads skip the step (train_asr.py:83-90); grad clipping by global
  norm; gradient accumulation (`accum_grad`).

The LR is computed as a pure function of (step, epoch_scale) and injected
per-step, so the whole update stays inside one jitted train step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from emoasr_tpu.config import ExpConfig


def resolve_warmup(cfg: ExpConfig, num_total_steps: Optional[int]) -> int:
    """`num_warmup_steps` xor `warmup_proportion` (optimizers.py:18-28)."""
    assert (cfg.num_warmup_steps is None) != (cfg.warmup_proportion is None), (
        "exactly one of num_warmup_steps / warmup_proportion must be set"
    )
    if cfg.warmup_proportion is not None:
        assert num_total_steps is not None
        return int(num_total_steps * cfg.warmup_proportion)
    return cfg.num_warmup_steps


def make_lr_fn(cfg: ExpConfig, num_total_steps: Optional[int] = None):
    """Returns lr(step, epoch_scale) -> float32.

    `step` counts optimizer updates starting at 1; `epoch_scale` carries the
    cumulative epdecay factor (1.0 otherwise).
    """
    warmup = resolve_warmup(cfg, num_total_steps)
    base = cfg.learning_rate
    sched = cfg.lr_schedule_type

    if sched == "noam":
        d_model = cfg.enc_hidden_size if cfg.encoder_type else cfg.hidden_size

        def lr(step, epoch_scale=1.0):
            s = jnp.maximum(step.astype(jnp.float32), 1.0)
            return base * d_model ** -0.5 * jnp.minimum(
                s ** -0.5, s * warmup ** -1.5
            )

    elif sched == "epdecay":

        def lr(step, epoch_scale=1.0):
            s = step.astype(jnp.float32)
            warm = base / max(1.0, warmup) * s
            return jnp.where(s <= warmup, warm, base) * epoch_scale

    elif sched == "lindecay":
        assert num_total_steps is not None

        def lr(step, epoch_scale=1.0):
            s = step.astype(jnp.float32)
            warm = base / max(1.0, warmup) * s
            decay = base * jnp.maximum(
                0.0,
                (num_total_steps - s) / max(1.0, num_total_steps - warmup),
            )
            return jnp.where(s <= warmup, warm, decay)

    else:
        raise ValueError(sched)

    return lr


def nodecay_mask(params) -> Any:
    """True where weight decay applies.  Reference excludes params whose
    name contains "bias" or belongs to a LayerNorm (optimizers.py:128-137);
    flax equivalents: leaf name bias, norm scales, BatchNorm scales."""

    def keep(path, _):
        names = [str(getattr(p, "key", p)) for p in path]
        leaf = names[-1]
        if leaf in ("bias", "b_ih", "b_hh"):
            return False
        if leaf == "scale":  # LayerNorm / BatchNorm weight
            return False
        if leaf in ("pos_bias_u", "pos_bias_v"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def build_optimizer(
    cfg: ExpConfig,
    num_total_steps: Optional[int] = None,
    use_adamw: bool = False,
) -> optax.GradientTransformation:
    """Gradient transform: clip -> (L2 | decoupled wd) -> adam -> -lr.

    The injected learning rate is optax's `inject_hyperparams` field
    `learning_rate`, set each step from `make_lr_fn`.
    """
    chain = []
    if cfg.clip_grad_norm and cfg.clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if use_adamw:
        # AdamW: decoupled decay with bias/norm exclusion
        # (lm/train_lm.py:188-195).  Decay is pre-scaled here (lr applied
        # by the caller on the emitted updates), matching AdamW semantics.
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(
            optax.add_decayed_weights(cfg.weight_decay, mask=nodecay_mask)
        )
    else:
        # torch Adam(weight_decay=...) couples L2 into the gradient before
        # the moment updates (asr/train_asr.py uses this path)
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale(-1.0))
    opt = optax.chain(*chain)
    if cfg.accum_grad > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.accum_grad)
    return opt


def scale_updates(updates, lr):
    """Apply the per-step learning rate to emitted updates (the transform
    chain ends at scale(-1); lr is a traced scalar)."""
    return jax.tree_util.tree_map(lambda u: u * lr, updates)



def finite_or_zero(grads):
    """Zero the whole gradient tree if any leaf is non-finite; returns
    (grads, was_finite).  Mirrors the reference's NaN-step skip."""
    leaves = jax.tree_util.tree_leaves(grads)
    finite = jnp.array(True)
    for g in leaves:
        finite &= jnp.isfinite(g).all()
    zeroed = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    return zeroed, finite
