"""Training criteria: label smoothing, distillation losses.

Parity targets: `/root/reference/asr/criteria.py:18-288` and
`/root/reference/lm/criteria.py:5-18`.  The reference iterates per-sample
Python loops over the batch; everything here is one masked batched reduction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _onehot_lsm(labels: jnp.ndarray, vocab: int, lsm_prob: float) -> jnp.ndarray:
    """Label-smoothed one-hot: (1-p) on target, p/(V-1) elsewhere
    (criteria.py:5-15)."""
    onehot = jax.nn.one_hot(labels, vocab)
    return (1.0 - lsm_prob) * onehot + (lsm_prob / (vocab - 1)) * (1.0 - onehot)


def label_smoothing_loss(
    logits: jnp.ndarray,
    ys: jnp.ndarray,
    ylens: jnp.ndarray,
    lsm_prob: float = 0.0,
    normalize_length: bool = False,
    normalize_batch: bool = True,
) -> jnp.ndarray:
    """Masked cross-entropy with label smoothing (criteria.py:18-46)."""
    B, L, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = _onehot_lsm(ys, V, lsm_prob)
    mask = (jnp.arange(L)[None, :] < ylens[:, None]).astype(logp.dtype)
    per_pos = jnp.sum(logp * tgt, axis=-1) * mask  # (B, L)
    per_b = jnp.sum(per_pos, axis=1)
    if normalize_length:
        per_b = per_b / jnp.maximum(ylens, 1)
    loss = -jnp.sum(per_b)
    if normalize_batch:
        loss = loss / B
    return loss


def distill_loss(
    logits: jnp.ndarray,
    ys: jnp.ndarray,
    soft_labels: jnp.ndarray,
    ylens: jnp.ndarray,
    soft_label_weight: float,
    lsm_prob: float = 0.0,
    normalize_length: bool = False,
    normalize_batch: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft/hard label interpolation KD (criteria.py:49-100).

    Returns (loss, loss_soft, loss_hard)."""
    B, L, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = (jnp.arange(L)[None, :] < ylens[:, None]).astype(logp.dtype)

    def masked_ce(target):
        per_b = jnp.sum(jnp.sum(logp * target, axis=-1) * mask, axis=1)
        if normalize_length:
            per_b = per_b / jnp.maximum(ylens, 1)
        return per_b

    soft_b = masked_ce(soft_labels[:, :L].astype(logp.dtype))
    hard_b = masked_ce(_onehot_lsm(ys, V, lsm_prob))
    loss_b = soft_label_weight * soft_b + (1.0 - soft_label_weight) * hard_b
    denom = B if normalize_batch else 1
    return (
        -jnp.sum(loss_b) / denom,
        -jnp.sum(soft_b) / denom,
        -jnp.sum(hard_b) / denom,
    )


def masked_lm_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_id: int = -100
) -> jnp.ndarray:
    """Mean CE over positions whose label != ignore_id (lm/criteria.py:5-18)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_id
    tgt = jax.nn.one_hot(jnp.where(valid, labels, 0), V)
    ce = -jnp.sum(logp * tgt, axis=-1)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )


# ---------------------------------------------------------------------------
# Alignment-based CTC distillation (criteria.py:103-215)
# ---------------------------------------------------------------------------


def frame_to_label_mapping(
    aligns: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
    position: str = "all",
) -> jnp.ndarray:
    """Map each frame to a label index (or -1), batched.

    Semantics of `CTCAlignDistillLoss._frame_to_label_mapping`
    (criteria.py:176-215): label segments are runs of the same non-blank
    token delimited by any change (blanks break runs); `position` selects
    which frames of each segment carry the label (all / left / mid / right).
    aligns: (B, T) frame alignment; returns (B, T) int32 label map.
    """
    B, T = aligns.shape
    valid = jnp.arange(T)[None, :] < xlens[:, None]
    nonblank = (aligns != blank_id) & valid
    prev = jnp.pad(aligns, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    new_tok = nonblank & (
        (jnp.arange(T)[None, :] == 0) | (aligns != prev)
    )
    label_id = jnp.cumsum(new_tok.astype(jnp.int32), axis=1) - 1  # (B, T)

    if position == "all":
        return jnp.where(nonblank, label_id, -1).astype(jnp.int32)

    # segment boundaries: first/last frame per label id
    U = T  # at most T segments
    seg = jnp.where(nonblank, label_id, U)  # invalid -> dropped bucket
    t_idx = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    big = jnp.full((B, U + 1), T, jnp.int32)
    left = big.at[jnp.arange(B)[:, None], seg].min(
        jnp.where(nonblank, t_idx, T).astype(jnp.int32)
    )[:, :U]
    small = jnp.full((B, U + 1), -1, jnp.int32)
    right = small.at[jnp.arange(B)[:, None], seg].max(
        jnp.where(nonblank, t_idx, -1).astype(jnp.int32)
    )[:, :U]

    if position == "left":
        pick = left
    elif position == "right":
        pick = right
    elif position == "mid":
        pick = (left + right) // 2
    else:
        raise ValueError(position)

    # scatter label ids onto the picked frame of each (valid) segment
    num_seg = jnp.max(jnp.where(nonblank, label_id + 1, 0), axis=1)  # (B,)
    seg_valid = jnp.arange(U)[None, :] < num_seg[:, None]
    out = jnp.full((B, T + 1), -1, jnp.int32)
    out = out.at[
        jnp.arange(B)[:, None], jnp.where(seg_valid, pick, T)
    ].set(jnp.where(seg_valid, jnp.arange(U)[None, :], -1).astype(jnp.int32))
    return out[:, :T]


def ctc_align_distill_loss(
    logits: jnp.ndarray,
    ys: jnp.ndarray,
    soft_labels: jnp.ndarray,
    aligns: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
    soft_label_weight: float = 1.0,
    position: str = "all",
    lsm_prob: float = 0.0,
    normalize_length: bool = True,
    normalize_batch: bool = True,
) -> jnp.ndarray:
    """Frame-level KD through a CTC forced alignment (criteria.py:103-174)."""
    B, T, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    label_map = frame_to_label_mapping(aligns, xlens, ylens, blank_id, position)
    exists = (label_map >= 0) & (jnp.arange(T)[None, :] < xlens[:, None])
    lm_clip = jnp.maximum(label_map, 0)

    def gather_targets(table):  # table: (B, U', V) -> (B, T, V)
        return jnp.take_along_axis(
            table, lm_clip[:, :, None].astype(jnp.int32), axis=1
        )

    denom = jnp.maximum(jnp.sum(exists, axis=1), 1) if normalize_length else 1

    loss_b = 0.0
    if soft_label_weight > 0:
        tgt = gather_targets(soft_labels.astype(logp.dtype))
        s = jnp.sum(
            jnp.where(exists[:, :, None], tgt * logp, 0.0), axis=(1, 2)
        )
        loss_b = loss_b + soft_label_weight * (s / denom if normalize_length else s)
    if soft_label_weight < 1:
        tgt = gather_targets(_onehot_lsm(ys, V, lsm_prob))
        h = jnp.sum(
            jnp.where(exists[:, :, None], tgt * logp, 0.0), axis=(1, 2)
        )
        loss_b = loss_b + (1 - soft_label_weight) * (
            h / denom if normalize_length else h
        )

    loss = -jnp.sum(loss_b)
    if normalize_batch:
        loss = loss / B
    return loss


def rnnt_word_distill_loss(
    logits: jnp.ndarray,
    soft_labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    normalize_length: bool = True,
    normalize_batch: bool = True,
) -> jnp.ndarray:
    """Word-level RNN-T KD: soft CE summed over the (T, U) grid
    (criteria.py:218-250)."""
    B, T, U1, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tmask = jnp.arange(T)[None, :] < xlens[:, None]
    umask = jnp.arange(U1)[None, :] < ylens[:, None]
    grid = tmask[:, :, None] & umask[:, None, :]
    soft = soft_labels[:, :U1].astype(logp.dtype)  # (B, U', V)
    per = jnp.einsum("btuv,buv->b", jnp.where(grid[..., None], logp, 0.0), soft)
    if normalize_length:
        per = per / jnp.maximum(xlens * ylens, 1)
    loss = -jnp.sum(per)
    if normalize_batch:
        loss = loss / B
    return loss


def rnnt_align_distill_loss(
    logits: jnp.ndarray,
    soft_labels: jnp.ndarray,
    aligns: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    normalize_length: bool = True,
    normalize_batch: bool = True,
) -> jnp.ndarray:
    """Alignment-level RNN-T KD: soft CE at the aligned (t_u, u) cells.

    NOTE: the reference implementation (criteria.py:253-288) overwrites
    `loss_u` inside its u-loop, so only the LAST label position contributes
    — an evident bug.  This implements the intended semantics (sum over all
    u, normalized by ylen), documented here as a deliberate divergence.
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # gather logp at (align[u], u): (B, U, V)
    al = jnp.clip(aligns[:, :U], 0, T - 1).astype(jnp.int32)
    # logp[b, al[b,u], u, :]
    b_idx = jnp.arange(B)[:, None]
    u_idx = jnp.arange(U)[None, :]
    lp_u = logp[b_idx, al, u_idx]  # (B, U, V)
    umask = (u_idx < ylens[:, None])[..., None]
    per = jnp.sum(
        jnp.where(umask, lp_u * soft_labels[:, :U].astype(logp.dtype), 0.0),
        axis=(1, 2),
    )
    if normalize_length:
        per = per / jnp.maximum(ylens, 1)
    loss = -jnp.sum(per)
    if normalize_batch:
        loss = loss / B
    return loss
