"""CTC loss and forced alignment as batched on-device scans.

TPU-native replacement for the reference's native CTC surface:
- `torch.nn.CTCLoss` (ATen/cuDNN) used at `asr/modeling/decoders/ctc.py:36-38,109-113`
  (blank=blank_id, reduction="sum", zero_infinity=True, normalized by B).
- `CTCForcedAligner` (`asr/modeling/decoders/ctc_aligner.py:96-221`), a
  per-timestep Python loop over torch ops, here a pair of `lax.scan`s plus a
  vectorized greedy walk.

Everything is a fixed-shape `lax.scan` over time of the 2U+1
blank-interleaved path lattice, vectorized over the batch; gradients come
from autodiff through the forward recursion (exact for CTC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emoasr_tpu.ops.common import LOG_0, logaddexp3

# Unroll factor for the time scans.  Each scan step is tiny ((B, 2U+1)
# elementwise + gathers), so the sequential-iteration overhead dominates
# on TPU; unrolling amortizes it without changing the math (same
# floating-point op order per step).
SCAN_UNROLL = 1

# Route ctc_loss through the Pallas alpha/beta kernels (ops/ctc_pallas):
# one program per sweep with the lattice in VMEM, ~10x faster than the
# lax.scan lattice at L1 train shapes.  The scan path remains for
# comparison and as the forced-alignment engine.
USE_PALLAS = True


def _extend_with_blanks(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, U) labels -> (B, 2U+1) blank-interleaved path ^a^b^ ... ^."""
    B, U = labels.shape
    z = jnp.full((B, 2 * U + 1), blank_id, dtype=labels.dtype)
    return z.at[:, 1::2].set(labels)


def _path_transition(alpha, allow2):
    """One CTC lattice transition: alpha'[s] = LSE(alpha[s], alpha[s-1],
    alpha[s-2] if allowed).  alpha: (B, S)."""
    a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_0)[:, :-1]
    a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_0)[:, :-2]
    a2 = jnp.where(allow2, a2, LOG_0)
    return logaddexp3(alpha, a1, a2)


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    Args:
      log_probs: (B, T, V) log-softmax outputs.
      labels: (B, U) int targets (padding beyond ylens is ignored).
      xlens, ylens: (B,) valid lengths.
    Returns:
      (B,) float32 NLL; infeasible alignments (T too short) give 0 when
      `zero_infinity` (matching torch.nn.CTCLoss(zero_infinity=True)).
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1

    z = _extend_with_blanks(labels, blank_id)  # (B, S)
    # skip-transition allowed into s when z[s] != blank and z[s] != z[s-2]
    z2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :-2]
    allow2 = (z != blank_id) & (z != z2)  # (B, S)

    # per-state emissions: (T, B, S)
    lp_path = jnp.take_along_axis(
        log_probs, z[:, None, :].astype(jnp.int32), axis=2
    ).transpose(1, 0, 2)

    if USE_PALLAS:
        from emoasr_tpu.ops.ctc_pallas import ctc_ll_from_path

        _, _, initf, finalf = _path_masks(labels, ylens, blank_id)
        ll = ctc_ll_from_path(
            lp_path, allow2.astype(jnp.float32), initf, finalf,
            xlens.astype(jnp.int32),
        )
        nll = -ll
        if zero_infinity:
            nll = jnp.where(ll < LOG_0 / 2, 0.0, nll)
        return nll

    alpha0 = jnp.full((B, S), LOG_0, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp_path[0, :, 0])
    if U > 0:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(ylens > 0, lp_path[0, :, 1], LOG_0)
        )

    def step(alpha, inputs):
        lp_t, t = inputs
        new = _path_transition(alpha, allow2) + lp_t
        # freeze once past each utterance's length
        new = jnp.where((t < xlens)[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(
        step, alpha0, (lp_path[1:], ts), unroll=SCAN_UNROLL
    )

    # log-likelihood: LSE over final blank (s=2U) and final label (s=2U-1)
    s_last = (2 * ylens).astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha, s_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(s_last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(ylens > 0, a_prev, LOG_0)
    ll = jnp.logaddexp(a_last, a_prev)

    nll = -ll
    if zero_infinity:
        nll = jnp.where(ll < LOG_0 / 2, 0.0, nll)
    return nll


def _path_masks(labels, ylens, blank_id):
    """(z, allow2f, initf, finalf) for the blank-interleaved path lattice."""
    z = _extend_with_blanks(labels, blank_id)
    z2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :-2]
    allow2f = ((z != blank_id) & (z != z2)).astype(jnp.float32)
    S = z.shape[1]
    s_iota = jnp.arange(S)[None, :]
    initf = (
        (s_iota == 0) | ((s_iota == 1) & (ylens > 0)[:, None])
    ).astype(jnp.float32)
    finalf = (
        (s_iota == (2 * ylens)[:, None])
        | ((s_iota == (2 * ylens - 1)[:, None]) & (ylens > 0)[:, None])
    ).astype(jnp.float32)
    return z, allow2f, initf, finalf


def ctc_loss_fn(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Reference-reduction CTC loss from raw logits: sum over batch / B
    (`asr/modeling/decoders/ctc.py:109-114`).

    Train hot path: instead of materializing the (B, T, V) log-softmax
    and gathering per-state columns (a strided HBM pattern whose
    scatter-backward dominated the whole loss — measured ~4 ms of a 9 ms
    loss at L1 shapes), normalization is a single dense logsumexp and the
    per-state emissions come from an EXACT one-hot matmul at
    precision=HIGHEST (each output accumulates exactly one non-zero
    product, so there is no rounding); the lattice itself runs in the
    Pallas alpha/beta kernels (ops/ctc_pallas)."""
    if not USE_PALLAS:
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return (
            jnp.sum(ctc_loss(log_probs, labels, xlens, ylens, blank_id))
            / logits.shape[0]
        )

    from emoasr_tpu.ops.ctc_pallas import ctc_ll_from_path

    logits = logits.astype(jnp.float32)
    B, T, V = logits.shape
    z, allow2f, initf, finalf = _path_masks(labels, ylens, blank_id)
    lse = jax.nn.logsumexp(logits, axis=-1)  # (B, T)
    hot = jax.nn.one_hot(z, V, dtype=logits.dtype)  # (B, S, V)
    xs = jnp.einsum(
        "btv,bsv->bts", logits, hot, precision=jax.lax.Precision.HIGHEST
    )
    lp_path = (xs - lse[:, :, None]).transpose(1, 0, 2)  # (T, B, S)
    ll = ctc_ll_from_path(
        lp_path, allow2f, initf, finalf, xlens.astype(jnp.int32)
    )
    nll = jnp.where(ll < LOG_0 / 2, 0.0, -ll)  # zero_infinity
    return jnp.sum(nll) / B


def ctc_loss_fused_head(
    eouts: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """ctc_loss_fn without EVER materializing the (B, T, V) logits.

    Takes the encoder output and the raw head weights; the head matmul,
    streaming logsumexp, and path-column extraction run fused in Pallas
    (ops/ctc_head_pallas) and only (B, T) + (B, T, S) tensors reach HBM.
    Numerically identical to `ctc_loss_fn(eouts @ w + b, ...)` up to
    matmul accumulation order.
    """
    from emoasr_tpu.ops.ctc_head_pallas import fused_ctc_head
    from emoasr_tpu.ops.ctc_pallas import ctc_ll_from_path

    B = eouts.shape[0]
    z, allow2f, initf, finalf = _path_masks(labels, ylens, blank_id)
    lse, xs = fused_ctc_head(eouts, w, b, z)
    S = z.shape[1]
    lp_path = (xs[:, :, :S] - lse[:, :, None]).transpose(1, 0, 2)
    ll = ctc_ll_from_path(
        lp_path, allow2f, initf, finalf, xlens.astype(jnp.int32)
    )
    nll = jnp.where(ll < LOG_0 / 2, 0.0, -ll)  # zero_infinity
    return jnp.sum(nll) / B


# ---------------------------------------------------------------------------
# Forced alignment (forward-backward + constrained greedy walk)
# ---------------------------------------------------------------------------


from emoasr_tpu.ops.common import flip_by_length as _flip_time  # noqa: E402


def _pre_emission_scan(lp_path, allow2, path_lens):
    """Run the forward recursion, emitting the pre-emission transition value
    at every step (the quantity the reference accumulates into
    `log_probs_fwd_bwd`, `ctc_aligner.py:121-148`).

    lp_path: (T, B, S) per-state emissions; returns (T, B, S).
    """
    T, B, S = lp_path.shape
    inside = jnp.arange(S)[None, :] < path_lens[:, None]  # (B, S)

    alpha0 = jnp.full((B, S), LOG_0, jnp.float32).at[:, 0].set(0.0)

    def step(alpha, lp_t):
        pre = _path_transition(alpha, allow2)
        pre = jnp.where(inside, pre, LOG_0)
        return pre + lp_t, pre

    _, pres = jax.lax.scan(step, alpha0, lp_path, unroll=SCAN_UNROLL)
    return pres


def ctc_forced_align(
    log_probs: jnp.ndarray,
    xlens: jnp.ndarray,
    labels: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Best CTC path via forward-backward posteriors + greedy constrained walk.

    Parity target: `CTCForcedAligner.__call__` (`ctc_aligner.py:150-221`).
    Returns (B, T) int32 frame-level alignment (blank or token id); frames
    beyond xlens are blank_id=0-filled like the reference's zeros init.
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1

    # zero out padded frames (reference masks log_probs to 0 outside xlens)
    tmask = (jnp.arange(T)[None, :] < xlens[:, None])[:, :, None]
    log_probs = jnp.where(tmask, log_probs, 0.0)

    z = _extend_with_blanks(labels, blank_id)
    z2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :-2]
    allow2 = (z != blank_id) & (z != z2)
    path_lens = 2 * ylens + 1

    lp_path = jnp.take_along_axis(
        log_probs, z[:, None, :].astype(jnp.int32), axis=2
    ).transpose(1, 0, 2)  # (T, B, S)

    # forward pre-emission accumulations
    pre_alpha = _pre_emission_scan(lp_path, allow2, path_lens)  # (T, B, S)

    # backward: same scan on time-flipped emissions and state-flipped path
    S_idx = (path_lens[:, None] - 1 - jnp.arange(S)[None, :]) % S  # (B, S)
    z_r = jnp.take_along_axis(z, S_idx, axis=1)
    z2_r = jnp.pad(z_r, ((0, 0), (2, 0)), constant_values=-1)[:, :-2]
    allow2_r = (z_r != blank_id) & (z_r != z2_r)
    lp_path_r = jnp.take_along_axis(
        _flip_time(log_probs, xlens), z_r[:, None, :].astype(jnp.int32), axis=2
    ).transpose(1, 0, 2)
    pre_beta_r = _pre_emission_scan(lp_path_r, allow2_r, path_lens)  # (T, B, S)

    # flip beta back to original (time, state) coordinates
    pre_beta = _flip_time(pre_beta_r.transpose(1, 0, 2), xlens)  # (B, T, S)
    pre_beta = jnp.take_along_axis(pre_beta, S_idx[:, None, :], axis=2)
    # posterior = emission + pre-alpha + pre-beta = alpha + beta - emission
    # (the reference seeds its accumulator with the gathered emissions,
    # ctc_aligner.py:177-180, so the emission term appears exactly once)
    fwd_bwd = (
        lp_path.transpose(1, 0, 2)
        + pre_alpha.transpose(1, 0, 2)
        + pre_beta
    )  # (B, T, S)

    # greedy constrained walk: from the previously selected state s, the
    # reachable states are {s, s+1, s+2 if allow2}; pick argmax posterior.
    inside = jnp.arange(S)[None, :] < path_lens[:, None]  # (B, S)
    s_range = jnp.arange(S)[None, :]

    def walk(prev_s, fb_t):
        reach = (
            (s_range == prev_s[:, None])
            | (s_range == prev_s[:, None] + 1)
            | ((s_range == prev_s[:, None] + 2) & allow2)
        ) & inside
        masked = jnp.where(reach, fb_t, LOG_0)
        sel = jnp.argmax(masked, axis=1).astype(jnp.int32)
        tok = jnp.take_along_axis(z, sel[:, None], axis=1)[:, 0]
        return sel, tok

    # initial "previous" is state 0 with a self-loop allowance matching the
    # reference's gamma init (delta at s=0)
    init_s = jnp.zeros((B,), jnp.int32)
    _, toks = jax.lax.scan(walk, init_s, fwd_bwd.transpose(1, 0, 2))
    aligns = toks.transpose(1, 0).astype(jnp.int32)  # (B, T)
    aligns = jnp.where(jnp.arange(T)[None, :] < xlens[:, None], aligns, 0)
    return aligns
