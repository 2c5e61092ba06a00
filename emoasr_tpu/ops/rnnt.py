"""RNN-Transducer loss and forced alignment as anti-diagonal wavefront scans.

TPU-native replacement for the reference's two CUDA dependencies:
- `warp_rnnt.rnnt_loss` (pip CUDA extension) used at
  `asr/modeling/decoders/rnn_transducer.py:106-115` (blank=blank_id,
  reduction="mean", average_frames=False).
- the Numba `@cuda.jit` wavefront kernels + alignment walk in
  `asr/modeling/decoders/rnnt_aligner.py:14-198`.

The (T, U) lattice recurrence

    alpha[t, u] = LSE(alpha[t-1, u] + blank[t-1, u],
                      alpha[t, u-1] + label[t, u-1])

has a wavefront dependency: every cell on anti-diagonal n = t + u depends
only on diagonal n-1.  The CUDA reference serializes over t with per-u
locks/atomics; here each diagonal is one fully-vectorized `lax.scan` step
(deterministic, no atomics), with the emissions pre-gathered into diagonal
layout so the scan body is pure VPU work.  Only the blank/label emissions
are gathered from the (B, T, U+1, V) joint output (the memory-saving
`gather=True` trick of warp_rnnt), so V never enters the inner loop and
autodiff through the scan yields the exact gradient.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from emoasr_tpu.ops.common import LOG_0


def _gather_blank_label(
    log_probs: jnp.ndarray, labels: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,T,U+1,V) -> blank (B,T,U+1) and label (B,T,U) emissions."""
    lp_blank = log_probs[..., blank_id]
    U = labels.shape[1]
    lp_label = jnp.take_along_axis(
        log_probs[:, :, :U, :], labels[:, None, :, None].astype(jnp.int32), axis=3
    )[..., 0]
    return lp_blank, lp_label


def _diagonalize(x: jnp.ndarray, t_of_u: jnp.ndarray) -> jnp.ndarray:
    """Re-layout (B, T, U') into (N', B, U') diagonals.

    out[n, b, u] = x[b, clip(t_of_u[n, u]), u]; out-of-range entries are
    clipped (the scan masks validity separately).  Single fused gather, no
    materialized broadcast.
    """
    B, T, U1 = x.shape
    idx_t = jnp.clip(t_of_u, 0, T - 1).astype(jnp.int32)  # (N', U1)
    idx_u = jnp.broadcast_to(jnp.arange(U1)[None, :], idx_t.shape)
    out = x[:, idx_t, idx_u]  # (B, N', U1)
    return out.transpose(1, 0, 2)


def rnnt_alpha_scan(
    lp_blank: jnp.ndarray,
    lp_label: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
):
    """Forward lattice scan.

    Returns (ll, diags): per-utterance log-likelihood (B,) and all alpha
    anti-diagonals (N, B, U+1) with diags[n, b, u] = alpha[n-u, u].
    """
    B, T, U1 = lp_blank.shape
    U = U1 - 1
    N = T + U  # diagonals 0..N-1

    u_range = jnp.arange(U1)  # (U1,)
    n_range = jnp.arange(1, N)

    # diagonal-layout emissions for the cell (t, u) on diagonal n:
    #   blank source: lp_blank[t-1, u], with t-1 = n-1-u
    #   label source: lp_label[t, u-1], with t = n-u (stored at column u)
    t_blank = n_range[:, None] - 1 - u_range[None, :]  # (N-1, U1)
    lb_diag = _diagonalize(lp_blank, t_blank)  # (N-1, B, U1)
    lp_label_pad = jnp.pad(
        lp_label, ((0, 0), (0, 0), (1, 0)), constant_values=LOG_0
    )  # (B, T, U1): column u holds the label emission into u (from u-1)
    t_label = n_range[:, None] - u_range[None, :]
    ll_diag = _diagonalize(lp_label_pad, t_label)  # (N-1, B, U1)

    valid_blank = (t_blank >= 0) & (t_blank < T)  # (N-1, U1)
    valid_label = (t_label >= 0) & (t_label < T) & (u_range[None, :] >= 1)

    diag0 = jnp.full((B, U1), LOG_0, jnp.float32).at[:, 0].set(0.0)

    # per-b final cell (t, u) = (xlen-1, ylen) lives on diagonal xlen-1+ylen
    n_final = xlens - 1 + ylens  # (B,)
    ylens_i = ylens[:, None].astype(jnp.int32)

    def step(carry, inputs):
        diag, final = carry
        lb, ll_e, vb, vl, n = inputs
        from_blank = jnp.where(vb[None, :], diag + lb, LOG_0)
        prev_shift = jnp.pad(diag, ((0, 0), (1, 0)), constant_values=LOG_0)[:, :-1]
        from_label = jnp.where(vl[None, :], prev_shift + ll_e, LOG_0)
        new = jnp.logaddexp(from_blank, from_label)
        cell = jnp.take_along_axis(new, ylens_i, axis=1)[:, 0]
        final = jnp.where(n == n_final, cell, final)
        return (new, final), new

    final0 = jnp.where(n_final == 0, diag0[:, 0], LOG_0)
    (_, final), diags = jax.lax.scan(
        step, (diag0, final0), (lb_diag, ll_diag, valid_blank, valid_label, n_range)
    )
    diags = jnp.concatenate([diag0[None], diags], axis=0)  # (N, B, U1)

    # terminal blank emission lp_blank[xlen-1, ylen]
    term = jnp.take_along_axis(
        jnp.take_along_axis(
            lp_blank, (xlens - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :],
        ylens_i,
        axis=1,
    )[:, 0]
    ll = final + term
    return ll, diags


def rnnt_loss_gathered(
    lp_blank: jnp.ndarray,
    lp_label: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
) -> jnp.ndarray:
    """Per-utterance RNN-T NLL from pre-gathered emissions (warp_rnnt
    `gather=True` memory layout)."""
    ll, _ = rnnt_alpha_scan(
        lp_blank.astype(jnp.float32), lp_label.astype(jnp.float32), xlens, ylens
    )
    return -ll


# ---------------------------------------------------------------------------
# Row-scan formulation (TPU-friendly: no diagonal gathers)
# ---------------------------------------------------------------------------


def _log_linear_scan(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve x_u = b_u LSE (a_u + x_{u-1}) along the last axis.

    Kogge-Stone doubling in the (LSE, +) semiring: log2(U) fully-vectorized
    steps instead of a U-long sequential loop — this is what makes the
    within-row label recursion map onto the VPU.
    """
    U = a.shape[-1]
    x, A = b, a
    s = 1
    while s < U:
        x_sh = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)],
                       constant_values=LOG_0)[..., :-s]
        A_sh = jnp.pad(A, [(0, 0)] * (A.ndim - 1) + [(s, 0)],
                       constant_values=0.0)[..., :-s]
        x = jnp.logaddexp(x, A + x_sh)
        A = A + A_sh
        s *= 2
    return x


def rnnt_alpha_rowscan(
    lp_blank: jnp.ndarray,
    lp_label: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
):
    """Forward lattice as a scan over TIME rows.

    alpha[t, u] = LSE(alpha[t-1, u] + blank[t-1, u],
                      alpha[t, u-1] + label[t, u-1])
    The cross-row term is elementwise; the within-row term is a first-order
    log-linear recurrence solved by `_log_linear_scan` — T sequential steps
    of log2(U) vector ops, with contiguous row reads (the anti-diagonal
    variant does T+U steps with per-step diagonal gathers).

    Returns per-utterance log-likelihood (B,).
    """
    lp_blank = lp_blank.astype(jnp.float32)
    lp_label = lp_label.astype(jnp.float32)
    B, T, U1 = lp_blank.shape
    # a[u]: label emission into u (from u-1), stored at column u
    a_all = jnp.pad(lp_label, ((0, 0), (0, 0), (1, 0)), constant_values=LOG_0)

    onehot_final = (
        jnp.arange(U1)[None, :] == ylens[:, None]
    ).astype(jnp.float32)

    # row 0: pure label chain from alpha[0,0]=0
    b0 = jnp.full((B, U1), LOG_0, jnp.float32).at[:, 0].set(0.0)
    alpha0 = _log_linear_scan(a_all[:, 0], b0)
    final0 = jnp.where(
        xlens == 1,
        jnp.sum(alpha0 * onehot_final, axis=1),
        LOG_0,
    )

    def step(carry, inputs):
        alpha, final = carry
        lpb_prev, a_t, t = inputs  # (B, U1), (B, U1), scalar row index
        b = alpha + lpb_prev
        new_alpha = _log_linear_scan(a_t, b)
        run = (t < xlens)[:, None]
        new_alpha = jnp.where(run, new_alpha, alpha)
        hit = t == (xlens - 1)
        cell = jnp.sum(new_alpha * onehot_final, axis=1)
        final = jnp.where(hit, cell, final)
        return (new_alpha, final), None

    (alpha, final), _ = jax.lax.scan(
        step,
        (alpha0, final0),
        (
            lp_blank[:, :-1].transpose(1, 0, 2),
            a_all[:, 1:].transpose(1, 0, 2),
            jnp.arange(1, T),
        ),
    )

    term = jnp.take_along_axis(
        jnp.take_along_axis(
            lp_blank, (xlens - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :],
        ylens[:, None].astype(jnp.int32),
        axis=1,
    )[:, 0]
    return final + term


def rnnt_loss_rowscan(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """RNN-T loss via the row-scan lattice (same semantics as rnnt_loss)."""
    lp_blank, lp_label = _gather_blank_label(
        log_probs.astype(jnp.float32), labels, blank_id
    )
    nll = -rnnt_alpha_rowscan(lp_blank, lp_label, xlens, ylens)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def rnnt_gathered_from_joint(
    h_enc: jnp.ndarray,
    h_dec: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    labels: jnp.ndarray,
    blank_id: int = 0,
    time_chunk: int = 32,
):
    """Memory-efficient blank/label log-prob extraction from joint
    activations WITHOUT materializing the (B, T, U+1, V) tensor.

    h_enc: (B, T, J) = W_enc @ eouts; h_dec: (B, U+1, J) = W_dec @ douts
    (biases folded in); w_out: (J, V), b_out: (V,).

    The joint output is computed in time chunks; each chunk's (B, c, U1, V)
    logits are reduced to logsumexp + two gathers and discarded.
    `jax.checkpoint` on the chunk makes backward recompute instead of
    keeping V-wide residuals — this is the warp_rnnt `gather=True` memory
    saving without a custom kernel (a Pallas fusion is layered on top in
    ops/rnnt_pallas.py).
    """
    B, T, J = h_enc.shape
    U1 = h_dec.shape[1]
    U = U1 - 1
    pad_T = (-T) % time_chunk
    h_enc_p = jnp.pad(h_enc, ((0, 0), (0, pad_T), (0, 0)))
    n_chunks = (T + pad_T) // time_chunk
    chunks = h_enc_p.reshape(B, n_chunks, time_chunk, J)

    w_blank = w_out[:, blank_id]  # (J,)
    b_blank = b_out[blank_id]
    # per-label output rows: (B, U, J)
    w_label = w_out.T[labels.astype(jnp.int32)]  # (B, U, J)
    b_label = b_out[labels.astype(jnp.int32)]  # (B, U)

    @jax.checkpoint
    def chunk_fn(h_enc_c):
        # h_enc_c: (B, c, J)
        z = jnp.tanh(h_enc_c[:, :, None, :] + h_dec[:, None, :, :])
        logits = jnp.einsum("bcuj,jv->bcuv", z, w_out) + b_out
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        lpb = (
            jnp.einsum("bcuj,j->bcu", z, w_blank) + b_blank
        ).astype(jnp.float32) - lse
        lpl = (
            jnp.einsum("bcuj,buj->bcu", z[:, :, :U, :], w_label)
            + b_label[:, None, :]
        ).astype(jnp.float32) - lse[:, :, :U]
        return lpb, lpl

    lpb_chunks, lpl_chunks = jax.lax.map(
        lambda c: chunk_fn(c), chunks.transpose(1, 0, 2, 3)
    )
    lp_blank = lpb_chunks.transpose(1, 0, 2, 3).reshape(B, T + pad_T, U1)[:, :T]
    lp_label = lpl_chunks.transpose(1, 0, 2, 3).reshape(B, T + pad_T, U)[:, :T]
    return lp_blank, lp_label


def rnnt_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    xlens: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """RNN-T loss matching `warp_rnnt.rnnt_loss(average_frames=False)`.

    log_probs: (B, T, U+1, V) log-softmaxed joint outputs.
    """
    lp_blank, lp_label = _gather_blank_label(
        log_probs.astype(jnp.float32), labels, blank_id
    )
    nll = rnnt_loss_gathered(lp_blank, lp_label, xlens, ylens)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


# ---------------------------------------------------------------------------
# Forced alignment
# ---------------------------------------------------------------------------


def _alpha_lattice(lp_blank, lp_label, xlens, ylens):
    """Full (B, T, U+1) alpha lattice from the diagonal scan."""
    _, diags = rnnt_alpha_scan(lp_blank, lp_label, xlens, ylens)
    B, T, U1 = lp_blank.shape
    d = diags.transpose(1, 0, 2)  # (B, N, U1)
    n_idx = (jnp.arange(T)[:, None] + jnp.arange(U1)[None, :]).astype(jnp.int32)
    u_idx = jnp.broadcast_to(jnp.arange(U1)[None, :], n_idx.shape)
    return d[:, n_idx, u_idx]  # (B, T, U1)


from emoasr_tpu.ops.common import flip_by_length as _flip_axis1  # noqa: E402


def _flip_axis2(x, lens):
    """Reverse the valid prefix of axis 2 per batch element (mod wrap)."""
    L = x.shape[2]
    idx = ((lens[:, None] - 1 - jnp.arange(L)[None, :]) % L).astype(jnp.int32)
    return jnp.take_along_axis(x, idx[:, None, :], axis=2)


def rnnt_forced_align(
    log_probs: jnp.ndarray,
    xlens: jnp.ndarray,
    labels: jnp.ndarray,
    ylens: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Best label-emission times via forward-backward + greedy walk.

    Parity target: `RNNTForcedAligner.__call__` (`rnnt_aligner.py:159-198`):
    best_aligns[b, u] = frame where label u is emitted, following
    argmax(alpha+beta) from (0, 0).  Returns (B, U) int32.
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    lp_blank, lp_label = _gather_blank_label(log_probs, labels, blank_id)

    alpha = _alpha_lattice(lp_blank, lp_label, xlens, ylens)  # (B, T, U1)

    # beta[t, u] = LSE(beta[t+1, u] + blank[t, u], beta[t, u+1] + label[t, u])
    # with beta[X-1, Y] = blank[X-1, Y].  Under the per-utterance flip
    # t' = X-1-t, u' = Y-u this becomes an alpha-style recursion where the
    # edge INTO flipped cell (t', u') carries the emission of the flipped
    # cell itself:
    #   beta'[t',u'] = LSE(beta'[t'-1,u'] + Bf[t',u'], beta'[t',u'-1] + Lf[t',u'])
    # with Bf[t',u'] = blank[X-1-t', Y-u'], Lf[t',u'] = label[X-1-t', Y-u'].
    # The generic scan consumes blank at [t-1, u] and label (col u-1) at
    # [t, u-1], so feed it Bf shifted one step forward in time and Lf laid
    # out so that generic column v = u'-1 reads label[X-1-t', Y-1-v]:
    Bf = _flip_axis2(_flip_axis1(lp_blank, xlens), ylens + 1)  # (B, T, U1)
    lb_gen = jnp.pad(Bf, ((0, 0), (0, 1), (0, 0)), constant_values=LOG_0)[:, 1:, :]
    ll_gen = _flip_axis2(_flip_axis1(lp_label, xlens), ylens)  # (B, T, U)

    beta_f = _alpha_lattice(lb_gen, ll_gen, xlens, ylens)
    # beta[t, u] = beta_f[t', u'] + blank[X-1, Y]  (the init emission the
    # generic scan omits); the constant-per-b term cancels in argmax but is
    # included to match the reference's alpha+beta values.
    beta = _flip_axis2(_flip_axis1(beta_f, xlens), ylens + 1)
    term = jnp.take_along_axis(
        jnp.take_along_axis(
            lp_blank, (xlens - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :],
        ylens[:, None].astype(jnp.int32),
        axis=1,
    )  # (B, 1)
    fwd_bwd = alpha + beta + term[:, :, None]

    # greedy walk (rnnt_aligner.py:189-196)
    u_cols = jnp.arange(U)[None, :]

    def step(carry, _):
        t, u, aligns = carry
        go = (t + 1 < xlens) & (u < ylens)
        fb_t1u = fwd_bwd[jnp.arange(B), jnp.minimum(t + 1, T - 1), u]
        fb_tu1 = fwd_bwd[jnp.arange(B), t, jnp.minimum(u + 1, U1 - 1)]
        advance_t = go & (fb_t1u > fb_tu1)
        emit = go & ~advance_t
        aligns = jnp.where(
            emit[:, None] & (u_cols == u[:, None]), t[:, None], aligns
        )
        t = jnp.where(advance_t, t + 1, t)
        u = jnp.where(emit, u + 1, u)
        return (t, u, aligns), None

    t0 = jnp.zeros((B,), jnp.int32)
    u0 = jnp.zeros((B,), jnp.int32)
    aligns0 = jnp.zeros((B, U), jnp.int32)
    (_, _, aligns), _ = jax.lax.scan(step, (t0, u0, aligns0), None, length=T + U)
    return aligns
