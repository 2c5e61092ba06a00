"""Batched incremental CTC prefix scorer for joint CTC+attention decoding.

Parity target: `CTCPrefixScorer`
(`/root/reference/asr/modeling/decoders/ctc_score.py:13-85`, espnet-style):
state r_t^{n,b}(g) per prefix, per-step scores log psi for K candidate
extensions.  The reference runs numpy per (beam, step) on the host; here one
`lax.scan` over frames advances all (B, W, K) candidates at once.

Padded-batch handling: rows t >= elen carry the previous row forward so the
end-of-sequence probability (used for the eos candidate) reads
r_sum at elen-1, matching the reference's exact-length inputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from emoasr_tpu.ops.common import LOG_0


def ctc_prefix_initial_state(
    log_probs: jnp.ndarray, elens: jnp.ndarray, blank_id: int, num_beams: int
) -> jnp.ndarray:
    """(B, T, V) -> (B, W, T, 2) initial r: blank-run cumsum in channel 1
    (ctc_score.py:20-33), frozen past elens."""
    B, T, V = log_probs.shape
    blanks = log_probs[:, :, blank_id]  # (B, T)
    valid = jnp.arange(T)[None, :] < elens[:, None]
    r_b = jnp.cumsum(jnp.where(valid, blanks, 0.0), axis=1)
    r = jnp.stack([jnp.full_like(r_b, LOG_0), r_b], axis=-1)  # (B, T, 2)
    return jnp.broadcast_to(r[:, None], (B, num_beams, T, 2))


def ctc_prefix_score_step(
    log_probs: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    cs: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
    eos_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score K candidate extensions of each beam's prefix.

    log_probs: (B, T, V); hyps: (B, W, L) with leading eos; hyp_lens (B, W);
    cs: (B, W, K) candidate tokens; r_prev: (B, W, T, 2).
    Returns (log_psi (B, W, K), r_new (B, W, K, T, 2)).
    """
    B, T, V = log_probs.shape
    W, K = cs.shape[1], cs.shape[2]
    olen = hyp_lens - 1  # output length excluding the leading eos (B, W)

    last = jnp.take_along_axis(
        hyps, jnp.maximum(hyp_lens - 1, 0)[:, :, None], axis=2
    )[:, :, 0]  # (B, W)

    # xs: per-candidate emissions (B, W, K, T)
    xs = jnp.take_along_axis(
        log_probs[:, None, :, :].repeat(W, 1),
        cs[:, :, None, :].astype(jnp.int32).repeat(T, 2),
        axis=3,
    ).transpose(0, 1, 3, 2)
    blanks = log_probs[:, :, blank_id][:, None, None, :]  # (B, 1, 1, T)

    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # (B, W, T)
    is_last = (cs == last[:, :, None]) & (olen > 0)[:, :, None]  # (B, W, K)
    # log_phi (B, W, K, T)
    log_phi = jnp.where(
        is_last[..., None], r_prev[:, :, None, :, 1], r_sum[:, :, None, :]
    )

    t_idx = jnp.arange(T)
    start = jnp.maximum(olen, 1)  # (B, W)

    # initialize: rows < start-1 dead; row start-1 per reference:
    #   olen == 0 -> r[0] = (xs[0], LOG_0); olen > 0 -> r[olen-1] = LOG_0
    init_r0 = jnp.where(
        (olen == 0)[:, :, None], xs[:, :, :, 0], LOG_0
    )  # (B, W, K)
    # psi starts at r[start-1, 0]
    psi0 = init_r0

    elens_bw = elens[:, None, None]  # (B, 1, 1)

    def scan_body(carry, t):
        r0, r1, psi = carry  # (B, W, K) each; state at t-1
        run = (t >= start)[:, :, None] & (t < elens_bw[:, :, 0])[:, :, None]
        xs_t = xs[:, :, :, t]
        phi_tm1 = log_phi[:, :, :, t - 1]
        new_r0 = jnp.logaddexp(r0, phi_tm1) + xs_t
        new_r1 = jnp.logaddexp(r0, r1) + blanks[:, :, :, t]
        new_psi = jnp.logaddexp(psi, phi_tm1 + xs_t)
        r0 = jnp.where(run, new_r0, r0)
        r1 = jnp.where(run, new_r1, r1)
        psi = jnp.where(run, new_psi, psi)
        return (r0, r1, psi), (r0, r1)

    # carries hold the row at t; we iterate t = start .. T-1, but start is
    # per-beam so run over all t with masking.  Row start-1 values:
    carry0 = (init_r0, jnp.full_like(init_r0, LOG_0), psi0)
    (_, _, log_psi), rows = jax.lax.scan(
        scan_body, carry0, jnp.arange(1, T)
    )
    r0_rows, r1_rows = rows  # (T-1, B, W, K)

    # assemble r_new rows: row t for t >= start holds the computed value;
    # rows below start-1 are dead, row start-1 holds the init
    r0_full = jnp.concatenate([carry0[0][None], r0_rows], axis=0)
    r1_full = jnp.concatenate([carry0[1][None], r1_rows], axis=0)
    # r*_full[t] currently holds the carry AFTER processing t (for t>=1) or
    # init (t=0); masked scan already froze rows outside [start, elen)
    r_new = jnp.stack([r0_full, r1_full], axis=-1)  # (T, B, W, K, 2)
    r_new = r_new.transpose(1, 2, 3, 0, 4)  # (B, W, K, T, 2)

    # eos candidate: log(r_T^n(g) + r_T^b(g)) at the last valid frame
    r_sum_last = jnp.take_along_axis(
        r_sum, jnp.maximum(elens - 1, 0)[:, None, None], axis=2
    )[:, :, 0]  # (B, W)
    log_psi = jnp.where(
        cs == eos_id, r_sum_last[:, :, None], log_psi
    )
    log_psi = jnp.where(cs == blank_id, LOG_0, log_psi)
    return log_psi, r_new
