"""Batched incremental CTC prefix scorer for joint CTC+attention decoding.

Parity target: `CTCPrefixScorer`
(`/root/reference/asr/modeling/decoders/ctc_score.py:13-85`, espnet-style):
state r_t^{n,b}(g) per prefix, per-step scores log psi for K candidate
extensions.  The reference runs numpy per (beam, step) on the host; here
all (B, W, K) candidates advance at once, and the recurrences run as
Kogge-Stone parallel scans instead of a T-long sequential loop.

The API is split for the beam loop's benefit:

- `ctc_prefix_score_psi` returns the selection scores log psi for all
  K candidates.  psi needs NO lattice recursion — it is a logsumexp of
  phi[t-1] + xs[t] over the active window — so this is cheap.
- `ctc_prefix_state_update` advances the r lattice for the ONE token
  per beam that selection actually kept.  The expensive parallel scans
  therefore run over (B, W, T) instead of (B, W, K, T) — the lazy-state
  trick: candidates are scored eagerly, states materialize lazily.
- `ctc_prefix_score_step` is the fused form (psi + states for all K),
  kept for oracle tests and non-beam callers.

Padded-batch handling: rows t >= elen carry the previous row forward so
the end-of-sequence probability (used for the eos candidate) reads
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


def _candidate_inputs(
    log_probs_T: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    cs: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
):
    """Shared per-candidate tensors for psi scoring and lattice updates.

    cs: (B, W, K) candidate tokens.  Returns (xs, phi_prev, run, init_r0,
    start) with xs/phi_prev/run shaped (B, W, K, T) (run broadcasts on K).
    """
    B, V, T = log_probs_T.shape
    W, K = cs.shape[1], cs.shape[2]
    olen = hyp_lens - 1  # output length excluding the leading eos (B, W)

    last = jnp.take_along_axis(
        hyps, jnp.maximum(hyp_lens - 1, 0)[:, :, None], axis=2
    )[:, :, 0]  # (B, W)

    # xs: per-candidate emissions (B, W, K, T).  With the (B, V, T)
    # layout each candidate is one CONTIGUOUS T-row, so this is a cheap
    # embedding-style row gather and exact.  (Two rejected layouts: a
    # take_along_axis over (B, T, V) strides by V per frame — ~10 ms/step
    # at L3 sizes; a one-hot (WK, V) x (V, T) matmul is exact only at
    # precision=HIGHEST, which costs ~120 GFLOP/step in f32 passes at
    # W=10, K=15, V=10k.)
    xs = jnp.take_along_axis(
        log_probs_T, cs.reshape(B, W * K)[:, :, None].astype(jnp.int32),
        axis=1,
    ).reshape(B, W, K, T)

    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # (B, W, T)
    is_last = (cs == last[:, :, None]) & (olen > 0)[:, :, None]  # (B, W, K)
    # log_phi (B, W, K, T)
    log_phi = jnp.where(
        is_last[..., None], r_prev[:, :, None, :, 1], r_sum[:, :, None, :]
    )
    phi_prev = jnp.concatenate(
        [jnp.full_like(log_phi[..., :1], LOG_0), log_phi[..., :-1]], axis=-1
    )  # phi[t-1] at position t

    t_idx = jnp.arange(T)
    start = jnp.maximum(olen, 1)  # (B, W)
    run = (
        (t_idx[None, None, None, :] >= start[:, :, None, None])
        & (t_idx[None, None, None, :] < elens[:, None, None, None])
    )  # (B, W, 1, T)

    # initialize: rows < start-1 dead; row start-1 per reference:
    #   olen == 0 -> r[0] = (xs[0], LOG_0); olen > 0 -> r[olen-1] = LOG_0
    init_r0 = jnp.where(
        (olen == 0)[:, :, None], xs[:, :, :, 0], LOG_0
    )  # (B, W, K)
    return xs, phi_prev, run, init_r0, start


def ctc_prefix_score_psi(
    log_probs_T: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    cs: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
    eos_id: int,
) -> jnp.ndarray:
    """Selection scores log psi (B, W, K) for K candidate extensions.

    log_probs_T: (B, V, T) — the frame log-probs TIME-MAJOR-LAST (callers
    transpose once per utterance batch); hyps: (B, W, L) with leading eos;
    hyp_lens (B, W); cs: (B, W, K) candidate tokens; r_prev: (B, W, T, 2).

    psi = LSE(r[start-1, 0], LSE_{t in [start, elen)} phi[t-1] + xs[t])
    needs no lattice recursion, only elementwise work + one reduction —
    the r lattices themselves advance separately (and lazily, only for
    the selected tokens) in `ctc_prefix_state_update`.
    """
    xs, phi_prev, run, init_r0, _ = _candidate_inputs(
        log_probs_T, elens, hyps, hyp_lens, cs, r_prev, blank_id
    )
    contrib = jnp.where(run, phi_prev + xs, LOG_0)
    log_psi = jnp.logaddexp(init_r0, jax.nn.logsumexp(contrib, axis=-1))

    # eos candidate: log(r_T^n(g) + r_T^b(g)) at the last valid frame
    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # (B, W, T)
    r_sum_last = jnp.take_along_axis(
        r_sum, jnp.maximum(elens - 1, 0)[:, None, None], axis=2
    )[:, :, 0]  # (B, W)
    log_psi = jnp.where(cs == eos_id, r_sum_last[:, :, None], log_psi)
    log_psi = jnp.where(cs == blank_id, LOG_0, log_psi)
    return log_psi


def _lattice(
    log_probs_T: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    cs: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Advance the r lattice for cs (B, W, K): returns (B, W, K, T, 2).

    The recurrences
      r0[t] = LSE(r0[t-1], phi[t-1]) + xs[t]
      r1[t] = LSE(r0[t-1], r1[t-1]) + blank[t]
    are first-order LINEAR in the (LSE, +) semiring, so instead of a
    T-long sequential scan (248 tiny steps dominated the whole attention
    beam's step cost) they run as two Kogge-Stone parallel scans of
    log2(T) vectorized sweeps each (ops/rnnt._log_linear_scan).
    Per-beam [start, elen) masking is encoded in the coefficients:
    outside the window a=identity(0), b=LOG_0 carries the row forward.
    """
    from emoasr_tpu.ops.rnnt import _log_linear_scan

    T = log_probs_T.shape[-1]
    xs, phi_prev, run, init_r0, start = _candidate_inputs(
        log_probs_T, elens, hyps, hyp_lens, cs, r_prev, blank_id
    )
    blanks = log_probs_T[:, blank_id][:, None, None, :]  # (B, 1, 1, T)
    t_idx = jnp.arange(T)

    a0 = jnp.where(run, xs, 0.0)
    b0 = jnp.where(run, phi_prev + xs, LOG_0)
    # row start-1 carries the init value
    at_init = t_idx[None, None, None, :] == (start - 1)[:, :, None, None]
    b0 = jnp.where(at_init, init_r0[..., None], b0)
    r0_full = _log_linear_scan(a0, b0)  # (B, W, K, T)

    r0_prev = jnp.concatenate(
        [jnp.full_like(r0_full[..., :1], LOG_0), r0_full[..., :-1]], axis=-1
    )
    a1 = jnp.where(run, blanks, 0.0)
    b1 = jnp.where(run, r0_prev + blanks, LOG_0)
    r1_full = _log_linear_scan(a1, b1)  # (B, W, K, T)

    return jnp.stack([r0_full, r1_full], axis=-1)  # (B, W, K, T, 2)


def ctc_prefix_state_update(
    log_probs_T: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    tok: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Lazy state update: advance r only for the selected token per beam.

    hyps/hyp_lens/r_prev are the PARENT beams (post-selection gather,
    pre-extension); tok: (B, W) the token each beam was extended with.
    Returns the new r lattice (B, W, T, 2).  Elementwise identical to
    slicing the fused `ctc_prefix_score_step` state at the selected
    candidate — the scans just skip the K-1 losers.
    """
    r_new = _lattice(
        log_probs_T, elens, hyps, hyp_lens, tok[:, :, None], r_prev, blank_id
    )
    return r_new[:, :, 0]


def ctc_prefix_score_step(
    log_probs_T: jnp.ndarray,
    elens: jnp.ndarray,
    hyps: jnp.ndarray,
    hyp_lens: jnp.ndarray,
    cs: jnp.ndarray,
    r_prev: jnp.ndarray,
    blank_id: int,
    eos_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused form: psi (B, W, K) AND advanced states (B, W, K, T, 2) for
    every candidate.  The beam loop uses the split psi/lazy-update API
    instead; this stays for oracle tests and exhaustive callers."""
    log_psi = ctc_prefix_score_psi(
        log_probs_T, elens, hyps, hyp_lens, cs, r_prev, blank_id, eos_id
    )
    r_new = _lattice(
        log_probs_T, elens, hyps, hyp_lens, cs, r_prev, blank_id
    )
    return log_psi, r_new
