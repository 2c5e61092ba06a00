"""Batched CTC prefix beam search (jitted, whole-corpus batchable).

Parity target: `CTCDecoder._beam_search`
(`/root/reference/asr/modeling/decoders/ctc.py:203-344`): p_b/p_nb prefix
bookkeeping, per-step top-k token expansion, path merging with logaddexp,
length reward `len_weight * |hyp|`, optional LM shallow fusion via
`lm.predict`.  The reference runs one utterance at a time with Python dict
beams and host logaddexp per step; here the whole batch advances through one
`lax.scan` over time with (B, W) beam tensors.

Documented divergence: the reference accumulates `score_lm` IN-PLACE across
the top-k candidates of one parent (`ctc.py:309-310`), so candidate k
carries the LM scores of candidates 0..k — an evident bug.  This
implementation scores each candidate with exactly its own token's LM
log-prob.

Path merging: candidates are identical only when a non-extended beam j
equals an extended beam i+[v]; identity is tested via double 32-bit rolling
hashes (see search/common.py).  Merge semantics match the reference's dict:
first candidate in enumeration order keeps its score_lm/score_len/LM state;
p_b/p_nb/score_asr merge with logaddexp.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from emoasr_tpu.ops.common import LOG_0
from emoasr_tpu.search.common import (
    DEAD,
    LMFusion,
    gather_beams,
    hash_extend,
    hash_init,
    topk_lastdim,
)


class _BeamState(NamedTuple):
    hyps: jnp.ndarray  # (B, W, Lmax) int32, hyps[:, :, 0] = eos
    lens: jnp.ndarray  # (B, W) int32 (>= 1)
    p_b: jnp.ndarray  # (B, W)
    p_nb: jnp.ndarray  # (B, W)
    score_asr: jnp.ndarray
    score_lm: jnp.ndarray
    score_len: jnp.ndarray
    n_noneos: jnp.ndarray  # (B, W) count of non-eos tokens in hyp
    h1: jnp.ndarray  # (B, W) uint32 rolling hashes
    h2: jnp.ndarray
    lm_states: Optional[jnp.ndarray]


def ctc_beam_search(
    log_probs: jnp.ndarray,
    elens: jnp.ndarray,
    beam_width: int,
    blank_id: int = 0,
    eos_id: int = 2,
    len_weight: float = 0.0,
    lm: Optional[LMFusion] = None,
    max_hyp_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run prefix beam search over a batch.

    log_probs: (B, T, V) log-softmax CTC outputs.
    Returns (hyps (B, W, Lmax) incl. leading eos, hyp_lens (B, W),
    scores (B, W)), beams sorted best-first.
    """
    B, T, V = log_probs.shape
    W = beam_width
    K = min(beam_width, V)
    Lmax = max_hyp_len or min(T + 1, 257)

    lm_weight = lm.weight if lm is not None else 0.0

    hyps0 = jnp.full((B, W, Lmax), blank_id, jnp.int32)
    hyps0 = hyps0.at[:, :, 0].set(eos_id)
    h1, h2 = hash_init((B, W))
    h1, h2 = hash_extend((h1, h2), jnp.full((B, W), eos_id))
    state = _BeamState(
        hyps=hyps0,
        lens=jnp.ones((B, W), jnp.int32),
        p_b=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, LOG_0)
        .astype(jnp.float32)
        .repeat(B, 0)
        .reshape(B, W),
        p_nb=jnp.full((B, W), LOG_0, jnp.float32),
        score_asr=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, DEAD)
        .astype(jnp.float32)
        .repeat(B, 0)
        .reshape(B, W),
        score_lm=jnp.zeros((B, W), jnp.float32),
        score_len=jnp.zeros((B, W), jnp.float32),
        n_noneos=jnp.zeros((B, W), jnp.int32),
        h1=h1,
        h2=h2,
        lm_states=lm.init_states(B, W) if lm is not None else None,
    )

    C = W * (K + 1)  # candidates per batch row, reference enumeration order
    b_idx = jnp.arange(B)[:, None]

    def step(state: _BeamState, inputs):
        lp_t, t = inputs  # (B, V), scalar
        active_b = (t < elens)[:, None]  # (B, 1)
        alive = state.score_asr > DEAD / 2  # (B, W)

        # per-step top-k candidate tokens (ctc.py:240-247)
        _, v_topk = topk_lastdim(lp_t, K)  # (B, K)

        if lm is not None:
            lm_logp, new_lm_states = lm.predict_beams(
                state.hyps, state.lens, state.lm_states
            )  # (B, W, V)
        else:
            lm_logp, new_lm_states = None, None

        lp_blank = lp_t[:, blank_id][:, None]  # (B, 1)
        last_tok = jnp.take_along_axis(
            state.hyps, jnp.maximum(state.lens - 1, 0)[:, :, None], axis=2
        )[:, :, 0]  # (B, W)
        has_last = state.lens > 1

        # ---- case 1: not extended ----
        c1_p_b = jnp.logaddexp(state.p_b, state.p_nb) + lp_blank
        lp_last = jnp.take_along_axis(lp_t, last_tok.astype(jnp.int32), axis=1)
        c1_p_nb = jnp.where(has_last, state.p_nb + lp_last, LOG_0)
        c1_asr = jnp.logaddexp(c1_p_b, c1_p_nb)

        # ---- case 2: extended with v_topk ----
        v = v_topk[:, None, :]  # (B, 1, K)
        lp_v = jnp.take_along_axis(lp_t, v_topk, axis=1)[:, None, :]  # (B,1,K)
        same = (v == last_tok[:, :, None]) & has_last[:, :, None]
        c2_p_nb = jnp.where(
            same,
            state.p_b[:, :, None] + lp_v,
            jnp.logaddexp(state.p_b, state.p_nb)[:, :, None] + lp_v,
        )  # (B, W, K)
        c2_p_b = jnp.full_like(c2_p_nb, LOG_0)
        c2_asr = c2_p_nb
        # score_len = len_weight * (|strip_eos(hyp)| + 1) (ctc.py:308):
        # counts non-eos tokens of the parent plus the new token
        c2_len = jnp.broadcast_to(
            len_weight * (state.n_noneos + 1).astype(jnp.float32)[:, :, None],
            (B, W, K),
        )
        if lm is not None:
            lm_v = jnp.take_along_axis(
                lm_logp, jnp.broadcast_to(v, (B, W, K)).astype(jnp.int32), axis=2
            )
            c2_lm = state.score_lm[:, :, None] + lm_weight * lm_v
        else:
            c2_lm = jnp.broadcast_to(state.score_lm[:, :, None], (B, W, K))

        c2_valid = (
            (v != blank_id)
            & alive[:, :, None]
            & (state.lens[:, :, None] < Lmax - 1)
        )

        # ---- assemble candidates in reference order:
        # parent i -> [case1(i), case2(i, k=0..K-1)]
        def interleave(x1, x2):
            # x1 (B, W[,...]), x2 (B, W, K[,...]) -> (B, C[,...])
            ex = jnp.concatenate([x1[:, :, None, ...], x2], axis=2)
            return ex.reshape((B, C) + ex.shape[3:])

        cand_p_b = interleave(c1_p_b, c2_p_b)
        cand_p_nb = interleave(c1_p_nb, c2_p_nb)
        cand_asr = interleave(c1_asr, c2_asr)
        cand_lm = interleave(state.score_lm, c2_lm)
        cand_len = interleave(state.score_len, c2_len)
        cand_parent = jnp.broadcast_to(
            (jnp.arange(C) // (K + 1))[None, :], (B, C)
        )
        cand_ext_tok = interleave(
            jnp.full((B, W), -1), jnp.broadcast_to(v, (B, W, K))
        )  # -1 for case-1
        is_ext = cand_ext_tok >= 0
        cand_lens = interleave(
            state.lens, state.lens[:, :, None] + jnp.zeros((1, 1, K), jnp.int32) + 1
        )
        c2_noneos = state.n_noneos[:, :, None] + (
            jnp.broadcast_to(v, (B, W, K)) != eos_id
        ).astype(jnp.int32)
        cand_noneos = interleave(state.n_noneos, c2_noneos)
        cand_valid = interleave(alive, c2_valid)

        # hashes: case1 keeps parent hash; case2 extends with v
        e1, e2 = hash_extend(
            (state.h1[:, :, None], state.h2[:, :, None]),
            jnp.broadcast_to(v, (B, W, K)),
        )
        cand_h1 = interleave(state.h1, e1)
        cand_h2 = interleave(state.h2, e2)

        # ---- merge identical candidates (first occurrence canonical) ----
        eq = (
            (cand_h1[:, :, None] == cand_h1[:, None, :])
            & (cand_h2[:, :, None] == cand_h2[:, None, :])
            & (cand_lens[:, :, None] == cand_lens[:, None, :])
            & cand_valid[:, :, None]
            & cand_valid[:, None, :]
        )  # (B, C, C)
        first_eq = jnp.argmax(eq, axis=2)  # first equal index (incl. self)
        is_canon = first_eq == jnp.arange(C)[None, :]

        def lse_merge(x):
            # logsumexp over the rows equal to each canonical candidate
            contrib = jnp.where(eq, x[:, None, :], LOG_0)
            return jax.nn.logsumexp(contrib, axis=2)

        m_p_b = lse_merge(cand_p_b)
        m_p_nb = lse_merge(cand_p_nb)
        m_asr = lse_merge(cand_asr)

        score = m_asr + cand_lm + cand_len
        score = jnp.where(cand_valid & is_canon, score, DEAD)

        # ---- prune to W ----
        top_scores, top_idx = jax.lax.top_k(score, W)  # (B, W)

        parent = jnp.take_along_axis(cand_parent, top_idx, axis=1)
        new_hyps = gather_beams(state.hyps, parent)
        ext_tok = jnp.take_along_axis(cand_ext_tok, top_idx, axis=1)
        new_lens_g = jnp.take_along_axis(cand_lens, top_idx, axis=1)
        ext = jnp.take_along_axis(is_ext, top_idx, axis=1)
        # write extension token at position len-1 (only for extended)
        pos = jnp.minimum(new_lens_g - 1, Lmax - 1)
        written = new_hyps.at[
            b_idx, jnp.arange(W)[None, :], pos
        ].set(jnp.where(ext, ext_tok, new_hyps[b_idx, jnp.arange(W)[None, :], pos]))

        new_state = _BeamState(
            hyps=written,
            lens=new_lens_g,
            p_b=jnp.take_along_axis(m_p_b, top_idx, axis=1),
            p_nb=jnp.take_along_axis(m_p_nb, top_idx, axis=1),
            score_asr=jnp.take_along_axis(m_asr, top_idx, axis=1),
            score_lm=jnp.take_along_axis(cand_lm, top_idx, axis=1),
            score_len=jnp.take_along_axis(cand_len, top_idx, axis=1),
            n_noneos=jnp.take_along_axis(cand_noneos, top_idx, axis=1),
            h1=jnp.take_along_axis(cand_h1, top_idx, axis=1),
            h2=jnp.take_along_axis(cand_h2, top_idx, axis=1),
            # case-1 keeps the parent's pre-step LM state ("do not update",
            # ctc.py:286); case-2 takes the advanced state
            lm_states=(
                jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        ext.reshape(ext.shape + (1,) * (new.ndim - 2)),
                        new, old,
                    ),
                    gather_beams(new_lm_states, parent),
                    gather_beams(state.lm_states, parent),
                )
                if lm is not None and state.lm_states is not None
                else None
            ),
        )
        # clamp dead slots' scores
        new_state = new_state._replace(
            score_asr=jnp.where(top_scores <= DEAD / 2, DEAD, new_state.score_asr)
        )

        # freeze batch rows past their length
        def freeze(new, old):
            if new is None or old is None:
                return new
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    active_b.reshape((B,) + (1,) * (n.ndim - 1)), n, o
                ),
                new, old,
            )

        merged = _BeamState(*[freeze(n, o) for n, o in zip(new_state, state)])
        return merged, None

    lp_seq = log_probs.transpose(1, 0, 2)  # (T, B, V)
    state, _ = jax.lax.scan(step, state, (lp_seq, jnp.arange(T)))

    total = state.score_asr + state.score_lm + state.score_len
    order = jnp.argsort(-total, axis=1)
    hyps = gather_beams(state.hyps, order)
    lens = jnp.take_along_axis(state.lens, order, axis=1)
    scores = jnp.take_along_axis(total, order, axis=1)
    return hyps, lens, scores
