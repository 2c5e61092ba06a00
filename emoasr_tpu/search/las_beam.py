"""Batched label-synchronous beam search for the LAS decoder.

Parity target: `LASDecoder.decode` (`/root/reference/asr/modeling/decoders/
las.py:176-285`):
- beams start as [eos]; per step each beam expands with its top-W tokens
  from the attention log-softmax, the W*W pool is pruned to W by cumulative
  score (the reference's LM/CTC fusion branches are literal `pass` stubs,
  las.py:233-249, so attention scores are the whole objective)
- a beam ending in <eos> is finalized with a `len_weight * |hyp|` bonus
  (|hyp| counts both framing eos); "only <eos>" hyps are rejected; the
  search stops once beam_width results exist (here: per-batch-row freeze)

The reference decodes batch-size-1 with host Python (`assert bs == 1`);
this runs the whole batch and all beams in one jitted `lax.while_loop`.
The recurrent decoder state (LSTM h/c per layer, context vector, previous
attention weights) is carried as a (B, W, ...) pytree and beam-gathered on
pruning.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from emoasr_tpu.search.common import DEAD, gather_beams, topk_lastdim


class _State(NamedTuple):
    step: jnp.ndarray
    hyps: jnp.ndarray  # (B, W, Lmax), leading eos
    lens: jnp.ndarray  # (B, W) incl leading eos
    carry: tuple  # decoder state, (B, W, ...) leaves
    scores: jnp.ndarray  # (B, W)
    res_hyps: jnp.ndarray
    res_lens: jnp.ndarray
    res_scores: jnp.ndarray
    res_count: jnp.ndarray  # (B,)
    lm_states: tuple = ()  # LM fusion states, (B, W, ...) leaves (or ())


def las_beam_search(
    step_fn: Callable,
    carry0,
    batch_size: int,
    vocab_size: int,
    beam_width: int,
    eos_id: int = 2,
    len_weight: float = 0.0,
    max_decode_ylen: int = 256,
    lm=None,
):
    """Beam search over a batch with a recurrent one-step decoder.

    step_fn(carry_flat, tokens (B*W,)) -> (carry_flat, log_probs (B*W, V));
    carry0 leaves are (B*W, ...) (caller tiles the encoder side W times).
    Returns (hyps (B, W, Lmax) with eos framing, lens, scores) best-first.

    `lm`: optional LMFusion (search/common.py) for in-loop shallow fusion
    — candidate scores become att_logp + lm.weight * lm_logp, same
    semantics as the attention beam.  The reference stubs these hooks
    (`asr/modeling/decoders/las.py:233-236` is a literal `pass`); this
    implements them first-class.  LM states are beam-gathered on pruning
    like the decoder carry (advance-on-extend, keep-parent).
    """
    B, W, V = batch_size, beam_width, vocab_size
    Lmax = max_decode_ylen + 2
    lm_weight = lm.weight if lm is not None else 0.0

    hyps0 = jnp.full((B, W, Lmax), eos_id, jnp.int32)
    state = _State(
        step=jnp.int32(0),
        hyps=hyps0,
        lens=jnp.ones((B, W), jnp.int32),
        carry=jax.tree_util.tree_map(
            lambda x: x.reshape((B, W) + x.shape[1:]), carry0
        ),
        scores=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, DEAD)
        .astype(jnp.float32).repeat(B, 0).reshape(B, W),
        res_hyps=hyps0,
        res_lens=jnp.zeros((B, W), jnp.int32),
        res_scores=jnp.full((B, W), DEAD, jnp.float32),
        res_count=jnp.zeros((B,), jnp.int32),
        lm_states=(lm.init_states(B, W) if lm is not None else ()),
    )

    b_idx = jnp.arange(B)[:, None]
    w_idx = jnp.arange(W)[None, :]

    def cond(state: _State):
        active = (state.scores > DEAD / 2).any(axis=1)
        running = active & (state.res_count < W)
        return (state.step < max_decode_ylen) & running.any()

    def body(state: _State):
        alive = state.scores > DEAD / 2
        row_active = alive.any(axis=1) & (state.res_count < W)

        last_tok = jnp.take_along_axis(
            state.hyps.reshape(B * W, Lmax),
            (jnp.maximum(state.lens.reshape(B * W), 1) - 1)[:, None],
            axis=1,
        )[:, 0]
        carry_flat = jax.tree_util.tree_map(
            lambda x: x.reshape((B * W,) + x.shape[2:]), state.carry
        )
        new_carry_flat, logp = step_fn(carry_flat, last_tok)
        new_carry = jax.tree_util.tree_map(
            lambda x: x.reshape((B, W) + x.shape[1:]), new_carry_flat
        )
        scores_att = logp.astype(jnp.float32).reshape(B, W, V)

        if lm is not None:
            lm_logp, new_lm_states = lm.predict_beams(
                state.hyps, state.lens, state.lm_states
            )
            scores_cand = scores_att + lm_weight * lm_logp.astype(
                jnp.float32
            )
        else:
            new_lm_states = state.lm_states
            scores_cand = scores_att

        sel_sc, sel_tok = topk_lastdim(scores_cand, W)  # (B, W, W)
        pool_sc = jnp.where(
            alive[:, :, None], state.scores[:, :, None] + sel_sc, DEAD
        ).reshape(B, W * W)
        top_sc, top_idx = jax.lax.top_k(pool_sc, W)  # (B, W)
        parent = top_idx // W

        new_hyps = gather_beams(state.hyps, parent)
        tok = jnp.take_along_axis(sel_tok.reshape(B, W * W), top_idx, axis=1)
        new_lens = jnp.take_along_axis(state.lens, parent, axis=1) + 1
        pos = jnp.minimum(new_lens - 1, Lmax - 1)
        new_hyps = new_hyps.at[b_idx, w_idx, pos].set(tok)
        new_carry = gather_beams(new_carry, parent)
        if lm is not None:
            new_lm_states = gather_beams(new_lm_states, parent)

        valid_new = top_sc > DEAD / 2
        ended = (tok == eos_id) & valid_new
        # "only <eos>" hyps (no real token) are rejected (las.py:263-266)
        acceptable = ended & (new_lens > 2)
        final_score = top_sc + len_weight * new_lens.astype(jnp.float32)

        offset = jnp.cumsum(acceptable.astype(jnp.int32), axis=1) - 1
        slot = state.res_count[:, None] + offset
        can_store = acceptable & (slot < W) & row_active[:, None]
        slot_c = jnp.where(can_store, slot, W)  # W = scratch slot
        res_hyps = jnp.concatenate(
            [state.res_hyps, jnp.zeros((B, 1, Lmax), jnp.int32)], axis=1
        )
        res_hyps = res_hyps.at[b_idx, slot_c].set(
            jnp.where(can_store[:, :, None], new_hyps, res_hyps[b_idx, slot_c])
        )[:, :W]
        res_lens = jnp.concatenate(
            [state.res_lens, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        res_lens = res_lens.at[b_idx, slot_c].set(
            jnp.where(can_store, new_lens, res_lens[b_idx, slot_c])
        )[:, :W]
        res_scores = jnp.concatenate(
            [state.res_scores, jnp.zeros((B, 1), jnp.float32)], axis=1
        )
        res_scores = res_scores.at[b_idx, slot_c].set(
            jnp.where(can_store, final_score, res_scores[b_idx, slot_c])
        )[:, :W]
        res_count = state.res_count + jnp.sum(can_store, axis=1)

        cont_scores = jnp.where(ended | ~valid_new, DEAD, top_sc)

        new_state = _State(
            step=state.step + 1,
            hyps=new_hyps,
            lens=new_lens,
            carry=new_carry,
            scores=cont_scores,
            res_hyps=res_hyps,
            res_lens=res_lens,
            res_scores=res_scores,
            res_count=res_count,
            lm_states=new_lm_states,
        )

        # freeze finished batch rows
        def pick(n, o):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    row_active.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                ),
                n, o,
            )

        return _State(
            state.step + 1,
            *[pick(n, o) for n, o in zip(new_state[1:], state[1:])],
        )

    state = jax.lax.while_loop(cond, body, state)

    order = jnp.argsort(-state.res_scores, axis=1)
    return (
        gather_beams(state.res_hyps, order),
        jnp.take_along_axis(state.res_lens, order, axis=1),
        jnp.take_along_axis(state.res_scores, order, axis=1),
    )
