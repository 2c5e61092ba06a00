"""Batched ALSD-style RNN-T beam search (jitted).

Parity target: `RNNTDecoder._beam_search`
(`/root/reference/asr/modeling/decoders/rnn_transducer.py:242-325`):
time-synchronous decoding with NUM_EXPANDS=3 label expansions per frame,
blank expansions accumulated across rounds, per-round local pruning, path
merging with logaddexp over total scores, prediction-net states carried
per-beam (a beam's stored state reflects hyp[:-1]; the recurrency consumes
hyp[-1] on evaluation — same invariant as the reference).

The reference runs one utterance at a time with Python dict beams and a
batched-over-beams prediction net; here the whole (B, W) beam tensor
advances through one `lax.scan` over frames.

Merging detail: within one expansion round, extensions of distinct parents
cannot collide (parents are unique), so only the cross-round blank pool is
merged (same double-hash identity as search/common.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from emoasr_tpu.search.common import (
    DEAD,
    gather_beams,
    hash_extend,
    hash_init,
    topk_lastdim,
)

NUM_EXPANDS = 3


class _Beams(NamedTuple):
    hyps: jnp.ndarray  # (B, W, Lmax)
    lens: jnp.ndarray  # (B, W)
    scores: jnp.ndarray  # (B, W) total (logaddexp-merged)
    dstates: jnp.ndarray  # (B, W, layers, 2, H) state for hyp[:-1]
    h1: jnp.ndarray
    h2: jnp.ndarray
    lm_states: object  # fusion LM states with (B, W, ...) leaves, or None


def rnnt_beam_search(
    eouts: jnp.ndarray,
    elens: jnp.ndarray,
    recurrency_fn: Callable,
    joint_fn: Callable,
    num_layers: int,
    dec_hidden: int,
    beam_width: int,
    vocab_size: int,
    blank_id: int = 0,
    eos_id: int = 2,
    max_hyp_len: int = 257,
    lm=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ALSD beam search over a batch.

    recurrency_fn(tokens (N, 1), dstates (layers, 2, N, H)) ->
        (douts (N, D), new_dstates)
    joint_fn(eouts_t (N, E), douts (N, D)) -> logits (N, V)

    Returns (hyps (B, W, Lmax) incl. leading eos, lens, scores) best-first.
    `lm` (LMFusion) adds shallow fusion on label expansions.
    """
    B, T, E = eouts.shape
    W = beam_width
    K = min(beam_width, vocab_size - 1)
    Lmax = max_hyp_len
    A = NUM_EXPANDS * W  # blank-pool size per frame

    hyps0 = jnp.full((B, W, Lmax), blank_id, jnp.int32).at[:, :, 0].set(eos_id)
    h1, h2 = hash_init((B, W))
    h1, h2 = hash_extend((h1, h2), jnp.full((B, W), eos_id))
    beams = _Beams(
        hyps=hyps0,
        lens=jnp.ones((B, W), jnp.int32),
        scores=jnp.where(
            jnp.arange(W)[None, :] == 0, 0.0, DEAD
        ).astype(jnp.float32).repeat(B, 0).reshape(B, W),
        dstates=jnp.zeros((B, W, num_layers, 2, dec_hidden), eouts.dtype),
        h1=h1,
        h2=h2,
        lm_states=lm.init_states(B, W) if lm is not None else None,
    )

    b_idx = jnp.arange(B)[:, None]
    w_idx = jnp.arange(W)[None, :]

    def flat_recurrency(last_tok, dstates_bw):
        """(B, W) tokens + (B, W, layers, 2, H) -> (B, W, D), new states."""
        N = B * W
        toks = last_tok.reshape(N, 1)
        ds = dstates_bw.reshape(N, num_layers, 2, dec_hidden).transpose(
            1, 2, 0, 3
        )
        douts, new_ds = recurrency_fn(toks, ds)
        new_bw = new_ds.transpose(2, 0, 1, 3).reshape(
            B, W, num_layers, 2, dec_hidden
        )
        return douts.reshape(B, W, -1), new_bw

    def step(beams: _Beams, inputs):
        e_t, t = inputs  # (B, E), scalar
        active_b = (t < elens)[:, None]

        # blank pool accumulated across rounds
        a_hyps = jnp.zeros((B, A, Lmax), jnp.int32)
        a_lens = jnp.zeros((B, A), jnp.int32)
        a_scores = jnp.full((B, A), DEAD, jnp.float32)
        a_dstates = jnp.zeros(
            (B, A, num_layers, 2, dec_hidden), eouts.dtype
        )
        a_h1 = jnp.zeros((B, A), jnp.uint32)
        a_h2 = jnp.zeros((B, A), jnp.uint32)
        a_lm_states = (
            jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x] * NUM_EXPANDS, axis=1
                ),
                beams.lm_states,
            )
            if lm is not None and beams.lm_states is not None else None
        )

        cur = beams
        for v_round in range(NUM_EXPANDS):
            alive = cur.scores > DEAD / 2
            last_tok = jnp.take_along_axis(
                cur.hyps, jnp.maximum(cur.lens - 1, 0)[:, :, None], axis=2
            )[:, :, 0]
            douts, new_dstates = flat_recurrency(last_tok, cur.dstates)
            logits = joint_fn(
                jnp.broadcast_to(e_t[:, None, :], (B, W, E)).reshape(B * W, E),
                douts.reshape(B * W, -1),
            ).reshape(B, W, vocab_size)
            sa = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

            # ---- blank expansion into the A pool (dstate NOT advanced) ----
            sl = slice(v_round * W, (v_round + 1) * W)
            blank_sc = jnp.where(
                alive, cur.scores + sa[:, :, blank_id], DEAD
            )
            a_hyps = a_hyps.at[:, sl].set(cur.hyps)
            a_lens = a_lens.at[:, sl].set(cur.lens)
            a_scores = a_scores.at[:, sl].set(blank_sc)
            a_dstates = a_dstates.at[:, sl].set(cur.dstates)
            a_h1 = a_h1.at[:, sl].set(cur.h1)
            a_h2 = a_h2.at[:, sl].set(cur.h2)
            if a_lm_states is not None:
                a_lm_states = jax.tree_util.tree_map(
                    lambda a, c: a.at[:, sl].set(c), a_lm_states, cur.lm_states
                )

            # ---- non-blank expansion (last round skips) ----
            if v_round < NUM_EXPANDS - 1:
                # the reference's topk runs over vocab[1:], i.e. assumes
                # blank_id == 0 (rnn_transducer.py:301-303)
                sa_nb = sa[:, :, 1:]
                if lm is not None:
                    # states advance only when a label is emitted; blank
                    # candidates keep the pre-step LM state
                    lm_logp, lm_new_states = lm.predict_beams(
                        cur.hyps, cur.lens, cur.lm_states
                    )
                    sa_nb = sa_nb + lm.weight * lm_logp[:, :, 1:]
                top_sc, top_v = topk_lastdim(sa_nb, K)  # (B, W, K)
                top_v = top_v + 1
                cand_scores = jnp.where(
                    alive[:, :, None]
                    & (cur.lens[:, :, None] < Lmax - 1),
                    cur.scores[:, :, None] + top_sc,
                    DEAD,
                ).reshape(B, W * K)
                sel_sc, sel_idx = jax.lax.top_k(cand_scores, W)  # (B, W)
                parent = sel_idx // K
                tok = jnp.take_along_axis(
                    top_v.reshape(B, W * K), sel_idx, axis=1
                )
                new_hyps = gather_beams(cur.hyps, parent)
                new_lens = jnp.take_along_axis(cur.lens, parent, axis=1) + 1
                pos = jnp.minimum(new_lens - 1, Lmax - 1)
                new_hyps = new_hyps.at[b_idx, w_idx, pos].set(
                    jnp.where(sel_sc > DEAD / 2, tok, new_hyps[b_idx, w_idx, pos])
                )
                ph = (
                    jnp.take_along_axis(cur.h1, parent, axis=1),
                    jnp.take_along_axis(cur.h2, parent, axis=1),
                )
                nh1, nh2 = hash_extend(ph, tok)
                cur = _Beams(
                    hyps=new_hyps,
                    lens=new_lens,
                    scores=sel_sc,
                    dstates=gather_beams(new_dstates, parent),
                    h1=nh1,
                    h2=nh2,
                    lm_states=(
                        gather_beams(lm_new_states, parent)
                        if lm is not None and lm_new_states is not None
                        else cur.lm_states
                    ),
                )

        # ---- merge the A pool (first occurrence canonical) and prune ----
        valid = a_scores > DEAD / 2
        eq = (
            (a_h1[:, :, None] == a_h1[:, None, :])
            & (a_h2[:, :, None] == a_h2[:, None, :])
            & (a_lens[:, :, None] == a_lens[:, None, :])
            & valid[:, :, None]
            & valid[:, None, :]
        )
        first_eq = jnp.argmax(eq, axis=2)
        is_canon = first_eq == jnp.arange(A)[None, :]
        merged = jax.nn.logsumexp(
            jnp.where(eq, a_scores[:, None, :], DEAD), axis=2
        )
        merged = jnp.where(valid & is_canon, merged, DEAD)

        top_sc, top_idx = jax.lax.top_k(merged, W)
        new_beams = _Beams(
            hyps=gather_beams(a_hyps, top_idx),
            lens=jnp.take_along_axis(a_lens, top_idx, axis=1),
            scores=top_sc,
            dstates=gather_beams(a_dstates, top_idx),
            h1=jnp.take_along_axis(a_h1, top_idx, axis=1),
            h2=jnp.take_along_axis(a_h2, top_idx, axis=1),
            lm_states=(
                gather_beams(a_lm_states, top_idx)
                if a_lm_states is not None else None
            ),
        )

        def pick(nf, of):
            if nf is None:
                return None
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    active_b.reshape((B,) + (1,) * (n.ndim - 1)), n, o
                ),
                nf, of,
            )

        out = _Beams(*[pick(nf, of) for nf, of in zip(new_beams, beams)])
        return out, None

    e_seq = eouts.transpose(1, 0, 2)  # (T, B, E)
    beams, _ = jax.lax.scan(step, beams, (e_seq, jnp.arange(T)))

    order = jnp.argsort(-beams.scores, axis=1)
    return (
        gather_beams(beams.hyps, order),
        jnp.take_along_axis(beams.lens, order, axis=1),
        jnp.take_along_axis(beams.scores, order, axis=1),
    )
