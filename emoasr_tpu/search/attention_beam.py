"""Batched label-synchronous beam search for attention decoders, with joint
CTC prefix scoring, LM shallow fusion, and length penalty.

Parity target: `TransformerDecoder.decode`
(`/root/reference/asr/modeling/decoders/transformer.py:160-294`):
- per step: full-prefix one-step forward, log-softmax scores
- optional LM fusion added BEFORE candidate pre-selection
- optional joint CTC: pre-select ctc_beam_width = 1.5x beam candidates by
  (att + lm), re-score with (1-w)*att + w*(ctc prefix delta) + lm
- global prune to beam_width; beams ending in <eos> are finalized with a
  `len_weight * |hyp|` bonus ("only <eos>" hyps rejected); search stops once
  beam_width results exist (here: per-batch-row freeze inside one
  `lax.while_loop` over label steps).

The reference decodes batch-size-1 with host Python; this runs the whole
batch and all beams in one jitted loop.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from emoasr_tpu.search.common import (
    DEAD,
    LMFusion,
    gather_beams,
    topk_lastdim,
)
from emoasr_tpu.search.ctc_prefix_score import (
    ctc_prefix_initial_state,
    ctc_prefix_score_psi,
    ctc_prefix_state_update,
)

CTC_BEAM_WIDTH_RATIO = 1.5  # transformer.py:22

# cache-length stage boundaries for the staged beam loop (see
# attention_beam_search).  None = adaptive (~Lmax/4 and ~Lmax/2, rounded
# to multiples of 8): three stages balance per-step cache/re-encode
# traffic (~0.70x of unstaged average) against while-loop compile count.
# Tests override with explicit bounds to force transitions at toy sizes.
STAGE_BOUNDS = None

# measurement-only knob (tools/stub_full.py): when True the while-loop
# conditions ignore convergence and run every stage to its step cap, so
# component-stubbed variants execute identical trip counts and their
# time deltas are per-step-comparable.  Results stay correct (res_*
# writes are row_active-gated); never set in production paths.  Use the
# `force_full_steps()` context manager rather than assigning the global:
# a forgotten reset pins every later trace in the process to its step
# cap (ADVICE r4).
FORCE_FULL_STEPS = False


@contextmanager
def force_full_steps(enabled: bool = True):
    """Scoped override of FORCE_FULL_STEPS (restores the prior value)."""
    global FORCE_FULL_STEPS
    prev = FORCE_FULL_STEPS
    FORCE_FULL_STEPS = enabled
    try:
        yield
    finally:
        FORCE_FULL_STEPS = prev


class _State(NamedTuple):
    step: jnp.ndarray
    hyps: jnp.ndarray  # (B, W, Lmax), leading eos
    lens: jnp.ndarray  # (B, W)
    caches: Optional[list]  # per-layer (k, v) with (B, W, Lmax, ...) leaves
    scores: jnp.ndarray  # (B, W)
    score_ctc: jnp.ndarray  # (B, W)
    ctc_state: Optional[jnp.ndarray]  # (B, W, T, 2)
    lm_states: Optional[jnp.ndarray]
    res_hyps: jnp.ndarray  # (B, W, Lmax)
    res_lens: jnp.ndarray  # (B, W)
    res_scores: jnp.ndarray  # (B, W)
    res_count: jnp.ndarray  # (B,)


def attention_beam_search(
    eouts: jnp.ndarray,
    elens: jnp.ndarray,
    step_fn: Callable,
    vocab_size: int,
    beam_width: int,
    eos_id: int = 2,
    blank_id: int = 0,
    len_weight: float = 0.0,
    lm: Optional[LMFusion] = None,
    decode_ctc_weight: float = 0.0,
    ctc_log_probs: Optional[jnp.ndarray] = None,
    max_decode_ylen: int = 256,
    cached_step: Optional[Tuple[Callable, Callable]] = None,
    row_caps: Optional[jnp.ndarray] = None,
    need_results: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Label-sync beam search over a batch.

    step_fn(flat_hyps (N, Lmax), flat_lens (N,), eouts_rep (N, T, E),
            elens_rep (N,)) -> logits (N, V): one-step decoder forward.
    `cached_step` = (init_cache(N, Lmax) -> caches,
    step(tokens (N,), pos (N,), caches) -> (logits, caches)) switches to
    incremental KV-cached decoding (O(1) work per step instead of
    re-encoding the whole prefix); caches are beam-gathered on pruning.
    Returns (hyps (B, W, Lmax) WITHOUT eos framing trimmed — leading eos
    kept, internal eos possible — lens, scores), results best-first.

    `row_caps` (B,) int32, optional: per-utterance decode-step budget
    (e.g. CTC-length-informed, eval/decode.py::ctc_len_caps).  A row
    reaching its cap force-finalizes every surviving beam (score + the
    same length bonus natural eos finalization gets) instead of running
    to the global step cap — so a row whose beams never emit a viable
    eos (the r4 `cannot decode` regime) still returns its best live
    hypotheses, and the batched loop's trip count is bounded by the
    slowest row's LENGTH ESTIMATE rather than `max_decode_ylen`.

    `need_results`, optional (default W): a row stops once this many
    results are stored AND no live beam can still beat the stored best.
    With 1 (top-1 decoding — everything except --nbest), the stop is
    EXACT for the returned best hypothesis: every per-step score
    increment is <= 0 (att/LM log-probs, CTC prefix-score deltas), the
    only positive term is the finalization bonus len_weight*len, so a
    live beam (score s, len l, r steps of row budget left) can never
    finalize above s + len_weight*l + max(len_weight, 0)*r.  The
    reference (transformer.py:264-287) always collects beam_width
    results — for top-1 decoding, most of those steps compute results
    that are then thrown away.
    """
    B, T, E = eouts.shape
    W = beam_width
    V = vocab_size
    Lmax = max_decode_ylen + 2
    use_ctc = decode_ctc_weight > 0
    need = W if need_results is None else min(need_results, W)
    caps = (
        jnp.full((B,), max_decode_ylen, jnp.int32)
        if row_caps is None
        else jnp.minimum(row_caps.astype(jnp.int32), max_decode_ylen)
    )
    # time-major-last table for the prefix scorer's per-candidate row
    # gather (one transpose per utterance batch, loop-invariant)
    ctc_lp_T = (
        ctc_log_probs.transpose(0, 2, 1) if use_ctc else None
    )
    K2 = min(V, int(W * CTC_BEAM_WIDTH_RATIO)) if use_ctc else W
    lm_weight = lm.weight if lm is not None else 0.0

    hyps0 = jnp.full((B, W, Lmax), eos_id, jnp.int32)

    # staged loop: the self-attention caches (and the LM-fusion prefix
    # re-encode) only ever need rows < current length, so the search runs
    # as a sequence of while_loops with growing static cache bounds —
    # per-step cache traffic (attend reads + beam-gather read/write, the
    # dominant decode cost) tracks the actual prefix length instead of
    # Lmax.  Exact: rows >= len are never read (self_mask <= pos), and a
    # row is overwritten at its step before first being attended.
    if STAGE_BOUNDS is None:
        cand = [max(8, Lmax // 4 // 8 * 8), max(16, Lmax // 2 // 8 * 8)]
    else:
        cand = list(STAGE_BOUNDS)
    stage_bounds = sorted({b for b in cand if b < Lmax}) + [Lmax]

    caches0 = None
    step_indirect_fn = None
    if cached_step is not None:
        init_cache_fn, step_cached_fn = cached_step[0], cached_step[1]
        if len(cached_step) > 2:
            step_indirect_fn = cached_step[2]
        caches0 = jax.tree_util.tree_map(
            lambda x: x.reshape((B, W) + x.shape[1:]),
            init_cache_fn(B * W, stage_bounds[0]),
        )
        if step_indirect_fn is not None:
            # ancestor-indirect caches: physical slot order + (B, W, Lc)
            # ancestor table; beam permutations compose into the table
            # instead of gathering the caches (label-sync-safe — each
            # column is written once, at its step)
            caches0 = {
                "caches": caches0,
                "anc": jnp.zeros((B, W, stage_bounds[0]), jnp.int32),
            }

    state = _State(
        step=jnp.int32(0),
        hyps=hyps0,
        lens=jnp.ones((B, W), jnp.int32),
        caches=caches0,
        scores=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, DEAD)
        .astype(jnp.float32).repeat(B, 0).reshape(B, W),
        score_ctc=jnp.zeros((B, W), jnp.float32),
        ctc_state=(
            ctc_prefix_initial_state(ctc_log_probs, elens, blank_id, W)
            if use_ctc
            else None
        ),
        lm_states=(
            lm.indirect.init_states(B, W, stage_bounds[0])
            if lm is not None and lm.indirect is not None
            else lm.init_states(B, W, stage_bounds[0])
            if lm is not None and lm.state_pad_axis is not None
            else lm.init_states(B, W) if lm is not None
            else None
        ),
        res_hyps=hyps0,
        res_lens=jnp.zeros((B, W), jnp.int32),
        res_scores=jnp.full((B, W), DEAD, jnp.float32),
        res_count=jnp.zeros((B,), jnp.int32),
    )

    eouts_rep = jnp.broadcast_to(eouts[:, None], (B, W, T, E)).reshape(
        B * W, T, E
    )
    elens_rep = jnp.broadcast_to(elens[:, None], (B, W)).reshape(B * W)
    b_idx = jnp.arange(B)[:, None]
    w_idx = jnp.arange(W)[None, :]

    def rows_running(state: _State):
        """(B,) rows still doing useful work; shared by the while-loop
        condition and the body's freeze mask so they can never diverge."""
        alive = state.scores > DEAD / 2
        running = alive.any(axis=1) & (state.res_count < W)
        if need < W:
            # admissible top-1 stop (see docstring): bound on the best
            # score any live beam could still finalize with
            lw = jnp.float32(len_weight)
            remaining = jnp.maximum(caps - state.step, 0).astype(jnp.float32)
            live_pot = jnp.max(
                jnp.where(
                    alive,
                    state.scores + lw * state.lens.astype(jnp.float32),
                    DEAD,
                ),
                axis=1,
            ) + jnp.maximum(lw, 0.0) * remaining
            best_stored = jnp.max(state.res_scores, axis=1)
            # 1e-4 slack: err toward running longer under float reordering
            beatable = live_pot >= best_stored - 1e-4
            running = running & ((state.res_count < need) | beatable)
        return running

    def make_cond(step_cap: int):
        if FORCE_FULL_STEPS:
            return lambda state: state.step < step_cap

        def cond(state: _State):
            return (state.step < step_cap) & rows_running(state).any()

        return cond

    def make_body(Lc: int):
        return lambda state: body(state, Lc)

    def body(state: _State, Lc: int):
        alive = state.scores > DEAD / 2  # (B, W)
        row_active = rows_running(state)  # (B,)

        flat_hyps = state.hyps.reshape(B * W, Lmax)
        flat_lens = jnp.maximum(state.lens.reshape(B * W), 1)
        if step_indirect_fn is not None:
            last_tok = jnp.take_along_axis(
                flat_hyps, (flat_lens - 1)[:, None], axis=1
            )[:, 0]
            posb = jnp.minimum(
                jnp.maximum(state.lens, 1) - 1, Lc - 1
            ).astype(jnp.int32)
            anc = state.caches["anc"].at[b_idx, w_idx, posb].set(
                jnp.broadcast_to(w_idx, (B, W))
            )
            logits, new_inner = step_indirect_fn(
                last_tok, posb, state.caches["caches"], anc
            )
            new_caches = {"caches": new_inner, "anc": anc}
        elif cached_step is not None:
            last_tok = jnp.take_along_axis(
                flat_hyps, (flat_lens - 1)[:, None], axis=1
            )[:, 0]
            flat_caches = jax.tree_util.tree_map(
                lambda x: x.reshape((B * W,) + x.shape[2:]), state.caches
            )
            logits, new_flat_caches = step_cached_fn(
                last_tok, flat_lens - 1, flat_caches
            )
            new_caches = jax.tree_util.tree_map(
                lambda x: x.reshape((B, W) + x.shape[1:]), new_flat_caches
            )
        else:
            # causal decoder: positions >= the stage bound are all beyond
            # every live prefix, so re-encoding the sliced buffer is exact
            logits = step_fn(
                flat_hyps[:, :Lc], jnp.minimum(flat_lens, Lc),
                eouts_rep, elens_rep,
            )
            new_caches = None
        scores_att = jax.nn.log_softmax(
            logits.astype(jnp.float32), -1
        ).reshape(B, W, V)

        if lm is not None:
            lm_predict = (
                lm.indirect.predict_beams
                if lm.indirect is not None
                else lm.predict_beams
            )
            lm_logp, new_lm_states = lm_predict(
                state.hyps[:, :, :Lc], state.lens, state.lm_states
            )
            lm_logp = lm_logp[:, :, :V]
            scores_pre = scores_att + lm_weight * lm_logp
        else:
            lm_logp, new_lm_states = None, None
            scores_pre = scores_att

        if row_caps is not None:
            # a step-0 eos candidate is ALWAYS rejected ("only <eos>",
            # below) — selecting it only wastes a beam slot, and at
            # W==1 it kills the whole row (then nothing remains to
            # force-finalize at the cap).  Masking it is WER-neutral.
            scores_pre = scores_pre.at[:, :, eos_id].add(
                jnp.where(state.step == 0, DEAD, 0.0)
            )

        if use_ctc:
            # pre-select K2 candidates by att(+lm) (transformer.py:222-232)
            pre_sc, v_topb = topk_lastdim(scores_pre, K2)  # (B, W, K2)
            # psi only — the lattice state advances lazily AFTER selection
            # (ctc_prefix_state_update below), so the Kogge-Stone scans
            # run over W winners instead of W*K2 candidates
            psi = ctc_prefix_score_psi(
                ctc_lp_T, elens, state.hyps, state.lens, v_topb,
                state.ctc_state, blank_id, eos_id,
            )
            # the reference re-scores (1-w)*scores + w*ctc_delta + lm, where
            # `scores` was ALREADY att + lm (it aliases and mutates in
            # place, transformer.py:220-244) — effective LM weight
            # (2-w)*lm_weight.  Reproduced exactly: the published +CTC+SF
            # operating points were tuned under this formula.
            cand = (
                (1 - decode_ctc_weight) * pre_sc
                + decode_ctc_weight * (psi - state.score_ctc[:, :, None])
            )
            if lm is not None:
                cand = cand + lm_weight * jnp.take_along_axis(
                    lm_logp, v_topb, axis=2
                )
            # per-parent top-W among the K2 (reference then pools W*W)
            sel_sc, sel_i = jax.lax.top_k(cand, W)  # (B, W, W)
            sel_tok = jnp.take_along_axis(v_topb, sel_i, axis=2)
            sel_psi = jnp.take_along_axis(psi, sel_i, axis=2)
        else:
            sel_sc, sel_tok = topk_lastdim(scores_pre, W)  # (B, W, W)
            sel_psi = None

        K = W
        pool_sc = jnp.where(
            alive[:, :, None], state.scores[:, :, None] + sel_sc, DEAD
        ).reshape(B, W * K)
        top_sc, top_idx = jax.lax.top_k(pool_sc, W)  # (B, W)
        parent = top_idx // K

        parent_hyps = gather_beams(state.hyps, parent)
        parent_lens = jnp.take_along_axis(state.lens, parent, axis=1)
        tok = jnp.take_along_axis(sel_tok.reshape(B, W * K), top_idx, axis=1)
        new_lens = parent_lens + 1
        pos = jnp.minimum(new_lens - 1, Lmax - 1)
        new_hyps = parent_hyps.at[b_idx, w_idx, pos].set(tok)

        new_score_ctc = state.score_ctc
        new_ctc_state = state.ctc_state
        if use_ctc:
            new_score_ctc = jnp.take_along_axis(
                sel_psi.reshape(B, W * K), top_idx, axis=1
            )
            # lazy lattice update: advance r only for each beam's winning
            # token, from the parent's state (W scans instead of W*K2)
            new_ctc_state = ctc_prefix_state_update(
                ctc_lp_T, elens, parent_hyps, parent_lens, tok,
                gather_beams(state.ctc_state, parent), blank_id,
            )

        new_lm_states_sel = (
            lm.indirect.gather_states(new_lm_states, parent)
            if lm is not None and lm.indirect is not None
            else gather_beams(new_lm_states, parent)
            if lm is not None
            else None
        )

        valid_new = top_sc > DEAD / 2

        # ---- finalize beams that just emitted eos ----
        ended = (tok == eos_id) & valid_new  # (B, W)
        # "only <eos>" (len_noeos < 1) hyps are rejected outright
        acceptable = ended & (new_lens > 2)
        # rows at their per-utterance step budget force-finalize every
        # surviving beam (best-effort hypotheses instead of running to
        # the global cap and dying — the r4 `cannot decode` regime).
        # Only with explicit row_caps: the bare search keeps the
        # reference's semantics (a row that never emits a viable eos
        # returns nothing, transformer.py:264-287).
        if row_caps is not None:
            at_cap = row_active & (state.step + 1 >= caps)  # (B,)
            forced = at_cap[:, None] & valid_new & ~ended
            acceptable = acceptable | forced
        else:
            at_cap = jnp.zeros((B,), bool)
        final_score = top_sc + len_weight * new_lens.astype(jnp.float32)

        # append accepted beams (already in descending score order) into
        # result slots while capacity remains
        offset = jnp.cumsum(acceptable.astype(jnp.int32), axis=1) - 1
        slot = state.res_count[:, None] + offset  # (B, W)
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

        # ended (accepted or rejected) and budget-exhausted beams leave
        # the active set
        cont_scores = jnp.where(
            ended | ~valid_new | at_cap[:, None], DEAD, top_sc
        )

        new_state = _State(
            step=state.step + 1,
            hyps=new_hyps,
            lens=new_lens,
            caches=(
                {
                    "caches": new_caches["caches"],
                    "anc": jnp.take_along_axis(
                        new_caches["anc"], parent[:, :, None], axis=1
                    ),
                }
                if step_indirect_fn is not None
                else gather_beams(new_caches, parent)
                if cached_step is not None else None
            ),
            scores=cont_scores,
            score_ctc=new_score_ctc,
            ctc_state=new_ctc_state,
            lm_states=new_lm_states_sel,
            res_hyps=res_hyps,
            res_lens=res_lens,
            res_scores=res_scores,
            res_count=res_count,
        )

        # freeze finished batch rows.  The big per-beam leaves (decoder KV
        # caches, LM-fusion states) are deliberately NOT frozen: for an
        # inactive row every consumer is already guarded — cont_scores
        # collapse to DEAD (pool_sc is DEAD-masked), res_* writes are
        # gated on row_active, and the search never reads a frozen row's
        # caches again — so the jnp.where pass over ~50 MB of cache per
        # step would buy nothing (measured ~0.3 ms/step,
        # tools/stub_beam.py).
        def pick(n, o):
            if n is None:
                return None
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    row_active.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                ),
                n, o,
            )

        frozen = _State(
            state.step + 1,
            *[pick(n, o) for n, o in zip(new_state[1:], state[1:])],
        )
        return frozen._replace(
            caches=new_state.caches, lm_states=new_state.lm_states
        )

    lm_pad_axis = lm.state_pad_axis if lm is not None else None

    prev_bound = stage_bounds[0]
    for bound in stage_bounds:
        if bound > prev_bound and state.caches is not None:
            state = state._replace(
                caches=jax.tree_util.tree_map(
                    lambda x: jnp.pad(
                        x,
                        ((0, 0), (0, 0), (0, bound - x.shape[2]))
                        + ((0, 0),) * (x.ndim - 3),
                    ),
                    state.caches,
                )
            )
        if (
            bound > prev_bound
            and lm_pad_axis is not None
            and state.lm_states is not None
        ):
            cap = min(bound, lm.state_max_len)

            def pad_lm(x):
                cur = x.shape[lm_pad_axis]
                if cur >= cap:
                    return x
                width = [(0, 0)] * x.ndim
                width[lm_pad_axis] = (0, cap - cur)
                return jnp.pad(x, width)

            state = state._replace(
                lm_states=jax.tree_util.tree_map(pad_lm, state.lm_states)
            )
        # step cap: the cache write position (lens - 1 <= step + 1) must
        # stay inside this stage's bound
        state = jax.lax.while_loop(
            make_cond(min(bound - 1, max_decode_ylen)),
            make_body(bound),
            state,
        )
        prev_bound = bound

    order = jnp.argsort(-state.res_scores, axis=1)
    return (
        gather_beams(state.res_hyps, order),
        jnp.take_along_axis(state.res_lens, order, axis=1),
        jnp.take_along_axis(state.res_scores, order, axis=1),
    )
