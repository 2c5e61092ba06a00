"""Shared machinery for batched, jitted beam search.

The reference decodes utterance-by-utterance with Python dict beams
(`asr/modeling/decoders/ctc.py:203-344`, `transformer.py:161-294`,
`rnn_transducer.py:242-325`).  Here every search is a fixed-beam-width
`lax.scan`/`while_loop` over a (B, W) beam tensor — the source of the
framework's RTF advantage.

Hypothesis identity for path merging uses a pair of incremental 32-bit
polynomial hashes instead of exact string compare (the reference uses dict
keys): collision probability is ~2^-64 per candidate pair, negligible
against ASR error rates, and it keeps the merge O(C^2) in scalars rather
than O(C^2 * L) in tokens.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


DEAD = -1e30  # score of dead/pruned beam slots

# numpy scalars, NOT jnp: module-level device arrays become captured
# closure constants in every trace that uses them; under jax 0.9's
# hoisted-constant lowering this produced executables expecting two
# extra ui32 parameter buffers that dispatch then failed to supply
# ("Execution supplied 46 buffers but compiled program expected 48",
# order-dependent across tests in one process).  np scalars inline as
# HLO literals.
HASH_P1 = np.uint32(1000003)
HASH_P2 = np.uint32(0x01000193)  # FNV prime


def hash_init(shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (
        jnp.full(shape, 17, jnp.uint32),
        jnp.full(shape, 2166136261, jnp.uint32),
    )


def hash_extend(h: Tuple[jnp.ndarray, jnp.ndarray], token: jnp.ndarray):
    t = token.astype(jnp.uint32)
    return (h[0] * HASH_P1 + t + 1, (h[1] ^ (t + 1)) * HASH_P2)


class IndirectLM(NamedTuple):
    """Ancestor-indirect cached fusion for LABEL-SYNCHRONOUS searches.

    The standard cached mode beam-gathers the whole KV cache every step
    (the dominant cached-fusion cost, tools/stub_lm.py).  This protocol
    instead keeps caches in physical slot order and carries a tiny
    (B, W, Lc) ancestor table that the LM resolves inside attention as a
    one-hot MXU contraction (bert.py::step_indirect) — the search
    beam-gathers only the table.

    Sound ONLY for label-sync searches (attention_beam): every slot
    writes cache column t exactly once, at step t, so physical columns
    are never clobbered across steps.  Searches with per-beam hyp
    lengths (CTC prefix beam, RNN-T) must use the standard fields.

    predict_beams(hyps (B,W,L), lens (B,W), states) -> (logp, states)
    init_states(B, W, init_len=None) -> {"caches": [...], "anc": ...}
    gather_states(states, parent (B,W)) -> states (gathers `anc` only)
    """

    predict_beams: Callable
    init_states: Callable
    gather_states: Callable


class LMFusion(NamedTuple):
    """Adapter bundling an LM for in-loop shallow fusion over (B, W) beams.

    predict_beams(hyps (B,W,L), lens (B,W), states) -> (logp (B,W,V), states)
    init_states(B, W, max_len=None) -> states pytree with (B, W, ...)
    leaves, or None; `max_len` lets a staged search start with short
    caches.

    `state_pad_axis`/`state_max_len`: set when the state leaves carry a
    growable length axis — a staged search (attention_beam) then inits
    the states at its first stage bound and zero-pads that axis at stage
    transitions (capped at state_max_len), so per-step state traffic
    tracks the prefix length.

    `indirect`: optional IndirectLM protocol; a label-sync search uses
    it in place of the standard fields when present (other searches
    ignore it).
    """

    predict_beams: Callable
    init_states: Callable
    weight: float
    state_pad_axis: Optional[int] = None
    state_max_len: Optional[int] = None
    indirect: Optional[IndirectLM] = None


def make_lm_fusion(
    lm_model, lm_variables, weight: float, max_len: Optional[int] = None,
    mode: str = "auto",
) -> LMFusion:
    """Build an LMFusion from an LM module (facade or inner wrapper).

    Stateful RNNLM states (layers, 2, N, H) are kept beam-major
    (B, W, layers, 2, H) inside the search so standard beam gathers apply.

    TransformerLM fusion has two modes (both exact; equivalence pinned in
    tests/test_beam_lm_fusion.py):

    - "stateless": re-encode the full prefix each beam step.  On CPU this
      is the reference's O(prefix) bottleneck (`transformer.py:62-77`); on
      TPU the re-encode is one large batched matmul, but its FLOPs grow
      quadratically with decode length.
    - "cached": per-layer KV caches, O(1) compute per step, kept
      batch-major (B, W, Lc, H, dk) so the per-step beam reindex is a
      leading-axis gather, and length-staged by the search so early
      steps carry short caches.

    "auto" selects cached: with the batch-major + staged-length layout
    (r3 rebuild) the cached path wins at the flagship L3-3 row on one
    v5e chip — 273.5 ms vs 289.2 ms at B=16 and 1112 ms vs 1321 ms at
    B=64 (tools/profile_l33.py; the r2 leading-layers layout measured
    the OPPOSITE because it moved the whole cache through two
    transposes per step).  The advance-on-extend/keep-parent semantics
    of the searches hold for the cached mode because a kept state
    differs from an advanced one only by the idempotent last cache
    write.

    "indirect" (and "auto") additionally attaches the IndirectLM
    protocol: label-sync searches then skip the per-step cache beam
    gather entirely (ancestor table + one-hot selection inside
    attention); non-label-sync searches fall back to this mode's
    standard cached fields.
    """
    lm_type = (
        lm_model.cfg.lm_type
        if getattr(lm_model, "cfg", None) is not None
        else None
    )
    is_rnn = lm_type == "rnn"

    if lm_type == "transformer" and mode == "auto":
        mode = "indirect"

    if lm_type == "transformer" and mode in ("cached", "indirect"):
        if max_len is None:
            max_len = lm_model.cfg.max_seq_len

        def predict_beams_cached(hyps, lens, states):
            B, W, L = hyps.shape
            flat = hyps.reshape(B * W, L)
            fl = lens.reshape(B * W)
            Lc = jax.tree_util.tree_leaves(states)[0].shape[2]
            idx = jnp.maximum(fl - 1, 0).astype(jnp.int32)
            tokens = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            # leaves (B, W, Lc, H, dk) -> (B*W, Lc, H, dk): pure reshape,
            # no transposes (the old leading-layers layout moved the
            # whole cache through HBM twice per step)
            caches = jax.tree_util.tree_map(
                lambda x: x.reshape((B * W,) + x.shape[2:]), states
            )
            logp, caches = lm_model.apply(
                lm_variables, tokens, jnp.minimum(idx, Lc - 1), caches,
                method=type(lm_model).predict_step,
            )
            out = jax.tree_util.tree_map(
                lambda x: x.reshape((B, W) + x.shape[1:]), caches
            )
            return logp.reshape(B, W, -1), out

        # caches follow the LM param dtype (bf16 decode -> bf16 caches:
        # halves the per-step beam-gather bytes, the dominant cached cost)
        cache_dtype = next(
            (
                x.dtype
                for x in jax.tree_util.tree_leaves(lm_variables)
                if jnp.issubdtype(x.dtype, jnp.floating)
            ),
            jnp.float32,
        )

        def init_states_cached(B, W, init_len=None):
            L0 = max_len if init_len is None else min(init_len, max_len)
            caches = lm_model.apply(
                lm_variables, B * W, L0, cache_dtype,
                method=type(lm_model).init_cache,
            )  # [(k, v)] with (B*W, L0, H, dk) leaves
            return jax.tree_util.tree_map(
                lambda x: x.reshape((B, W) + x.shape[1:]), caches
            )

        indirect = None
        if mode == "indirect":

            def predict_beams_ind(hyps, lens, states):
                B, W, _ = hyps.shape
                caches, anc = states["caches"], states["anc"]
                Lc = anc.shape[2]
                pos = jnp.minimum(
                    jnp.maximum(lens - 1, 0), Lc - 1
                ).astype(jnp.int32)
                tokens = jnp.take_along_axis(
                    hyps, pos[:, :, None], axis=2
                )[..., 0]
                bidx = jnp.arange(B)[:, None]
                widx = jnp.arange(W)[None, :]
                # this step's column is ours: anc[b, w, pos] = w
                anc = anc.at[bidx, widx, pos].set(
                    jnp.broadcast_to(widx, (B, W))
                )
                logp, caches = lm_model.apply(
                    lm_variables, tokens, pos, caches, anc,
                    method=type(lm_model).predict_step_indirect,
                )
                return logp, {"caches": caches, "anc": anc}

            def init_states_ind(B, W, init_len=None):
                st = init_states_cached(B, W, init_len)
                L0 = jax.tree_util.tree_leaves(st)[0].shape[2]
                return {
                    "caches": st,
                    "anc": jnp.zeros((B, W, L0), jnp.int32),
                }

            def gather_states_ind(states, parent):
                # compose the beam permutation into the ancestor table;
                # the caches stay in physical slot order
                return {
                    "caches": states["caches"],
                    "anc": jnp.take_along_axis(
                        states["anc"], parent[:, :, None], axis=1
                    ),
                }

            indirect = IndirectLM(
                predict_beams_ind, init_states_ind, gather_states_ind
            )

        return LMFusion(
            predict_beams_cached, init_states_cached, weight,
            state_pad_axis=2, state_max_len=max_len, indirect=indirect,
        )

    def predict_beams(hyps, lens, states):
        B, W, L = hyps.shape
        flat = hyps.reshape(B * W, L)
        fl = lens.reshape(B * W)
        lm_states = None
        if states is not None:
            # (B, W, layers, 2, H) -> (layers, 2, B*W, H)
            lm_states = states.reshape((B * W,) + states.shape[2:]).transpose(
                1, 2, 0, 3
            )
        logp, new_states = lm_model.apply(
            lm_variables, flat, fl, lm_states, method=type(lm_model).predict
        )
        out_states = None
        if new_states is not None:
            out_states = new_states.transpose(2, 0, 1, 3).reshape(
                (B, W) + new_states.shape[:2] + new_states.shape[3:]
            )
        return logp.reshape(B, W, -1), out_states

    def init_states(B, W, init_len=None):
        if not is_rnn:
            return None
        st = lm_model.apply(
            lm_variables, B * W, method=type(lm_model).zero_states
        )  # (layers, 2, B*W, H)
        return st.transpose(2, 0, 1, 3).reshape(
            (B, W) + st.shape[:2] + st.shape[3:]
        )

    return LMFusion(predict_beams, init_states, weight)


# Global top-k strategy: "chunked" = two-level chunked kernel below,
# "direct" = plain lax.top_k, "auto" = current default.  The r4 chip
# ablation (tools/ablate_beam_dtype.py) measured IN-PIPELINE direct
# beating chunked at every beam row (rnnt_beam10 162 -> 61 ms, ctc_beam8
# 115 -> 86 ms at V=10k) even though the isolated microbench favored
# chunked 12x — in-loop, XLA fuses the mask/add producers into the
# single TopK but cannot into the two-level reshape pipeline.
# EMOASR_TOPK env overrides the global for A/B measurement runs
# (bench.py BENCH_ONLY rows + EMOASR_TOPK=direct/chunked/pallas bisect a
# single scoreboard row per strategy without code edits)
TOPK_MODE = os.environ.get("EMOASR_TOPK", "auto")
_AUTO_MODE = "pallas"  # falls back to direct when k/V is out of range


def topk_lastdim(x: jnp.ndarray, k: int, chunk: int = 128, mode=None):
    """Exact top-k along the last axis; strategy per `mode` (falls back
    to the global TOPK_MODE).

    Chunked variant: two-level chunked top_k.

    XLA's TopK over a long trailing dim is the single largest cost of the
    beam loops on TPU (measured 2.0 ms/step for (160, 10000) at k=10,
    `tools/ablate_beam.py`); chunking to 128-wide top_k plus a second
    top_k over the C*k survivors is exact — every global top-k element is
    its chunk's top-k — and ~12x faster (0.17 ms/step).

    Tie-breaking matches `lax.top_k` (equal values resolve to the lowest
    index): the flattened candidate order is chunk-major and rank-minor,
    both ascending in the original index, and the -inf padding of the
    last chunk sits at the highest flattened positions so real entries
    always win ties against padding.
    """
    V = x.shape[-1]
    if mode is None:
        mode = _AUTO_MODE if TOPK_MODE == "auto" else TOPK_MODE
    elif TOPK_MODE != "auto":
        mode = TOPK_MODE  # global force (measurement tools) wins
    if mode in ("pallas", "auto"):
        # small-k selection: k unrolled (max, min-index, mask) VMEM
        # sweeps (ops/topk_pallas.py) — no sort.  In-loop at (640, 10k)
        # k=10: 0.04 ms/step vs chunked 2.0 / direct 5.8
        # (tools/ablate_machinery.py, r4 chip run)
        if k <= 32 and V >= 2 * chunk:
            from emoasr_tpu.ops.topk_pallas import topk_pallas

            return topk_pallas(x, k)
        mode = "direct"
    if mode == "direct" or V <= max(chunk * 2, 2 * k):
        return jax.lax.top_k(x, k)
    lead = x.shape[:-1]
    C = -(-V // chunk)
    pad = C * chunk - V
    if pad:
        x = jnp.pad(
            x, [(0, 0)] * len(lead) + [(0, pad)],
            constant_values=-jnp.inf,
        )
    kc = min(k, chunk)
    v1, i1 = jax.lax.top_k(x.reshape(lead + (C, chunk)), kc)
    i1 = i1 + (jnp.arange(C, dtype=i1.dtype) * chunk)[:, None]
    v2, i2 = jax.lax.top_k(v1.reshape(lead + (C * kc,)), k)
    idx = jnp.take_along_axis(i1.reshape(lead + (C * kc,)), i2, -1)
    return v2, idx


def gather_beams(tree: Any, idx: jnp.ndarray):
    """Gather pytree leaves shaped (B, W, ...) with (B, W') indices along
    the beam axis (axis 1).  None passes through."""
    if tree is None:
        return None

    def gather(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
        )

    return jax.tree_util.tree_map(gather, tree)
