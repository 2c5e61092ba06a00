"""Unified batched decoding front-end: greedy / beam for every decoder type.

Replaces `ASR.decode` dispatch (`/root/reference/asr/modeling/asr.py:70-95`
-> per-decoder `decode` methods) with jit-compiled batched search functions
from `emoasr_tpu.search`.  One call decodes a whole padded bucket batch.

Variables are passed as a jit ARGUMENT, not closed over: closing over
concrete device arrays embeds the whole parameter tree as constants in the
lowered module (measured 105 s lowering / ~80 MB HLO for the L1 beam on the
remote-TPU transport, vs ~9 s with parameters as runtime arguments).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.models.layers import make_pad_mask
from emoasr_tpu.search.attention_beam import attention_beam_search
from emoasr_tpu.search.common import LMFusion
from emoasr_tpu.search.ctc_beam import ctc_beam_search
from emoasr_tpu.search.rnnt_beam import rnnt_beam_search
from emoasr_tpu.train.step import preprocess


def ctc_len_caps(
    cfg: ExpConfig, ctc_log_probs: jnp.ndarray, elens: jnp.ndarray
) -> jnp.ndarray:
    """Per-utterance decode-step budget from the collapsed CTC greedy
    length: cap = ratio * est + margin (clamped to max_decode_ylen).

    The collapsed-argmax estimate is the CTC greedy decode's length
    (`/root/reference/asr/modeling/decoders/ctc.py:176-201` semantics)
    computed with three elementwise ops — free when joint-CTC log-probs
    are already on device."""
    am = jnp.argmax(ctc_log_probs, axis=-1)  # (B, T)
    prev = jnp.pad(am[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    T = am.shape[1]
    valid = jnp.arange(T)[None, :] < elens[:, None]
    est = jnp.sum(
        (am != cfg.blank_id) & (am != prev) & valid, axis=1
    ).astype(jnp.float32)
    return jnp.clip(
        jnp.ceil(cfg.decode_cap_ratio * est) + cfg.decode_cap_margin,
        1,
        cfg.max_decode_ylen,
    ).astype(jnp.int32)


def _pack_outputs(hyps, hyp_lens, scores):
    """Pack (hyps, hyp_lens, scores) into ONE (B, W, 2+L) int32 array so
    a decode batch costs a single device->host fetch (scores carried as
    f32 bit patterns).  Greedy (B, L) outputs become W=1.

    Layout [lens, scores, hyps...]: the metadata columns lead so that
    batches from different buckets (different L) can be zero-padded on
    the LAST axis and concatenated into one buffer for a single fetch
    per group of batches (decode_dataset's coalescing — on the remote
    transport every fresh result buffer pays a fixed round-trip cost
    that dwarfs the bytes)."""
    if hyps.ndim == 2:
        hyps, hyp_lens, scores = (
            hyps[:, None], hyp_lens[:, None], scores[:, None]
        )
    bits = jax.lax.bitcast_convert_type(
        scores.astype(jnp.float32), jnp.int32
    )
    return jnp.concatenate(
        [
            hyp_lens.astype(jnp.int32)[..., None],
            bits[..., None],
            hyps.astype(jnp.int32),
        ],
        axis=-1,
    )


def unpack_outputs(arr):
    """Host-side inverse of `_pack_outputs` on the fetched numpy array:
    (B, W, 2+L) int32 -> (hyps (B,W,L), hyp_lens (B,W), scores (B,W)).
    Tolerates trailing zero-padding of the hyp axis (coalesced groups
    are padded to their widest bucket)."""
    import numpy as np

    return (
        arr[..., 2:],
        arr[..., 0],
        arr[..., 1].view(np.float32),
    )


# per-shape-combination jitted pad+concat programs for coalesced fetches
_COALESCE_CACHE: dict = {}


def coalesce_packed(outs):
    """Concatenate a list of packed device arrays (B_i, W, K_i) into one
    (sum B_i, W, max K_i) device array (zero-padding the hyp tail) so a
    whole group of decoded batches costs ONE device->host fetch."""
    if len(outs) == 1:
        return outs[0]
    key = tuple(o.shape for o in outs)
    fn = _COALESCE_CACHE.get(key)
    if fn is None:
        kmax = max(s[-1] for s in key)

        def build(*xs):
            return jnp.concatenate(
                [
                    jnp.pad(
                        x, ((0, 0), (0, 0), (0, kmax - x.shape[-1]))
                    )
                    for x in xs
                ],
                axis=0,
            )

        fn = jax.jit(build)
        _COALESCE_CACHE[key] = fn
    return fn(*outs)


def build_decode_fn(
    model: ASR,
    variables,
    cfg: ExpConfig,
    beam_width: int = 0,
    len_weight: float = 0.0,
    decode_ctc_weight: float = 0.0,
    lm: Optional[LMFusion] = None,
    decode_phone: bool = False,
    top1: bool = False,
) -> Callable:
    """Returns jitted fn(xs, xlens) -> (hyps, hyp_lens, scores).

    hyps carry framing eos tokens for beam modes (host strips); greedy
    returns collapsed label sequences directly with scores = None-like
    zeros.

    `top1=True` (every eval mode except --nbest) lets the attention
    beam stop a row as soon as its stored best is provably unbeatable
    (exact for the returned hypothesis — see attention_beam_search
    `need_results`).

    The returned callable also exposes `packed(xs, xlens)` -> one
    (B, W, L+2) int32 device array (see `_pack_outputs`) + host
    `unpack`: the pipelined eval loop fetches ONE array per batch
    instead of three (each fetch pays a transport round trip).
    """
    from emoasr_tpu.utils.precision import cast_floating, dtype_of, is_half

    if is_half(cfg):
        # one-time cast: halve param HBM and run matmuls in bf16 (search
        # scores/log-softmaxes stay float32 inside the search modules)
        variables = cast_floating(variables, dtype_of(cfg))

    def encode(variables, xs, xlens):
        xs, xlens = preprocess(cfg, xs, xlens, None, False)
        if is_half(cfg):
            xs = xs.astype(dtype_of(cfg))
        return model.apply(variables, xs, xlens, method=ASR.encode)

    def _weights(lw=None, lmw=None):
        return {
            "len_weight": jnp.float32(len_weight if lw is None else lw),
            "lm_weight": jnp.float32(
                (lm.weight if lm is not None else 0.0) if lmw is None else lmw
            ),
        }

    def _wrap(fn):
        """jit with variables AND fusion weights as arguments; public
        surface stays (xs, xlens).

        Weights are traced scalars, so a (lm_weight, len_weight) grid
        reuses ONE compiled program — `call.with_weights(lm_w, len_w)`
        returns a sibling callable bound to different weights (the
        fusion-grid path; the reference recompiles nothing because it is
        host Python, we recompile nothing because weights are runtime
        inputs).  `lower`/`bind_compiled` expose the AOT protocol used by
        bench.py.
        """
        jitted = jax.jit(fn)
        jitted_packed = jax.jit(
            lambda v, w, xs, xlens: _pack_outputs(*fn(v, w, xs, xlens))
        )
        w0 = _weights()

        def call(xs, xlens):
            return jitted(variables, w0, xs, xlens)

        call.lower = lambda xs, xlens: jitted.lower(variables, w0, xs, xlens)

        def call_compiled(compiled):
            return lambda xs, xlens: compiled(variables, w0, xs, xlens)

        call.bind_compiled = call_compiled
        call.packed = lambda xs, xlens: jitted_packed(variables, w0, xs, xlens)
        call.unpack = unpack_outputs

        def with_weights(lm_w=None, len_w=None):
            w = _weights(len_w, lm_w)

            def bound(xs, xlens):
                return jitted(variables, w, xs, xlens)

            bound.packed = lambda xs, xlens: jitted_packed(
                variables, w, xs, xlens
            )
            bound.unpack = unpack_outputs
            return bound

        call.with_weights = with_weights

        def with_variables(new_variables):
            """Rebind to updated variables (e.g. per-epoch validation)
            without retracing — params are runtime inputs."""
            if is_half(cfg):
                new_variables = cast_floating(new_variables, dtype_of(cfg))
            return lambda xs, xlens: jitted(new_variables, w0, xs, xlens)

        call.with_variables = with_variables
        return call

    dec_type = cfg.decoder_type

    # the attention decoder has no greedy path (the reference also runs its
    # beam loop for width 1, transformer.py:160+); clamp to a 1-wide beam
    if dec_type == "transformer" and beam_width <= 1:
        beam_width = 1

    if (beam_width <= 1 and dec_type != "transformer") or (
        dec_type == "rnn_transducer" and decode_ctc_weight == 1
    ):
        def decode_greedy(variables, weights, xs, xlens):
            xs, xlens = preprocess(cfg, xs, xlens, None, False)
            if is_half(cfg):
                xs = xs.astype(dtype_of(cfg))
            hyps, hyp_lens, _, _ = model.apply(
                variables, xs, xlens, decode_phone, method=ASR.decode_greedy
            )
            return hyps, hyp_lens, jnp.zeros(hyp_lens.shape, jnp.float32)

        return _wrap(decode_greedy)

    if dec_type == "ctc":
        def decode_ctc_beam(variables, weights, xs, xlens):
            lm_t = (
                lm._replace(weight=weights["lm_weight"])
                if lm is not None else None
            )
            eouts, elens, eouts_inter = encode(variables, xs, xlens)
            if decode_phone and cfg.hie_mtl_phone:
                eouts = eouts_inter
            logits = model.apply(
                variables, eouts,
                method=lambda m, e: (
                    m.decoder.phone_logits(e) if decode_phone
                    else m.decoder.logits(e)
                ),
            )
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return ctc_beam_search(
                lp, elens, beam_width, cfg.blank_id, cfg.eos_id,
                weights["len_weight"], lm_t,
            )

        return _wrap(decode_ctc_beam)

    if dec_type == "rnn_transducer":
        def decode_rnnt_beam(variables, weights, xs, xlens):
            lm_t = (
                lm._replace(weight=weights["lm_weight"])
                if lm is not None else None
            )
            def rec(tok, ds):
                d, s = model.apply(
                    variables, tok, ds,
                    method=lambda m, t, st: m.decoder.recurrency(t, st),
                )
                return d[:, 0], s

            def joint(e, d):
                return model.apply(
                    variables, e, d,
                    method=lambda m, a, b: m.decoder.joint_step(a, b),
                )

            eouts, elens, _ = encode(variables, xs, xlens)
            return rnnt_beam_search(
                eouts, elens, rec, joint,
                num_layers=cfg.dec_num_layers,
                dec_hidden=cfg.dec_hidden_size,
                beam_width=beam_width,
                vocab_size=cfg.vocab_size,
                blank_id=cfg.blank_id,
                eos_id=cfg.eos_id,
                max_hyp_len=cfg.max_decode_ylen + 1,
                lm=lm_t,
            )

        return _wrap(decode_rnnt_beam)

    if dec_type == "transformer":
        def decode_att_beam(variables, weights, xs, xlens):
            lm_t = (
                lm._replace(weight=weights["lm_weight"])
                if lm is not None else None
            )
            eouts, elens, _ = encode(variables, xs, xlens)
            B, T = eouts.shape[0], eouts.shape[1]
            W = beam_width

            # encoder-side cross-attention K/V projected ONCE per batch;
            # kept per-utterance — the beam step attends all W beams as W
            # query positions so the K/V are read once per utterance per
            # step, not once per beam (W x less HBM traffic)
            cross_kvs = model.apply(
                variables, eouts,
                method=lambda m, e: m.decoder.precompute_cross_kv(e),
            )
            emask = make_pad_mask(elens, T)[:, None, None, :]

            cache_dtype = dtype_of(cfg) if is_half(cfg) else jnp.float32

            def init_cache_fn(N, Lmax):
                return model.apply(
                    variables, N, Lmax,
                    method=lambda m, n, L: m.decoder.init_cache(
                        n, L, dtype=cache_dtype
                    ),
                )

            # "auto" selects the ancestor-indirect step: it removes the
            # per-step (B, W, Lc, H, dk) cache beam gather entirely (the
            # dominant beam-loop HBM cost; chip A/B in ROUND3_NOTES), is
            # pure XLA, and is exact for this label-sync search
            step_mode = cfg.dec_step_mode
            if step_mode == "auto":
                step_mode = "indirect"

            def step_cached_fn(tokens, pos, caches):
                return model.apply(
                    variables, tokens, pos, caches, cross_kvs, emask,
                    method=lambda m, *a: m.decoder.decode_step_cached(
                        *a, beam_width=W, step_mode=step_mode, elens=elens
                    ),
                )

            step_indirect_fn = None
            if step_mode in ("indirect", "fused_indirect"):
                def step_indirect_fn(tokens, pos, caches, anc):
                    return model.apply(
                        variables, tokens, pos, caches, anc, cross_kvs,
                        emask,
                        method=lambda m, *a:
                            m.decoder.decode_step_cached_indirect(
                                *a, beam_width=W, step_mode=step_mode,
                                elens=elens,
                            ),
                    )

            ctc_lp = None
            if decode_ctc_weight > 0:
                ctc_logits = model.apply(
                    variables, eouts,
                    method=lambda m, e: m.decoder.ctc.logits(e),
                )
                ctc_lp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)

            row_caps = None
            if cfg.decode_len_cap == "on" or (
                cfg.decode_len_cap == "auto" and ctc_lp is not None
            ):
                if ctc_lp is not None:
                    row_caps = ctc_len_caps(cfg, ctc_lp, elens)
                elif cfg.mtl_ctc_weight > 0:
                    # aux CTC head exists even when joint scoring is off
                    cl = model.apply(
                        variables, eouts,
                        method=lambda m, e: m.decoder.ctc.logits(e),
                    )
                    row_caps = ctc_len_caps(
                        cfg,
                        jax.nn.log_softmax(cl.astype(jnp.float32), -1),
                        elens,
                    )
                else:
                    # no CTC head: bound by the (subsampled) frame
                    # count with the same ratio + margin — attention
                    # decoders have no monotonic alignment, so frames
                    # alone are not a hard token bound
                    row_caps = jnp.clip(
                        jnp.ceil(
                            cfg.decode_cap_ratio
                            * elens.astype(jnp.float32)
                        )
                        + cfg.decode_cap_margin,
                        1,
                        cfg.max_decode_ylen,
                    ).astype(jnp.int32)

            return attention_beam_search(
                eouts, elens, None,
                vocab_size=cfg.vocab_size,
                beam_width=beam_width,
                eos_id=cfg.eos_id,
                blank_id=cfg.blank_id,
                len_weight=weights["len_weight"],
                lm=lm_t,
                decode_ctc_weight=decode_ctc_weight,
                ctc_log_probs=ctc_lp,
                max_decode_ylen=cfg.max_decode_ylen,
                cached_step=(
                    (init_cache_fn, step_cached_fn, step_indirect_fn)
                    if step_indirect_fn is not None
                    else (init_cache_fn, step_cached_fn)
                ),
                row_caps=row_caps,
                need_results=1 if top1 else None,
            )

        return _wrap(decode_att_beam)

    if dec_type == "las":
        def decode_las_beam(variables, weights, xs, xlens):
            eouts, elens, _ = encode(variables, xs, xlens)
            lm_t = (
                lm._replace(weight=weights["lm_weight"])
                if lm is not None else None
            )
            return model.apply(
                variables, eouts, elens, beam_width, weights["len_weight"],
                method=lambda m, e, el, w, lw: m.decoder.decode_beam(
                    e, el, w, lw, lm=lm_t
                ),
            )

        return _wrap(decode_las_beam)

    raise NotImplementedError(f"beam decode for {dec_type}")
