"""Attention (Transformer) decoder with label-smoothing / distillation /
CMLM losses and auxiliary CTC.

Parity target: `/root/reference/asr/modeling/decoders/transformer.py:25-159`:
embed + PE, N pre-norm decoder layers, final LayerNorm eps=1e-12, linear
output; CMLM mode (src-style mask over ylens) used by PC-MLM / P2W; causal
mask over ylens+1 otherwise; `forward_one_step` re-runs the full prefix and
returns the last position's logits (used by the beam search in
`emoasr_tpu/search/attention_beam.py`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.criteria import (
    distill_loss,
    label_smoothing_loss,
    masked_lm_loss,
)
from emoasr_tpu.models.decoders.ctc import CTCDecoder
from emoasr_tpu.models.layers import (
    PositionalEncoder,
    TransformerDecoderLayer,
    make_causal_mask,
    make_pad_mask,
)


class TransformerDecoder(nn.Module):
    cfg: ExpConfig
    cmlm: bool = False

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.dec_hidden_size, name="embed")
        self.pe = PositionalEncoder(cfg.dec_hidden_size, cfg.dropout_dec_rate)
        self.layers = [
            TransformerDecoderLayer(
                num_heads=cfg.dec_num_attention_heads,
                hidden_size=cfg.dec_hidden_size,
                intermediate_size=cfg.dec_intermediate_size,
                dropout_rate=cfg.dropout_dec_rate,
                dropout_attn_rate=cfg.dropout_attn_rate,
                name=f"layers_{i}",
            )
            for i in range(cfg.dec_num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-12, name="norm")
        self.output = nn.Dense(cfg.vocab_size, name="output")
        if cfg.mtl_ctc_weight > 0:
            self.ctc = CTCDecoder(cfg)

    def _decode_stack(
        self, ys_in, ymask, eouts, emask, deterministic: bool = True,
        cross_kvs=None,
    ):
        h = self.pe(self.embed(ys_in.astype(jnp.int32)), deterministic)
        for i, layer in enumerate(self.layers):
            h = layer(
                h, ymask, eouts, emask, deterministic,
                cross_kv=None if cross_kvs is None else cross_kvs[i],
            )
        return h

    def precompute_cross_kv(self, eouts):
        """Per-layer encoder-side (K, V) — step-invariant during decoding,
        so the beam loop projects the memory ONCE instead of per step
        (~6x decode-loop FLOP cut for the L3 config)."""
        return [layer.compute_cross_kv(eouts) for layer in self.layers]

    def init_cache(self, B: int, max_len: int, dtype=jnp.float32):
        """Per-layer self-attention K/V caches for incremental decoding.

        `dtype` should match the activation dtype of the decode path
        (bf16 under compute_dtype=bfloat16): a f32 cache would silently
        upcast the attends AND double the per-step cache traffic, which
        dominates beam-decode time.
        """
        cfg = self.cfg
        H = cfg.dec_num_attention_heads
        dk = cfg.dec_hidden_size // H
        return [
            (
                jnp.zeros((B, max_len, H, dk), dtype),
                jnp.zeros((B, max_len, H, dk), dtype),
            )
            for _ in range(cfg.dec_num_layers)
        ]

    def decode_step_cached(
        self, tokens, pos, caches, cross_kvs, memory_mask=None,
        beam_width=None, step_mode="dense", elens=None,
    ):
        """Incremental one-token decode with self-attention KV caches.

        tokens: (B,) newest token per row; pos: (B,) its position; caches
        from `init_cache` (beam-gathered by the caller on pruning).
        Numerically identical to `forward_one_step` on the full prefix but
        O(1) instead of O(L) work per step.  With `beam_width`, B is
        utterances x beams and `cross_kvs`/`memory_mask` are
        per-utterance (see TransformerDecoderLayer.decode_step).
        """
        cfg = self.cfg
        B = tokens.shape[0]
        Lmax = caches[0][0].shape[1]
        import math as _math

        from emoasr_tpu.models.layers import sinusoidal_pe

        emb = self.embed(tokens.astype(jnp.int32))[:, None, :]
        pe = sinusoidal_pe(Lmax, cfg.dec_hidden_size, emb.dtype)
        h = emb * _math.sqrt(cfg.dec_hidden_size) + pe[pos][:, None, :]

        # attend over cache positions <= pos
        self_mask = (
            jnp.arange(Lmax)[None, :] <= pos[:, None]
        )[:, None, None, :]

        fused = step_mode == "fused"
        new_caches = []
        for i, layer in enumerate(self.layers):
            h, ck, cv = layer.decode_step(
                h, caches[i][0], caches[i][1], pos, self_mask,
                memory_mask, cross_kvs[i], beam_width=beam_width,
                fused=fused, elens=elens,
            )
            new_caches.append((ck, cv))
        logits = self.output(self.norm(h[:, 0]))
        return logits, new_caches

    def decode_step_cached_indirect(
        self, tokens, pos, caches, anc, cross_kvs, memory_mask=None,
        beam_width=None, step_mode="indirect", elens=None,
    ):
        """`decode_step_cached` with ancestor-indirect caches.

        caches: per-layer (k, v) with (Bu, W, Lc, H, dk) leaves in
        PHYSICAL slot order; anc: (Bu, W, Lc) ancestor table shared by
        all layers (the caller sets anc[b, w, pos] = w before the call);
        pos: (Bu, W); tokens: (B,) flat with B = Bu*W.  The beam search
        never gathers the caches — it composes beam permutations into
        `anc` only (see layers.py::decode_step_indirect).
        """
        cfg = self.cfg
        B = tokens.shape[0]
        Lmax = caches[0][0].shape[2]
        import math as _math

        from emoasr_tpu.models.layers import sinusoidal_pe

        emb = self.embed(tokens.astype(jnp.int32))[:, None, :]
        pe = sinusoidal_pe(Lmax, cfg.dec_hidden_size, emb.dtype)
        flat_pos = pos.reshape(-1)
        h = emb * _math.sqrt(cfg.dec_hidden_size) + pe[flat_pos][:, None, :]

        fused = step_mode == "fused_indirect"
        new_caches = []
        for i, layer in enumerate(self.layers):
            h, ck, cv = layer.decode_step_indirect(
                h, caches[i][0], caches[i][1], pos, anc,
                memory_mask, cross_kvs[i], beam_width,
                fused=fused, elens=elens,
            )
            new_caches.append((ck, cv))
        logits = self.output(self.norm(h[:, 0]))
        return logits, new_caches

    def __call__(
        self,
        eouts,
        elens,
        eouts_inter=None,
        ys=None,
        ylens=None,
        ys_in=None,
        ys_out=None,
        soft_labels=None,
        ps=None,
        plens=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        L = ys_in.shape[1]
        emask = make_pad_mask(elens, eouts.shape[1])[:, None, None, :]
        if self.cmlm:
            ymask = make_pad_mask(ylens, L)[:, None, None, :]
        else:
            ymask = (
                make_pad_mask(ylens + 1, L)[:, None, None, :]
                & make_causal_mask(L)[None, None, :, :]
            )

        h = self._decode_stack(ys_in, ymask, eouts, emask, deterministic)
        logits = self.output(self.norm(h))

        if ys_out is None:
            return logits

        loss_dict = {}
        if cfg.kd_weight > 0 and soft_labels is not None:
            loss_att_kd, loss_kd, loss_att = distill_loss(
                logits, ys_out, soft_labels, ylens + 1,
                soft_label_weight=cfg.kd_weight,
                lsm_prob=cfg.lsm_prob,
                normalize_length=cfg.loss_normalize_length,
                normalize_batch=cfg.loss_normalize_batch,
            )
            loss = loss_att_kd
            loss_dict["loss_kd"] = loss_kd
            loss_dict["loss_att"] = loss_att
        elif self.cmlm:
            loss_att = masked_lm_loss(logits, ys_out)
            loss = loss_att
            loss_dict["loss_att"] = loss_att
        else:
            loss_att = label_smoothing_loss(
                logits, ys_out, ylens + 1,
                lsm_prob=cfg.lsm_prob,
                normalize_length=cfg.loss_normalize_length,
                normalize_batch=cfg.loss_normalize_batch,
            )
            loss = loss_att
            loss_dict["loss_att"] = loss_att

        if cfg.mtl_ctc_weight > 0:
            loss_ctc, _, _ = self.ctc(
                eouts, elens, ys=ys, ylens=ylens, deterministic=deterministic
            )
            loss = loss + cfg.mtl_ctc_weight * loss_ctc
            loss_dict["loss_ctc"] = loss_ctc

        loss_dict["loss_total"] = loss
        return loss, loss_dict, logits

    def forward_one_step(self, ys_in, ylens_in, eouts, emask=None,
                         cross_kvs=None):
        """Logits for the position `ylens_in-1` of each prefix.

        The reference (transformer.py:148-159) re-encodes the full prefix
        and takes the last position; here prefixes are fixed-width padded,
        so the "last" position is gathered per row — jit-friendly for the
        batched beam loop.  Pass `cross_kvs` (from precompute_cross_kv) to
        skip re-projecting the encoder memory each step.
        """
        L = ys_in.shape[1]
        ymask = (
            make_pad_mask(ylens_in, L)[:, None, None, :]
            & make_causal_mask(L)[None, None, :, :]
        )
        h = self._decode_stack(ys_in, ymask, eouts, emask, True, cross_kvs)
        last = jnp.take_along_axis(
            h, (ylens_in - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return self.output(self.norm(last))
