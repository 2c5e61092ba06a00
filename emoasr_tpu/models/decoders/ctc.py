"""CTC decoder head: loss (+ MTL/KD variants) and batched greedy decode.

Parity target: `/root/reference/asr/modeling/decoders/ctc.py:26-201` —
linear head, CTC loss normalized by B, phone-CTC MTL (optionally
hierarchical from the intermediate layer), inter-CTC MTL, alignment-KD.
The prefix beam search (`ctc.py:203-344`) lives in
`emoasr_tpu/search/ctc_beam.py` as a batched jitted loop.

TPU-first: greedy decode runs entirely on device (argmax + vectorized
collapse into fixed-size padded hypotheses), instead of per-utterance
Python `groupby`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

import emoasr_tpu.ops.ctc as ops_ctc
from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.criteria import ctc_align_distill_loss
from emoasr_tpu.models.layers import ExplicitDense
from emoasr_tpu.ops.ctc import (
    ctc_forced_align,
    ctc_loss_fn,
    ctc_loss_fused_head,
)


def greedy_collapse(
    best_paths: jnp.ndarray, elens: jnp.ndarray, blank_id: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse repeats then remove blanks, batched on device.

    best_paths: (B, T) argmax frame labels.  Returns (hyps, hyp_lens):
    hyps (B, T) int32 padded with blank_id.  Replaces the per-utterance
    `itertools.groupby` host loop (ctc.py:188-196).
    """
    B, T = best_paths.shape
    prev = jnp.pad(best_paths, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    valid = jnp.arange(T)[None, :] < elens[:, None]
    keep = (best_paths != prev) & (best_paths != blank_id) & valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot
    hyp_lens = jnp.max(jnp.where(keep, pos + 1, 0), axis=1)
    out = jnp.full((B, T + 1), blank_id, best_paths.dtype)
    out = out.at[
        jnp.arange(B)[:, None], jnp.where(keep, pos, T)
    ].set(jnp.where(keep, best_paths, blank_id))
    return out[:, :T].astype(jnp.int32), hyp_lens.astype(jnp.int32)


class CTCDecoder(nn.Module):
    """Linear head + CTC losses."""

    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        # ExplicitDense == nn.Dense in param layout/init ({kernel, bias},
        # lecun_normal/zeros) but exposes the raw weights for the fused
        # Pallas head (ops/ctc_head_pallas)
        self.output = ExplicitDense(
            cfg.enc_hidden_size, cfg.vocab_size, name="output"
        )
        if cfg.mtl_phone_ctc_weight > 0:
            self.phone_output = ExplicitDense(
                cfg.enc_hidden_size, cfg.phone_vocab_size,
                name="phone_output",
            )

    def logits(self, eouts):
        return self.output(eouts)

    def phone_logits(self, eouts):
        return self.phone_output(eouts)

    def __call__(
        self,
        eouts: jnp.ndarray,
        elens: jnp.ndarray,
        eouts_inter: Optional[jnp.ndarray] = None,
        ys: Optional[jnp.ndarray] = None,
        ylens: Optional[jnp.ndarray] = None,
        ys_in=None,  # unused (API parity with other decoders)
        ys_out=None,  # unused
        soft_labels: Optional[jnp.ndarray] = None,
        ps: Optional[jnp.ndarray] = None,
        plens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if ys is None:
            return self.output(eouts)

        loss_dict = {}
        # align-KD needs the dense log-probs anyway; otherwise the head
        # runs fused (matmul + streaming lse + path gather in Pallas,
        # no (B, T, V) materialization)
        need_dense = cfg.kd_weight > 0 and soft_labels is not None
        logits = None  # materialized only on the dense/KD path
        if ops_ctc.USE_PALLAS and not need_dense:
            loss_ctc = ctc_loss_fused_head(
                eouts, self.output.kernel, self.output.bias,
                ys, elens, ylens, cfg.blank_id,
            )
        else:
            logits = self.output(eouts)
            loss_ctc = ctc_loss_fn(logits, ys, elens, ylens, cfg.blank_id)
        loss = loss_ctc
        loss_dict["loss_ctc"] = loss_ctc

        if cfg.kd_weight > 0 and soft_labels is not None:
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            aligns = jax.lax.stop_gradient(
                ctc_forced_align(log_probs, elens, ys, ylens, cfg.blank_id)
            )
            loss_kd = ctc_align_distill_loss(
                logits, ys, soft_labels, aligns, elens, ylens,
                blank_id=cfg.blank_id,
                soft_label_weight=cfg.kd_ctc_soft_label_weight,
                position=cfg.kd_ctc_position,
                lsm_prob=cfg.lsm_prob,
            )
            loss_dict["loss_kd"] = loss_kd
            if cfg.reduce_main_loss_kd:
                loss = (1 - cfg.kd_weight) * loss + cfg.kd_weight * loss_kd
            else:
                loss = loss + cfg.kd_weight * loss_kd

        if cfg.mtl_phone_ctc_weight > 0:
            src = eouts_inter if cfg.hie_mtl_phone else eouts
            if ops_ctc.USE_PALLAS:
                loss_phone = ctc_loss_fused_head(
                    src, self.phone_output.kernel, self.phone_output.bias,
                    ps, elens, plens, cfg.blank_id,
                )
            else:
                logits_phone = self.phone_output(src)
                loss_phone = ctc_loss_fn(
                    logits_phone, ps, elens, plens, cfg.blank_id
                )
            loss = loss + cfg.mtl_phone_ctc_weight * loss_phone
            key = "loss_phone_ctc(inter)" if cfg.hie_mtl_phone else "loss_phone_ctc"
            loss_dict[key] = loss_phone

        if cfg.mtl_inter_ctc_weight > 0:
            need_dense_inter = (
                cfg.inter_kd_weight > 0 and soft_labels is not None
            )
            if ops_ctc.USE_PALLAS and not need_dense_inter:
                loss_inter = ctc_loss_fused_head(
                    eouts_inter, self.output.kernel, self.output.bias,
                    ys, elens, ylens, cfg.blank_id,
                )
            else:
                logits_inter = self.output(eouts_inter)
                loss_inter = ctc_loss_fn(
                    logits_inter, ys, elens, ylens, cfg.blank_id
                )
            loss_dict["loss_inter_ctc"] = loss_inter
            if cfg.inter_kd_weight > 0 and soft_labels is not None:
                lp_i = jax.nn.log_softmax(logits_inter.astype(jnp.float32), -1)
                aligns_i = jax.lax.stop_gradient(
                    ctc_forced_align(lp_i, elens, ys, ylens, cfg.blank_id)
                )
                loss_inter_kd = ctc_align_distill_loss(
                    logits_inter, ys, soft_labels, aligns_i, elens, ylens,
                    blank_id=cfg.blank_id,
                    soft_label_weight=cfg.kd_ctc_soft_label_weight,
                    position=cfg.kd_ctc_position,
                    lsm_prob=cfg.lsm_prob,
                )
                loss_dict["loss_inter_kd"] = loss_inter_kd
                if cfg.reduce_main_loss_kd:
                    loss = loss + cfg.mtl_inter_ctc_weight * (
                        (1 - cfg.inter_kd_weight) * loss_inter
                        + cfg.inter_kd_weight * loss_inter_kd
                    )
                else:
                    loss = loss + cfg.inter_kd_weight * loss_inter_kd
            else:
                loss = loss + cfg.mtl_inter_ctc_weight * loss_inter

        loss_dict["loss_total"] = loss
        return loss, loss_dict, logits

    def greedy(
        self,
        eouts: jnp.ndarray,
        elens: jnp.ndarray,
        decode_phone: bool = False,
    ):
        """Batched greedy decode: returns (hyps, hyp_lens, logits, aligns)."""
        logits = self.phone_output(eouts) if decode_phone else self.output(eouts)
        best_paths = jnp.argmax(logits, axis=-1)
        aligns = jnp.where(
            jnp.arange(best_paths.shape[1])[None, :] < elens[:, None],
            best_paths,
            0,
        ).astype(jnp.int32)
        hyps, hyp_lens = greedy_collapse(best_paths, elens, self.cfg.blank_id)
        return hyps, hyp_lens, logits, aligns
