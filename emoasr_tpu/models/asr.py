"""End-to-end ASR facade: encoder + decoder under one flax module.

Parity target: `/root/reference/asr/modeling/asr.py:21-101` — builds the
encoder (rnn / transformer / conformer) and decoder (ctc / rnn_transducer /
transformer / las), exposes `forward` (loss), greedy `decode`, and
`forced_align`.

TPU-first differences: no DataParallel pad-trimming (`asr.py:57-62`) —
batches keep their static bucket shapes and SPMD sharding handles devices;
decoding is batched/jitted rather than per-utterance.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.decoders.ctc import CTCDecoder
from emoasr_tpu.models.decoders.las import LASDecoder
from emoasr_tpu.models.decoders.rnnt import RNNTDecoder
from emoasr_tpu.models.decoders.transformer import TransformerDecoder
from emoasr_tpu.models.encoders import RNNEncoder, TransformerEncoder
from emoasr_tpu.ops.ctc import ctc_forced_align


class ASR(nn.Module):
    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        if cfg.encoder_type == "rnn":
            self.encoder = RNNEncoder(cfg, name="encoder")
        elif cfg.encoder_type in ("transformer", "conformer"):
            self.encoder = TransformerEncoder(
                cfg,
                is_conformer=(cfg.encoder_type == "conformer"),
                name="encoder",
            )
        else:
            raise ValueError(cfg.encoder_type)

        if cfg.decoder_type == "ctc":
            self.decoder = CTCDecoder(cfg, name="decoder")
        elif cfg.decoder_type == "rnn_transducer":
            self.decoder = RNNTDecoder(cfg, name="decoder")
        elif cfg.decoder_type == "transformer":
            self.decoder = TransformerDecoder(cfg, name="decoder")
        elif cfg.decoder_type == "las":
            self.decoder = LASDecoder(cfg, name="decoder")
        else:
            raise ValueError(cfg.decoder_type)

    def __call__(
        self,
        xs,
        xlens,
        ys,
        ylens,
        ys_in,
        ys_out,
        soft_labels=None,
        ps=None,
        plens=None,
        deterministic: bool = True,
    ):
        eouts, elens, eouts_inter = self.encoder(xs, xlens, deterministic)
        loss, loss_dict, _ = self.decoder(
            eouts, elens, eouts_inter, ys, ylens, ys_in, ys_out,
            soft_labels, ps, plens, deterministic=deterministic,
        )
        return loss, loss_dict

    def encode(self, xs, xlens):
        return self.encoder(xs, xlens, True)

    def decode_greedy(self, xs, xlens, decode_phone: bool = False):
        """Batched greedy decode -> (hyps, hyp_lens, logits_or_None, aligns).

        Mirrors `ASR.decode` with beam_width<=1 (`asr.py:70-95` +
        `ctc.py:176-201` / `rnn_transducer.py:194-240`).
        """
        cfg = self.cfg
        eouts, elens, eouts_inter = self.encoder(xs, xlens, True)
        if cfg.decoder_type == "ctc":
            if decode_phone and cfg.hie_mtl_phone:
                eouts = eouts_inter
            return self.decoder.greedy(eouts, elens, decode_phone)
        if cfg.decoder_type == "rnn_transducer":
            hyps, hyp_lens, aligns = self.decoder.greedy(eouts, elens)
            return hyps, hyp_lens, None, aligns
        if cfg.decoder_type == "las":
            hyps, hyp_lens = self.decoder.decode_greedy(eouts, elens)
            return hyps, hyp_lens, None, None
        raise NotImplementedError(
            f"greedy decode for {cfg.decoder_type}; use emoasr_tpu.search"
        )

    def forced_align(self, xs, xlens, ys, ylens, ys_in=None):
        """Forced alignment of reference labels.

        The reference's `ASR.forced_align` (asr.py:97-101) is latently broken
        (2-of-3 encoder unpack, and no `forced_align` on its decoders); here
        it works: CTC gives a (B, T) frame alignment, RNN-T a (B, U) list of
        emission frames (`ys_in` = eos-prefixed labels required).
        """
        from emoasr_tpu.ops.rnnt import rnnt_forced_align

        cfg = self.cfg
        eouts, elens, _ = self.encoder(xs, xlens, True)
        if cfg.decoder_type == "ctc":
            logits = self.decoder.logits(eouts)
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return ctc_forced_align(log_probs, elens, ys, ylens, cfg.blank_id)
        if cfg.decoder_type == "rnn_transducer":
            if ys_in is None:
                ys_in = jnp.pad(
                    ys, ((0, 0), (1, 0)), constant_values=cfg.eos_id
                )
            douts, _ = self.decoder.recurrency(ys_in, None)
            logits = self.decoder.joint(eouts, douts)
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return rnnt_forced_align(log_probs, elens, ys, ylens, cfg.blank_id)
        raise NotImplementedError(
            f"forced_align for decoder_type={cfg.decoder_type}"
        )
