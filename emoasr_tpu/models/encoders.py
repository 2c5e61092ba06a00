"""ASR encoders: Transformer / Conformer / RNN (flax.linen).

Parity targets:
- `TransformerEncoder` (`/root/reference/asr/modeling/encoders/transformer.py:16-113`):
  input layer conv2d/embed/linear, abs or rel positional encoding, N encoder
  layers, pre-norm final LayerNorm eps=1e-12, optional intermediate tap for
  inter-CTC / hierarchical phone CTC.
- `RNNEncoder` (`/root/reference/asr/modeling/encoders/rnn.py:14-81`):
  stacked single-layer biLSTMs with forward+backward outputs summed.

All shapes are static per bucket; padding is mask-driven.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.layers import (
    ConformerEncoderLayer,
    Conv2dSubsampler,
    PositionalEncoder,
    RelPositionalEncoder,
    TransformerEncoderLayer,
    make_pad_mask,
)
from emoasr_tpu.ops.lstm import BiLSTM


class TransformerEncoder(nn.Module):
    """Transformer encoder, also covering Conformer via `is_conformer`."""

    cfg: ExpConfig
    is_conformer: bool = False

    @nn.compact
    def __call__(self, xs, xlens, deterministic: bool = True):
        cfg = self.cfg
        pos_encode_type = cfg.pos_encode_type if self.is_conformer else "abs"

        if cfg.input_layer == "conv2d":
            xs, elens = Conv2dSubsampler(cfg.enc_hidden_size, name="conv")(
                xs, xlens
            )
        elif cfg.input_layer == "embed":
            xs = nn.Embed(
                cfg.src_vocab_size, cfg.enc_hidden_size, name="embed"
            )(xs.astype(jnp.int32))
            elens = xlens
        elif cfg.input_layer == "linear":
            xs = nn.Dense(cfg.enc_hidden_size, name="linear")(xs)
            elens = xlens
        else:
            raise ValueError(cfg.input_layer)

        mask = make_pad_mask(elens, xs.shape[1])[:, None, None, :]  # (B,1,1,T)

        if pos_encode_type == "abs":
            xs = PositionalEncoder(
                cfg.enc_hidden_size, cfg.dropout_enc_rate, name="pe"
            )(xs, deterministic)
            pos_emb = None
        else:
            xs, pos_emb = RelPositionalEncoder(
                cfg.enc_hidden_size, cfg.dropout_enc_rate, name="pe"
            )(xs, deterministic)

        Layer = ConformerEncoderLayer if self.is_conformer else TransformerEncoderLayer
        inter_layer_id = cfg.inter_ctc_layer_id if (
            cfg.mtl_inter_ctc_weight > 0 or cfg.mtl_phone_ctc_weight > 0
        ) else 0

        final_norm = nn.LayerNorm(epsilon=1e-12, name="norm")
        eouts_inter = None
        for layer_id in range(cfg.enc_num_layers):
            kw = dict(
                num_heads=cfg.enc_num_attention_heads,
                hidden_size=cfg.enc_hidden_size,
                intermediate_size=cfg.enc_intermediate_size,
                dropout_rate=cfg.dropout_enc_rate,
                dropout_attn_rate=cfg.dropout_attn_rate,
                name=f"layers_{layer_id}",
            )
            if self.is_conformer:
                kw.update(
                    pos_encode_type=pos_encode_type,
                    conv_kernel_size=cfg.conv_kernel_size,
                    fused_attn=cfg.enc_fused_attn,
                )
                xs = Layer(**kw)(
                    xs, mask, pos_emb, deterministic,
                    lens=elens if cfg.enc_fused_attn else None,
                )
            else:
                kw.update(fused_attn=cfg.enc_fused_attn)
                xs = Layer(**kw)(
                    xs, mask, pos_emb, deterministic,
                    lens=elens if cfg.enc_fused_attn else None,
                )
            if (layer_id + 1) == inter_layer_id:
                # intermediate branches also get the pre-norm normalization
                eouts_inter = final_norm(xs)

        eouts = final_norm(xs)
        return eouts, elens, eouts_inter


class RNNEncoder(nn.Module):
    """Stacked biLSTM encoder with summed directions."""

    cfg: ExpConfig

    @nn.compact
    def __call__(self, xs, xlens, deterministic: bool = True):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            xs, elens = Conv2dSubsampler(cfg.enc_hidden_size, name="conv")(
                xs, xlens
            )
        else:  # "none"
            elens = xlens

        if cfg.enc_hidden_sum_fwd_bwd:
            hidden = cfg.enc_hidden_size
        else:
            assert cfg.enc_hidden_size % 2 == 0
            hidden = cfg.enc_hidden_size // 2

        for layer_id in range(cfg.enc_num_layers):
            out = BiLSTM(hidden, name=f"rnns_{layer_id}")(xs, elens)
            if cfg.enc_hidden_sum_fwd_bwd:
                xs = out[:, :, :hidden] + out[:, :, hidden:]
            else:
                xs = out
            xs = nn.Dropout(cfg.dropout_enc_rate)(
                xs, deterministic=deterministic
            )

        return xs, elens, None


def build_encoder(cfg: ExpConfig) -> nn.Module:
    """Encoder factory (`asr/modeling/asr.py:29-34`)."""
    if cfg.encoder_type == "rnn":
        return RNNEncoder(cfg)
    if cfg.encoder_type in ("transformer", "conformer"):
        return TransformerEncoder(cfg, is_conformer=cfg.encoder_type == "conformer")
    raise ValueError(cfg.encoder_type)
