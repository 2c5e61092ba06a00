"""Import reference (emoASR / torch) checkpoints into flax parameter trees.

Needed for the WER-parity goal: load `model.ep{N}` state_dicts from the
reference (`asr/train_asr.py:290-303` checkpoint format) and evaluate them
with the JAX models.  Layout conversions:

- Linear  (out,in)            -> Dense kernel (in,out)
- Conv2d  (out,in,kh,kw)      -> Conv kernel (kh,kw,in,out)
- Conv1d  (out,in,k)          -> Conv kernel (k,in,out)
- LSTM    weight_ih_l0 etc.   -> UniLSTM params (same torch layout, no T)
- BatchNorm running stats     -> batch_stats collection
- Embedding weight            -> Embed embedding
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]


def dense(sd: SD, p: str, bias: bool = True) -> dict:
    out = {"kernel": sd[f"{p}.weight"].T}
    if bias:
        out["bias"] = sd[f"{p}.bias"]
    return out


def conv2d(sd: SD, p: str) -> dict:
    return {
        "kernel": sd[f"{p}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{p}.bias"],
    }


def conv1d(sd: SD, p: str) -> dict:
    return {
        "kernel": sd[f"{p}.weight"].transpose(2, 1, 0),
        "bias": sd[f"{p}.bias"],
    }


def layer_norm(sd: SD, p: str) -> dict:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def embed(sd: SD, p: str) -> dict:
    return {"embedding": sd[f"{p}.weight"]}


def lstm(sd: SD, p: str, suffix: str = "_l0") -> dict:
    return {
        "weight_ih": sd[f"{p}.weight_ih{suffix}"],
        "weight_hh": sd[f"{p}.weight_hh{suffix}"],
        "bias_ih": sd[f"{p}.bias_ih{suffix}"],
        "bias_hh": sd[f"{p}.bias_hh{suffix}"],
    }


def mha(sd: SD, p: str, rel: bool = False) -> dict:
    out = {
        "linear_q": dense(sd, f"{p}.linear_q"),
        "linear_k": dense(sd, f"{p}.linear_k"),
        "linear_v": dense(sd, f"{p}.linear_v"),
        "linear_out": dense(sd, f"{p}.linear_out"),
    }
    if rel:
        out["linear_pos"] = dense(sd, f"{p}.linear_pos", bias=False)
        out["pos_bias_u"] = sd[f"{p}.pos_bias_u"]
        out["pos_bias_v"] = sd[f"{p}.pos_bias_v"]
    return out


def feed_forward(sd: SD, p: str) -> dict:
    return {"w1": dense(sd, f"{p}.w1"), "w2": dense(sd, f"{p}.w2")}


def conv_subsampler(sd: SD, p: str = "conv") -> dict:
    # reference: conv.conv.0 / conv.conv.2 (Sequential), conv.output
    return {
        "conv1": conv2d(sd, f"{p}.conv.0"),
        "conv2": conv2d(sd, f"{p}.conv.2"),
        "output": dense(sd, f"{p}.output"),
    }


def transformer_layer(sd: SD, p: str) -> dict:
    return {
        "norm1": layer_norm(sd, f"{p}.norm1"),
        "norm2": layer_norm(sd, f"{p}.norm2"),
        "self_attn": mha(sd, f"{p}.self_attn"),
        "feed_forward": feed_forward(sd, f"{p}.feed_forward"),
    }


def conformer_layer(sd: SD, p: str, rel: bool = True) -> Tuple[dict, dict]:
    """Returns (params, batch_stats)."""
    params = {
        "norm_ff_macaron": layer_norm(sd, f"{p}.norm_ff_macaron"),
        "feed_forward_macaron": feed_forward(sd, f"{p}.feed_forward_macaron"),
        "norm_self_attn": layer_norm(sd, f"{p}.norm_self_attn"),
        "self_attn": mha(sd, f"{p}.self_attn", rel=rel),
        "norm_conv": layer_norm(sd, f"{p}.norm_conv"),
        "conv": {
            "pointwise_conv1": conv1d(sd, f"{p}.conv.pointwise_conv1"),
            "depthwise_conv": conv1d(sd, f"{p}.conv.depthwise_conv"),
            "batch_norm": {
                "scale": sd[f"{p}.conv.batch_norm.weight"],
                "bias": sd[f"{p}.conv.batch_norm.bias"],
            },
            "pointwise_conv2": conv1d(sd, f"{p}.conv.pointwise_conv2"),
        },
        "norm_ff": layer_norm(sd, f"{p}.norm_ff"),
        "feed_forward": feed_forward(sd, f"{p}.feed_forward"),
        "norm_final": layer_norm(sd, f"{p}.norm_final"),
    }
    stats = {
        "conv": {
            "batch_norm": {
                "mean": sd[f"{p}.conv.batch_norm.running_mean"],
                "var": sd[f"{p}.conv.batch_norm.running_var"],
            }
        }
    }
    return params, stats


def transformer_encoder(
    sd: SD, num_layers: int, is_conformer: bool, prefix: str = "",
    input_layer: str = "conv2d",
) -> Tuple[dict, dict]:
    """Convert a reference TransformerEncoder state_dict subtree.

    Returns (params, batch_stats) for `emoasr_tpu.models.encoders.TransformerEncoder`.
    """
    P = lambda s: f"{prefix}{s}"
    params: dict = {}
    stats: dict = {}
    if input_layer == "conv2d":
        params["conv"] = conv_subsampler(sd, P("conv"))
    elif input_layer == "embed":
        params["embed"] = embed(sd, P("embed"))
    elif input_layer == "linear":
        params["linear"] = dense(sd, P("linear"))
    for i in range(num_layers):
        lp = P(f"transformers.{i}")
        if is_conformer:
            params[f"layers_{i}"], st = conformer_layer(sd, lp)
            stats[f"layers_{i}"] = st
        else:
            params[f"layers_{i}"] = transformer_layer(sd, lp)
    params["norm"] = layer_norm(sd, P("norm"))
    return params, stats


def rnn_encoder(sd: SD, num_layers: int, prefix: str = "") -> dict:
    P = lambda s: f"{prefix}{s}"
    params: dict = {"conv": conv_subsampler(sd, P("conv"))}
    for i in range(num_layers):
        params[f"rnns_{i}"] = {
            "fwd": lstm(sd, P(f"rnns.{i}"), "_l0"),
            "bwd": lstm(sd, P(f"rnns.{i}"), "_l0_reverse"),
        }
    return params


def transformer_decoder_layer(sd: SD, p: str) -> dict:
    return {
        "norm1": layer_norm(sd, f"{p}.norm1"),
        "norm2": layer_norm(sd, f"{p}.norm2"),
        "norm3": layer_norm(sd, f"{p}.norm3"),
        "self_attn": mha(sd, f"{p}.self_attn"),
        "src_attn": mha(sd, f"{p}.src_attn"),
        "feed_forward": feed_forward(sd, f"{p}.feed_forward"),
    }


def transformer_decoder(sd: SD, num_layers: int, prefix: str = "") -> dict:
    """Convert a reference attention-decoder state_dict subtree
    (`asr/modeling/decoders/transformer.py:25-60`)."""
    P = lambda s: f"{prefix}{s}"
    params = {
        "embed": embed(sd, P("embed")),
        "norm": layer_norm(sd, P("norm")),
        "output": dense(sd, P("output")),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = transformer_decoder_layer(sd, P(f"transformers.{i}"))
    if any(k.startswith(P("ctc.")) for k in sd):
        params["ctc"] = ctc_decoder(sd, P("ctc."))
    return params


def ctc_decoder(sd: SD, prefix: str = "") -> dict:
    params = {"output": dense(sd, f"{prefix}output")}
    if f"{prefix}phone_output.weight" in sd:
        params["phone_output"] = dense(sd, f"{prefix}phone_output")
    return params


def rnnt_decoder(sd: SD, num_layers: int, prefix: str = "") -> dict:
    """Convert a reference RNN-T decoder subtree
    (`asr/modeling/decoders/rnn_transducer.py:24-62`)."""
    P = lambda s: f"{prefix}{s}"
    params = {
        "embed": embed(sd, P("embed")),
        "rnns": {
            f"layer{i}": lstm(sd, P(f"rnns.{i}"), "_l0") for i in range(num_layers)
        },
        "w_enc": dense(sd, P("w_enc")),
        "w_dec": dense(sd, P("w_dec")),
        "output": dense(sd, P("output")),
    }
    if any(k.startswith(P("ctc.")) for k in sd):
        params["ctc"] = ctc_decoder(sd, P("ctc."))
    return params


def las_decoder(sd: SD, num_layers: int, prefix: str = "") -> dict:
    """Convert a reference LAS decoder subtree (las.py:22-60, 289-303)."""
    P = lambda s: f"{prefix}{s}"
    params = {
        "embed": embed(sd, P("embed")),
        "output": dense(sd, P("output")),
        "intermed_kernel": sd[P("intermed.weight")].T,
        "intermed_bias": sd[P("intermed.bias")],
        "w_key_kernel": sd[P("score.w_key.weight")].T,
        "w_key_bias": sd[P("score.w_key.bias")],
        "w_query_kernel": sd[P("score.w_query.weight")].T,
        "w_query_bias": sd[P("score.w_query.bias")],
        "w_conv_kernel": sd[P("score.w_conv.weight")].T,
        "w_conv_bias": sd[P("score.w_conv.bias")],
        "w_score_kernel": sd[P("score.w_score.weight")].T,
        "w_score_bias": sd[P("score.w_score.bias")],
        "attn_conv_kernel": sd[P("score.conv.weight")].transpose(2, 1, 0),
    }
    for i in range(num_layers):
        params[f"cell{i}_w_ih"] = sd[P(f"rnns.{i}.weight_ih")]
        params[f"cell{i}_w_hh"] = sd[P(f"rnns.{i}.weight_hh")]
        params[f"cell{i}_b_ih"] = sd[P(f"rnns.{i}.bias_ih")]
        params[f"cell{i}_b_hh"] = sd[P(f"rnns.{i}.bias_hh")]
    if any(k.startswith(P("ctc.")) for k in sd):
        params["ctc"] = ctc_decoder(sd, P("ctc."))
    return params


def asr_model(sd: SD, cfg) -> Tuple[dict, dict]:
    """Convert a full reference ASR checkpoint (`asr/modeling/asr.py`).

    Returns ({"encoder": ..., "decoder": ...}, batch_stats)."""
    stats: dict = {}
    if cfg.encoder_type == "rnn":
        enc = rnn_encoder(sd, cfg.enc_num_layers, "encoder.")
    else:
        enc, enc_stats = transformer_encoder(
            sd, cfg.enc_num_layers, cfg.encoder_type == "conformer",
            "encoder.", cfg.input_layer,
        )
        if enc_stats:
            stats["encoder"] = enc_stats
    if cfg.decoder_type == "ctc":
        dec = ctc_decoder(sd, "decoder.")
    elif cfg.decoder_type == "rnn_transducer":
        dec = rnnt_decoder(sd, cfg.dec_num_layers, "decoder.")
    elif cfg.decoder_type == "transformer":
        dec = transformer_decoder(sd, cfg.dec_num_layers, "decoder.")
    elif cfg.decoder_type == "las":
        dec = las_decoder(sd, cfg.dec_num_layers, "decoder.")
    else:
        raise ValueError(cfg.decoder_type)
    return {"encoder": enc, "decoder": dec}, stats


# ---------------------------------------------------------------------------
# LM family (vendored-HF BERT / ELECTRA naming)
# ---------------------------------------------------------------------------


def bert_layer_hf(sd: SD, p: str) -> dict:
    """One `encoder.layer.{i}` subtree -> emoasr_tpu BertLayer params."""
    return {
        "self_attn": {
            "query": dense(sd, f"{p}.attention.self.query"),
            "key": dense(sd, f"{p}.attention.self.key"),
            "value": dense(sd, f"{p}.attention.self.value"),
        },
        "attn_output": dense(sd, f"{p}.attention.output.dense"),
        "attn_norm": layer_norm(sd, f"{p}.attention.output.LayerNorm"),
        "intermediate": dense(sd, f"{p}.intermediate.dense"),
        "output": dense(sd, f"{p}.output.dense"),
        "output_norm": layer_norm(sd, f"{p}.output.LayerNorm"),
    }


def bert_stack_hf(sd: SD, num_layers: int, prefix: str) -> dict:
    """`bert.` / `electra.` model subtree -> BertStack params."""
    P = lambda s: f"{prefix}{s}"
    params = {
        "word_embeddings": embed(sd, P("embeddings.word_embeddings")),
        "position_embeddings": embed(sd, P("embeddings.position_embeddings")),
        "token_type_embeddings": embed(sd, P("embeddings.token_type_embeddings")),
        "emb_norm": layer_norm(sd, P("embeddings.LayerNorm")),
    }
    if f"{prefix}embeddings_project.weight" in sd:
        params["embeddings_project"] = dense(sd, P("embeddings_project"))
    for i in range(num_layers):
        params[f"layers_{i}"] = bert_layer_hf(sd, P(f"encoder.layer.{i}"))
    return params


def bert_mlm_head_hf(sd: SD, prefix: str = "cls.predictions") -> dict:
    return {
        "transform_dense": dense(sd, f"{prefix}.transform.dense"),
        "transform_norm": layer_norm(sd, f"{prefix}.transform.LayerNorm"),
        "decoder": {
            "kernel": sd[f"{prefix}.decoder.weight"].T,
            "bias": sd[f"{prefix}.bias"],
        },
    }


def bert_masked_lm(sd: SD, num_layers: int, prefix: str = "") -> dict:
    """`BertForMaskedLM` (used by both TransformerLM and BERTMaskedLM
    wrappers; the causal flag is runtime-only)."""
    return {
        "stack": bert_stack_hf(sd, num_layers, f"{prefix}bert."),
        "head": bert_mlm_head_hf(sd, f"{prefix}cls.predictions"),
    }


def electra_model(sd: SD, gen_layers: int, disc_layers: int, prefix: str = "") -> dict:
    """`ELECTRAModel` (gmodel=ElectraForMaskedLM + dmodel=ElectraForPreTraining)."""
    P = lambda s: f"{prefix}{s}"
    return {
        "gstack": bert_stack_hf(sd, gen_layers, P("gmodel.electra.")),
        "ghead": {
            "dense": dense(sd, P("gmodel.generator_predictions.dense")),
            "norm": layer_norm(sd, P("gmodel.generator_predictions.LayerNorm")),
            "lm_head": dense(sd, P("gmodel.generator_lm_head")),
        },
        "dstack": bert_stack_hf(sd, disc_layers, P("dmodel.electra.")),
        "dhead": {
            "dense": dense(sd, P("dmodel.discriminator_predictions.dense")),
            "dense_prediction": dense(
                sd, P("dmodel.discriminator_predictions.dense_prediction")
            ),
        },
    }


def rnnlm(sd: SD, num_layers: int, prefix: str = "") -> dict:
    P = lambda s: f"{prefix}{s}"
    return {
        "embed": embed(sd, P("embed")),
        "rnns": {
            f"layer{i}": lstm(sd, P("rnns"), f"_l{i}") for i in range(num_layers)
        },
        "output": dense(sd, P("output")),
    }


def load_state_dict_np(path: str) -> SD:
    """Load a torch checkpoint into numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def npz_state_dict(npz) -> SD:
    """Extract a state_dict saved by tools/gen_*_fixtures.py ('sd::' keys)."""
    return {k[4:]: npz[k] for k in npz.files if k.startswith("sd::")}
