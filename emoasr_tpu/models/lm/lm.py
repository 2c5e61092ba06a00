"""Language models: TransformerLM / BERT / RNNLM / ELECTRA / P-ELECTRA / P2W
with a unified facade.

Parity targets:
- `LM` facade dispatch + unified `predict`/`score`/`zero_states`
  (`/root/reference/lm/modeling/lm.py:22-66`)
- `TransformerLM` = BERT stack with causal mask; stateless `predict`
  re-runs the full prefix; `score` sums next-token log-probs
  (`lm/modeling/transformer.py:19-105`)
- `BERTMaskedLM`: masked-LM training; `score` = pseudo-log-likelihood
  masking each position (`lm/modeling/bert.py:17-92`) — here one batched
  forward over all positions instead of inner host batching
- `RNNLM`: multi-layer LSTM LM; stateful one-step `predict`
  (`lm/modeling/rnn.py:13-86`); `score` implemented here (the reference
  leaves it `pass`)
- `ELECTRAModel` / `PELECTRAModel`: generator MLM + sampled replacements +
  discriminator BCE, joint loss gloss + w*dloss; `score` = -sum sigmoid
  (`lm/modeling/electra.py:33-233`)
- `P2W` phone-to-word models (`lm/modeling/p2w.py:20-107`): phone encoder
  (TransformerEncoder, input_layer=embed) + word decoder (AR transformer /
  CMLM "pbert" / CTC)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.decoders.ctc import CTCDecoder
from emoasr_tpu.models.decoders.transformer import TransformerDecoder
from emoasr_tpu.models.encoders import TransformerEncoder
from emoasr_tpu.models.layers import make_pad_mask
from emoasr_tpu.models.lm.bert import (
    BertMLMHead,
    BertStack,
    ElectraDiscriminatorHead,
    ElectraGeneratorHead,
    disc_bce_loss,
    mlm_loss,
)
from emoasr_tpu.ops.lstm import StackedLSTM


def _gather_last(logp, ylens):
    """(B, L, V), (B,) -> (B, V) at position ylen-1."""
    idx = (ylens - 1)[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(logp, idx, axis=1)[:, 0]


class TransformerLM(nn.Module):
    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        self.stack = BertStack(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_seq_len=cfg.max_seq_len,
            name="stack",
        )
        self.head = BertMLMHead(cfg.hidden_size, cfg.vocab_size, name="head")

    def logits(self, ys, ylens=None, deterministic: bool = True):
        h = self.stack(ys, ylens, causal=True, deterministic=deterministic)
        return self.head(h)

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        logits = self.logits(ys, ylens, deterministic)
        if labels is None:
            return logits
        loss = mlm_loss(logits, labels)
        return loss, {"loss_total": loss}

    def zero_states(self, bs: int):
        return None  # stateless

    def predict(self, ys, ylens, states=None):
        # gather the last hidden state BEFORE the vocab head: the head is
        # position-wise, so head(h)[last] == head(h[last]) exactly, and
        # projecting only the needed position turns the per-beam-step
        # cost from O(L·H·V) into O(H·V) — at the flagship L3-3 fusion
        # shapes (640 beams x L=80 x V=10k) that removes a ~500 GFLOP
        # matmul and a (B·W, L, V) float32 log-softmax per decode step
        h = self.stack(ys, ylens, causal=True)
        logits = self.head(_gather_last(h, ylens))
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), states

    def init_cache(self, B: int, max_len: int, dtype=jnp.float32):
        """Self-attention KV caches for incremental `predict_step`."""
        return self.stack.init_cache(B, max_len, dtype)

    def predict_step(self, tokens, pos, caches):
        """Incremental fusion step: consume `tokens` (B,) at `pos` (B,),
        return (log p(next) (B, V), new caches).  Equals `predict` on the
        full prefix but O(1) per step instead of O(L) re-encodes (cf. the
        reference's stateless loop, `lm/modeling/transformer.py:62-77`)."""
        h, caches = self.stack.step(tokens, pos, caches)
        logits = self.head(h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), caches

    def predict_step_indirect(self, tokens, pos, caches, anc):
        """`predict_step` over (B, W) beams with physical-slot caches +
        an ancestor table (no materialized beam gather; see
        bert.py::BertSelfAttention.step_indirect)."""
        h, caches = self.stack.step_indirect(tokens, pos, caches, anc)
        logits = self.head(h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), caches

    def score(self, ys, ylens):
        """Sum of next-token log-probs over positions 0..ylen-2 (B,)."""
        logits = self.logits(ys, ylens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        B, L, V = logp.shape
        nxt = jnp.pad(ys, ((0, 0), (0, 1)), constant_values=0)[:, 1:]
        tok_lp = jnp.take_along_axis(
            logp, nxt[:, :, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        valid = jnp.arange(L)[None, :] < (ylens - 1)[:, None]
        return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)


class BERTMaskedLM(nn.Module):
    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        self.stack = BertStack(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_seq_len=cfg.max_seq_len,
            name="stack",
        )
        self.head = BertMLMHead(cfg.hidden_size, cfg.vocab_size, name="head")

    def logits(self, ys, ylens=None, deterministic: bool = True):
        h = self.stack(ys, ylens, causal=False, deterministic=deterministic)
        return self.head(h)

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        logits = self.logits(ys, ylens, deterministic)
        if labels is None:
            return logits
        loss = mlm_loss(logits, labels)
        return loss, {"loss_total": loss}

    def zero_states(self, bs: int):
        return None

    def predict(self, ys, ylens, states=None):
        """MLM fill-in: log-probs at every position (used by the error
        correction pipeline)."""
        logits = self.logits(ys, ylens)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), states

    def score(self, ys, ylens):
        """Pseudo-log-likelihood: mask each position, sum target log-probs.

        One fully-batched forward over (B*L) masked copies replaces the
        reference's per-hyp chunked loop (bert.py:54-86).
        """
        cfg = self.cfg
        B, L = ys.shape
        # (B, L, L): for row p, copy of ys with position p masked
        eye = jnp.eye(L, dtype=bool)[None]  # (1, L, L)
        masked = jnp.where(eye, cfg.mask_id, ys[:, None, :])
        masked = masked.reshape(B * L, L)
        rep_lens = jnp.repeat(ylens, L)
        logits = self.logits(masked, rep_lens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        pos = jnp.tile(jnp.arange(L), B)
        tgt = ys.reshape(-1)
        lp = logp[jnp.arange(B * L), pos, tgt].reshape(B, L)
        valid = jnp.arange(L)[None, :] < ylens[:, None]
        return jnp.sum(jnp.where(valid, lp, 0.0), axis=1)


class RNNLM(nn.Module):
    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        emb = cfg.embedding_size or cfg.hidden_size
        self.embed = nn.Embed(cfg.vocab_size, emb, name="embed")
        self.rnns = StackedLSTM(
            cfg.hidden_size, cfg.num_layers, cfg.dropout_rate, name="rnns"
        )
        self.output = nn.Dense(cfg.vocab_size, name="output")
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def logits(self, ys, states=None, deterministic: bool = True):
        emb = self.dropout(
            self.embed(ys.astype(jnp.int32)), deterministic=deterministic
        )
        out, new_states = self.rnns(emb, states, deterministic=deterministic)
        return (
            self.output(self.dropout(out, deterministic=deterministic)),
            new_states,
        )

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        logits, _ = self.logits(ys, deterministic=deterministic)
        if labels is None:
            return logits
        loss = mlm_loss(logits, labels)
        return loss, {"loss_total": loss}

    def zero_states(self, bs: int):
        cfg = self.cfg
        return jnp.zeros((cfg.num_layers, 2, bs, cfg.hidden_size))

    def predict(self, ys, ylens, states=None):
        """Advance one step from the LAST valid token (rnn.py:62-81)."""
        last = jnp.take_along_axis(
            ys, (ylens - 1)[:, None].astype(jnp.int32), axis=1
        )  # (B, 1)
        if states is None:
            states = self.zero_states(ys.shape[0])
        logits, new_states = self.logits(last, states)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return logp[:, -1], new_states

    def score(self, ys, ylens):
        """Causal score (the reference leaves RNNLM.score unimplemented;
        provided here with TransformerLM.score semantics)."""
        logits, _ = self.logits(ys)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        B, L, V = logp.shape
        nxt = jnp.pad(ys, ((0, 0), (0, 1)), constant_values=0)[:, 1:]
        tok_lp = jnp.take_along_axis(
            logp, nxt[:, :, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        valid = jnp.arange(L)[None, :] < (ylens - 1)[:, None]
        return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)


def sample_categorical(rng, logits, temp: float = 1.0):
    """Temperature sampling (electra.py:20-30; temp=0 -> argmax)."""
    if temp == 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(rng, logits.astype(jnp.float32) / temp, axis=-1)


class ELECTRAModel(nn.Module):
    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        self.gstack = BertStack(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.gen_hidden_size,
            num_layers=cfg.gen_num_layers,
            num_heads=cfg.gen_num_attention_heads,
            intermediate_size=cfg.gen_intermediate_size,
            max_seq_len=cfg.max_seq_len,
            embedding_size=cfg.gen_embedding_size,
            name="gstack",
        )
        self.ghead = ElectraGeneratorHead(
            cfg.gen_embedding_size or cfg.gen_hidden_size, cfg.vocab_size,
            name="ghead",
        )
        self.dstack = BertStack(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.disc_hidden_size,
            num_layers=cfg.disc_num_layers,
            num_heads=cfg.disc_num_attention_heads,
            intermediate_size=cfg.disc_intermediate_size,
            max_seq_len=cfg.max_seq_len,
            embedding_size=cfg.disc_embedding_size,
            name="dstack",
        )
        self.dhead = ElectraDiscriminatorHead(
            cfg.disc_hidden_size, name="dhead"
        )

    def _generator(self, ys, ylens, deterministic):
        return self.ghead(self.gstack(ys, ylens, False, deterministic))

    def _discriminator(self, ys, ylens, deterministic):
        return self.dhead(self.dstack(ys, ylens, False, deterministic))

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        """Joint generator + discriminator training (electra.py:71-113)."""
        cfg = self.cfg
        glogits = self._generator(ys, ylens, deterministic)
        gloss = mlm_loss(glogits, labels)

        masked = labels != -100
        original = jnp.where(masked, labels, ys)
        rng = self.make_rng("sample")
        sample_ids = sample_categorical(rng, glogits)
        generated = jnp.where(masked, sample_ids, ys).astype(jnp.int32)
        generated = jax.lax.stop_gradient(generated)
        replaced = (generated != original).astype(jnp.int32)

        dlogits = self._discriminator(generated, ylens, deterministic)
        dloss = disc_bce_loss(dlogits, replaced, ylens)

        loss = gloss + cfg.electra_disc_weight * dloss
        B = ys.shape[0]
        return loss, {
            "loss_total": loss,
            "loss_gen": gloss,
            "loss_disc": dloss,
            "num_replaced": jnp.sum(replaced) / B,
            "num_masked": jnp.sum(masked) / B,
        }

    def forward_disc(self, ys, ylens=None, error_labels=None,
                     deterministic: bool = True):
        """Discriminator-only training on ASR error labels ("electra-disc")."""
        dlogits = self._discriminator(ys, ylens, deterministic)
        loss = disc_bce_loss(dlogits, error_labels, ylens)
        return loss, {"loss_total": loss}

    def zero_states(self, bs: int):
        return None

    def predict(self, ys, ylens, states=None):
        logits = self._generator(ys, ylens, True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return _gather_last(logp, ylens), states

    def score(self, ys, ylens):
        """-sum sigmoid(disc logits) over valid positions (electra.py:116-132)."""
        dlogits = self._discriminator(ys, ylens, True)
        probs = jax.nn.sigmoid(dlogits.astype(jnp.float32))
        valid = make_pad_mask(ylens, ys.shape[1])
        return -jnp.sum(jnp.where(valid, probs, 0.0), axis=1)


class P2W(nn.Module):
    """Phone-to-word model (PC-MLM family)."""

    cfg: ExpConfig
    decoder_type: Optional[str] = None  # transformer | bert | ctc

    def setup(self):
        cfg = self.cfg
        # phone encoder: TransformerEncoder with input_layer=embed
        enc_cfg = cfg.replace(input_layer="embed")
        self.encoder = TransformerEncoder(enc_cfg, name="encoder")
        dt = self.decoder_type
        if dt is None:
            dt = {
                "ptransformer": "transformer",
                "pbert": "bert",
                "pctc": "ctc",
            }[cfg.lm_type]
        self._dt = dt
        if dt == "transformer":
            self.decoder = TransformerDecoder(cfg, name="decoder")
        elif dt == "bert":
            self.decoder = TransformerDecoder(cfg, cmlm=True, name="decoder")
        elif dt == "ctc":
            self.decoder = CTCDecoder(cfg, name="decoder")
        else:
            raise ValueError(dt)

    def __call__(self, ys=None, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True, return_logits: bool = False):
        eouts, elens, _ = self.encoder(ps, plens, deterministic)

        if self._dt == "ctc":
            loss, loss_dict, logits = self.decoder(
                eouts, elens, ys=ys, ylens=ylens, deterministic=deterministic
            )
            if return_logits:
                return loss, loss_dict, logits
            return loss, loss_dict

        # CMLM ("bert"): ys_in = masked ys, targets at masked positions;
        # AR ("transformer"): reference decrements ylens to account for the
        # causal mask built as ylens+1 (p2w.py:85-87)
        dec_ylens = ylens - 1 if self._dt == "transformer" else ylens
        if labels is None:
            return self.decoder(
                eouts, elens, None, ys, dec_ylens, ys_in=ys, ys_out=None,
                deterministic=deterministic,
            )
        loss, loss_dict, logits = self.decoder(
            eouts, elens, None, ys, dec_ylens, ys_in=ys, ys_out=labels,
            deterministic=deterministic,
        )
        if return_logits:
            return loss, loss_dict, logits
        return loss, loss_dict

    def predict(self, ys, ylens, ps=None, plens=None):
        """Fill-in log-probs conditioned on phones (for error correction)."""
        eouts, elens, _ = self.encoder(ps, plens, True)
        logits = self.decoder(
            eouts, elens, None, ys, ylens, ys_in=ys, ys_out=None,
            deterministic=True,
        )
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), None

    def decode_greedy(self, ps, plens):
        """Cascade correction path (p2w.py:101-107): phone -> word."""
        eouts, elens, _ = self.encoder(ps, plens, True)
        if self._dt == "ctc":
            hyps, hyp_lens, _, _ = self.decoder.greedy(eouts, elens)
            return hyps, hyp_lens
        raise NotImplementedError("P2W decode for non-CTC uses emoasr_tpu.search")


class PELECTRAModel(nn.Module):
    """Phone-conditioned ELECTRA: P2W (CMLM) generator + BERT discriminator."""

    cfg: ExpConfig

    def setup(self):
        cfg = self.cfg
        self.gmodel = P2W(cfg, decoder_type="bert", name="gmodel")
        self.dstack = BertStack(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.disc_hidden_size,
            num_layers=cfg.disc_num_layers,
            num_heads=cfg.disc_num_attention_heads,
            intermediate_size=cfg.disc_intermediate_size,
            max_seq_len=cfg.max_seq_len,
            embedding_size=cfg.disc_embedding_size,
            name="dstack",
        )
        self.dhead = ElectraDiscriminatorHead(cfg.disc_hidden_size, name="dhead")

    def _discriminator(self, ys, ylens, deterministic):
        return self.dhead(self.dstack(ys, ylens, False, deterministic))

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        cfg = self.cfg
        gloss, gdict, glogits = self.gmodel(
            ys, ylens, labels, ps, plens, deterministic, return_logits=True
        )
        masked = labels != -100
        original = jnp.where(masked, labels, ys)
        rng = self.make_rng("sample")
        sample_ids = sample_categorical(rng, glogits)
        generated = jnp.where(masked, sample_ids, ys).astype(jnp.int32)
        generated = jax.lax.stop_gradient(generated)
        replaced = (generated != original).astype(jnp.int32)

        dlogits = self._discriminator(generated, ylens, deterministic)
        dloss = disc_bce_loss(dlogits, replaced, ylens)
        loss = gloss + cfg.electra_disc_weight * dloss
        B = ys.shape[0]
        return loss, {
            "loss_total": loss,
            "loss_gen": gloss,
            "loss_disc": dloss,
            "num_replaced": jnp.sum(replaced) / B,
            "num_masked": jnp.sum(masked) / B,
        }

    def forward_disc(self, ys, ylens=None, error_labels=None,
                     deterministic: bool = True):
        dlogits = self._discriminator(ys, ylens, deterministic)
        loss = disc_bce_loss(dlogits, error_labels, ylens)
        return loss, {"loss_total": loss}

    def zero_states(self, bs: int):
        return None

    def score(self, ys, ylens):
        dlogits = self._discriminator(ys, ylens, True)
        probs = jax.nn.sigmoid(dlogits.astype(jnp.float32))
        valid = make_pad_mask(ylens, ys.shape[1])
        return -jnp.sum(jnp.where(valid, probs, 0.0), axis=1)


class LM(nn.Module):
    """Dispatching facade (lm/modeling/lm.py:22-66)."""

    cfg: ExpConfig

    def setup(self):
        t = self.cfg.lm_type
        if t == "bert":
            self.lm = BERTMaskedLM(self.cfg, name="lm")
        elif t == "transformer":
            self.lm = TransformerLM(self.cfg, name="lm")
        elif t in ("electra", "electra-disc"):
            self.lm = ELECTRAModel(self.cfg, name="lm")
        elif t in ("pelectra", "pelectra-disc"):
            self.lm = PELECTRAModel(self.cfg, name="lm")
        elif t == "rnn":
            self.lm = RNNLM(self.cfg, name="lm")
        elif t in ("ptransformer", "pbert", "pctc"):
            self.lm = P2W(self.cfg, name="lm")
        else:
            raise ValueError(t)

    def __call__(self, ys, ylens=None, labels=None, ps=None, plens=None,
                 deterministic: bool = True):
        return self.lm(ys, ylens, labels, ps, plens, deterministic=deterministic)

    def forward_disc(self, ys, ylens=None, error_labels=None,
                     deterministic: bool = True):
        return self.lm.forward_disc(ys, ylens, error_labels, deterministic)

    def zero_states(self, bs: int):
        return self.lm.zero_states(bs)

    def predict(self, ys, ylens, states=None):
        return self.lm.predict(ys, ylens, states)

    def init_cache(self, B: int, max_len: int, dtype=jnp.float32):
        return self.lm.init_cache(B, max_len, dtype)

    def predict_step(self, tokens, pos, caches):
        return self.lm.predict_step(tokens, pos, caches)

    def predict_step_indirect(self, tokens, pos, caches, anc):
        return self.lm.predict_step_indirect(tokens, pos, caches, anc)

    def score(self, ys, ylens):
        return self.lm.score(ys, ylens)
