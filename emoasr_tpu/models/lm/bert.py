"""BERT-style post-norm transformer stack with a causal switch, plus
BERT-MLM and ELECTRA generator/discriminator heads (flax.linen).

The reference vendors ~6.8k LoC of trimmed HuggingFace transformers
(`/root/reference/lm/modeling/transformers/`) with ONE local modification: a
`causal=` flag threaded into the extended attention mask
(`modeling_bert.py:734,793-795`) so the same BERT stack serves as both a
masked LM and a causal (Transformer) LM.  This is a clean re-implementation
of just the pieces emoASR uses, with the same architecture so reference
checkpoints import:

- embeddings = word + learned-position + token-type, LayerNorm eps=1e-12,
  dropout (modeling_bert.py:159-205); ELECTRA variant uses `embedding_size`
  with a projection to `hidden_size` (modeling_electra.py:240-330)
- encoder layer = post-norm self-attention and FF-GELU blocks
- MLM head = dense+gelu+LN transform, untied vocab decoder with bias
  (modeling_bert.py:520-555)
- ELECTRA generator head = dense->gelu->LN at embedding_size + lm head;
  discriminator head = dense->act->dense(1) (modeling_electra.py:128-161),
  BCE over non-pad positions (modeling_electra.py:527-535)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.models.layers import NEG_INF, make_causal_mask, make_pad_mask


# fused indirect-step dispatch: None = auto, True/False = forced
# (tests + measurement tools).  Chip A/B at the L3-3 flagship row
# (B=64, W=10, bf16, tools/profile_l33.py --lm-step): XLA chain 329.0 ms
# vs fused kernel 370.4 ms — XLA already fuses this step well enough
# that the kernel's W-way masked cache contractions cost more than the
# small-op overhead they remove, so auto resolves to the XLA path.  The
# kernel stays parity-tested (tests/test_lm_step_pallas.py) as the
# fallback shape for future W/L regimes.
FUSED_INDIRECT_STEP = None


def _fused_step_wanted() -> bool:
    if FUSED_INDIRECT_STEP is not None:
        return bool(FUSED_INDIRECT_STEP)
    return False


class BertSelfAttention(nn.Module):
    num_heads: int
    hidden_size: int
    dropout_rate: float = 0.1

    def setup(self):
        self.query = nn.Dense(self.hidden_size)
        self.key = nn.Dense(self.hidden_size)
        self.value = nn.Dense(self.hidden_size)
        self.attn_drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, deterministic: bool = True):
        d_k = self.hidden_size // self.num_heads
        B, L, _ = x.shape
        q = self.query(x).reshape(B, L, self.num_heads, d_k)
        k = self.key(x).reshape(B, L, self.num_heads, d_k)
        v = self.value(x).reshape(B, L, self.num_heads, d_k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d_k, x.dtype)
        )
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, self.hidden_size)
        return out

    def step(self, x, cache_k, cache_v, pos):
        """Incremental causal attention for decoding (no reference
        equivalent — the reference re-encodes the full prefix per step,
        `lm/modeling/transformer.py:62-77`).

        x: (B, D) hidden of the newest token; cache_k/v: (B, Lmax, H, dk);
        pos: (B,) its position.  Writes K/V at pos and attends over
        positions <= pos — the same column a full causal forward yields.
        """
        d_k = self.hidden_size // self.num_heads
        B = x.shape[0]
        Lmax = cache_k.shape[1]
        q = self.query(x).reshape(B, self.num_heads, d_k)
        k = self.key(x).reshape(B, self.num_heads, d_k)
        v = self.value(x).reshape(B, self.num_heads, d_k)
        bidx = jnp.arange(B)
        cache_k = cache_k.at[bidx, pos].set(k)
        cache_v = cache_v.at[bidx, pos].set(v)
        scores = jnp.einsum("bhd,bkhd->bhk", q, cache_k) / jnp.sqrt(
            jnp.asarray(d_k, x.dtype)
        )
        mask = jnp.arange(Lmax)[None, None, :] <= pos[:, None, None]
        scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhk,bkhd->bhd", attn, cache_v).reshape(
            B, self.hidden_size
        )
        return out, cache_k, cache_v

    def step_indirect(self, x, cache_k, cache_v, pos, anc):
        """`step` over beam-structured caches with ancestor indirection.

        x: (B, W, D) newest-token hiddens; cache_k/v: (B, W, Lc, H, dk)
        in PHYSICAL slot order (never beam-permuted); pos: (B, W);
        anc: (B, W, Lc) with anc[b, w, t] = the physical slot whose
        column t holds beam (b, w)'s token at position t (the caller
        keeps it composed across beam reindexes and has already set
        anc[b, w, pos] = w for this step's write).

        Equivalent to gathering each beam's ancestor rows and running
        `step`, but the gather never materializes: scores against ALL W
        physical rows (a W-wide MXU contraction, ~W x the FLOPs of the
        gathered dot — trivial at beam widths) are one-hot-selected by
        `anc`.  Saves the dominant per-step HBM cost of cached beam
        decoding: the (B, W, Lc, H, dk) read+write gather materialization
        (measured ~810 us/step for the 4-layer fusion LM at L3-3 shapes,
        tools/stub_lm.py, vs ~100 us of pure cache-read traffic).
        """
        d_k = self.hidden_size // self.num_heads
        B, W, _ = x.shape
        Lc = cache_k.shape[2]
        q = self.query(x).reshape(B, W, self.num_heads, d_k)
        k = self.key(x).reshape(B, W, self.num_heads, d_k)
        v = self.value(x).reshape(B, W, self.num_heads, d_k)
        bidx = jnp.arange(B)[:, None]
        widx = jnp.arange(W)[None, :]
        cache_k = cache_k.at[bidx, widx, pos].set(k)
        cache_v = cache_v.at[bidx, widx, pos].set(v)
        # one-hot ancestor selector (exact: exactly one nonzero per (w, t))
        m = (anc[:, :, None, :] == widx[0][None, None, :, None]).astype(
            x.dtype
        )  # (B, W, Wv, Lc)
        s_all = jnp.einsum("bwhd,bvthd->bwvth", q, cache_k) / jnp.sqrt(
            jnp.asarray(d_k, x.dtype)
        )
        scores = jnp.einsum("bwvt,bwvth->bwht", m, s_all)
        tmask = jnp.arange(Lc)[None, None, None, :] <= pos[:, :, None, None]
        scores = jnp.where(tmask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        p2 = jnp.einsum("bwht,bwvt->bwvth", attn, m)
        out = jnp.einsum("bwvth,bvthd->bwhd", p2, cache_v).reshape(
            B, W, self.hidden_size
        )
        return out, cache_k, cache_v


class BertLayer(nn.Module):
    """Post-norm: LN(x + drop(proj(attn))), LN(x + drop(out(gelu(inter))))."""

    num_heads: int
    hidden_size: int
    intermediate_size: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1

    def setup(self):
        self.self_attn = BertSelfAttention(
            self.num_heads, self.hidden_size, self.attn_dropout_rate
        )
        self.attn_output = nn.Dense(self.hidden_size)
        self.attn_norm = nn.LayerNorm(epsilon=1e-12)
        self.intermediate = nn.Dense(self.intermediate_size)
        self.output = nn.Dense(self.hidden_size)
        self.output_norm = nn.LayerNorm(epsilon=1e-12)
        self.drop = nn.Dropout(self.dropout_rate)

    def _ff(self, x, deterministic):
        h = self.intermediate(x)
        h = nn.gelu(h, approximate=False)
        h = self.output(h)
        return self.output_norm(x + self.drop(h, deterministic=deterministic))

    def __call__(self, x, mask, deterministic: bool = True):
        h = self.self_attn(x, mask, deterministic)
        h = self.attn_output(h)
        x = self.attn_norm(x + self.drop(h, deterministic=deterministic))
        return self._ff(x, deterministic)

    def step(self, x, cache_k, cache_v, pos):
        """Incremental decode for one new position; x: (B, D)."""
        h, cache_k, cache_v = self.self_attn.step(x, cache_k, cache_v, pos)
        h = self.attn_output(h)
        x = self.attn_norm(x + h)
        return self._ff(x, True), cache_k, cache_v

    def _step_weights(self):
        """Raw weight dict for the fused Pallas step (ops/lm_step_pallas)."""
        p = self.variables["params"]
        return dict(
            wq=p["self_attn"]["query"]["kernel"],
            bq=p["self_attn"]["query"]["bias"],
            wk=p["self_attn"]["key"]["kernel"],
            bk=p["self_attn"]["key"]["bias"],
            wv=p["self_attn"]["value"]["kernel"],
            bv=p["self_attn"]["value"]["bias"],
            wo=p["attn_output"]["kernel"], bo=p["attn_output"]["bias"],
            ln1_s=p["attn_norm"]["scale"], ln1_b=p["attn_norm"]["bias"],
            wi=p["intermediate"]["kernel"], bi=p["intermediate"]["bias"],
            wo2=p["output"]["kernel"], bo2=p["output"]["bias"],
            ln2_s=p["output_norm"]["scale"], ln2_b=p["output_norm"]["bias"],
        )

    def step_indirect(self, x, cache_k, cache_v, pos, anc, fused=False):
        """`step` on (B, W, D) with ancestor-indirect caches.

        `fused=True` runs the whole layer step as ONE Pallas program
        (ops/lm_step_pallas.py) — same math, none of the ~30 small-op
        HBM round trips per layer."""
        if fused:
            from emoasr_tpu.ops.lm_step_pallas import (
                fused_bert_layer_step_indirect,
            )

            B, W = pos.shape
            y, k_new, v_new = fused_bert_layer_step_indirect(
                x, cache_k, cache_v, pos, anc, self._step_weights()
            )
            bidx = jnp.arange(B)[:, None]
            widx = jnp.arange(W)[None, :]
            cache_k = cache_k.at[bidx, widx, pos].set(k_new)
            cache_v = cache_v.at[bidx, widx, pos].set(v_new)
            return y, cache_k, cache_v
        h, cache_k, cache_v = self.self_attn.step_indirect(
            x, cache_k, cache_v, pos, anc
        )
        h = self.attn_output(h)
        x = self.attn_norm(x + h)
        return self._ff(x, True), cache_k, cache_v


class BertStack(nn.Module):
    """Embeddings + N post-norm layers; `causal` makes it a left-to-right LM.

    `embedding_size` (ELECTRA) adds a projection when != hidden_size.
    """

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_seq_len: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    embedding_size: Optional[int] = None

    def setup(self):
        E = self.embedding_size or self.hidden_size
        self.word_embeddings = nn.Embed(self.vocab_size, E)
        self.position_embeddings = nn.Embed(self.max_seq_len, E)
        self.token_type_embeddings = nn.Embed(self.type_vocab_size, E)
        self.emb_norm = nn.LayerNorm(epsilon=1e-12)
        self.emb_drop = nn.Dropout(self.dropout_rate)
        if E != self.hidden_size:
            self.embeddings_project = nn.Dense(self.hidden_size)
        self.layers = [
            BertLayer(
                self.num_heads, self.hidden_size, self.intermediate_size,
                self.dropout_rate, self.attn_dropout_rate, name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]

    def _embed(self, ys, positions, deterministic):
        E = self.embedding_size or self.hidden_size
        emb = self.word_embeddings(ys.astype(jnp.int32))
        pos = self.position_embeddings(positions.astype(jnp.int32))
        tok = self.token_type_embeddings(jnp.zeros(ys.shape, jnp.int32))
        h = self.emb_norm(emb + pos + tok)
        h = self.emb_drop(h, deterministic=deterministic)
        if E != self.hidden_size:
            h = self.embeddings_project(h)
        return h

    def __call__(
        self,
        ys,
        ylens: Optional[jnp.ndarray] = None,
        causal: bool = False,
        deterministic: bool = True,
    ):
        B, L = ys.shape
        h = self._embed(ys, jnp.arange(L)[None, :], deterministic)

        mask = None
        if ylens is not None:
            mask = make_pad_mask(ylens, L)[:, None, None, :]
        if causal:
            cm = make_causal_mask(L)[None, None, :, :]
            mask = cm if mask is None else (mask & cm)

        for layer in self.layers:
            h = layer(h, mask, deterministic)
        return h

    def init_cache(self, B: int, max_len: int, dtype=jnp.float32):
        """Per-layer [(k, v)] self-attention caches for incremental causal
        decoding, each (B, max_len, H, dk).

        Batch-major tuples (same family as the ASR decoder's caches)
        rather than one stacked (layers, 2, B, ...) array: beam searches
        gather the batch axis every step, and a leading-layers layout
        forced two full-cache transposes per step in the fusion adapter
        (measured the dominant cost of cached fusion, tools/profile_l33).
        """
        d_k = self.hidden_size // self.num_heads
        return [
            (
                jnp.zeros((B, max_len, self.num_heads, d_k), dtype),
                jnp.zeros((B, max_len, self.num_heads, d_k), dtype),
            )
            for _ in range(self.num_layers)
        ]

    def step(self, tokens, pos, caches):
        """One incremental causal step.

        tokens: (B,) newest token ids; pos: (B,) their positions; caches:
        as from `init_cache`.  Returns (h (B, D), new caches) — h equals
        the full causal forward's hidden at `pos`.
        """
        h = self._embed(tokens[:, None], pos[:, None], True)[:, 0]
        new_caches = []
        for i, layer in enumerate(self.layers):
            h, ck, cv = layer.step(h, caches[i][0], caches[i][1], pos)
            new_caches.append((ck, cv))
        return h, new_caches

    def step_indirect(self, tokens, pos, caches, anc):
        """`step` over (B, W) beams with physical-slot caches + ancestor
        table (see BertSelfAttention.step_indirect).  Each layer runs as
        one fused Pallas program on TPU (FUSED_INDIRECT_STEP=None ->
        auto; ops/lm_step_pallas.py), the XLA path elsewhere."""
        h = self._embed(tokens[..., None], pos[..., None], True)[..., 0, :]
        fused = _fused_step_wanted()
        new_caches = []
        for i, layer in enumerate(self.layers):
            h, ck, cv = layer.step_indirect(
                h, caches[i][0], caches[i][1], pos, anc, fused=fused
            )
            new_caches.append((ck, cv))
        return h, new_caches


class BertMLMHead(nn.Module):
    """transform(dense+gelu+LN) -> untied decoder with bias."""

    hidden_size: int
    vocab_size: int

    @nn.compact
    def __call__(self, h):
        h = nn.Dense(self.hidden_size, name="transform_dense")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-12, name="transform_norm")(h)
        return nn.Dense(self.vocab_size, name="decoder")(h)


class ElectraGeneratorHead(nn.Module):
    embedding_size: int
    vocab_size: int

    @nn.compact
    def __call__(self, h):
        h = nn.Dense(self.embedding_size, name="dense")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-12, name="norm")(h)
        return nn.Dense(self.vocab_size, name="lm_head")(h)


class ElectraDiscriminatorHead(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, h):
        x = nn.Dense(self.hidden_size, name="dense")(h)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(1, name="dense_prediction")(x)[..., 0]


def mlm_loss(logits, labels, ignore_id: int = -100):
    """Mean CE over labels != ignore_id (torch CrossEntropyLoss default)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    valid = labels != ignore_id
    tgt = jax.nn.one_hot(jnp.where(valid, labels, 0), V)
    ce = -jnp.sum(logp * tgt, axis=-1)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def disc_bce_loss(logits, labels, ylens=None):
    """BCE-with-logits over non-pad positions (modeling_electra.py:527-535)."""
    logp = jax.nn.log_sigmoid(logits.astype(jnp.float32))
    logq = jax.nn.log_sigmoid(-logits.astype(jnp.float32))
    lab = labels.astype(jnp.float32)
    bce = -(lab * logp + (1.0 - lab) * logq)
    if ylens is None:
        return jnp.mean(bce)
    valid = make_pad_mask(ylens, logits.shape[1])
    return jnp.sum(jnp.where(valid, bce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
