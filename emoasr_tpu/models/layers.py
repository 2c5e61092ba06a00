"""Core Transformer / Conformer building blocks (flax.linen).

Behavioral parity targets (math, norm placement, eps values):
- `/root/reference/asr/modeling/transformer.py` — sinusoidal PE with sqrt(d)
  input scaling, pre-norm MHSA/FF layers with LayerNorm eps=1e-12.
- `/root/reference/asr/modeling/conformer.py` — Transformer-XL relative
  position MHSA with pos_bias_u/v + rel_shift, conv module
  (pointwise -> GLU -> depthwise k=31 -> BN -> swish -> pointwise), macaron
  FF scaled by 0.5, LayerNorm eps=1e-5 (torch default) inside conformer
  blocks.
- `/root/reference/asr/modeling/encoders/conv.py` — two VALID Conv2d k=3 s=2
  + ReLU giving 4x time reduction with xlens' = ((l-1)//2 - 1)//2.

TPU-first notes: everything is static-shape and mask-driven (no packed
sequences); attention is einsum-based so XLA tiles it onto the MXU; softmax
runs in float32 regardless of the compute dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # mask fill for attention scores (float32-safe)


def sinusoidal_pe(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(length, dim) sinusoidal table: sin on even, cos on odd channels."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def make_pad_mask(lens: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, maxlen) True at valid positions (model_utils.py:6-29)."""
    return jnp.arange(maxlen)[None, :] < lens[:, None]


def make_causal_mask(length: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((length, length), bool))


class ExplicitDense(nn.Module):
    """Dense layer whose kernel/bias are directly addressable attributes.

    Same parameter tree layout as nn.Dense ({kernel, bias}) so checkpoints
    are interchangeable; used where fused kernels need the raw weights
    (e.g. the RNN-T joint output in ops/rnnt_pallas.py)."""

    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,)
        )

    def __call__(self, x):
        return x @ self.kernel + self.bias


class PositionalEncoder(nn.Module):
    """x * sqrt(d) + PE, then dropout (transformer.py:15-46)."""

    hidden_size: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        T = xs.shape[1]
        pe = sinusoidal_pe(T, self.hidden_size, xs.dtype)
        xs = xs * math.sqrt(self.hidden_size) + pe[None]
        return nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)


class RelPositionalEncoder(nn.Module):
    """Scale input and emit the 2T-1 relative position table
    (conformer.py:16-55): positions T-1 ... -(T-1)."""

    hidden_size: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        T = xs.shape[1]
        # positive part: positions T-1..0 (sin(pos)), negative: -1..-(T-1)
        pos = jnp.concatenate(
            [jnp.arange(T - 1, 0, -1), jnp.arange(0, -T, -1)]
        ).astype(jnp.float32)[:, None]
        div = jnp.exp(
            jnp.arange(0, self.hidden_size, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / self.hidden_size)
        )
        pe = jnp.zeros((2 * T - 1, self.hidden_size), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        pe = pe.astype(xs.dtype)[None]  # (1, 2T-1, D)

        xs = xs * math.sqrt(self.hidden_size)
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(xs, deterministic=deterministic),
            drop(pe, deterministic=deterministic),
        )


class MultiHeadAttention(nn.Module):
    """Scaled dot-product MHA with boolean masking (transformer.py:48-99).

    mask: bool, broadcastable to (B, 1, Tq, Tk); True = attend.
    """

    num_heads: int
    hidden_size: int
    dropout_rate: float = 0.0
    fused: bool = False  # Pallas fused softmax(QK^T)V (ops/attention_pallas)

    def setup(self):
        self.d_k = self.hidden_size // self.num_heads
        self.linear_q = nn.Dense(self.hidden_size)
        self.linear_k = nn.Dense(self.hidden_size)
        self.linear_v = nn.Dense(self.hidden_size)
        self.linear_out = nn.Dense(self.hidden_size)
        self.attn_drop = nn.Dropout(self.dropout_rate)

    def _qkv(self, q_in, k_in, v_in):
        B = q_in.shape[0]
        shape = lambda x: x.reshape(B, -1, self.num_heads, self.d_k)
        return (
            shape(self.linear_q(q_in)),
            shape(self.linear_k(k_in)),
            shape(self.linear_v(v_in)),
        )

    def _attend(self, scores, v, mask, deterministic):
        # scores: (B, H, Tq, Tk) -- softmax in float32
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if mask is not None:
            attn = jnp.where(mask, attn, 0.0)
        attn = attn.astype(v.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        B, Tq = out.shape[0], out.shape[1]
        return self.linear_out(out.reshape(B, Tq, self.hidden_size))

    def __call__(
        self, q_in, k_in, v_in, mask=None, deterministic: bool = True,
        lens=None,
    ):
        if self.fused and lens is not None:
            # fused path: key-pad masking by `lens` (must agree with
            # `mask`); scores never materialize in HBM
            from emoasr_tpu.ops.attention_pallas import fused_self_attention

            q, k, v = self._qkv(q_in, k_in, v_in)
            rate = self.dropout_rate
            if rate > 0.0 and not deterministic:
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out = fused_self_attention(
                q, k, v, lens, seed,
                scale=1.0 / math.sqrt(self.d_k),
                dropout_rate=rate,
                deterministic=deterministic,
            )
            B, Tq = out.shape[0], out.shape[1]
            return self.linear_out(out.reshape(B, Tq, self.hidden_size))
        q, k, v = self._qkv(q_in, k_in, v_in)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
        return self._attend(scores, v, mask, deterministic)

    def kv(self, kv_in):
        """Precompute (k, v) projections (cross-attention cache: the
        encoder-side K/V are step-invariant during decoding)."""
        B = kv_in.shape[0]
        shape = lambda x: x.reshape(B, -1, self.num_heads, self.d_k)
        return shape(self.linear_k(kv_in)), shape(self.linear_v(kv_in))

    def attend_kv(self, q_in, k, v, mask=None, deterministic: bool = True):
        """Attention with precomputed K/V."""
        B = q_in.shape[0]
        q = self.linear_q(q_in).reshape(B, -1, self.num_heads, self.d_k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
        return self._attend(scores, v, mask, deterministic)


class RelMultiHeadAttention(MultiHeadAttention):
    """Transformer-XL style relative-position MHSA (conformer.py:57-95)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.hidden_size, use_bias=False)
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param(
            "pos_bias_u", init, (self.num_heads, self.d_k)
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", init, (self.num_heads, self.d_k)
        )

    @staticmethod
    def rel_shift(x):
        """(B, H, T, 2T-1): row i keeps relative offsets aligned so column j
        holds position j - i (conformer.py:70-77)."""
        B, H, T, L = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, L + 1, T)[:, :, 1:, :]
        x = x.reshape(B, H, T, L)[:, :, :, :T]
        return x

    def __call__(self, q_in, k_in, v_in, pos_emb=None, mask=None,
                 deterministic=True, lens=None):
        q, k, v = self._qkv(q_in, k_in, v_in)
        B = q_in.shape[0]
        p = self.linear_pos(pos_emb).reshape(-1, self.num_heads, self.d_k)
        # p: (2T-1, H, D), shared across the batch

        bias_u = self.pos_bias_u.astype(q.dtype)
        bias_v = self.pos_bias_v.astype(q.dtype)
        matrix_bd = jnp.einsum("bqhd,khd->bhqk", q + bias_v[None, None], p)
        matrix_bd = self.rel_shift(matrix_bd)

        if self.fused and lens is not None:
            # AC matmul + softmax + dropout + AV (and their backward)
            # fuse in one Pallas program; the BD matrix stays an XLA
            # matmul + rel_shift and enters as the additive score bias
            # (one (B, H, T, T) HBM tensor instead of the dense path's
            # several score-sized round trips)
            from emoasr_tpu.ops.attention_pallas import fused_self_attention

            rate = self.dropout_rate
            if rate > 0.0 and not deterministic:
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out = fused_self_attention(
                q + bias_u[None, None], k, v, lens, seed,
                scale=1.0 / math.sqrt(self.d_k),
                dropout_rate=rate,
                deterministic=deterministic,
                bias=matrix_bd,
            )
            Tq = out.shape[1]
            return self.linear_out(out.reshape(B, Tq, self.hidden_size))

        matrix_ac = jnp.einsum("bqhd,bkhd->bhqk", q + bias_u[None, None], k)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        return self._attend(scores, v, mask, deterministic)


class PositionwiseFeedForward(nn.Module):
    """w2(drop(act(w1(x)))) (transformer.py:102-118)."""

    intermediate_size: int
    hidden_size: int
    dropout_rate: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.intermediate_size, name="w1")(x)
        h = nn.relu(h) if self.activation == "relu" else nn.swish(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.hidden_size, name="w2")(h)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm MHSA + FF with residuals, eps=1e-12 (transformer.py:121-153)."""

    num_heads: int
    hidden_size: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dropout_attn_rate: float = 0.1
    fused_attn: bool = False

    @nn.compact
    def __call__(
        self, x, mask=None, pos_emb=None, deterministic: bool = True,
        lens=None,
    ):
        drop = nn.Dropout(self.dropout_rate)
        h = nn.LayerNorm(epsilon=1e-12, name="norm1")(x)
        h = MultiHeadAttention(
            self.num_heads, self.hidden_size, self.dropout_attn_rate,
            fused=self.fused_attn, name="self_attn",
        )(h, h, h, mask, deterministic, lens=lens)
        x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-12, name="norm2")(x)
        h = PositionwiseFeedForward(
            self.intermediate_size, self.hidden_size, self.dropout_rate,
            name="feed_forward",
        )(h, deterministic)
        return x + drop(h, deterministic=deterministic)


class TransformerDecoderLayer(nn.Module):
    """Pre-norm self-attn + cross-attn + FF (transformer.py:156-198).

    `cross_kv` takes precomputed encoder-side (K, V) so the decode loop
    does not re-project the encoder memory every step (it is
    step-invariant); `compute_cross_kv` builds them once per utterance.
    """

    num_heads: int
    hidden_size: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dropout_attn_rate: float = 0.1

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-12)
        self.norm2 = nn.LayerNorm(epsilon=1e-12)
        self.norm3 = nn.LayerNorm(epsilon=1e-12)
        self.self_attn = MultiHeadAttention(
            self.num_heads, self.hidden_size, self.dropout_attn_rate
        )
        self.src_attn = MultiHeadAttention(
            self.num_heads, self.hidden_size, self.dropout_attn_rate
        )
        self.feed_forward = PositionwiseFeedForward(
            self.intermediate_size, self.hidden_size, self.dropout_rate
        )
        self.drop = nn.Dropout(self.dropout_rate)

    def compute_cross_kv(self, memory):
        return self.src_attn.kv(memory)

    def _decode_step_weights(self):
        """Raw weight dict for the fused Pallas step (same tensors the
        dense path reads through flax)."""
        p = self.variables["params"]
        return dict(
            ln1_s=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
            wq=p["self_attn"]["linear_q"]["kernel"],
            bq=p["self_attn"]["linear_q"]["bias"],
            wk=p["self_attn"]["linear_k"]["kernel"],
            bk=p["self_attn"]["linear_k"]["bias"],
            wv=p["self_attn"]["linear_v"]["kernel"],
            bv=p["self_attn"]["linear_v"]["bias"],
            wo=p["self_attn"]["linear_out"]["kernel"],
            bo=p["self_attn"]["linear_out"]["bias"],
            ln2_s=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"],
            cwq=p["src_attn"]["linear_q"]["kernel"],
            cbq=p["src_attn"]["linear_q"]["bias"],
            cwo=p["src_attn"]["linear_out"]["kernel"],
            cbo=p["src_attn"]["linear_out"]["bias"],
            ln3_s=p["norm3"]["scale"], ln3_b=p["norm3"]["bias"],
            w1=p["feed_forward"]["w1"]["kernel"],
            b1=p["feed_forward"]["w1"]["bias"],
            w2=p["feed_forward"]["w2"]["kernel"],
            b2=p["feed_forward"]["w2"]["bias"],
        )

    def decode_step(
        self, h, cache_k, cache_v, pos, self_mask, memory_mask=None,
        cross_kv=None, beam_width=None, fused=False, elens=None,
    ):
        """Incremental decode: one new position per row.

        h: (B, 1, D) hidden for the newest token; cache_k/v: (B, Lmax, H, dk)
        self-attention cache; pos: (B,) the new token's position.  Writes
        the new K/V into the cache and attends over positions <= pos —
        exactly the causal column the full recompute would produce.

        `beam_width=W` marks B as Bu*W beam rows (Bu utterances) sharing
        encoder memory: `cross_kv`/`memory_mask` are then per-utterance
        (Bu, T, ...) and the cross-attention treats the W beams as W
        query positions of one batched attention — the encoder K/V are
        read from HBM once per utterance instead of once per beam (the
        dominant per-step traffic at large T: W x less).

        `fused=True` (+ `elens`, the per-utterance encoder lengths that
        `memory_mask` encodes) runs the whole layer step as ONE Pallas
        program (ops/decoder_step_pallas.py) — same math, none of the
        ~25 small-op HBM round trips.
        """
        B = h.shape[0]
        if fused and beam_width is not None and elens is not None:
            from emoasr_tpu.ops.decoder_step_pallas import (
                fused_decoder_layer_step,
            )

            y, k_new, v_new = fused_decoder_layer_step(
                h[:, 0], cache_k, cache_v, pos, cross_kv[0], cross_kv[1],
                elens, self._decode_step_weights(), beam_width=beam_width,
            )
            cache_k = cache_k.at[jnp.arange(B), pos].set(k_new)
            cache_v = cache_v.at[jnp.arange(B), pos].set(v_new)
            return y[:, None], cache_k, cache_v
        hn = self.norm1(h)
        q, k, v = self.self_attn._qkv(hn, hn, hn)  # (B, 1, H, dk)
        cache_k = cache_k.at[jnp.arange(B), pos].set(k[:, 0])
        cache_v = cache_v.at[jnp.arange(B), pos].set(v[:, 0])
        ha = self.self_attn.attend_kv(hn, cache_k, cache_v, self_mask, True)
        x = h + ha

        hn = self.norm2(x)
        if beam_width is not None:
            Bu = B // beam_width
            hq = hn.reshape(Bu, beam_width, hn.shape[-1])
            hc = self.src_attn.attend_kv(
                hq, cross_kv[0], cross_kv[1], memory_mask, True
            ).reshape(B, 1, hn.shape[-1])
        else:
            hc = self.src_attn.attend_kv(
                hn, cross_kv[0], cross_kv[1], memory_mask, True
            )
        x = x + hc

        hn = self.norm3(x)
        return x + self.feed_forward(hn, True), cache_k, cache_v

    def decode_step_indirect(
        self, h, cache_k, cache_v, pos, anc, memory_mask, cross_kv,
        beam_width, fused=False, elens=None,
    ):
        """`decode_step` with ancestor-indirect self-attention caches.

        cache_k/v: (Bu, W, Lc, H, dk) in PHYSICAL slot order (never
        beam-permuted); anc: (Bu, W, Lc) ancestor table (see
        models/lm/bert.py::BertSelfAttention.step_indirect — same
        scheme); pos: (Bu, W).  h: (B, 1, D) with B = Bu*W.

        The beam search composes its per-step beam permutation into
        `anc` instead of physically gathering the caches; attention
        selects each beam's ancestor rows with a one-hot W-wide MXU
        contraction.  Exact (one-hot selection), label-sync-only (each
        physical column is written once, at its step).

        `fused=True` (+ `elens`) runs the whole layer step as ONE Pallas
        program (ops/decoder_step_pallas.py::_kernel_indirect) — same
        math, none of the per-op HBM round trips.
        """
        B = h.shape[0]
        W = beam_width
        Bu = B // W
        H, dk = self.num_heads, self.hidden_size // self.num_heads
        Lc = cache_k.shape[2]

        if fused and elens is not None:
            from emoasr_tpu.ops.decoder_step_pallas import (
                fused_decoder_layer_step_indirect,
            )

            y, k_new, v_new = fused_decoder_layer_step_indirect(
                h[:, 0], cache_k, cache_v, pos, anc,
                cross_kv[0], cross_kv[1], elens,
                self._decode_step_weights(), beam_width=W,
            )
            bidx = jnp.arange(Bu)[:, None]
            widx = jnp.arange(W)[None, :]
            cache_k = cache_k.at[bidx, widx, pos].set(
                k_new.reshape(Bu, W, H, dk)
            )
            cache_v = cache_v.at[bidx, widx, pos].set(
                v_new.reshape(Bu, W, H, dk)
            )
            return y[:, None], cache_k, cache_v

        hn = self.norm1(h)
        q, k, v = self.self_attn._qkv(hn, hn, hn)  # (B, 1, H, dk)
        qb = q[:, 0].reshape(Bu, W, H, dk)
        bidx = jnp.arange(Bu)[:, None]
        widx = jnp.arange(W)[None, :]
        cache_k = cache_k.at[bidx, widx, pos].set(k[:, 0].reshape(Bu, W, H, dk))
        cache_v = cache_v.at[bidx, widx, pos].set(v[:, 0].reshape(Bu, W, H, dk))

        m = (anc[:, :, None, :] == widx[0][None, None, :, None]).astype(
            h.dtype
        )  # (Bu, W, Wv, Lc)
        s_all = jnp.einsum("bwhd,bvthd->bwvth", qb, cache_k) / math.sqrt(dk)
        scores = jnp.einsum("bwvt,bwvth->bwht", m, s_all)
        tmask = (
            jnp.arange(Lc)[None, None, None, :] <= pos[:, :, None, None]
        )  # (Bu, W, 1, Lc)
        scores = jnp.where(tmask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = jnp.where(tmask, attn, 0.0).astype(cache_v.dtype)
        p2 = jnp.einsum("bwht,bwvt->bwvth", attn, m)
        out = jnp.einsum("bwvth,bvthd->bwhd", p2, cache_v).reshape(
            B, 1, self.hidden_size
        )
        x = h + self.self_attn.linear_out(out)

        hn = self.norm2(x)
        hq = hn.reshape(Bu, W, hn.shape[-1])
        hc = self.src_attn.attend_kv(
            hq, cross_kv[0], cross_kv[1], memory_mask, True
        ).reshape(B, 1, hn.shape[-1])
        x = x + hc

        hn = self.norm3(x)
        return x + self.feed_forward(hn, True), cache_k, cache_v

    def __call__(
        self, x, tgt_mask, memory, memory_mask, deterministic: bool = True,
        cross_kv=None,
    ):
        drop = self.drop
        h = self.norm1(x)
        h = self.self_attn(h, h, h, tgt_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)

        h = self.norm2(x)
        if cross_kv is not None:
            h = self.src_attn.attend_kv(
                h, cross_kv[0], cross_kv[1], memory_mask, deterministic
            )
        else:
            h = self.src_attn(h, memory, memory, memory_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)

        h = self.norm3(x)
        h = self.feed_forward(h, deterministic)
        return x + drop(h, deterministic=deterministic)


class ConvModule(nn.Module):
    """Conformer convolution module (conformer.py:98-143):
    pointwise(2C) -> GLU -> depthwise k=31 SAME -> BN -> swish -> pointwise.

    BatchNorm statistics run over (B, T) including padded frames, matching
    the reference's unmasked BatchNorm1d.
    """

    channels: int
    kernel_size: int = 31

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, T, C)
        h = nn.Conv(2 * self.channels, (1,), name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(
            self.channels,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=self.channels,
            name="depthwise_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=deterministic, name="batch_norm"
        )(h)
        h = nn.swish(h)
        return nn.Conv(self.channels, (1,), name="pointwise_conv2")(h)


class ConformerEncoderLayer(nn.Module):
    """Macaron FF x0.5 -> (rel)MHSA -> conv -> FF x0.5 -> final LN
    (conformer.py:146-229); inner LayerNorms use torch-default eps=1e-5."""

    num_heads: int
    hidden_size: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dropout_attn_rate: float = 0.1
    pos_encode_type: str = "rel"
    conv_kernel_size: int = 31
    fused_attn: bool = False

    @nn.compact
    def __call__(self, x, mask=None, pos_emb=None, deterministic: bool = True,
                 lens=None):
        drop = nn.Dropout(self.dropout_rate)

        h = nn.LayerNorm(name="norm_ff_macaron")(x)
        h = PositionwiseFeedForward(
            self.intermediate_size, self.hidden_size, self.dropout_rate,
            activation="swish", name="feed_forward_macaron",
        )(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)

        if self.pos_encode_type == "rel":
            h = nn.LayerNorm(name="norm_self_attn")(x)
            h = RelMultiHeadAttention(
                self.num_heads, self.hidden_size, self.dropout_attn_rate,
                fused=self.fused_attn, name="self_attn",
            )(h, h, h, pos_emb, mask, deterministic,
              lens=lens if self.fused_attn else None)
            x = x + drop(h, deterministic=deterministic)

            h = nn.LayerNorm(name="norm_conv")(x)
            h = ConvModule(self.hidden_size, self.conv_kernel_size, name="conv")(
                h, deterministic
            )
            x = x + drop(h, deterministic=deterministic)
        else:  # abs: conv before attention (conformer.py:212-227)
            h = nn.LayerNorm(name="norm_conv")(x)
            h = ConvModule(self.hidden_size, self.conv_kernel_size, name="conv")(
                h, deterministic
            )
            x = x + drop(h, deterministic=deterministic)

            h = nn.LayerNorm(name="norm_self_attn")(x)
            h = MultiHeadAttention(
                self.num_heads, self.hidden_size, self.dropout_attn_rate,
                name="self_attn",
            )(h, h, h, mask, deterministic)
            x = x + drop(h, deterministic=deterministic)

        h = nn.LayerNorm(name="norm_ff")(x)
        h = PositionwiseFeedForward(
            self.intermediate_size, self.hidden_size, self.dropout_rate,
            activation="swish", name="feed_forward",
        )(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)

        return nn.LayerNorm(name="norm_final")(x)


class Conv2dSubsampler(nn.Module):
    """Two VALID 3x3 stride-2 convs + ReLU + linear: 4x time reduction,
    xlens' = ((l-1)//2 - 1)//2 (encoders/conv.py:5-28)."""

    output_dim: int

    @nn.compact
    def __call__(self, xs, xlens):
        # xs: (B, T, F) -> (B, T, F, 1) NHWC
        h = xs[:, :, :, None]
        h = nn.Conv(
            self.output_dim, (3, 3), strides=(2, 2), padding="VALID", name="conv1"
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.output_dim, (3, 3), strides=(2, 2), padding="VALID", name="conv2"
        )(h)
        h = nn.relu(h)
        B, T2, F2, C = h.shape
        h = nn.Dense(self.output_dim, name="output")(
            h.transpose(0, 1, 3, 2).reshape(B, T2, C * F2)
        )
        new_lens = ((xlens - 1) // 2 - 1) // 2
        return h, new_lens
