"""LAS (listen-attend-spell) decoder: LSTM-cell decoder with location-aware
attention.

Parity target: `/root/reference/asr/modeling/decoders/las.py:22-342` —
embedding + stacked LSTMCells (layer-0 output drives attention), location-
aware attention (1D conv over the previous attention weights, kernel 201,
10 channels, no bias), generate = tanh(intermed([ctx; douts_top])), then one
output linear over all steps; LabelSmoothing / Distill losses; aux CTC.

Note: in the reference, LAS is wired but unreachable from the `ASR` facade
(`asr/modeling/asr.py:43` leaves it TODO) and its beam-search LM/CTC hooks
are stubbed `pass` (las.py:233-249).  Here it is a first-class decoder.

TPU-first: the per-position loop is a `lax.scan` whose body is pure array
math (all step weights are raw `self.param` tensors, torch layouts), with
the encoder-side key projection hoisted out of the loop.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.models.criteria import distill_loss, label_smoothing_loss
from emoasr_tpu.models.decoders.ctc import CTCDecoder
from emoasr_tpu.models.layers import NEG_INF, make_pad_mask


def _lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh):
    gates = x @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


class LASDecoder(nn.Module):
    cfg: ExpConfig
    attn_dim: int = 256
    conv_out_channels: int = 10
    conv_kernel_size: int = 201

    def setup(self):
        cfg = self.cfg
        emb_size = cfg.embedding_size or cfg.dec_hidden_size
        H = cfg.dec_hidden_size
        E = cfg.enc_hidden_size
        A = self.attn_dim
        C = self.conv_out_channels
        self.embed = nn.Embed(cfg.vocab_size, emb_size, name="embed")

        def uinit(scale):
            def f(key, shape):
                return jax.random.uniform(key, shape, minval=-scale, maxval=scale)
            return f

        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros

        k = 1.0 / (H ** 0.5)
        cells = []
        in_size = emb_size + E
        for li in range(cfg.dec_num_layers):
            cells.append(
                dict(
                    w_ih=self.param(f"cell{li}_w_ih", uinit(k), (4 * H, in_size)),
                    w_hh=self.param(f"cell{li}_w_hh", uinit(k), (4 * H, H)),
                    b_ih=self.param(f"cell{li}_b_ih", uinit(k), (4 * H,)),
                    b_hh=self.param(f"cell{li}_b_hh", uinit(k), (4 * H,)),
                )
            )
            in_size = H
        self.cells = cells

        # location-aware attention params (las.py:289-303)
        self.w_key_k = self.param("w_key_kernel", lecun, (E, A))
        self.w_key_b = self.param("w_key_bias", zeros, (A,))
        self.w_query_k = self.param("w_query_kernel", lecun, (H, A))
        self.w_query_b = self.param("w_query_bias", zeros, (A,))
        self.w_conv_k = self.param("w_conv_kernel", lecun, (C, A))
        self.w_conv_b = self.param("w_conv_bias", zeros, (A,))
        self.w_score_k = self.param("w_score_kernel", lecun, (A, 1))
        self.w_score_b = self.param("w_score_bias", zeros, (1,))
        self.conv_kernel = self.param(
            "attn_conv_kernel", lecun, (self.conv_kernel_size, 1, C)
        )  # (k, in=1, out=C) flax conv layout

        self.intermed_k = self.param("intermed_kernel", lecun, (E + H, cfg.dec_intermediate_size))
        self.intermed_b = self.param("intermed_bias", zeros, (cfg.dec_intermediate_size,))
        from emoasr_tpu.models.layers import ExplicitDense
        self.output = ExplicitDense(
            cfg.dec_intermediate_size, cfg.vocab_size, name="output"
        )
        if cfg.mtl_ctc_weight > 0:
            self.ctc = CTCDecoder(cfg)

    def _run(self, eouts, elens, ys_in, deterministic=True):
        cfg = self.cfg
        B, T, E = eouts.shape
        H = cfg.dec_hidden_size
        emb = self.embed(ys_in.astype(jnp.int32))  # (B, L, emb)
        attn_mask = make_pad_mask(elens, T)
        keys_proj = eouts @ self.w_key_k + self.w_key_b  # hoisted

        cells = self.cells
        conv_kernel = self.conv_kernel
        w_query_k, w_query_b = self.w_query_k, self.w_query_b
        w_conv_k, w_conv_b = self.w_conv_k, self.w_conv_b
        w_score_k, w_score_b = self.w_score_k, self.w_score_b
        intermed_k, intermed_b = self.intermed_k, self.intermed_b

        def step(carry, y_emb):
            hs, cs, ctx, attn_w = carry
            x = jnp.concatenate([y_emb, ctx], axis=-1)
            new_hs, new_cs = [], []
            douts_1 = None
            for li, cp in enumerate(cells):
                h, c = _lstm_cell(
                    x, hs[li], cs[li], cp["w_ih"], cp["w_hh"], cp["b_ih"], cp["b_hh"]
                )
                new_hs.append(h)
                new_cs.append(c)
                x = h
                if li == 0:
                    douts_1 = h
            douts_top = x

            conv_feat = jax.lax.conv_general_dilated(
                attn_w[:, :, None], conv_kernel,
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )  # (B, T, C)
            score = (
                jnp.tanh(
                    keys_proj
                    + (douts_1 @ w_query_k + w_query_b)[:, None, :]
                    + conv_feat @ w_conv_k + w_conv_b
                )
                @ w_score_k
                + w_score_b
            )[:, :, 0]
            score = jnp.where(attn_mask, score, NEG_INF)
            attn_w = jax.nn.softmax(score.astype(jnp.float32), 1).astype(eouts.dtype)
            ctx = jnp.einsum("bt,btd->bd", attn_w, eouts)

            logit = jnp.tanh(
                jnp.concatenate([ctx, douts_top], -1) @ intermed_k + intermed_b
            )
            return (tuple(new_hs), tuple(new_cs), ctx, attn_w), logit

        carry0 = (
            tuple(jnp.zeros((B, H), eouts.dtype) for _ in range(cfg.dec_num_layers)),
            tuple(jnp.zeros((B, H), eouts.dtype) for _ in range(cfg.dec_num_layers)),
            jnp.zeros((B, E), eouts.dtype),
            jnp.zeros((B, T), eouts.dtype),
        )
        _, outs = jax.lax.scan(step, carry0, emb.transpose(1, 0, 2))
        return self.output(outs.transpose(1, 0, 2))  # (B, L, V)

    def _make_step(self, eouts, elens):
        """Returns (step_fn, carry0): one decode step given previous tokens.

        step_fn(carry, tokens (B,)) -> (carry, log_probs (B, V))
        """
        cfg = self.cfg
        B, T, E = eouts.shape
        H = cfg.dec_hidden_size
        attn_mask = make_pad_mask(elens, T)
        keys_proj = eouts @ self.w_key_k + self.w_key_b
        cells = self.cells
        conv_kernel = self.conv_kernel
        w_query_k, w_query_b = self.w_query_k, self.w_query_b
        w_conv_k, w_conv_b = self.w_conv_k, self.w_conv_b
        w_score_k, w_score_b = self.w_score_k, self.w_score_b
        intermed_k, intermed_b = self.intermed_k, self.intermed_b
        # jnp (not raw numpy from a torch import): traced gather below
        embedding = jnp.asarray(self.embed.embedding)
        out_kernel, out_bias = self.output.kernel, self.output.bias

        def output_fn(h):
            return h @ out_kernel + out_bias

        def step(carry, tokens):
            hs, cs, ctx, attn_w = carry
            y_emb = embedding[tokens.astype(jnp.int32)]
            x = jnp.concatenate([y_emb, ctx], axis=-1)
            new_hs, new_cs = [], []
            douts_1 = None
            for li, cp in enumerate(cells):
                h, c = _lstm_cell(
                    x, hs[li], cs[li], cp["w_ih"], cp["w_hh"], cp["b_ih"],
                    cp["b_hh"],
                )
                new_hs.append(h)
                new_cs.append(c)
                x = h
                if li == 0:
                    douts_1 = h
            douts_top = x
            conv_feat = jax.lax.conv_general_dilated(
                attn_w[:, :, None], conv_kernel, (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            score = (
                jnp.tanh(
                    keys_proj
                    + (douts_1 @ w_query_k + w_query_b)[:, None, :]
                    + conv_feat @ w_conv_k + w_conv_b
                ) @ w_score_k + w_score_b
            )[:, :, 0]
            score = jnp.where(attn_mask, score, NEG_INF)
            attn_w = jax.nn.softmax(score.astype(jnp.float32), 1).astype(
                eouts.dtype
            )
            ctx = jnp.einsum("bt,btd->bd", attn_w, eouts)
            logit = jnp.tanh(
                jnp.concatenate([ctx, douts_top], -1) @ intermed_k + intermed_b
            )
            logp = jax.nn.log_softmax(
                output_fn(logit).astype(jnp.float32), -1
            )
            return (tuple(new_hs), tuple(new_cs), ctx, attn_w), logp

        carry0 = (
            tuple(jnp.zeros((B, H), eouts.dtype) for _ in cells),
            tuple(jnp.zeros((B, H), eouts.dtype) for _ in cells),
            jnp.zeros((B, E), eouts.dtype),
            jnp.zeros((B, T), eouts.dtype),
        )
        return step, carry0

    def decode_greedy(self, eouts, elens):
        """Batched greedy decode (the reference's LAS decode with width 1,
        las.py:175-280).  Returns (hyps (B, L), hyp_lens)."""
        cfg = self.cfg
        B = eouts.shape[0]
        L = cfg.max_decode_ylen
        step, carry0 = self._make_step(eouts, elens)

        def body(state, _):
            carry, tok, done, hyps, n = state
            carry, logp = step(carry, tok)
            new_tok = jnp.argmax(logp, -1).astype(jnp.int32)
            emit = ~done & (new_tok != cfg.eos_id)
            hyps = hyps.at[jnp.arange(B), jnp.minimum(n, L - 1)].set(
                jnp.where(emit, new_tok, hyps[jnp.arange(B), jnp.minimum(n, L - 1)])
            )
            n = jnp.where(emit, n + 1, n)
            done = done | (new_tok == cfg.eos_id)
            return (carry, new_tok, done, hyps, n), None

        init = (
            carry0,
            jnp.full((B,), cfg.eos_id, jnp.int32),
            jnp.zeros((B,), bool),
            jnp.zeros((B, L), jnp.int32),
            jnp.zeros((B,), jnp.int32),
        )
        (c, t, d, hyps, n), _ = jax.lax.scan(body, init, None, length=L)
        return hyps, n

    def decode_beam(self, eouts, elens, beam_width, len_weight=0.0,
                    lm=None):
        """Batched beam search (las.py:176-285; reference is bs=1 host
        Python with stubbed LM/CTC fusion — attention scores only; the
        `lm` hook here implements the stub first-class via LMFusion).

        Returns (hyps (B, W, Lmax) with eos framing, lens, scores)."""
        from emoasr_tpu.search.las_beam import las_beam_search

        cfg = self.cfg
        B, T, E = eouts.shape
        W = beam_width
        eouts_rep = jnp.broadcast_to(
            eouts[:, None], (B, W, T, E)
        ).reshape(B * W, T, E)
        elens_rep = jnp.broadcast_to(elens[:, None], (B, W)).reshape(B * W)
        step, carry0 = self._make_step(eouts_rep, elens_rep)
        return las_beam_search(
            step, carry0, B,
            vocab_size=cfg.vocab_size,
            beam_width=W,
            eos_id=cfg.eos_id,
            len_weight=len_weight,
            max_decode_ylen=cfg.max_decode_ylen,
            lm=lm,
        )

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
        logits = self._run(eouts, elens, ys_in, deterministic)
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
