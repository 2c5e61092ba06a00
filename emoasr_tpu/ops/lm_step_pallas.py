"""Pallas TPU kernel: fused post-norm BERT/TransformerLM layer step for
beam-fused decoding (ancestor-indirect caches).

The L3-3 flagship decode's LM shallow fusion costs ~1.7 ms/step at
B=64 after the ancestor-indirect rebuild (tools/profile_l33.py) against
~60 us of matmul math — the 4-layer LM step is a chain of ~30 small XLA
ops per layer.  Same cure as the ASR decoder's step
(ops/decoder_step_pallas.py::_kernel_indirect): the whole layer runs as
ONE VMEM-resident program per utterance block.

Layer semantics (models/lm/bert.py::BertLayer.step_indirect, post-norm):

    q/k/v proj -> ancestor-indirect causal attention over physical-slot
    caches -> out proj -> LN(x + h) -> FF(gelu exact) -> LN(x + h)

Cache protocol: the kernel receives the PRE-write caches, attends
columns < pos via the ancestor table plus the freshly projected own
column (the search keeps anc[b, w, pos] = w), and returns k_new/v_new
for the caller's per-slot write — term-for-term the same softmax the
XLA path computes after writing at `pos` and masking `<= pos`.

Replaces the per-step LM cost of the reference's fused beam
(`asr/modeling/decoders/transformer.py:222-226` -> its full-prefix LM
re-encode).  Auto-interprets off-TPU; parity tests in
tests/test_lm_step_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emoasr_tpu.ops.decoder_step_pallas import (
    NEG_INF,
    _layer_norm,
    _on_tpu,
)

_VMEM_BUDGET = 10 * 1024 * 1024

# XLA's own f32 erf rational approximation (ErfImpl32: clamp to [-4, 4],
# odd-degree/even-degree polynomial ratio).  Mosaic has no erf/erfc
# primitive; inlining XLA's polynomial keeps the fused kernel's exact
# gelu near-bit-identical to the XLA step path.
_ERF_ALPHA = (
    -2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
    -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
    -7.37332916720468e-03, -1.42647390514189e-02,
)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    p = p * x
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return p / q


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) with the inlined f32 erf."""
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(0.7071067811865476)))

WEIGHT_NAMES = (
    "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
    "ln1_s", "ln1_b",
    "wi", "bi", "wo2", "bo2",
    "ln2_s", "ln2_b",
)


def _kernel(
    pos_ref,      # (R, 1) int32, rows in (u, w) order
    h_ref,        # (R, D)
    ck_ref,       # (U, W, L, D) physical-slot K cache (head-packed)
    cv_ref,       # (U, W, L, D)
    anc_ref,      # (U, W, L) int32
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln1_s_ref, ln1_b_ref,
    wi_ref, bi_ref, wo2_ref, bo2_ref,
    ln2_s_ref, ln2_b_ref,
    y_ref,        # (R, D) out
    knew_ref,     # (R, D) out
    vnew_ref,     # (R, D) out
    *,
    H: int,
    W: int,
    scale: float,
):
    h = h_ref[...]
    R, D = h.shape
    L = ck_ref.shape[2]
    U = ck_ref.shape[0]
    dk = D // H
    adt = h.dtype

    # f32 inputs: HIGHEST keeps the parity path out of the MXU's
    # single-pass bf16 truncation (the XLA step path itself truncates
    # under DEFAULT — chip-measured 0.025 logp drift either way over a
    # 5-step episode is the BASELINE's truncation, not the kernel's).
    # bf16 inputs: DEFAULT is already exact (MXU-native, f32
    # accumulate); Mosaic rejects fp32 contract_precision on bf16
    # operands ("Bad lhs type").
    prec = (
        jax.lax.Precision.HIGHEST
        if adt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dense(x, w_ref, b_ref):
        return (
            jax.lax.dot_general(
                x, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + b_ref[...].astype(jnp.float32)
        ).astype(adt)

    q = dense(h, wq_ref, bq_ref)
    k_new = dense(h, wk_ref, bk_ref)
    v_new = dense(h, wv_ref, bv_ref)
    knew_ref[...] = k_new
    vnew_ref[...] = v_new

    posu = pos_ref[...].reshape(U, W)
    anc = anc_ref[...]
    past = (
        jax.lax.broadcasted_iota(jnp.int32, (U, W, L), 2)
        < posu[:, :, None]
    )

    attn_cols = []
    for hh in range(H):
        sl = slice(hh * dk, (hh + 1) * dk)
        qh = q[:, sl].reshape(U, W, dk).astype(jnp.float32)
        knh = k_new[:, sl].reshape(U, W, dk).astype(jnp.float32)
        vnh = v_new[:, sl].reshape(U, W, dk).astype(jnp.float32)

        s_sel = jnp.zeros((U, W, L), jnp.float32)
        for ws in range(W):
            ckh = ck_ref[:, ws, :, sl].astype(jnp.float32)
            s_ws = jax.lax.dot_general(
                qh, ckh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )
            s_sel = jnp.where(anc == ws, s_ws, s_sel)
        s_sel = jnp.where(past, s_sel * scale, NEG_INF)
        s_new = jnp.sum(qh * knh, axis=-1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_sel, axis=-1, keepdims=True), s_new)
        e_past = jnp.where(past, jnp.exp(s_sel - m), 0.0)
        e_new = jnp.exp(s_new - m)
        denom = jnp.sum(e_past, axis=-1, keepdims=True) + e_new
        p_past = (e_past / denom).astype(adt).astype(jnp.float32)
        p_new = (e_new / denom).astype(adt).astype(jnp.float32)

        out_h = p_new * vnh
        for ws in range(W):
            cvh = cv_ref[:, ws, :, sl].astype(jnp.float32)
            p_ws = jnp.where(anc == ws, p_past, 0.0)
            out_h = out_h + jax.lax.dot_general(
                p_ws, cvh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )
        attn_cols.append(out_h.reshape(R, dk).astype(adt))
    ha = jnp.concatenate(attn_cols, axis=-1)

    # post-norm residual blocks (BertLayer)
    x = _layer_norm(h + dense(ha, wo_ref, bo_ref),
                    ln1_s_ref[...], ln1_b_ref[...])
    inter = dense(x, wi_ref, bi_ref).astype(jnp.float32)
    inter = _gelu_exact(inter).astype(adt)
    y = _layer_norm(x + dense(inter, wo2_ref, bo2_ref),
                    ln2_s_ref[...], ln2_b_ref[...])
    y_ref[...] = y.astype(adt)


def _pick_u_block(Bu, W, L, D, F, esize):
    weights = 4 * D * D + 2 * D * F + 6 * D + 2 * F

    def fits(u):
        rows = u * W
        need = (
            rows * L * D * 2 * esize * 2  # K/V cache blocks (dbl-buffered)
            + weights * esize
            + rows * (3 * D + F) * 4
        )
        return need <= _VMEM_BUDGET

    def aligned(u):
        return u == Bu or (u * W) % 8 == 0

    for u in range(Bu, 0, -1):
        if Bu % u == 0 and aligned(u) and fits(u):
            return u
    for u in range(Bu, 0, -1):
        if aligned(u) and fits(u):
            return u
    import math

    a = 8 // math.gcd(W, 8)
    return a if a <= Bu else Bu


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _call(pos2, h, ck, cv, anc, weights, *, H, W, interpret):
    N, D = h.shape
    Bu, _, L = ck.shape[0], ck.shape[1], ck.shape[2]
    esize = jnp.dtype(h.dtype).itemsize
    F = weights["wi"].shape[1]
    u_block = _pick_u_block(Bu, W, L, D, F, esize)
    G = -(-Bu // u_block)
    if G * u_block != Bu:
        pad_u = G * u_block - Bu
        pad_r = pad_u * W
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
        pos2 = jnp.pad(pos2, ((0, pad_r), (0, 0)))
        ck = jnp.pad(ck, ((0, pad_u), (0, 0), (0, 0), (0, 0)))
        cv = jnp.pad(cv, ((0, pad_u), (0, 0), (0, 0), (0, 0)))
        anc = jnp.pad(anc, ((0, pad_u), (0, 0), (0, 0)))
    R = u_block * W

    vec = lambda blk, idx: pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    row = lambda *tail: vec((R,) + tail, lambda g: (g,) + (0,) * len(tail))
    utt = lambda *tail: vec(
        (u_block,) + tail, lambda g: (g,) + (0,) * len(tail)
    )
    w_specs = [
        vec(weights[n].shape, lambda g: (0, 0)) for n in WEIGHT_NAMES
    ]

    y, knew, vnew = pl.pallas_call(
        functools.partial(
            _kernel, H=H, W=W, scale=1.0 / float((D // H) ** 0.5)
        ),
        grid=(G,),
        in_specs=[
            row(1),
            row(D),
            utt(W, L, D), utt(W, L, D),
            utt(W, L),
            *w_specs,
        ],
        out_specs=[row(D)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((G * R, D), h.dtype) for _ in range(3)
        ],
        interpret=interpret,
    )(pos2, h, ck, cv, anc, *[weights[n] for n in WEIGHT_NAMES])
    return y[:N], knew[:N], vnew[:N]


def fused_bert_layer_step_indirect(
    h, cache_k, cache_v, pos, anc, weights, *, interpret=None,
):
    """One fused post-norm LM layer step with ancestor-indirect caches.

    h: (Bu, W, D); cache_k/v: (Bu, W, Lc, H, dk) physical slot order
    (pre-write); pos: (Bu, W); anc: (Bu, W, Lc); weights: WEIGHT_NAMES
    dict (2-D kernels, 1-D biases/scales).  Returns (y (Bu, W, D),
    k_new, v_new (Bu, W, H, dk)) — caller writes k/v_new at `pos`.
    """
    if interpret is None:
        interpret = not _on_tpu()
    Bu, W, Lc, H, dk = cache_k.shape
    D = H * dk
    N = Bu * W

    packed = lambda x: x.reshape(x.shape[:-2] + (D,))
    w = dict(weights)
    for n in WEIGHT_NAMES:
        if w[n].ndim == 1:
            w[n] = w[n].reshape(1, -1)

    y, knew, vnew = _call(
        pos.astype(jnp.int32).reshape(N, 1),
        h.reshape(N, D), packed(cache_k), packed(cache_v),
        anc.astype(jnp.int32), w,
        H=H, W=int(W), interpret=bool(interpret),
    )
    return (
        y.reshape(Bu, W, D),
        knew.reshape(Bu, W, H, dk),
        vnew.reshape(Bu, W, H, dk),
    )
