"""Pallas TPU kernel: fused transformer-decoder step for beam decoding.

One incremental decode step of a pre-norm decoder layer
(`models/layers.py::TransformerDecoderLayer.decode_step`) is ~25 small
XLA ops over tiny (B*W, 256)-shaped tensors — at flagship L3-3 beam
shapes (B=16, W=10) the whole 6-layer step measures ~1.9 ms against
~20 us of MXU-saturated matmul time (`tools/stub_beam.py`), i.e. the
step is pure small-op latency/HBM-round-trip overhead, not FLOPs.

This kernel runs the ENTIRE layer step in one program, resident in
VMEM:

    LN1 -> Q/K/V proj -> cached self-attention -> out proj -> +res
    -> LN2 -> beam-shared cross-attention (precomputed encoder K/V)
    -> out proj -> +res -> LN3 -> FF(relu) -> +res

and returns (y, k_new, v_new).  The self-attention K/V cache write
stays OUTSIDE the kernel (the caller's per-row dynamic scatter,
`cache.at[arange, pos].set(...)`): the kernel attends over cache
positions `< pos` plus the freshly projected (k_new, v_new) as an
explicit extra column — term-for-term the same softmax the dense path
computes after writing the cache at `pos` and masking `<= pos`.

Semantics parity targets (models/layers.py:321-361):
- LayerNorm eps=1e-12, stats in float32 (flax default), output cast
  back to the activation dtype;
- attention scores in float32, NEG_INF=-1e9 mask fill BEFORE softmax,
  post-softmax mask zeroing, probabilities cast to v.dtype for the AV
  contraction;
- beam-shared cross-attention: the W beams of an utterance attend as W
  query positions over per-utterance encoder K/V (read once per
  utterance, not per beam).

Grid: 1-D over utterance blocks (rows are independent; each block
carries `u_block*W` rows, its rows' caches, its utterances' encoder
K/V, and the full weight set).  Decode-only: no dropout, no gradients.
Auto-interprets off-TPU (tests pin equivalence vs the dense path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # matches models/layers.py
LN_EPS = 1e-12

# per-block VMEM budget for picking the utterance block size (bytes);
# leaves headroom under the ~16 MB/core VMEM for Mosaic's own buffers
_VMEM_BUDGET = 10 * 1024 * 1024

WEIGHT_NAMES = (
    "ln1_s", "ln1_b",
    "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
    "ln2_s", "ln2_b",
    "cwq", "cbq", "cwo", "cbo",
    "ln3_s", "ln3_b",
    "w1", "b1", "w2", "b2",
)


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _layer_norm(x, scale, bias):
    """flax nn.LayerNorm semantics: f32 stats, eps inside the sqrt."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (
        y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(x.dtype)


def _kernel(
    pos_ref,      # (R, 1) int32
    elens_ref,    # (R, 1) int32 (per-row; rows of an utterance agree)
    h_ref,        # (R, D)
    ck_ref,       # (R, L, D)   self-attn K cache (head-packed)
    cv_ref,       # (R, L, D)
    crossk_ref,   # (U, T, D)   per-utterance encoder K (head-packed)
    crossv_ref,   # (U, T, D)
    ln1_s_ref, ln1_b_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln2_s_ref, ln2_b_ref,
    cwq_ref, cbq_ref, cwo_ref, cbo_ref,
    ln3_s_ref, ln3_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
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
    L = ck_ref.shape[1]
    U, T = crossk_ref.shape[0], crossk_ref.shape[1]
    dk = D // H
    adt = h.dtype

    def dense(x, w_ref, b_ref):
        return (
            jax.lax.dot_general(
                x, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[...].astype(jnp.float32)
        ).astype(adt)

    # ---- self-attention (cached, one new position per row) ----
    hn = _layer_norm(h, ln1_s_ref[...], ln1_b_ref[...])
    q = dense(hn, wq_ref, bq_ref)       # (R, D)
    k_new = dense(hn, wk_ref, bk_ref)
    v_new = dense(hn, wv_ref, bv_ref)
    knew_ref[...] = k_new
    vnew_ref[...] = v_new

    pos = pos_ref[...]  # (R, 1)
    past = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1) < pos  # l < pos

    attn_cols = []
    for hh in range(H):
        qh = q[:, hh * dk:(hh + 1) * dk].astype(jnp.float32)      # (R, dk)
        ckh = ck_ref[:, :, hh * dk:(hh + 1) * dk].astype(jnp.float32)
        cvh = cv_ref[:, :, hh * dk:(hh + 1) * dk].astype(jnp.float32)
        knh = k_new[:, hh * dk:(hh + 1) * dk].astype(jnp.float32)
        vnh = v_new[:, hh * dk:(hh + 1) * dk].astype(jnp.float32)

        s_past = jnp.sum(qh[:, None, :] * ckh, axis=-1) * scale   # (R, L)
        s_past = jnp.where(past, s_past, NEG_INF)
        s_new = jnp.sum(qh * knh, axis=-1, keepdims=True) * scale  # (R, 1)

        m = jnp.maximum(jnp.max(s_past, axis=-1, keepdims=True), s_new)
        e_past = jnp.where(past, jnp.exp(s_past - m), 0.0)
        e_new = jnp.exp(s_new - m)
        denom = jnp.sum(e_past, axis=-1, keepdims=True) + e_new
        p_past = (e_past / denom).astype(adt).astype(jnp.float32)
        p_new = (e_new / denom).astype(adt).astype(jnp.float32)

        out_h = (
            jnp.sum(p_past[:, :, None] * cvh, axis=1) + p_new * vnh
        )  # (R, dk)
        attn_cols.append(out_h.astype(adt))
    ha = jnp.concatenate(attn_cols, axis=-1)  # (R, D)
    x = h + dense(ha, wo_ref, bo_ref)

    # ---- beam-shared cross-attention ----
    hn2 = _layer_norm(x, ln2_s_ref[...], ln2_b_ref[...])
    q2 = dense(hn2, cwq_ref, cbq_ref)  # (R, D)
    # per-row elens -> per-utterance (rows of an utterance agree);
    # (R, 1) blocks satisfy Mosaic's row tiling where (U, 1) cannot
    elens_u = elens_ref[...].reshape(U, W)[:, :1]  # (U, 1)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (U, 1, T), 2)
        < elens_u[:, :, None]
    )  # (U, 1, T)

    cross_cols = []
    for hh in range(H):
        q2h = q2[:, hh * dk:(hh + 1) * dk].reshape(U, W, dk)
        ckh = crossk_ref[:, :, hh * dk:(hh + 1) * dk]  # (U, T, dk)
        cvh = crossv_ref[:, :, hh * dk:(hh + 1) * dk]
        s = jax.lax.dot_general(
            q2h, ckh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (U, W, T)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p = jnp.where(valid, p, 0.0).astype(adt)
        o = jax.lax.dot_general(
            p, cvh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (U, W, dk)
        cross_cols.append(o.astype(adt).reshape(R, dk))
    hc = jnp.concatenate(cross_cols, axis=-1)
    x = x + dense(hc, cwo_ref, cbo_ref)

    # ---- feed-forward ----
    hn3 = _layer_norm(x, ln3_s_ref[...], ln3_b_ref[...])
    ff = dense(jnp.maximum(dense(hn3, w1_ref, b1_ref), 0), w2_ref, b2_ref)
    y_ref[...] = x + ff


def _pick_u_block(Bu, W, L, T, D, F, esize):
    """Largest utterance block whose working set fits the VMEM budget.

    Prefers exact divisors of Bu (no padded rows).  A sub-block must
    also keep its row count `u*W` divisible by 8 — Mosaic requires the
    second-to-last block dim to be a multiple of 8 unless the block
    spans the whole array (the `u == Bu` case is exempt because every
    block dim then equals the array dim)."""
    weights = 2 * D * F + 6 * D * D + 4 * F + 12 * D

    def fits(u):
        rows = u * W
        need = (
            rows * L * D * 2 * esize        # self K/V cache block
            + u * T * D * 2 * esize         # encoder K/V block
            + weights * esize
            + rows * (3 * D + F) * 4        # activations (f32 worst case)
        )
        return need <= _VMEM_BUDGET

    def aligned(u):
        return u == Bu or (u * W) % 8 == 0

    for u in range(Bu, 0, -1):  # largest fitting aligned divisor
        if Bu % u == 0 and aligned(u) and fits(u):
            return u
    for u in range(Bu, 0, -1):  # largest fitting aligned block (padded)
        if aligned(u) and fits(u):
            return u
    # nothing aligned fits the soft budget: smallest aligned block
    # (Mosaic errors only if it truly exceeds physical VMEM)
    a = 8 // math.gcd(W, 8)
    return a if a <= Bu else Bu


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "interpret"),
)
def _call(pos2, elens2, h, ck, cv, crossk, crossv, weights, *, H, W,
          interpret):
    N, D = h.shape
    L = ck.shape[1]
    Bu, T = crossk.shape[0], crossk.shape[1]
    esize = jnp.dtype(h.dtype).itemsize
    F = weights["w1"].shape[1]
    u_block = _pick_u_block(Bu, W, L, T, D, F, esize)
    G = -(-Bu // u_block)
    if G * u_block != Bu:
        pad_u = G * u_block - Bu
        pad_r = pad_u * W
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
        pos2 = jnp.pad(pos2, ((0, pad_r), (0, 0)))
        ck = jnp.pad(ck, ((0, pad_r), (0, 0), (0, 0)))
        cv = jnp.pad(cv, ((0, pad_r), (0, 0), (0, 0)))
        crossk = jnp.pad(crossk, ((0, pad_u), (0, 0), (0, 0)))
        crossv = jnp.pad(crossv, ((0, pad_u), (0, 0), (0, 0)))
        elens2 = jnp.pad(elens2, ((0, pad_r), (0, 0)))  # per-row
    R = u_block * W

    vec = lambda blk, idx: pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    row = lambda *tail: vec((R,) + tail, lambda g: (g,) + (0,) * len(tail))
    utt = lambda *tail: vec(
        (u_block,) + tail, lambda g: (g,) + (0,) * len(tail)
    )
    # all weights are 2-D here (wrapper reshapes 1-D biases/scales)
    w_specs = [
        vec(weights[n].shape, lambda g: (0, 0)) for n in WEIGHT_NAMES
    ]
    out_spec = row(D)

    y, knew, vnew = pl.pallas_call(
        functools.partial(
            _kernel, H=H, W=W, scale=1.0 / float((D // H) ** 0.5)
        ),
        grid=(G,),
        in_specs=[
            row(1),                 # pos
            row(1),                 # elens (per-row)
            row(D),                 # h
            row(L, D), row(L, D),   # self K/V cache
            utt(T, D), utt(T, D),   # encoder K/V
            *w_specs,
        ],
        out_specs=[out_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((G * R, D), h.dtype) for _ in range(3)
        ],
        interpret=interpret,
    )(
        pos2, elens2, h, ck, cv, crossk, crossv,
        *[weights[n] for n in WEIGHT_NAMES],
    )
    return y[:N], knew[:N], vnew[:N]


def fused_decoder_layer_step(
    h, cache_k, cache_v, pos, cross_k, cross_v, elens, weights,
    *, beam_width: int, interpret=None,
):
    """One fused pre-norm decoder-layer step for beam decoding.

    h: (N, D) newest-token hidden (N = Bu*beam_width rows);
    cache_k/v: (N, Lmax, H, dk) self-attention caches (positions < pos
    valid); pos: (N,) int32; cross_k/v: (Bu, T, H, dk) per-utterance
    encoder K/V; elens: (Bu,) valid encoder lengths; weights: dict with
    WEIGHT_NAMES entries — 2-D kernels (in, out) and 1-D biases/scales.

    Returns (y, k_new, v_new) with y: (N, D) and k_new/v_new:
    (N, H, dk) — the caller writes them into the caches at `pos`
    (outside the kernel), exactly as the dense path does.
    """
    if interpret is None:
        interpret = not _on_tpu()
    N, Lmax = cache_k.shape[0], cache_k.shape[1]
    H, dk = cache_k.shape[2], cache_k.shape[3]
    D = H * dk
    Bu, T = cross_k.shape[0], cross_k.shape[1]

    packed = lambda x: x.reshape(x.shape[:-2] + (D,))
    w = dict(weights)
    for n in WEIGHT_NAMES:  # biases/scales to 2-D for TPU layout
        if w[n].ndim == 1:
            w[n] = w[n].reshape(1, -1)

    y, knew, vnew = _call(
        pos.astype(jnp.int32).reshape(N, 1),
        jnp.repeat(  # per-row copy of the utterance's encoder length:
            elens.astype(jnp.int32), N // Bu  # (Bu,1) blocks break
        ).reshape(N, 1),                      # Mosaic's 8-row tiling
        h, packed(cache_k), packed(cache_v),
        packed(cross_k), packed(cross_v), w,
        H=H, W=int(beam_width), interpret=bool(interpret),
    )
    return y, knew.reshape(N, H, dk), vnew.reshape(N, H, dk)


# ---------------------------------------------------------------------------
# Ancestor-INDIRECT fused layer step (r4): same fused layer as `_kernel`
# but over physical-slot caches + an ancestor table, i.e. the kernel
# version of `models/layers.py::decode_step_indirect`.  The search never
# beam-gathers the caches; attention resolves each beam's ancestry by
# accumulating W masked per-slot contractions (sum of one-hot selects ==
# the XLA path's one-hot einsum, exactly one nonzero per (w, l)).
# ---------------------------------------------------------------------------


def _kernel_indirect(
    pos_ref,      # (R, 1) int32, R = U*W rows in (u, w) order
    elens_ref,    # (R, 1) int32
    h_ref,        # (R, D)
    ck_ref,       # (U, W, L, D) self-attn K cache, PHYSICAL slot order
    cv_ref,       # (U, W, L, D)
    anc_ref,      # (U, W, L) int32 ancestor table
    crossk_ref,   # (U, T, D)
    crossv_ref,   # (U, T, D)
    ln1_s_ref, ln1_b_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln2_s_ref, ln2_b_ref,
    cwq_ref, cbq_ref, cwo_ref, cbo_ref,
    ln3_s_ref, ln3_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
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
    U, T = crossk_ref.shape[0], crossk_ref.shape[1]
    dk = D // H
    adt = h.dtype

    def dense(x, w_ref, b_ref):
        return (
            jax.lax.dot_general(
                x, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[...].astype(jnp.float32)
        ).astype(adt)

    # ---- self-attention: ancestor-indirect over physical slots ----
    hn = _layer_norm(h, ln1_s_ref[...], ln1_b_ref[...])
    q = dense(hn, wq_ref, bq_ref)       # (R, D)
    k_new = dense(hn, wk_ref, bk_ref)
    v_new = dense(hn, wv_ref, bv_ref)
    knew_ref[...] = k_new
    vnew_ref[...] = v_new

    posu = pos_ref[...].reshape(U, W)
    anc = anc_ref[...]  # (U, W, L)
    past = (
        jax.lax.broadcasted_iota(jnp.int32, (U, W, L), 2)
        < posu[:, :, None]
    )  # strictly < pos: the new column enters explicitly below

    attn_cols = []
    for hh in range(H):
        sl = slice(hh * dk, (hh + 1) * dk)
        qh = q[:, sl].reshape(U, W, dk).astype(jnp.float32)
        knh = k_new[:, sl].reshape(U, W, dk).astype(jnp.float32)
        vnh = v_new[:, sl].reshape(U, W, dk).astype(jnp.float32)

        s_sel = jnp.zeros((U, W, L), jnp.float32)
        for ws in range(W):
            ckh = ck_ref[:, ws, :, sl].astype(jnp.float32)  # (U, L, dk)
            s_ws = jax.lax.dot_general(
                qh, ckh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (U, W, L)
            s_sel = jnp.where(anc == ws, s_ws, s_sel)
        s_sel = jnp.where(past, s_sel * scale, NEG_INF)
        s_new = jnp.sum(qh * knh, axis=-1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_sel, axis=-1, keepdims=True), s_new)
        e_past = jnp.where(past, jnp.exp(s_sel - m), 0.0)
        e_new = jnp.exp(s_new - m)
        denom = jnp.sum(e_past, axis=-1, keepdims=True) + e_new
        p_past = (e_past / denom).astype(adt).astype(jnp.float32)
        p_new = (e_new / denom).astype(adt).astype(jnp.float32)

        out_h = p_new * vnh  # (U, W, dk)
        for ws in range(W):
            cvh = cv_ref[:, ws, :, sl].astype(jnp.float32)  # (U, L, dk)
            p_ws = jnp.where(anc == ws, p_past, 0.0)
            out_h = out_h + jax.lax.dot_general(
                p_ws, cvh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        attn_cols.append(out_h.reshape(R, dk).astype(adt))
    ha = jnp.concatenate(attn_cols, axis=-1)
    x = h + dense(ha, wo_ref, bo_ref)

    # ---- beam-shared cross-attention (same as _kernel) ----
    hn2 = _layer_norm(x, ln2_s_ref[...], ln2_b_ref[...])
    q2 = dense(hn2, cwq_ref, cbq_ref)
    elens_u = elens_ref[...].reshape(U, W)[:, :1]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (U, 1, T), 2)
        < elens_u[:, :, None]
    )
    cross_cols = []
    for hh in range(H):
        sl = slice(hh * dk, (hh + 1) * dk)
        q2h = q2[:, sl].reshape(U, W, dk)
        ckh = crossk_ref[:, :, sl]
        cvh = crossv_ref[:, :, sl]
        s = jax.lax.dot_general(
            q2h, ckh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p = jnp.where(valid, p, 0.0).astype(adt)
        o = jax.lax.dot_general(
            p, cvh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        cross_cols.append(o.astype(adt).reshape(R, dk))
    hc = jnp.concatenate(cross_cols, axis=-1)
    x = x + dense(hc, cwo_ref, cbo_ref)

    # ---- feed-forward ----
    hn3 = _layer_norm(x, ln3_s_ref[...], ln3_b_ref[...])
    ff = dense(jnp.maximum(dense(hn3, w1_ref, b1_ref), 0), w2_ref, b2_ref)
    y_ref[...] = x + ff


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "interpret"),
)
def _call_indirect(pos2, elens2, h, ck, cv, anc, crossk, crossv, weights,
                   *, H, W, interpret):
    N, D = h.shape
    L = ck.shape[2]
    Bu, T = crossk.shape[0], crossk.shape[1]
    esize = jnp.dtype(h.dtype).itemsize
    F = weights["w1"].shape[1]
    u_block = _pick_u_block(Bu, W, L, T, D, F, esize)
    G = -(-Bu // u_block)
    if G * u_block != Bu:
        pad_u = G * u_block - Bu
        pad_r = pad_u * W
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
        pos2 = jnp.pad(pos2, ((0, pad_r), (0, 0)))
        ck = jnp.pad(ck, ((0, pad_u), (0, 0), (0, 0), (0, 0)))
        cv = jnp.pad(cv, ((0, pad_u), (0, 0), (0, 0), (0, 0)))
        anc = jnp.pad(anc, ((0, pad_u), (0, 0), (0, 0)))
        crossk = jnp.pad(crossk, ((0, pad_u), (0, 0), (0, 0)))
        crossv = jnp.pad(crossv, ((0, pad_u), (0, 0), (0, 0)))
        elens2 = jnp.pad(elens2, ((0, pad_r), (0, 0)))
    R = u_block * W

    vec = lambda blk, idx: pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    row = lambda *tail: vec((R,) + tail, lambda g: (g,) + (0,) * len(tail))
    utt = lambda *tail: vec(
        (u_block,) + tail, lambda g: (g,) + (0,) * len(tail)
    )
    w_specs = [
        vec(weights[n].shape, lambda g: (0, 0)) for n in WEIGHT_NAMES
    ]
    out_spec = row(D)

    y, knew, vnew = pl.pallas_call(
        functools.partial(
            _kernel_indirect, H=H, W=W, scale=1.0 / float((D // H) ** 0.5)
        ),
        grid=(G,),
        in_specs=[
            row(1),                    # pos
            row(1),                    # elens
            row(D),                    # h
            utt(W, L, D), utt(W, L, D),  # physical-slot self K/V
            utt(W, L),                 # ancestor table
            utt(T, D), utt(T, D),      # encoder K/V
            *w_specs,
        ],
        out_specs=[out_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((G * R, D), h.dtype) for _ in range(3)
        ],
        interpret=interpret,
    )(
        pos2, elens2, h, ck, cv, anc, crossk, crossv,
        *[weights[n] for n in WEIGHT_NAMES],
    )
    return y[:N], knew[:N], vnew[:N]


def fused_decoder_layer_step_indirect(
    h, cache_k, cache_v, pos, anc, cross_k, cross_v, elens, weights,
    *, beam_width: int, interpret=None,
):
    """One fused ancestor-indirect decoder-layer step.

    h: (N, D) rows in (utterance, beam) order (N = Bu*W);
    cache_k/v: (Bu, W, Lc, H, dk) in PHYSICAL slot order (pre-write:
    the kernel attends cache[< pos] plus the freshly projected column);
    pos: (Bu, W); anc: (Bu, W, Lc); cross_k/v: (Bu, T, H, dk); elens:
    (Bu,).  Returns (y (N, D), k_new, v_new (N, H, dk)) — the caller
    writes k/v_new into each row's own physical slot at `pos`, exactly
    as `models/layers.py::decode_step_indirect` does.
    """
    if interpret is None:
        interpret = not _on_tpu()
    Bu, W, Lc = cache_k.shape[0], cache_k.shape[1], cache_k.shape[2]
    H, dk = cache_k.shape[3], cache_k.shape[4]
    D = H * dk
    N = h.shape[0]

    packed = lambda x: x.reshape(x.shape[:-2] + (D,))
    w = dict(weights)
    for n in WEIGHT_NAMES:
        if w[n].ndim == 1:
            w[n] = w[n].reshape(1, -1)

    y, knew, vnew = _call_indirect(
        pos.astype(jnp.int32).reshape(N, 1),
        jnp.repeat(elens.astype(jnp.int32), N // Bu).reshape(N, 1),
        h, packed(cache_k), packed(cache_v), anc.astype(jnp.int32),
        packed(cross_k), packed(cross_v), w,
        H=H, W=int(W), interpret=bool(interpret),
    )
    return y, knew.reshape(N, H, dk), vnew.reshape(N, H, dk)
