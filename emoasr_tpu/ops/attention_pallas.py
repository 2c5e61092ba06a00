"""Pallas TPU kernel: fused self-attention for encoder blocks.

The dense path (`models/layers.py::MultiHeadAttention._attend`)
round-trips the (B, H, T, T) score tensor through HBM several times per
layer: QK^T write, mask fill, f32 softmax, post-softmax mask zero,
dropout mask generate+apply, AV read — and the backward mirrors all of
it.  At encoder shapes (T'≈199, d_k=64) the matmuls are small, so these
elementwise passes dominate: `tools/ablate_encoder.py` measured the
12-layer attention stack at ~4.2 ms fwd+bwd against ~1.4 ms of padded
MXU time.

This kernel computes one (batch, head) attention row block entirely in
VMEM: S = QK^T*scale -> key-pad mask -> f32 softmax -> in-kernel
dropout (pltpu PRNG, regenerated bit-identically in the backward) ->
P@V.  The scores never exist in HBM, forward or backward.  The
backward recomputes S and P (flash-attention style) and emits
dQ/dK/dV in one kernel.

Semantics parity targets (`models/layers.py:146-157`): NEG_INF=-1e9
mask fill BEFORE softmax, f32 softmax, post-softmax mask zeroing, and
the P cast to v.dtype before the AV matmul.  Dropout uses the TPU
hardware PRNG rather than `nn.Dropout`'s threefry stream — the mask
distribution (iid Bernoulli keep=1-p, 1/(1-p) scaling) is identical,
the realized bits are not; training noise provenance, not math, is the
only divergence (same stance as `rng_impl: unsafe_rbg`).

Replaces the attention inner loop of the reference's encoder
(`asr/modeling/transformer.py:48-99`) on the training hot path.
Auto-interprets off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # matches models/layers.py


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softmax_masked(s, kmask):
    """Row softmax of (Tp, Tp) f32 scores with key mask (1, Tp)."""
    s = jnp.where(kmask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.where(kmask, p, 0.0)


def _drop_mask(seed_ref, rate: float, shape):
    """Regenerable in-kernel Bernoulli keep mask (uint32 threshold)."""
    pltpu.prng_seed(
        seed_ref[0, 0]
        + pl.program_id(0) * pl.num_programs(1)
        + pl.program_id(1)
    )
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(int(rate * (2 ** 32)))


def _fwd_kernel(
    lens_ref,  # (1, 1) int32 SMEM
    seed_ref,  # (1, 1) int32 SMEM
    *refs,  # q, k, v, [bias (1, 1, Tp, Tp)], o — bias iff has_bias
    scale: float,
    rate: float,
    Tp: int,
    has_bias: bool = False,
):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tp, Tp)
    if has_bias:
        # additive pre-scale score bias (rel-pos BD term): semantics of
        # scores = (AC + BD) / sqrt(d) (models/layers.py RelMHA)
        s = s + bias_ref[0, 0].astype(jnp.float32)
    s = s * scale
    kmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1)
        < lens_ref[pl.program_id(0), 0]
    )
    p = _softmax_masked(s, kmask)
    if rate > 0.0:
        keep = _drop_mask(seed_ref, rate, (Tp, Tp))
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0, 0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(
    lens_ref,  # (1, 1) int32 SMEM
    seed_ref,  # (1, 1) int32 SMEM
    *refs,  # q, k, v, [bias], do, then outs dq, dk, dv, [dbias]
    scale: float,
    rate: float,
    Tp: int,
    has_bias: bool = False,
):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, do_ref = refs[:5]
        dq_ref, dk_ref, dv_ref, dbias_ref = refs[5:]
    else:
        q_ref, k_ref, v_ref, do_ref = refs[:4]
        dq_ref, dk_ref, dv_ref = refs[4:]
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    s = s * scale
    kmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1)
        < lens_ref[pl.program_id(0), 0]
    )
    p = _softmax_masked(s, kmask)  # f32, zero at masked keys

    if rate > 0.0:
        keep = _drop_mask(seed_ref, rate, (Tp, Tp))  # same bits as fwd
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p

    # dV = Pd^T @ dO  (same bf16-input precision as the dense einsum)
    dv = jax.lax.dot_general(
        pd.astype(v.dtype), do,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dPd = dO @ V^T
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rate > 0.0:
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        dp = dpd
    dp = jnp.where(kmask, dp, 0.0)  # post-softmax mask-zero vjp

    # softmax vjp: dS = P * (dP - rowsum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)

    if has_bias:
        # s = (qk^T + bias) * scale  =>  d bias = scale * dS_presoftmax
        dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)

    dq_ref[0, 0] = jnp.dot(
        ds, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _pad_qkv(x, Tp, Dp):
    B, H, T, D = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D)))


def _specs(B, H, Tp, Dp, n_tensors):
    # whole-array SMEM blocks (Mosaic rejects (1, 1) blocks of a (B, 1)
    # array: block dims must divide (8, 128) or equal the array's); the
    # kernel indexes lens by pl.program_id(0)
    smem = pl.BlockSpec(
        (B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM
    )
    seed = pl.BlockSpec(
        (1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM
    )
    big = pl.BlockSpec(
        (1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    return [smem, seed] + [big] * n_tensors, big


def _pad_bias(bias, Tp):
    B, H, T, T2 = bias.shape
    return jnp.pad(bias, ((0, 0), (0, 0), (0, Tp - T), (0, Tp - T2)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfgt, q, k, v, bias, lens, seed):
    out, _ = _fused_fwd(cfgt, q, k, v, bias, lens, seed)
    return out


def _fused_fwd(cfgt, q, k, v, bias, lens, seed):
    scale, rate, interpret, has_bias = cfgt
    B, H, T, D = q.shape
    Tp, Dp = _round_up(T, 128), _round_up(D, 128)
    qp, kp, vp = (_pad_qkv(x, Tp, Dp) for x in (q, k, v))
    lens2 = lens.astype(jnp.int32).reshape(B, 1)
    seed2 = seed.astype(jnp.int32).reshape(1, 1)
    in_specs, big = _specs(B, H, Tp, Dp, 3)
    operands = [lens2, seed2, qp, kp, vp]
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, Tp, Tp), lambda b, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(_pad_bias(bias, Tp))
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, rate=rate, Tp=Tp, has_bias=has_bias
        ),
        grid=(B, H),
        in_specs=in_specs,
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), v.dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :, :T, :D], (q, k, v, bias, lens, seed)


def _fused_bwd(cfgt, res, g):
    scale, rate, interpret, has_bias = cfgt
    q, k, v, bias, lens, seed = res
    B, H, T, D = q.shape
    Tp, Dp = _round_up(T, 128), _round_up(D, 128)
    qp, kp, vp = (_pad_qkv(x, Tp, Dp) for x in (q, k, v))
    gp = _pad_qkv(g.astype(v.dtype), Tp, Dp)
    lens2 = lens.astype(jnp.int32).reshape(B, 1)
    seed2 = seed.astype(jnp.int32).reshape(1, 1)
    in_specs, big = _specs(B, H, Tp, Dp, 4)
    operands = [lens2, seed2, qp, kp, vp, gp]
    out_specs = [big] * 3
    out_shape = [
        jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        jax.ShapeDtypeStruct((B, H, Tp, Dp), k.dtype),
        jax.ShapeDtypeStruct((B, H, Tp, Dp), v.dtype),
    ]
    if has_bias:
        bias_spec = pl.BlockSpec(
            (1, 1, Tp, Tp), lambda b, h: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs.insert(5, bias_spec)  # after q, k, v; before do
        operands.insert(5, _pad_bias(bias, Tp))
        out_specs.append(bias_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((B, H, Tp, Tp), bias.dtype)
        )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, rate=rate, Tp=Tp, has_bias=has_bias
        ),
        grid=(B, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    crop = lambda x: x[:, :, :T, :D]
    if has_bias:
        dq, dk, dv, dbias = outs
        dbias = dbias[:, :, :T, : bias.shape[-1]]
    else:
        dq, dk, dv = outs
        dbias = None
    return crop(dq), crop(dk), crop(dv), dbias, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def _fallback(q, k, v, lens, seed, scale, rate, bias=None):
    """Pure-JAX mirror of the kernel for off-TPU dropout runs.

    `pltpu.prng_seed`/`prng_random_bits` have no CPU lowering (even
    interpreted), so when dropout is active off-TPU we run the same
    semantic pipeline — NEG_INF mask fill, f32 softmax, post-softmax
    zero, iid Bernoulli keep with 1/(1-p) scale, P cast to v.dtype —
    with a threefry mask derived from `seed`.  Same math/distribution
    as the kernel; realized dropout bits differ across backends (the
    documented stance for hardware-RNG streams).
    """
    B, T = q.shape[0], q.shape[1]
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    s = s * scale
    m = (jnp.arange(T)[None, None, None, :] < lens[:, None, None, None])
    s = jnp.where(m, s, NEG_INF)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    p = jnp.where(m, p, 0.0)
    if rate > 0.0:
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed.astype(jnp.uint32)), 1.0 - rate, p.shape
        )
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def fused_self_attention(
    q, k, v, lens, seed, *, scale: float, dropout_rate: float = 0.0,
    deterministic: bool = True, interpret=None, bias=None,
):
    """Fused masked self-attention.

    q/k/v: (B, T, H, D); lens: (B,) valid key counts; seed: int32
    scalar array (ignored when deterministic or dropout_rate == 0).
    `bias`: optional (B, H, Tq, Tk) additive PRE-scale score term —
    scores = (q k^T + bias) * scale — used for the Conformer rel-pos BD
    matrix (models/layers.py RelMHA); gradients flow to it.
    Returns (B, T, H, D) in v.dtype.  Gradients flow to q/k/v (+bias).
    """
    if interpret is None:
        interpret = not _on_tpu()
    rate = 0.0 if deterministic else float(dropout_rate)
    if interpret and rate > 0.0:
        return _fallback(
            q, k, v, lens, seed, float(scale), rate, bias=bias
        )
    # kernel layout: (B, H, T, D) blocks are contiguous per (b, h)
    to_bhtd = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    out = _fused(
        (float(scale), rate, bool(interpret), bias is not None),
        to_bhtd(q), to_bhtd(k), to_bhtd(v),
        bias, lens, seed,
    )
    return jnp.transpose(out, (0, 2, 1, 3))
