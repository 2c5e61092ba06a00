"""Pallas TPU kernels: fused CTC vocab head (matmul + streaming
logsumexp + path-column extraction), never materializing (B, T, V).

The CTC loss needs only two things from the vocab head: the per-frame
normalizer lse[b, t] = logsumexp_v(eouts[b, t] @ W + bias) and the
blank-interleaved path columns xs[b, t, s] = logits[b, t, z[b, s]].
The dense route (head matmul -> (B, T, V) HBM -> reduce -> gather, plus
the mirrored backward) moves ~1.5 GB of HBM traffic per L1 train step
for a 33 GFLOP matmul.  These kernels stream the head over V tiles like
`ops/rnnt_pallas.py` streams the transducer joint:

fwd   : logits tile = eouts @ W[:, v-tile] (MXU) -> running max/sumexp
        (VPU) + xs accumulation via an exact one-hot tile matmul; only
        lse (B, T) and xs (B, T, S) ever reach HBM.
bwd   : with p = exp(logits - lse) recomputed tile-wise,
          d logits = g_lse * p + one_hot(z) @ g_xs
        never materializes either: one kernel accumulates
        d eouts = d logits @ W^T over V tiles, a second (V-outermost
        grid) accumulates d W = eouts^T @ d logits and d bias.

Everything wires through `jax.custom_vjp` on (eouts, W, bias); the
lattice itself stays in `ops/ctc_pallas`.  Auto-interprets off-TPU.

Replaces the hot half of `torch.nn.CTCLoss`'s surrounding dense ops
(`asr/modeling/decoders/ctc.py:36-38,109-113`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _fwd_kernel(
    z_ref,  # (1, 1, Sp) int32
    e_ref,  # (1, Tc, H)
    w_ref,  # (H, Vc)
    b_ref,  # (1, Vc)
    lse_ref,  # (1, Tc, 1) out
    xs_ref,  # (1, Tc, Sp) out
    m_ref,  # (Tc, 1) scratch: running max
    s_ref,  # (Tc, 1) scratch: running sumexp
    xs_acc,  # (Tc, Sp) scratch
    *,
    Vc: int,
    n_v: int,
    Tc: int,
    Sp: int,
):
    v_idx = pl.program_id(2)

    @pl.when(v_idx == 0)
    def _init():
        m_ref[...] = jnp.full((Tc, 1), NEG, jnp.float32)
        s_ref[...] = jnp.zeros((Tc, 1), jnp.float32)
        xs_acc[...] = jnp.zeros((Tc, Sp), jnp.float32)

    logits = (
        jnp.dot(e_ref[0], w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[0][None, :]
    )  # (Tc, Vc) f32

    tile_max = jnp.max(logits, axis=-1, keepdims=True)  # (Tc, 1)
    new_m = jnp.maximum(m_ref[...], tile_max)
    scale = jnp.exp(m_ref[...] - new_m)
    s_ref[...] = s_ref[...] * scale + jnp.sum(
        jnp.exp(logits - new_m), axis=-1, keepdims=True
    )
    m_ref[...] = new_m

    # path columns: one-hot tile (Vc, Sp) — exact, each output element
    # accumulates at most one non-zero product
    v_lo = v_idx * Vc
    col = jax.lax.broadcasted_iota(jnp.int32, (Vc, Sp), 0) + v_lo
    hot = (col == z_ref[0, 0][None, :]).astype(jnp.float32)
    xs_acc[...] = xs_acc[...] + jnp.dot(
        logits, hot, preferred_element_type=jnp.float32
    )

    @pl.when(v_idx == n_v - 1)
    def _emit():
        lse_ref[0] = m_ref[...] + jnp.log(s_ref[...])
        xs_ref[0] = xs_acc[...]


def _grad_e_kernel(
    z_ref,  # (1, 1, Sp) int32
    e_ref,  # (1, Tc, H)
    w_ref,  # (H, Vc)
    b_ref,  # (1, Vc)
    lse_ref,  # (1, Tc, 1)
    glse_ref,  # (1, Tc, 1)
    gxs_ref,  # (1, Tc, Sp)
    ge_ref,  # (1, Tc, H) out
    ge_acc,  # (Tc, H) scratch
    *,
    Vc: int,
    n_v: int,
    Tc: int,
    Sp: int,
):
    v_idx = pl.program_id(2)

    @pl.when(v_idx == 0)
    def _init():
        ge_acc[...] = jnp.zeros_like(ge_acc)

    logits = (
        jnp.dot(e_ref[0], w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[0][None, :]
    )
    p = jnp.exp(logits - lse_ref[0])  # (Tc, Vc)

    v_lo = v_idx * Vc
    col = jax.lax.broadcasted_iota(jnp.int32, (Vc, Sp), 0) + v_lo
    hot = (col == z_ref[0, 0][None, :]).astype(jnp.float32)  # (Vc, Sp)
    gl = glse_ref[0] * p + jnp.dot(
        gxs_ref[0], hot.T, preferred_element_type=jnp.float32
    )  # (Tc, Vc)

    ge_acc[...] = ge_acc[...] + jnp.dot(
        gl, w_ref[...].T, preferred_element_type=jnp.float32
    )

    @pl.when(v_idx == n_v - 1)
    def _emit():
        ge_ref[0] = ge_acc[...]


def _grad_w_kernel(
    z_ref,  # (B, 1, Sp) int32 (full)
    e_ref,  # (1, Tc, H)
    w_ref,  # (H, Vc)
    b_ref,  # (1, Vc)
    lse_ref,  # (1, Tc, 1)
    glse_ref,  # (1, Tc, 1)
    gxs_ref,  # (1, Tc, Sp)
    gw_ref,  # (H, Vc) out (revisited across b, t)
    gb_ref,  # (1, Vc) out (revisited)
    *,
    Vc: int,
    Tc: int,
    Sp: int,
    n_bt: int,
):
    # grid = (n_v, B, n_t): v outermost so the (H, Vc) accumulator block
    # is revisited consecutively across every (b, t) pair
    v_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    t_idx = pl.program_id(2)
    bt = b_idx * pl.num_programs(2) + t_idx

    @pl.when(bt == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    e = e_ref[0]  # (Tc, H)
    logits = (
        jnp.dot(e, w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[0][None, :]
    )
    p = jnp.exp(logits - lse_ref[0])

    v_lo = v_idx * Vc
    col = jax.lax.broadcasted_iota(jnp.int32, (Vc, Sp), 0) + v_lo
    hot = (col == z_ref[0, 0][None, :]).astype(jnp.float32)
    gl = glse_ref[0] * p + jnp.dot(
        gxs_ref[0], hot.T, preferred_element_type=jnp.float32
    )  # (Tc, Vc)

    gw_ref[...] = gw_ref[...] + jnp.dot(
        e.astype(jnp.float32).T, gl, preferred_element_type=jnp.float32
    )
    gb_ref[...] = gb_ref[...] + jnp.sum(gl, axis=0, keepdims=True)


def _pad_axis(x, axis, mult, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w, constant_values=value)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=()
)
def fused_ctc_head(eouts, w, b, z):
    """(lse (B, T), xs (B, T, Sp)) from the un-materialized head.

    eouts: (B, T, H); w: (H, V); b: (V,); z: (B, S) int32 path labels.
    xs comes back padded to Sp (sublane multiple of 8); slice [:, :, :S].
    Gradients flow to (eouts, w, b); z is data.
    """
    out, _ = _fwd(eouts, w, b, z)
    return out


_T_CHUNK = 128
_V_CHUNK = 1024


def _prep(eouts, w, b, z):
    B, T, H = eouts.shape
    V = w.shape[1]
    S = z.shape[1]
    e_p = _pad_axis(eouts, 1, _T_CHUNK)
    Tp = e_p.shape[1]
    w_p = _pad_axis(w, 1, _V_CHUNK)
    Vp = w_p.shape[1]
    # padded vocab columns must never win max or hit a label: bias NEG
    b_p = jnp.full((1, Vp), NEG, jnp.float32).at[0, :V].set(
        b.astype(jnp.float32)
    )
    z_p = _pad_axis(z.astype(jnp.int32), 1, 8, value=-1)[:, None, :]
    Sp = z_p.shape[2]  # -1 never matches a vocab column
    return e_p, w_p, b_p, z_p, B, T, H, V, S, Tp, Vp, Sp


def _fwd(eouts, w, b, z):
    e_p, w_p, b_p, z_p, B, T, H, V, S, Tp, Vp, Sp = _prep(eouts, w, b, z)
    n_t, n_v = Tp // _T_CHUNK, Vp // _V_CHUNK

    lse, xs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, Vc=_V_CHUNK, n_v=n_v, Tc=_T_CHUNK, Sp=Sp
        ),
        grid=(B, n_t, n_v),
        in_specs=[
            pl.BlockSpec((1, 1, Sp), lambda b_, t, v: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, H), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _V_CHUNK), lambda b_, t, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _V_CHUNK), lambda b_, t, v: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _T_CHUNK, 1), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, Sp), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, Sp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_T_CHUNK, 1), jnp.float32),
            pltpu.VMEM((_T_CHUNK, 1), jnp.float32),
            pltpu.VMEM((_T_CHUNK, Sp), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(z_p, e_p, w_p, b_p)

    lse, xs = lse[:, :T, 0], xs[:, :T]
    return (lse, xs), (eouts, w, b, z, lse)


def _bwd(res, g):
    eouts, w, b, z, lse = res
    g_lse, g_xs = g
    e_p, w_p, b_p, z_p, B, T, H, V, S, Tp, Vp, Sp = _prep(eouts, w, b, z)
    n_t, n_v = Tp // _T_CHUNK, Vp // _V_CHUNK
    lse_p = _pad_axis(lse, 1, _T_CHUNK)[:, :, None]
    glse_p = _pad_axis(g_lse.astype(jnp.float32), 1, _T_CHUNK)[:, :, None]
    gxs_p = _pad_axis(
        _pad_axis(g_xs.astype(jnp.float32), 2, 8), 1, _T_CHUNK
    )

    ge = pl.pallas_call(
        functools.partial(
            _grad_e_kernel, Vc=_V_CHUNK, n_v=n_v, Tc=_T_CHUNK, Sp=Sp
        ),
        grid=(B, n_t, n_v),
        in_specs=[
            pl.BlockSpec((1, 1, Sp), lambda b_, t, v: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, H), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _V_CHUNK), lambda b_, t, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _V_CHUNK), lambda b_, t, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, 1), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, 1), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, Sp), lambda b_, t, v: (b_, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _T_CHUNK, H), lambda b_, t, v: (b_, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_T_CHUNK, H), jnp.float32)],
        interpret=not _on_tpu(),
    )(z_p, e_p, w_p, b_p, lse_p, glse_p, gxs_p)

    z_full = z_p  # (B, 1, Sp) — every (v) step reads row b
    gw, gb = pl.pallas_call(
        functools.partial(
            _grad_w_kernel, Vc=_V_CHUNK, Tc=_T_CHUNK, Sp=Sp,
            n_bt=B * n_t,
        ),
        grid=(n_v, B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, Sp), lambda v, b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, H), lambda v, b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _V_CHUNK), lambda v, b_, t: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _V_CHUNK), lambda v, b_, t: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, 1), lambda v, b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, 1), lambda v, b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T_CHUNK, Sp), lambda v, b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, _V_CHUNK), lambda v, b_, t: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _V_CHUNK), lambda v, b_, t: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(z_full, e_p, w_p, b_p, lse_p, glse_p, gxs_p)

    return (
        ge[:, :T].astype(eouts.dtype),
        gw[:, :V].astype(w.dtype),
        gb[0, :V].astype(b.dtype),
        None,
    )


fused_ctc_head.defvjp(_fwd, _bwd)
