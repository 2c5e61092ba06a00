"""Pallas TPU kernel: fused RNN-T joint -> (blank, label) log-probs.

The transducer's memory wall is the (B, T, U+1, V) joint output: the
reference materializes it fully (`rnn_transducer.py:101`) — 2.6 GB for a
typical (16, 400, 101, 1000) training batch and 10+ GB for the CSJ "Large"
4k-vocab config.  The lattice loss only ever consumes the blank column and
one label column per (t, u) cell (warp_rnnt's `gather=True` trick).

This kernel computes, for each (t, u) cell, directly from the joint
activations:

    z        = tanh(h_enc[t] + h_dec[u])           (VPU)
    logits_v = z @ W[:, v-tile] + b                (MXU, streamed over V)
    lse      = streaming logsumexp over V tiles
    lpb      = logit[blank] - lse
    lpl[u]   = logit[labels[u]] - lse

so the V axis never leaves VMEM: HBM traffic is O(B·T·U) instead of
O(B·T·U·V).  Grid = (B, T-tiles, V-tiles) with V innermost; the z tile is
computed once per (b, t) at v==0 and reused for every V tile from VMEM
scratch.

Backward uses `jax.custom_vjp` delegating to the chunked+rematerialized
pure-JAX path (`ops/rnnt.rnnt_gathered_from_joint`), which is already
O(B·T·U)-memory; only the forward needed hand-fusing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _on_tpu() -> bool:
    """True when the default device is a TPU (incl. PJRT plugins whose
    platform name differs, e.g. the remote-TPU 'axon' tunnel)."""
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _kernel(
    labels_ref,  # (1, 1, Up) int32
    h_enc_ref,  # (1, Tc, J)
    h_dec_ref,  # (1, Up, J)
    w_ref,  # (J, Vc)
    b_ref,  # (1, Vc)
    lpb_ref,  # (1, Tc, Up) out
    lpl_ref,  # (1, Tc, Up) out
    z_ref,  # (Tc * Up, J) scratch
    m_ref,  # (Tc, Up) scratch: running max
    s_ref,  # (Tc, Up) scratch: running sumexp
    blank_ref,  # (Tc, Up) scratch: blank logit
    lab_ref,  # (Tc, Up) scratch: label logit
    *,
    blank_id: int,
    Vc: int,
    n_v: int,
    Tc: int,
    Up: int,
):
    v_idx = pl.program_id(2)

    @pl.when(v_idx == 0)
    def _init():
        # z = tanh(e[t] + d[u]) computed once per (b, t) block
        e = h_enc_ref[0]  # (Tc, J)
        d = h_dec_ref[0]  # (Up, J)
        z = jnp.tanh(e[:, None, :] + d[None, :, :])  # (Tc, Up, J)
        z_ref[:] = z.reshape(Tc * Up, -1)
        m_ref[:] = jnp.full((Tc, Up), NEG, jnp.float32)
        s_ref[:] = jnp.zeros((Tc, Up), jnp.float32)
        blank_ref[:] = jnp.zeros((Tc, Up), jnp.float32)
        lab_ref[:] = jnp.zeros((Tc, Up), jnp.float32)

    logits = (
        jnp.dot(z_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0][None, :]
    ).reshape(Tc, Up, Vc)

    # streaming logsumexp over the V tiles
    tile_max = jnp.max(logits, axis=-1)
    new_m = jnp.maximum(m_ref[:], tile_max)
    scale = jnp.exp(m_ref[:] - new_m)
    s_ref[:] = s_ref[:] * scale + jnp.sum(
        jnp.exp(logits - new_m[:, :, None]), axis=-1
    )
    m_ref[:] = new_m

    v_lo = v_idx * Vc
    col = jax.lax.broadcasted_iota(jnp.int32, (Tc, Up, Vc), 2) + v_lo

    # blank column (exactly one tile contains it)
    blank_hit = (col == blank_id).astype(jnp.float32)
    blank_ref[:] = blank_ref[:] + jnp.sum(logits * blank_hit, axis=-1)

    # label columns: labels_ref holds labels[b, u] at column u (emission
    # into u+1 is read from column u by the caller's layout)
    lab = labels_ref[0, 0]  # (Up,) int32
    lab_hit = (col == lab[None, :, None]).astype(jnp.float32)
    lab_ref[:] = lab_ref[:] + jnp.sum(logits * lab_hit, axis=-1)

    @pl.when(v_idx == n_v - 1)
    def _emit():
        lse = m_ref[:] + jnp.log(s_ref[:])
        lpb_ref[0] = blank_ref[:] - lse
        lpl_ref[0] = lab_ref[:] - lse


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("blank_id", "t_chunk", "v_chunk"))
def fused_joint_gather_fwd(
    h_enc: jnp.ndarray,
    h_dec: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    labels: jnp.ndarray,
    blank_id: int = 0,
    t_chunk: int = 8,
    v_chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lp_blank (B,T,U+1), lp_label (B,T,U)) without the (B,T,U,V) tensor."""
    B, T, J = h_enc.shape
    U1 = h_dec.shape[1]
    U = U1 - 1
    V = w_out.shape[1]
    if labels.shape[1] != U:
        raise ValueError(
            f"labels length {labels.shape[1]} != h_dec length - 1 ({U}); "
            "the prediction net output must be U+1 long (blank/sos-led, "
            "data/asr_dataset.py convention)"
        )

    # mixed precision: z and the z@W matmul run in the activations'
    # dtype (bf16 under compute_dtype=bfloat16 — MXU-native), with f32
    # accumulation (preferred_element_type) and f32 logsumexp scratch
    dt = h_enc.dtype
    h_dec = h_dec.astype(dt)
    w_out = w_out.astype(dt)

    h_enc_p = _pad_to(h_enc, 1, t_chunk)
    Tp = h_enc_p.shape[1]
    # U+1 pads to the sublane multiple (8), NOT the lane multiple (128):
    # U is a middle dim everywhere it appears (z rows are Tc*Up, logits
    # are (Tc, Up, Vc)), and padding 49 -> 128 was tripling the joint
    # matmul FLOPs at typical U~50 (measured slower than the chunked
    # lattice end-to-end; 49 -> 56 is 14% waste instead)
    h_dec_p = _pad_to(h_dec, 1, 8)
    Up = h_dec_p.shape[1]
    w_p = _pad_to(w_out, 1, v_chunk)
    Vp = w_p.shape[1]
    # padded vocab columns must not win the max: bias them to NEG
    b_p = jnp.full((1, Vp), NEG, jnp.float32).at[0, :V].set(b_out)
    labels_p = jnp.full((B, 1, Up), -1, jnp.int32).at[:, 0, :U].set(
        labels.astype(jnp.int32)
    )

    n_t = Tp // t_chunk
    n_v = Vp // v_chunk

    kernel = functools.partial(
        _kernel, blank_id=blank_id, Vc=v_chunk, n_v=n_v, Tc=t_chunk, Up=Up
    )

    lpb, lpl = pl.pallas_call(
        kernel,
        grid=(B, n_t, n_v),
        in_specs=[
            pl.BlockSpec((1, 1, Up), lambda b, t, v: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, J), lambda b, t, v: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up, J), lambda b, t, v: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, v_chunk), lambda b, t, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_chunk), lambda b, t, v: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_chunk, Up), lambda b, t, v: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, Up), lambda b, t, v: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, Up), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, Up), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_chunk * Up, J), dt),
            pltpu.VMEM((t_chunk, Up), jnp.float32),
            pltpu.VMEM((t_chunk, Up), jnp.float32),
            pltpu.VMEM((t_chunk, Up), jnp.float32),
            pltpu.VMEM((t_chunk, Up), jnp.float32),
        ],
        # configs with rnnt_joint_mode=pallas stay runnable on CPU
        # (tests, dryrun): the emulator executes the same kernel
        interpret=not _on_tpu(),
    )(labels_p, h_enc_p, h_dec_p, w_p, b_p)

    return lpb[:, :T, :U1], lpl[:, :T, :U]


def fused_joint_gather(
    h_enc, h_dec, w_out, b_out, labels, blank_id: int = 0,
    t_chunk: int = 8, v_chunk: int = 512, time_chunk_bwd: int = 32,
):
    """Pallas forward + chunked-JAX backward (custom VJP)."""
    from emoasr_tpu.ops.rnnt import rnnt_gathered_from_joint

    @jax.custom_vjp
    def f(h_enc, h_dec, w_out, b_out):
        return fused_joint_gather_fwd(
            h_enc, h_dec, w_out, b_out, labels, blank_id, t_chunk, v_chunk
        )

    def f_fwd(h_enc, h_dec, w_out, b_out):
        out = f(h_enc, h_dec, w_out, b_out)
        return out, (h_enc, h_dec, w_out, b_out)

    def f_bwd(res, g):
        h_enc, h_dec, w_out, b_out = res
        _, vjp = jax.vjp(
            lambda he, hd, w, b: rnnt_gathered_from_joint(
                he, hd, w, b, labels, blank_id, time_chunk_bwd
            ),
            h_enc, h_dec, w_out, b_out,
        )
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(h_enc, h_dec, w_out, b_out)
