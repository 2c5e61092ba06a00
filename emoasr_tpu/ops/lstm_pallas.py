"""Pallas TPU kernel: fused LSTM recurrence (fwd + bwd).

The `lax.scan` LSTM (`ops/lstm.py::lstm_scan`) dispatches one tiny
(B, H) @ (H, 4H) matmul per timestep; at transducer prediction-net
shapes (B=16, U=48, H=512) the scan costs ~5.9 ms of a ~24 ms T5 train
step (tools/profile_t5.py) — nearly all per-iteration HBM round trips
and XLA loop machinery, not compute (the matmul math is ~0.4 ms).

Here the WHOLE recurrence runs inside one Pallas program: x-projections,
recurrent weights and the carry live in VMEM; a `fori_loop` (unrolled
K=4, same rationale as ops/ctc_pallas.py) does gates -> state update ->
output with no per-step HBM traffic.  Long sequences grid over time
chunks — the TPU grid is sequential, so the (h, c) carry persists in
VMEM scratch across chunk programs.  The backward pass is the exact
reverse recurrence as a second kernel (gradients w.r.t. x_proj, w_hh,
h0, c0), with dW_hh accumulated f32 in scratch, wired via
`jax.custom_vjp`.

Gate layout note: in-kernel splits must land on 128-lane boundaries, so
the host wrapper pads H -> Hp (multiple of 128) PER GATE: x_proj
(B, T, 4H) is rearranged to (T, B, 4*Hp) with each torch-order gate
(i, f, g, o) in its own Hp slot, and w_hh (4H, H) likewise.  Padding is
inert: padded x-projection columns are zero, padded w rows/cols are
zero, and padded h/c lanes stay exactly 0 through the recurrence
(i=f=o=sigmoid(0), g=tanh(0)=0 -> c_pad=0, h_pad=0).

Replaces the native surface of cuDNN `nn.LSTM` for the hot training
paths (`asr/modeling/decoders/rnn_transducer.py:45-52` prediction net,
`asr/modeling/encoders/rnn.py:43-50`).  Parity vs the scan path (values
and grads) is pinned in tests/test_lstm_pallas.py; dispatch lives in
`ops/lstm.py::lstm_scan` (auto on TPU, scan elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _f32(x):
    return x.astype(jnp.float32)


def _fwd_kernel(
    xp_ref,  # (Tc, B, 4Hp) in-dtype: per-gate padded x @ W_ih^T + biases
    whh_ref,  # (Hp, 4Hp) f32: recurrent weights, h -> gates
    h0_ref,  # (B, Hp)
    c0_ref,  # (B, Hp)
    ys_ref,  # (Tc, B, Hp) out
    gates_ref,  # (Tc, B, 4Hp) out: post-activation (i, f, g, o) residual
    hcprev_ref,  # (Tc, B, 2Hp) out: [h_{t-1}, c_{t-1}] residual
    hT_ref,  # (B, Hp) out
    cT_ref,  # (B, Hp) out
    h_s,  # (B, Hp) f32 scratch: carry across chunk programs
    c_s,  # (B, Hp) f32 scratch
    *,
    Tc: int,
    Hp: int,
):
    pi = pl.program_id(0)

    @pl.when(pi == 0)
    def _init():
        h_s[...] = _f32(h0_ref[...])
        c_s[...] = _f32(c0_ref[...])

    whh = whh_ref[...]
    odt = ys_ref.dtype

    def one(t, carry):
        h, c = carry
        hcprev_ref[t] = jnp.concatenate([h, c], axis=-1).astype(odt)
        gates = _f32(xp_ref[t]) + jax.lax.dot(
            h, whh, preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(gates[:, :Hp])
        gf = jax.nn.sigmoid(gates[:, Hp : 2 * Hp])
        gg = jnp.tanh(gates[:, 2 * Hp : 3 * Hp])
        go = jax.nn.sigmoid(gates[:, 3 * Hp :])
        gates_ref[t] = jnp.concatenate([gi, gf, gg, go], axis=-1).astype(odt)
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        ys_ref[t] = h.astype(odt)
        return (h, c)

    carry = (h_s[...], c_s[...])
    K = 4
    n_tail = Tc % K

    def body(i, carry):
        for k in range(K):
            carry = one(i * K + k, carry)
        return carry

    carry = jax.lax.fori_loop(0, Tc // K, body, carry)
    for k in range(n_tail):
        carry = one(Tc - n_tail + k, carry)
    h, c = carry
    h_s[...] = h
    c_s[...] = c
    hT_ref[...] = h.astype(odt)
    cT_ref[...] = c.astype(odt)


def _bwd_kernel(
    gates_ref,  # (Tc, B, 4Hp) post-activation (i, f, g, o)
    hcprev_ref,  # (Tc, B, 2Hp): [h_{t-1}, c_{t-1}]
    dys_ref,  # (Tc, B, Hp)
    whh_t_ref,  # (4Hp, Hp) f32: gates -> h (transpose of fwd whh)
    dhcT_ref,  # (B, 2Hp): upstream cotangent of (h_T, c_T)
    dxp_ref,  # (Tc, B, 4Hp) out
    dwhh_ref,  # (4Hp, Hp) f32 out (written at the final program)
    dh0_ref,  # (B, Hp) out
    dc0_ref,  # (B, Hp) out
    dh_s,  # (B, Hp) f32 scratch
    dc_s,  # (B, Hp) f32 scratch
    dw_s,  # (4Hp, Hp) f32 scratch
    *,
    Tc: int,
    Hp: int,
):
    pi = pl.program_id(0)

    @pl.when(pi == 0)  # first program = LAST time chunk (reversed grid)
    def _init():
        dhc = _f32(dhcT_ref[...])
        dh_s[...] = dhc[:, :Hp]
        dc_s[...] = dhc[:, Hp:]
        dw_s[...] = jnp.zeros_like(dw_s)

    whh_t = whh_t_ref[...]
    odt = dxp_ref.dtype

    def one(t, carry):
        dh_carry, dc_carry = carry
        gates = _f32(gates_ref[t])
        gi = gates[:, :Hp]
        gf = gates[:, Hp : 2 * Hp]
        gg = gates[:, 2 * Hp : 3 * Hp]
        go = gates[:, 3 * Hp :]
        hcprev = _f32(hcprev_ref[t])
        cprev = hcprev[:, Hp:]
        c_t = gf * cprev + gi * gg
        tc = jnp.tanh(c_t)
        dh = _f32(dys_ref[t]) + dh_carry
        do_ = dh * tc
        dc = dc_carry + dh * go * (1.0 - tc * tc)
        dgi = (dc * gg) * gi * (1.0 - gi)
        dgf = (dc * cprev) * gf * (1.0 - gf)
        dgg = (dc * gi) * (1.0 - gg * gg)
        dgo = do_ * go * (1.0 - go)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dxp_ref[t] = dgates.astype(odt)
        # dW_hh^T accumulation: (4Hp, B) @ (B, Hp), contracted on batch
        dw_s[...] += jax.lax.dot_general(
            dgates,
            hcprev[:, :Hp],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_carry = jax.lax.dot(
            dgates, whh_t, preferred_element_type=jnp.float32
        )
        dc_carry = dc * gf
        return (dh_carry, dc_carry)

    carry = (dh_s[...], dc_s[...])
    K = 4
    n_head = Tc % K

    for k in range(n_head):
        carry = one(Tc - 1 - k, carry)

    def body(i, carry):
        t = Tc - 1 - n_head - i * K
        for k in range(K):
            carry = one(t - k, carry)
        return carry

    carry = jax.lax.fori_loop(0, Tc // K, body, carry)
    dh, dc = carry
    dh_s[...] = dh
    dc_s[...] = dc
    dwhh_ref[...] = dw_s[...]
    dh0_ref[...] = dh.astype(odt)
    dc0_ref[...] = dc.astype(odt)


def _pad_gatewise(x, H: int, Hp: int, n_groups: int = 4):
    """(..., n_groups*H) -> (..., n_groups*Hp), each group zero-padded."""
    if H == Hp:
        return x
    xg = x.reshape(x.shape[:-1] + (n_groups, H))
    xg = jnp.pad(xg, [(0, 0)] * (xg.ndim - 1) + [(0, Hp - H)])
    return xg.reshape(x.shape[:-1] + (n_groups * Hp,))


def _unpad_gatewise(x, H: int, Hp: int, n_groups: int = 4):
    if H == Hp:
        return x
    xg = x.reshape(x.shape[:-1] + (n_groups, Hp))
    return xg[..., :H].reshape(x.shape[:-1] + (n_groups * H,))


def _pad_last(x, Hp: int):
    pad = Hp - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _time_chunk(T: int, B: int, Hp: int, itemsize: int) -> int:
    """Largest divisor-friendly chunk whose per-chunk buffers fit a
    conservative VMEM budget (fwd: xp 4Hp + ys Hp + gates 4Hp + hcprev
    2Hp = 11 Hp lanes/step; bwd peaks similarly plus the f32 dW
    scratch)."""
    budget = 8 * 1024 * 1024 - 8 * Hp * Hp  # dW/w f32 scratch reserve
    per_t = B * Hp * 11 * itemsize
    tc = max(1, budget // max(per_t, 1))
    if tc >= T:
        return T
    tc = min(tc, T)
    # prefer a divisor of T so every block is full (blocks out of range
    # would recompute the tail chunk); fall back to ceil-pad by caller
    for c in range(tc, 0, -1):
        if T % c == 0:
            return c
    return tc


@jax.custom_vjp
def lstm_scan_pallas(x_proj, w_hh, h0, c0):
    """Drop-in for `ops/lstm.py::lstm_scan` (same shapes/semantics):
    x_proj (B, T, 4H) torch gate order, w_hh (4H, H), h0/c0 (B, H) ->
    (ys (B, T, H), (h_T, c_T))."""
    ys, hT, cT, _, _ = _fwd_impl(x_proj, w_hh, h0, c0)
    return ys, (hT, cT)


def _fwd_impl(x_proj, w_hh, h0, c0, interpret=None):
    if interpret is None:
        interpret = not _on_tpu()
    B, T, H4 = x_proj.shape
    H = H4 // 4
    Hp = H + ((-H) % 128)
    Bp = B + ((-B) % 8)
    dt = x_proj.dtype

    xp = _pad_gatewise(x_proj, H, Hp).transpose(1, 0, 2)  # (T, B, 4Hp)
    xp = jnp.pad(xp, ((0, 0), (0, Bp - B), (0, 0)))
    # whh: (4H, H) -> f32 (Hp, 4Hp), h -> gates, gate-slot padded
    whh = _pad_gatewise(w_hh.T.astype(jnp.float32), H, Hp)  # (H, 4Hp)
    whh = jnp.pad(whh, ((0, Hp - H), (0, 0)))  # (Hp, 4Hp)
    h0p = jnp.pad(_pad_last(h0, Hp), ((0, Bp - B), (0, 0)))
    c0p = jnp.pad(_pad_last(c0, Hp), ((0, Bp - B), (0, 0)))

    Tc = _time_chunk(T, Bp, Hp, jnp.dtype(dt).itemsize)
    Tp = T + ((-T) % Tc)
    if Tp != T:
        xp = jnp.pad(xp, ((0, Tp - T), (0, 0), (0, 0)))
    n_chunks = Tp // Tc

    kernel = functools.partial(_fwd_kernel, Tc=Tc, Hp=Hp)
    ys, gates, hcprev, hT, cT = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((Tc, Bp, 4 * Hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((Hp, 4 * Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Tc, Bp, Hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((Tc, Bp, 4 * Hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((Tc, Bp, 2 * Hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, Hp), dt),
            jax.ShapeDtypeStruct((Tp, Bp, 4 * Hp), dt),
            jax.ShapeDtypeStruct((Tp, Bp, 2 * Hp), dt),
            jax.ShapeDtypeStruct((Bp, Hp), dt),
            jax.ShapeDtypeStruct((Bp, Hp), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(xp.astype(dt), whh, h0p.astype(dt), c0p.astype(dt))
    ys_out = ys[:T, :B, :H].transpose(1, 0, 2)
    return ys_out, hT[:B, :H], cT[:B, :H], (gates, hcprev), (Tc, Tp, Hp, Bp)


def _vjp_fwd(x_proj, w_hh, h0, c0):
    ys, hT, cT, res, _ = _fwd_impl(x_proj, w_hh, h0, c0)
    return (ys, (hT, cT)), (w_hh, res[0], res[1])


def _vjp_bwd(saved, g):
    # all static dims re-derived from the saved arrays (custom_vjp
    # residuals must be pure pytrees of arrays)
    w_hh, gates, hcprev = saved
    dys, (dhT, dcT) = g
    B, T, H = dys.shape
    dt = gates.dtype
    Tp, Bp = gates.shape[0], gates.shape[1]
    Hp = gates.shape[2] // 4
    Tc = _time_chunk(T, Bp, Hp, jnp.dtype(dt).itemsize)  # == fwd's
    interpret = not _on_tpu()

    dysp = _pad_last(dys, Hp).transpose(1, 0, 2)
    dysp = jnp.pad(dysp, ((0, Tp - T), (0, Bp - B), (0, 0)))
    dhc = jnp.concatenate(
        [
            jnp.pad(_pad_last(dhT, Hp), ((0, Bp - B), (0, 0))),
            jnp.pad(_pad_last(dcT, Hp), ((0, Bp - B), (0, 0))),
        ],
        axis=-1,
    )
    # whh_t: gates -> h, (4Hp, Hp) f32
    whh_t = _pad_gatewise(w_hh.T.astype(jnp.float32), H, Hp)  # (H, 4Hp)
    whh_t = jnp.pad(whh_t, ((0, Hp - H), (0, 0))).T  # (4Hp, Hp)

    n_chunks = Tp // Tc
    rev = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731
    kernel = functools.partial(_bwd_kernel, Tc=Tc, Hp=Hp)
    dxp, dwhh, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((Tc, Bp, 4 * Hp), rev),
            pl.BlockSpec((Tc, Bp, 2 * Hp), rev),
            pl.BlockSpec((Tc, Bp, Hp), rev),
            pl.BlockSpec((4 * Hp, Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, 2 * Hp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Tc, Bp, 4 * Hp), rev),
            pl.BlockSpec((4 * Hp, Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, 4 * Hp), dt),
            jax.ShapeDtypeStruct((4 * Hp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), dt),
            jax.ShapeDtypeStruct((Bp, Hp), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((4 * Hp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(gates, hcprev, dysp.astype(dt), whh_t, dhc.astype(dt))

    dx_proj = _unpad_gatewise(
        dxp[:T, :B].transpose(1, 0, 2), H, Hp
    ).astype(dt)
    # dwhh is dW_hh^T in padded gate layout: (4Hp, Hp) -> torch (4H, H)
    dw = _unpad_gatewise(dwhh[:, :H].T, H, Hp).T  # (4H, H)... via transpose
    dw = dw.astype(w_hh.dtype)
    return (
        dx_proj,
        dw,
        dh0[:B, :H].astype(dt),
        dc0[:B, :H].astype(dt),
    )


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
