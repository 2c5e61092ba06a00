"""Pallas TPU kernel: CTC alpha/beta lattice (warp_ctc-class).

The pure-XLA CTC loss (`ops/ctc.py`) runs the alpha recursion as a
`lax.scan` of T tiny (B, 2U+1) steps; differentiating it adds a second
T-step reverse sweep.  At L1 train shapes (B=32, T'=199, S=97) those
sequential while-loop iterations cost ~10 ms of a ~23 ms train step —
pure loop overhead, not compute (measured: tools/profile_train.py).

Here the WHOLE recursion runs inside one Pallas program with the lattice
resident in VMEM ((T, B, S) f32 ~= 3 MB at L1 shapes): a `fori_loop` of
lane-shift + logaddexp3 VPU ops with no per-step HBM round trip and no
XLA loop machinery.  The backward pass is the exact CTC forward-backward
identity — a second kernel runs the beta recursion in reverse and emits
    d ll / d lp_path[t, s] = exp(alpha[t, s] + beta[t, s] - ll)
directly (beta excludes the emission at t, alpha includes it), wired up
via `jax.custom_vjp`.  Both kernels auto-interpret off-TPU so CPU tests
exercise the same code path.

Replaces the native surface of `torch.nn.CTCLoss` (ATen/cuDNN,
`asr/modeling/decoders/ctc.py:36-38`) at TPU speed-of-light; golden
values/grads vs torch are pinned in tests/test_ctc_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emoasr_tpu.ops.common import LOG_0


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return (
        "tpu" in dev.platform.lower()
        or "tpu" in getattr(dev, "device_kind", "").lower()
    )


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_r(x, k, lane_iota):
    """x[s-k] along lanes; lanes < k get LOG_0."""
    return jnp.where(lane_iota >= k, jnp.roll(x, k, axis=1), LOG_0)


def _shift_l(x, k, lane_iota, S):
    """x[s+k] along lanes; lanes >= S-k get LOG_0."""
    return jnp.where(lane_iota < S - k, jnp.roll(x, -k, axis=1), LOG_0)


def _alpha_kernel(
    lp_ref,  # (T, B, S)
    allow2_ref,  # (B, S) float {0,1}
    init_ref,  # (B, S) float {0,1}: states alive at t=0
    xlens_ref,  # (B, 1) int32
    alpha_ref,  # (T, B, S) out
    alpha_last_ref,  # (B, S) out: final alpha, frozen at xlen-1 per row.
    # Emitted separately so the fwd graph never SLICES the big lattice —
    # a slice consumer makes XLA place the whole (T, B, S) custom-call
    # result in scoped VMEM (S(1)), which OOMs at B=128 decode shapes.
    *,
    T: int,
):
    B, S = allow2_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    allow2 = allow2_ref[...] > 0.5
    xlens = xlens_ref[...]  # (B, 1)

    lp0 = lp_ref[0]
    alpha0 = jnp.where(init_ref[...] > 0.5, lp0, LOG_0)
    alpha_ref[0] = alpha0

    def one(t, alpha):
        lp_t = lp_ref[t]
        a1 = _shift_r(alpha, 1, iota)
        a2 = jnp.where(allow2, _shift_r(alpha, 2, iota), LOG_0)
        new = _lse3(alpha, a1, a2) + lp_t
        alpha = jnp.where(t < xlens, new, alpha)  # freeze past length
        alpha_ref[t] = alpha
        return alpha

    # unrolled loop: the per-iteration scalar/branch overhead of the
    # Mosaic loop (~8 us) dwarfs the (B, S) VPU math; K steps per trip
    K = 4
    n_tail = (T - 1) % K

    def body(i, alpha):
        t = 1 + i * K
        for k in range(K):
            alpha = one(t + k, alpha)
        return alpha

    alpha = jax.lax.fori_loop(0, (T - 1) // K, body, alpha0)
    for k in range(n_tail):
        alpha = one(T - n_tail + k, alpha)
    alpha_last_ref[...] = alpha


def _beta_grad_kernel(
    lp_ref,  # (T, B, S)
    allow2_ref,  # (B, S) float {0,1}
    final_ref,  # (B, S) float {0,1}: final states (2U, 2U-1)
    xlens_ref,  # (B, 1) int32
    alpha_ref,  # (T, B, S)
    ll_g_ref,  # (B, 2): [:, 0] = ll, [:, 1] = upstream cotangent of ll
    grad_ref,  # (T, B, S) out
    *,
    T: int,
):
    B, S = allow2_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    xlens = xlens_ref[...]  # (B, 1)
    init_beta = jnp.where(final_ref[...] > 0.5, 0.0, LOG_0)
    # allow2 shifted: gate for the s+2 skip INTO s+2, evaluated at s
    allow2_l = jnp.where(
        iota < S - 2, jnp.roll(allow2_ref[...], -2, axis=1), 0.0
    ) > 0.5
    ll = ll_g_ref[:, 0:1]  # (B, 1)
    g = ll_g_ref[:, 1:2]

    def emit(t, beta):
        alpha_t = alpha_ref[t]
        gamma = alpha_t + beta - ll
        grad = jnp.where(t < xlens, g * jnp.exp(gamma), 0.0)
        grad_ref[t] = grad

    def one(t, beta_next):
        lp_t1 = lp_ref[t + 1]
        D = beta_next + lp_t1
        d1 = _shift_l(D, 1, iota, S)
        d2 = jnp.where(allow2_l, _shift_l(D, 2, iota, S), LOG_0)
        cand = _lse3(D, d1, d2)
        beta = jnp.where(t >= xlens - 1, init_beta, cand)
        emit(t, beta)
        return beta

    emit(T - 1, init_beta)
    # unrolled reverse loop (see _alpha_kernel)
    K = 4
    n_head = (T - 1) % K

    for k in range(n_head):
        beta = one(T - 2 - k, init_beta if k == 0 else beta)  # noqa: F821
    carry = init_beta if n_head == 0 else beta  # noqa: F821

    def body(i, beta_next):
        t = T - 2 - n_head - i * K
        for k in range(K):
            beta_next = one(t - k, beta_next)
        return beta_next

    jax.lax.fori_loop(0, (T - 1) // K, body, carry)


def _pad_lanes(x, mult, value):
    pad = (-x.shape[-1]) % mult
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[-1] = (0, pad)
    return jnp.pad(x, w, constant_values=value)


def _pad_rows(x, axis, mult, value=0.0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ctc_ll_from_path(lp_path, allow2f, initf, finalf, xlens):
    """Log-likelihood (B,) from blank-interleaved path emissions.

    lp_path: (T, B, S) per-state emissions; allow2f/initf/finalf: (B, S)
    {0,1} float masks (skip-transition allowed / states alive at t=0 /
    final states); xlens: (B,).  Exact CTC forward; gradient = the
    forward-backward identity, both as single Pallas programs.
    """
    ll, _ = _ctc_fwd(lp_path, allow2f, initf, finalf, xlens)
    return ll


def _batch_block(T: int, Sp: int, n_big: int, B: int) -> int:
    """Largest multiple-of-8 batch block whose `n_big` (T, Bb, Sp) f32
    VMEM buffers fit a conservative scoped-VMEM budget.  One whole-batch
    program OOMs at production shapes (B=128, T=249, Sp=128: the lattice
    alone is 16.3 MB vs the 16 MB scope), so the lattice grids over
    independent batch blocks.  `n_big` must count Mosaic's grid
    pipelining: every in/out block whose index varies across grid steps
    is DOUBLE-buffered (so fwd = 2 buffers x 2, bwd = 3 x 2)."""
    budget = 10 * 1024 * 1024
    bb = budget // (T * Sp * 4 * n_big)
    bb = max(8, (bb // 8) * 8)
    return min(B + ((-B) % 8), bb)


def _run_alpha(lp_path, allow2f, initf, xlens):
    T, B, S = lp_path.shape
    Sp = S + ((-S) % 128)
    Bb = _batch_block(T, Sp, 4, B)
    Bp = B + ((-B) % Bb)
    lp = _pad_lanes(lp_path, 128, LOG_0)
    lp = _pad_rows(lp, 1, Bb, LOG_0)
    a2 = _pad_rows(_pad_lanes(allow2f, 128, 0.0), 0, Bb, 0.0)
    ini = _pad_rows(_pad_lanes(initf, 128, 0.0), 0, Bb, 0.0)
    xl = _pad_rows(xlens[:, None].astype(jnp.int32), 0, Bb, 1)

    alpha, alpha_last = pl.pallas_call(
        functools.partial(_alpha_kernel, T=T),
        grid=(Bp // Bb,),
        in_specs=[
            pl.BlockSpec((T, Bb, Sp), lambda i: (0, i, 0)),
            pl.BlockSpec((Bb, Sp), lambda i: (i, 0)),
            pl.BlockSpec((Bb, Sp), lambda i: (i, 0)),
            pl.BlockSpec((Bb, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((T, Bb, Sp), lambda i: (0, i, 0)),
            pl.BlockSpec((Bb, Sp), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Sp), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(lp.astype(jnp.float32), a2, ini, xl)
    return alpha, alpha_last


def _ctc_fwd(lp_path, allow2f, initf, finalf, xlens):
    T, B, S = lp_path.shape
    alpha, alpha_last_p = _run_alpha(lp_path, allow2f, initf, xlens)
    alpha_last = alpha_last_p[:B, :S]  # frozen at xlen-1 per row
    sel = jnp.where(finalf > 0.5, alpha_last, LOG_0)
    ll = jax.nn.logsumexp(sel, axis=1)
    return ll, (lp_path, allow2f, initf, finalf, xlens, alpha, ll)


def _ctc_bwd(res, g):
    lp_path, allow2f, initf, finalf, xlens, alpha, ll = res
    T, B, S = lp_path.shape
    Sp = alpha.shape[2]
    # 3 big buffers per block here (lp, alpha, grad) vs fwd's 2, so the
    # bwd block can be smaller than the fwd's; re-pad alpha to match
    Bb = _batch_block(T, Sp, 6, B)
    Bp = B + ((-B) % Bb)
    alpha = _pad_rows(alpha[:, :B], 1, Bb, LOG_0)
    lp = _pad_rows(_pad_lanes(lp_path, 128, LOG_0), 1, Bb, LOG_0)
    a2 = _pad_rows(_pad_lanes(allow2f, 128, 0.0), 0, Bb, 0.0)
    fin = _pad_rows(_pad_lanes(finalf, 128, 0.0), 0, Bb, 0.0)
    xl = _pad_rows(xlens[:, None].astype(jnp.int32), 0, Bb, 1)
    # rows with ll == LOG_0-ish (infeasible) must emit zero grad: exp of
    # (finite alpha + beta - LOG_0) would overflow, so clamp g to 0 there
    g_safe = jnp.where(ll < LOG_0 / 2, 0.0, g)
    ll_g = jnp.stack([ll, g_safe], axis=1).astype(jnp.float32)
    ll_g = _pad_rows(ll_g, 0, Bb, 0.0)

    grad = pl.pallas_call(
        functools.partial(_beta_grad_kernel, T=T),
        grid=(Bp // Bb,),
        in_specs=[
            pl.BlockSpec((T, Bb, Sp), lambda i: (0, i, 0)),
            pl.BlockSpec((Bb, Sp), lambda i: (i, 0)),
            pl.BlockSpec((Bb, Sp), lambda i: (i, 0)),
            pl.BlockSpec((Bb, 1), lambda i: (i, 0)),
            pl.BlockSpec((T, Bb, Sp), lambda i: (0, i, 0)),
            pl.BlockSpec((Bb, 2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, Bb, Sp), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
        interpret=not _on_tpu(),
    )(lp.astype(jnp.float32), a2, fin, xl, alpha, ll_g)
    return (grad[:, :B, :S].astype(lp_path.dtype), None, None, None, None)


ctc_ll_from_path.defvjp(_ctc_fwd, _ctc_bwd)
