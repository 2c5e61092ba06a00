"""Golden tests for the RNN-T lattice ops against an independent torch DP
implementation (same recurrence as warp_rnnt / the reference's Numba kernels,
`/root/reference/asr/modeling/decoders/rnnt_aligner.py:14-152`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from emoasr_tpu.ops.rnnt import rnnt_forced_align, rnnt_loss


def torch_rnnt_ll(log_probs, labels, T, U):
    """Plain O(T*U) torch DP (autograd-capable) for one utterance."""
    alpha = {}
    alpha[(0, 0)] = torch.tensor(0.0, dtype=log_probs.dtype)
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[(t - 1, u)] + log_probs[t - 1, u, 0])
            if u > 0:
                terms.append(alpha[(t, u - 1)] + log_probs[t, u - 1, labels[u - 1]])
            alpha[(t, u)] = torch.logsumexp(torch.stack(terms), dim=0)
    return alpha[(T - 1, U)] + log_probs[T - 1, U, 0]


def _case(rng, B, T, U1, V):
    logits = rng.normal(size=(B, T, U1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U1 - 1))
    xlens = rng.integers(U1, T + 1, size=B).astype(np.int32)
    xlens[0] = T
    ylens = rng.integers(1, U1, size=B).astype(np.int32)
    ylens[0] = U1 - 1
    return logits, labels, xlens, ylens


@pytest.mark.parametrize("seed", [0, 1])
def test_rnnt_loss_matches_dp(seed):
    rng = np.random.default_rng(seed)
    B, T, U1, V = 3, 9, 5, 6
    logits, labels, xlens, ylens = _case(rng, B, T, U1, V)
    lp = torch.log_softmax(torch.tensor(logits), dim=-1)

    want = np.array(
        [
            -float(torch_rnnt_ll(lp[b], labels[b], int(xlens[b]), int(ylens[b])))
            for b in range(B)
        ]
    )

    got = rnnt_loss(
        jax.nn.log_softmax(jnp.asarray(logits), axis=-1),
        jnp.asarray(labels),
        jnp.asarray(xlens),
        jnp.asarray(ylens),
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_rnnt_loss_grad_matches_torch_autograd():
    rng = np.random.default_rng(2)
    B, T, U1, V = 2, 7, 4, 5
    logits, labels, xlens, ylens = _case(rng, B, T, U1, V)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.log_softmax(t_logits, dim=-1)
    t_loss = torch.stack(
        [
            -torch_rnnt_ll(t_lp[b], labels[b], int(xlens[b]), int(ylens[b]))
            for b in range(B)
        ]
    ).mean()
    t_loss.backward()

    def jloss(lg):
        return rnnt_loss(
            jax.nn.log_softmax(lg, axis=-1),
            jnp.asarray(labels),
            jnp.asarray(xlens),
            jnp.asarray(ylens),
            reduction="mean",
        )

    j_loss, j_grad = jax.value_and_grad(jloss)(jnp.asarray(logits))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=1e-3, atol=1e-5
    )


def test_rnnt_loss_degenerate_single_frame():
    # xlen=1, ylen=0: only path is the final blank at (0, 0)
    lp = jax.nn.log_softmax(jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 2, 4)).astype(np.float32)), axis=-1)
    nll = rnnt_loss(lp, jnp.array([[1]]), jnp.array([1]), jnp.array([0]), reduction="none")
    np.testing.assert_allclose(float(nll[0]), -float(lp[0, 0, 0, 0]), rtol=1e-5)


def _ref_align(lp, labels, T, U, blank=0):
    """Independent numpy alpha/beta + greedy walk mirroring
    rnnt_aligner.py:159-198 semantics."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(terms)
    beta = np.full((T, U + 1), -np.inf)
    beta[T - 1, U] = lp[T - 1, U, blank]
    for t in range(T - 1, -1, -1):
        for u in range(U, -1, -1):
            if t == T - 1 and u == U:
                continue
            terms = []
            if t + 1 < T:
                terms.append(beta[t + 1, u] + lp[t, u, blank])
            if u + 1 <= U:
                terms.append(beta[t, u + 1] + lp[t, u, labels[u]])
            beta[t, u] = np.logaddexp.reduce(terms)
    fb = alpha + beta
    aligns = np.zeros(U, dtype=np.int32)
    t = u = 0
    while t + 1 < T and u < U:
        if fb[t + 1, u] > fb[t, u + 1]:
            t += 1
        else:
            aligns[u] = t
            u += 1
    return aligns


@pytest.mark.parametrize("seed", [0, 3])
def test_rnnt_forced_align_matches_dp(seed):
    rng = np.random.default_rng(seed)
    B, T, U1, V = 3, 10, 5, 6
    logits, labels, xlens, ylens = _case(rng, B, T, U1, V)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

    want = np.zeros((B, U1 - 1), np.int32)
    for b in range(B):
        w = _ref_align(
            lp[b][: xlens[b]], labels[b], int(xlens[b]), int(ylens[b])
        )
        want[b, : ylens[b]] = w[: ylens[b]]

    got = rnnt_forced_align(
        jnp.asarray(lp), jnp.asarray(xlens), jnp.asarray(labels), jnp.asarray(ylens)
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_rnnt_rowscan_matches_diagonal():
    from emoasr_tpu.ops.rnnt import rnnt_loss_rowscan

    rng = np.random.default_rng(5)
    B, T, U1, V = 3, 10, 5, 8
    logits = rng.normal(size=(B, T, U1, V)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    labels = jnp.asarray(rng.integers(1, V, (B, U1 - 1)))
    xl = jnp.asarray([10, 7, 5])
    yl = jnp.asarray([4, 3, 1])
    l1 = rnnt_loss(lp, labels, xl, yl, reduction="none")
    l2 = rnnt_loss_rowscan(lp, labels, xl, yl, reduction="none")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
    g1 = jax.grad(lambda x: rnnt_loss(jax.nn.log_softmax(x, -1), labels, xl, yl))(
        jnp.asarray(logits)
    )
    g2 = jax.grad(
        lambda x: rnnt_loss_rowscan(jax.nn.log_softmax(x, -1), labels, xl, yl)
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-6)


def test_rnnt_chunked_joint_matches_full():
    from emoasr_tpu.ops.rnnt import (
        _gather_blank_label,
        rnnt_gathered_from_joint,
    )

    rng = np.random.default_rng(6)
    B, T, U1, V, J = 2, 9, 5, 20, 8
    h_enc = jnp.asarray(rng.normal(size=(B, T, J)).astype(np.float32))
    h_dec = jnp.asarray(rng.normal(size=(B, U1, J)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(J, V)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, (B, U1 - 1)))
    z = jnp.tanh(h_enc[:, :, None, :] + h_dec[:, None, :, :])
    full = jax.nn.log_softmax(jnp.einsum("btuj,jv->btuv", z, w) + b, -1)
    lpb_ref, lpl_ref = _gather_blank_label(full, labels, 0)
    lpb, lpl = rnnt_gathered_from_joint(h_enc, h_dec, w, b, labels, time_chunk=4)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(lpb_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpl), np.asarray(lpl_ref), rtol=1e-4, atol=1e-5)


def test_rnnt_pallas_fused_interpret():
    """Pallas fused joint kernel vs the chunked reference (interpret mode
    on CPU; compiled parity is exercised on the real chip in benchmarks)."""
    from jax.experimental import pallas as pl

    import emoasr_tpu.ops.rnnt_pallas as rp
    from emoasr_tpu.ops.rnnt import rnnt_gathered_from_joint

    orig = rp.pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    rp.pl.pallas_call = interp
    try:
        rng = np.random.default_rng(7)
        B, T, U1, V, J = 2, 11, 6, 40, 16
        h_enc = jnp.asarray(rng.normal(size=(B, T, J)).astype(np.float32))
        h_dec = jnp.asarray(rng.normal(size=(B, U1, J)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(J, V)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
        labels = jnp.asarray(rng.integers(1, V, (B, U1 - 1)))
        lpb_ref, lpl_ref = rnnt_gathered_from_joint(
            h_enc, h_dec, w, b, labels, time_chunk=4
        )
        lpb, lpl = rp.fused_joint_gather_fwd(
            h_enc, h_dec, w, b, labels, t_chunk=4, v_chunk=16
        )
        np.testing.assert_allclose(
            np.asarray(lpb), np.asarray(lpb_ref), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lpl), np.asarray(lpl_ref), rtol=1e-4, atol=1e-4
        )
    finally:
        rp.pl.pallas_call = orig


def test_rnnt_pallas_fused_bf16_inputs():
    """bf16 activations (compute_dtype=bfloat16 train path) through the
    fused kernel: z and z@W run in bf16 with f32 accumulation/logsumexp.
    Regression for the f32-scratch/bf16-value dtype mismatch that broke
    transducer bf16 training."""
    import emoasr_tpu.ops.rnnt_pallas as rp

    rng = np.random.default_rng(9)
    B, T, U1, V, J = 2, 11, 6, 40, 16
    h_enc = jnp.asarray(rng.normal(size=(B, T, J)).astype(np.float32))
    h_dec = jnp.asarray(rng.normal(size=(B, U1, J)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(J, V)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, (B, U1 - 1)))
    lpb32, lpl32 = rp.fused_joint_gather_fwd(
        h_enc, h_dec, w, b, labels, t_chunk=4, v_chunk=16
    )
    lpb16, lpl16 = rp.fused_joint_gather_fwd(
        h_enc.astype(jnp.bfloat16), h_dec.astype(jnp.bfloat16), w, b,
        labels, t_chunk=4, v_chunk=16,
    )
    assert lpb16.dtype == jnp.float32  # log-probs come out f32 either way
    np.testing.assert_allclose(
        np.asarray(lpb16), np.asarray(lpb32), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(lpl16), np.asarray(lpl32), rtol=0.05, atol=0.05
    )


def test_rnnt_decoder_chunked_mode_matches_full():
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.decoders.rnnt import RNNTDecoder

    rng = np.random.default_rng(8)
    B, T, U, E = 2, 8, 4, 16
    base = dict(
        decoder_type="rnn_transducer", vocab_size=12, enc_hidden_size=E,
        dec_hidden_size=16, dec_num_layers=1, embedding_size=8,
        joint_hidden_size=16,
    )
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    elens = jnp.asarray([8, 6])
    ys = jnp.asarray(rng.integers(1, 12, (B, U)))
    ylens = jnp.asarray([4, 3])
    ys_in = jnp.pad(ys, ((0, 0), (1, 0)), constant_values=2)

    losses = {}
    for mode in ("full", "chunked"):
        cfg = config_from_dict(dict(base, rnnt_joint_mode=mode))
        dec = RNNTDecoder(cfg)
        v = dec.init(
            jax.random.PRNGKey(0), eouts, elens, None, ys, ylens, ys_in
        )
        loss, ld, _ = dec.apply(v, eouts, elens, None, ys, ylens, ys_in)
        losses[mode] = float(loss)
    np.testing.assert_allclose(losses["chunked"], losses["full"], rtol=1e-4)
