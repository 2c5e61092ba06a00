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
