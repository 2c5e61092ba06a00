"""Exact-equality tests: ops/topk_pallas.py vs lax.top_k (values AND
indices, including tie-breaking to the lowest index).  The kernel is
the selection step of every beam search (search/common.py
topk_lastdim mode='pallas', the TPU default)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emoasr_tpu.ops.topk_pallas import topk_pallas
from emoasr_tpu.search.common import topk_lastdim


@pytest.mark.parametrize(
    "shape,k",
    [
        ((7, 1000), 10),       # unaligned rows + vocab
        ((3, 10, 10000), 15),  # beam layout at flagship V
        ((2, 257), 8),         # just above the chunk threshold
        ((640, 512), 1),       # k=1
    ],
)
def test_matches_lax_topk(shape, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v0, i0 = jax.lax.top_k(x, k)
    v1, i1 = topk_pallas(x, k)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_ties_resolve_to_lowest_index():
    x = jnp.zeros((4, 500), jnp.float32)
    x = x.at[:, 100].set(3.0).at[:, 7].set(3.0).at[:, 400].set(5.0)
    v0, i0 = jax.lax.top_k(x, 6)
    v1, i1 = topk_pallas(x, 6)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert np.asarray(i1)[0, :3].tolist() == [400, 7, 100]


def test_neg_inf_rows():
    """DEAD-score rows (all -inf) must not break selection."""
    x = jnp.full((3, 300), -jnp.inf, jnp.float32).at[1, 250].set(1.0)
    v1, i1 = topk_pallas(x, 4)
    v0, i0 = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    assert int(np.asarray(i1)[1, 0]) == 250


def test_bf16_dtype():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 600)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v0, i0 = jax.lax.top_k(x, 7)
    v1, i1 = topk_pallas(x, 7)
    assert v1.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(v0, np.float32), np.asarray(v1, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_topk_lastdim_auto_dispatch():
    """The TPU-default auto mode (pallas) must agree with the chunked
    and direct modes through the public entry point."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 6, 3000)).astype(np.float32))
    v_a, i_a = topk_lastdim(x, 10, mode="pallas")
    v_c, i_c = topk_lastdim(x, 10, mode="chunked")
    v_d, i_d = topk_lastdim(x, 10, mode="direct")
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_c))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_c))
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_d))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_d))
