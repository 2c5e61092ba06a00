"""Label-sync attention beam search vs the reference TransformerDecoder.decode
(batch-1 host implementation), with and without joint CTC prefix scoring."""

import sys
from collections import namedtuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.decoders.transformer import TransformerDecoder
from emoasr_tpu.models.layers import make_pad_mask
from emoasr_tpu.search.attention_beam import attention_beam_search
from emoasr_tpu.utils import torch_import as ti

sys.path.insert(0, "/root/reference")

V = 20
CFG = dict(
    vocab_size=V,
    dec_hidden_size=16,
    dec_num_attention_heads=2,
    dec_num_layers=1,
    dec_intermediate_size=32,
    dropout_dec_rate=0.0,
    dropout_attn_rate=0.0,
    enc_hidden_size=16,
    lsm_prob=0.0,
    eos_id=2,
    blank_id=0,
    max_decode_ylen=12,
    mtl_ctc_weight=0.3,  # gives the reference decoder its ctc head
)


def _ref_decoder(seed):
    from asr.modeling.decoders.transformer import (
        TransformerDecoder as RefDec,
    )

    P = namedtuple(
        "P",
        "vocab_size dec_hidden_size dec_num_attention_heads dec_num_layers "
        "dec_intermediate_size dropout_dec_rate dropout_attn_rate "
        "enc_hidden_size lsm_prob eos_id blank_id max_decode_ylen "
        "mtl_ctc_weight loss_normalize_length loss_normalize_batch kd_weight "
        "mtl_phone_ctc_weight mtl_inter_ctc_weight",
    )
    torch.manual_seed(seed)
    dec = RefDec(
        P(
            V, 16, 2, 1, 32, 0.0, 0.0, 16, 0.0, 2, 0, 12, 0.3,
            False, True, 0, 0, 0,
        )
    ).eval()
    return dec


def _mine_from_ref(dec):
    sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    cfg = config_from_dict(CFG)
    mine = TransformerDecoder(cfg)
    params = ti.transformer_decoder(sd, 1)
    return mine, {"params": params}, cfg


@pytest.mark.parametrize(
    "seed,ctc_w,len_w", [(0, 0.0, 0.0), (5, 0.0, 0.3), (2, 0.3, 0.0)]
)
def test_attention_beam_matches_reference(seed, ctc_w, len_w):
    dec = _ref_decoder(seed)
    # bias toward <eos> so random decoders actually finalize hypotheses
    with torch.no_grad():
        dec.output.bias[2] += 1.0
    mine, variables, cfg = _mine_from_ref(dec)

    rng = np.random.default_rng(seed)
    T = 14
    eouts = rng.normal(size=(1, T, 16)).astype(np.float32)
    elens_t = torch.tensor([T])

    with torch.no_grad():
        ref_hyps, ref_scores, _, _ = dec.decode(
            torch.tensor(eouts), elens_t, beam_width=3, len_weight=len_w,
            decode_ctc_weight=ctc_w,
        )

    eouts_j = jnp.asarray(eouts)
    elens_j = jnp.asarray([T])
    Emask_T = T

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, Emask_T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    ctc_lp = None
    if ctc_w > 0:
        logits_ctc = mine.apply(
            variables, eouts_j,
            method=lambda m, e: m.ctc.logits(e),
        )
        ctc_lp = jax.nn.log_softmax(logits_ctc.astype(jnp.float32), -1)

    hyps, lens, scores = attention_beam_search(
        eouts_j, elens_j, step_fn, vocab_size=V, beam_width=3,
        len_weight=len_w, decode_ctc_weight=ctc_w, ctc_log_probs=ctc_lp,
        max_decode_ylen=12,
    )
    hyps, lens, scores = map(np.asarray, (hyps, lens, scores))

    # reference hyps are eos-stripped; ours carry leading + trailing eos
    got = []
    for w in range(3):
        h = hyps[0, w, : lens[0, w]].tolist()
        got.append([t for t in h if t != 2])
    n_ref = len(ref_hyps)
    assert n_ref > 0
    assert got[:n_ref] == [list(map(int, h)) for h in ref_hyps], (
        got, ref_hyps
    )
    np.testing.assert_allclose(
        scores[0, :n_ref], np.asarray(ref_scores, np.float32), rtol=1e-3,
        atol=1e-4,
    )


def test_attention_beam_batched_jit():
    dec = _ref_decoder(5)
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(5)
    B, T = 3, 7
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.array([7, 5, 4])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    f = jax.jit(
        lambda eo, el: attention_beam_search(
            eo, el, step_fn, vocab_size=V, beam_width=3, len_weight=0.1,
            max_decode_ylen=12,
        )
    )
    hyps, lens, scores = f(eouts, elens)
    assert hyps.shape[:2] == (B, 3)
    # batch-row consistency
    h1, l1, s1 = f(eouts[1:2], elens[1:2])
    np.testing.assert_allclose(
        np.asarray(s1)[0, 0], np.asarray(scores)[1, 0], rtol=1e-5
    )


def test_cached_step_matches_forward_one_step():
    """Incremental KV-cached decoding must equal full-prefix recompute."""
    dec = _ref_decoder(7)
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(7)
    B, T, Lmax = 4, 9, 8
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([9, 7, 5, 9])
    emask = make_pad_mask(elens, T)[:, None, None, :]

    cross_kvs = mine.apply(
        variables, eouts, method=TransformerDecoder.precompute_cross_kv
    )
    caches = mine.apply(
        variables, B, Lmax, method=lambda m, n, L: m.init_cache(n, L)
    )

    hyps = jnp.full((B, Lmax), 2, jnp.int32)
    toks = rng.integers(3, V, size=(B, Lmax - 1))
    for step in range(4):
        lens = jnp.full((B,), step + 1, jnp.int32)
        last = hyps[jnp.arange(B), lens - 1]
        logits_c, caches = mine.apply(
            variables, last, lens - 1, caches, cross_kvs, emask,
            method=lambda m, *a: m.decode_step_cached(*a),
        )
        logits_f = mine.apply(
            variables, hyps, lens, eouts, emask,
            method=TransformerDecoder.forward_one_step,
        )
        np.testing.assert_allclose(
            np.asarray(logits_c), np.asarray(logits_f), rtol=1e-4, atol=1e-4,
            err_msg=f"step {step}",
        )
        hyps = hyps.at[:, step + 1].set(jnp.asarray(toks[:, step]))


def test_staged_loop_equivalence(monkeypatch):
    """The staged while_loop (growing cache bounds) must match the
    single-stage search exactly — transitions forced at toy sizes."""
    import emoasr_tpu.search.attention_beam as ab

    dec = _ref_decoder(3)
    with torch.no_grad():
        dec.output.bias[2] += 0.5  # some rows finish, some hit the cap
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(3)
    B, T = 3, 10
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([10, 8, 6])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    def run():
        return attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=3,
            len_weight=0.2, max_decode_ylen=12,
        )

    base = jax.tree_util.tree_map(np.asarray, run())  # Lmax=14: one stage
    monkeypatch.setattr(ab, "STAGE_BOUNDS", (4, 7, 11))
    staged = jax.tree_util.tree_map(np.asarray, run())  # four stages
    # hyps/lens must be identical; the re-encode step_fn runs on a
    # sliced (shorter) token buffer per stage, so XLA reduces over a
    # different padded extent and scores can differ at the last ulp
    np.testing.assert_array_equal(base[0], staged[0])
    np.testing.assert_array_equal(base[1], staged[1])
    np.testing.assert_allclose(base[2], staged[2], rtol=1e-6, atol=1e-6)


def test_staged_cached_beam_equivalence(monkeypatch):
    """Staged loop with KV caches (padded across stage transitions) and
    beam-shared cross-attention must match the single-stage result."""
    import emoasr_tpu.search.attention_beam as ab

    dec = _ref_decoder(11)
    with torch.no_grad():
        dec.output.bias[2] += 0.5
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(11)
    B, T, W = 2, 9, 3
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([9, 6])
    emask = make_pad_mask(elens, T)[:, None, None, :]
    cross_kvs = mine.apply(
        variables, eouts, method=TransformerDecoder.precompute_cross_kv
    )

    def init_cache_fn(N, Lmax):
        return mine.apply(
            variables, N, Lmax, method=lambda m, n, L: m.init_cache(n, L)
        )

    def step_cached_fn(tokens, pos, caches):
        return mine.apply(
            variables, tokens, pos, caches, cross_kvs, emask,
            method=lambda m, *a: m.decode_step_cached(*a, beam_width=W),
        )

    def run():
        return attention_beam_search(
            eouts, elens, None, vocab_size=V, beam_width=W,
            len_weight=0.2, max_decode_ylen=12,
            cached_step=(init_cache_fn, step_cached_fn),
        )

    base = jax.tree_util.tree_map(np.asarray, run())
    monkeypatch.setattr(ab, "STAGE_BOUNDS", (4, 7, 11))
    staged = jax.tree_util.tree_map(np.asarray, run())
    for a, b in zip(base, staged):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape,k", [((7, 10000), 10), ((3, 5, 1003), 15),
                                     ((4, 257), 8), ((2, 64), 5)])
def test_topk_lastdim_matches_lax(shape, k):
    from emoasr_tpu.search.common import topk_lastdim

    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    # inject ties (including at the selection boundary) and -inf blocks
    flat = x.reshape(-1, shape[-1])
    flat[:, 5] = flat[:, 1]
    flat[0, : k * 3] = 7.5
    if shape[-1] > 200:
        flat[-1, 100:] = -np.inf
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v_new, i_new = topk_lastdim(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_new))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_new))


def test_row_caps_forced_finalization():
    """A row whose beams never emit a viable eos must still return its
    best live hypotheses, force-finalized at the per-row step budget
    (the r4 `cannot decode` regime; VERDICT r4 #2)."""
    dec = _ref_decoder(13)
    with torch.no_grad():
        dec.output.bias[2] -= 25.0  # eos never survives selection
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(13)
    B, T, W = 2, 8, 3
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([8, 6])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    caps = jnp.asarray([4, 6])
    hyps, lens, scores = map(
        np.asarray,
        attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=W,
            len_weight=0.1, max_decode_ylen=12, row_caps=caps,
        ),
    )
    # every row decodes; forced hyps carry exactly cap real tokens
    # (+ the leading eos) and no internal eos
    assert (scores[:, 0] > -1e29).all(), scores
    for b, cap in enumerate([4, 6]):
        n_res = int((scores[b] > -1e29).sum())
        assert n_res == W  # all surviving beams were finalized
        for w in range(n_res):
            assert lens[b, w] == cap + 1
            h = hyps[b, w, 1 : lens[b, w]]
            assert (h != 2).all(), h
    # scores best-first
    assert (np.diff(scores[0][scores[0] > -1e29]) <= 1e-6).all()


def test_global_cap_best_effort_guarantee():
    """row_caps == max_decode_ylen still force-finalizes at the global
    cap — every utterance yields a hypothesis (without row_caps the
    search keeps the reference's cannot-decode semantics, pinned by
    test_full_model_parity)."""
    dec = _ref_decoder(17)
    with torch.no_grad():
        dec.output.bias[2] -= 25.0
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(17)
    B, T = 2, 8
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([8, 6])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    hyps, lens, scores = map(
        np.asarray,
        attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=3,
            len_weight=0.1, max_decode_ylen=12,
            row_caps=jnp.asarray([12, 12]),
        ),
    )
    assert (scores[:, 0] > -1e29).all(), scores
    assert (lens[:, 0] == 13).all()  # leading eos + max_decode_ylen tokens

    # without row_caps: reference semantics — these rows return nothing
    _, _, scores_ref = map(
        np.asarray,
        attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=3,
            len_weight=0.1, max_decode_ylen=12,
        ),
    )
    assert (scores_ref < -1e29).all(), scores_ref


@pytest.mark.parametrize(
    "seed,ctc_w,len_w", [(0, 0.0, 0.0), (5, 0.0, 0.3), (2, 0.3, 0.1)]
)
def test_top1_early_stop_exact(seed, ctc_w, len_w):
    """need_results=1 (top-1 decoding) must return the SAME best
    hypothesis and score as the full need_results=W search — the stop
    rule is admissible (attention_beam_search docstring)."""
    dec = _ref_decoder(seed)
    with torch.no_grad():
        dec.output.bias[2] += 1.0
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(seed)
    B, T, W = 3, 10, 4
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([10, 7, 5])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    ctc_lp = None
    if ctc_w > 0:
        logits_ctc = mine.apply(
            variables, eouts, method=lambda m, e: m.ctc.logits(e)
        )
        ctc_lp = jax.nn.log_softmax(logits_ctc.astype(jnp.float32), -1)

    def run(need):
        return jax.tree_util.tree_map(
            np.asarray,
            attention_beam_search(
                eouts, elens, step_fn, vocab_size=V, beam_width=W,
                len_weight=len_w, decode_ctc_weight=ctc_w,
                ctc_log_probs=ctc_lp, max_decode_ylen=12,
                need_results=need,
            ),
        )

    full = run(None)
    top1 = run(1)
    for b in range(B):
        assert full[2][b, 0] > -1e29
        np.testing.assert_allclose(
            top1[2][b, 0], full[2][b, 0], rtol=1e-6, atol=1e-6
        )
        lf, lt = full[1][b, 0], top1[1][b, 0]
        assert lf == lt
        np.testing.assert_array_equal(
            top1[0][b, 0, :lt], full[0][b, 0, :lf]
        )


def test_ctc_len_caps():
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import ctc_len_caps

    cfg = config_from_dict(
        dict(
            vocab_size=5, blank_id=0, max_decode_ylen=20,
            decode_cap_ratio=1.5, decode_cap_margin=2,
        )
    )
    # utt 0: argmax path 0 1 1 0 2 2 3 -> collapsed len 3
    # utt 1: all blank within elen=3 -> est 0 -> cap = margin
    lp = np.full((2, 7, 5), -10.0, np.float32)
    path0 = [0, 1, 1, 0, 2, 2, 3]
    for t, v in enumerate(path0):
        lp[0, t, v] = 0.0
    lp[1, :, 0] = 0.0
    caps = np.asarray(
        ctc_len_caps(cfg, jnp.asarray(lp), jnp.asarray([7, 3]))
    )
    assert caps[0] == int(np.ceil(1.5 * 3)) + 2
    assert caps[1] == 2


def test_packed_outputs_roundtrip():
    from emoasr_tpu.eval.decode import _pack_outputs, unpack_outputs

    rng = np.random.default_rng(0)
    # beam shapes (B, W, L)
    hyps = rng.integers(0, 30000, size=(3, 4, 9)).astype(np.int32)
    lens = rng.integers(1, 10, size=(3, 4)).astype(np.int32)
    scores = rng.normal(size=(3, 4)).astype(np.float32)
    scores[1, 2] = -1e30  # DEAD must survive the bitcast exactly
    packed = np.asarray(
        _pack_outputs(jnp.asarray(hyps), jnp.asarray(lens), jnp.asarray(scores))
    )
    h, l, s = unpack_outputs(packed)
    np.testing.assert_array_equal(h, hyps)
    np.testing.assert_array_equal(l, lens)
    np.testing.assert_array_equal(s, scores)
    # greedy shapes (B, L) -> W=1
    g_hyps = rng.integers(0, 100, size=(2, 6)).astype(np.int32)
    g_lens = np.asarray([4, 6], np.int32)
    g_scores = np.zeros((2,), np.float32)
    packed = np.asarray(
        _pack_outputs(
            jnp.asarray(g_hyps), jnp.asarray(g_lens), jnp.asarray(g_scores)
        )
    )
    h, l, s = unpack_outputs(packed)
    assert h.shape == (2, 1, 6)
    np.testing.assert_array_equal(h[:, 0], g_hyps)
    np.testing.assert_array_equal(l[:, 0], g_lens)


def test_row_caps_w1_eos_hungry_still_decodes():
    """beam_width=1 + an eos-hungry model: a step-0 eos is always
    rejected as 'only eos' and at W=1 that killed the whole row.  With
    row_caps active the search masks the (always-rejected) step-0 eos
    candidate so the single beam survives to produce a hypothesis."""
    dec = _ref_decoder(19)
    with torch.no_grad():
        dec.output.bias[2] += 25.0  # eos wins every step
    mine, variables, cfg = _mine_from_ref(dec)
    rng = np.random.default_rng(19)
    B, T = 2, 8
    eouts = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    elens = jnp.asarray([8, 6])

    def step_fn(h, l, eo, el):
        emask = make_pad_mask(el, T)[:, None, None, :]
        return mine.apply(
            variables, h, l, eo, emask,
            method=TransformerDecoder.forward_one_step,
        )

    hyps, lens, scores = map(
        np.asarray,
        attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=1,
            len_weight=0.1, max_decode_ylen=12,
            row_caps=jnp.asarray([6, 6]),
        ),
    )
    assert (scores[:, 0] > -1e29).all(), scores
    # after the masked first step eos wins immediately: 1 real token
    for b in range(B):
        h = hyps[b, 0, 1 : lens[b, 0]]
        assert len(h) >= 1 and h[0] != 2, h
