"""CTC prefix beam with RNNLM shallow fusion vs a host oracle.

The oracle transcribes the reference algorithm (ctc.py:203-344) with the
documented fix: each candidate's score_lm adds exactly its own token's LM
log-prob (the reference accumulates across a parent's top-k candidates
in-place, ctc.py:309-310)."""

import numpy as np

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.lm.lm import RNNLM
from emoasr_tpu.search.common import LMFusion, make_lm_fusion
from emoasr_tpu.search.ctc_beam import ctc_beam_search

LOG_0 = -1e10


def _oracle(lp, W, lm_predict, lm_w, len_w, eos=2, blank=0):
    T, V = lp.shape
    beams = [
        dict(hyp=[eos], p_b=0.0, p_nb=LOG_0, score_asr=0.0, score_lm=0.0,
             score_len=0.0, states=None)
    ]
    for t in range(T):
        new_beams = []
        v_top = np.argsort(-lp[t])[:W]

        hyps = [b["hyp"] for b in beams]
        lens = [len(h) for h in hyps]
        states = [b["states"] for b in beams]
        lm_logp, new_states = lm_predict(hyps, lens, states)

        for bi, b in enumerate(beams):
            hyp = b["hyp"]
            # case 1
            n_p_b = np.logaddexp(
                b["p_b"] + lp[t, blank], b["p_nb"] + lp[t, blank]
            )
            n_p_nb = b["p_nb"] + lp[t, hyp[-1]] if len(hyp) > 1 else LOG_0
            asr = np.logaddexp(n_p_b, n_p_nb)
            new_beams.append(
                dict(hyp=hyp, p_b=n_p_b, p_nb=n_p_nb, score_asr=asr,
                     score_lm=b["score_lm"], score_len=b["score_len"],
                     states=b["states"])
            )
            # case 2
            for v in v_top:
                if v == blank:
                    continue
                p_t = lp[t, v]
                v_prev = hyp[-1] if len(hyp) > 1 else None
                if v == v_prev:
                    n_p_nb = b["p_b"] + p_t
                else:
                    n_p_nb = np.logaddexp(b["p_b"] + p_t, b["p_nb"] + p_t)
                asr = n_p_nb
                score_len = len_w * len([x for x in hyp if x != eos] + [v])
                score_lm = b["score_lm"] + lm_w * lm_logp[bi][v]
                new_beams.append(
                    dict(hyp=hyp + [int(v)], p_b=LOG_0, p_nb=n_p_nb,
                         score_asr=asr, score_lm=score_lm,
                         score_len=score_len, states=new_states[bi])
                )
        # merge
        merged = {}
        for b in new_beams:
            k = tuple(b["hyp"])
            if k in merged:
                m = merged[k]
                m["p_b"] = np.logaddexp(m["p_b"], b["p_b"])
                m["p_nb"] = np.logaddexp(m["p_nb"], b["p_nb"])
                m["score_asr"] = np.logaddexp(m["score_asr"], b["score_asr"])
            else:
                merged[k] = b
        beams = sorted(
            merged.values(),
            key=lambda x: x["score_asr"] + x["score_lm"] + x["score_len"],
            reverse=True,
        )[:W]
    return beams


def test_ctc_beam_rnnlm_fusion_matches_oracle():
    V, W, T = 10, 3, 10
    cfg = config_from_dict(
        dict(lm_type="rnn", vocab_size=V, embedding_size=8, hidden_size=12,
             num_layers=1, dropout_rate=0.0)
    )
    lm = RNNLM(cfg)
    rng = np.random.default_rng(0)
    variables = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32), jnp.array([2])
    )

    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.normal(size=(T, V)) * 2), -1),
        np.float32,
    )

    def lm_predict(hyps, lens, states):
        out_lp, out_states = [], []
        for h, l, s in zip(hyps, lens, states):
            ys = jnp.asarray([h], jnp.int32)
            st = s if s is not None else lm.apply(
                variables, 1, method=RNNLM.zero_states
            )
            p, ns = lm.apply(
                variables, ys, jnp.asarray([l]), st, method=RNNLM.predict
            )
            out_lp.append(np.asarray(p)[0])
            out_states.append(ns)
        return out_lp, out_states

    oracle = _oracle(lp, W, lm_predict, lm_w=0.5, len_w=0.2)

    fusion = make_lm_fusion(lm, variables, weight=0.5)
    hyps, lens, scores = ctc_beam_search(
        jnp.asarray(lp)[None], jnp.asarray([T]), beam_width=W,
        len_weight=0.2, lm=fusion,
    )
    hyps, lens, scores = map(np.asarray, (hyps, lens, scores))
    got = {
        tuple(hyps[0, w, : lens[0, w]].tolist()): scores[0, w]
        for w in range(W)
    }
    want = {
        tuple(b["hyp"]): b["score_asr"] + b["score_lm"] + b["score_len"]
        for b in oracle
    }
    assert set(got) == set(want), (got, want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-4)


def test_rnnt_beam_rnnlm_fusion_states_thread():
    """RNN-LM fusion in the ALSD beam must carry states along hypotheses
    (regression: states were reset to zero each round)."""
    from emoasr_tpu.models.decoders.rnnt import RNNTDecoder
    from emoasr_tpu.search.rnnt_beam import rnnt_beam_search

    cfg = config_from_dict(
        dict(
            decoder_type="rnn_transducer", vocab_size=10, enc_hidden_size=12,
            dec_hidden_size=12, dec_num_layers=1, embedding_size=8,
            joint_hidden_size=12,
        )
    )
    dec = RNNTDecoder(cfg)
    lm_cfg = config_from_dict(
        dict(lm_type="rnn", vocab_size=10, embedding_size=8, hidden_size=12,
             num_layers=1, dropout_rate=0.0)
    )
    lm = RNNLM(lm_cfg)
    rng = np.random.default_rng(4)
    B, T, E = 2, 6, 12
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    elens = jnp.asarray([6, 4])

    def _init_all(mdl, tokens, e_t):
        d, _ = mdl.recurrency(tokens, None)
        return mdl.joint_step(e_t, d[:, 0])

    dvars = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32),
                     jnp.zeros((1, E)), method=_init_all)
    lvars = lm.init(jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32),
                    jnp.asarray([2]))

    def rec(tok, ds):
        d, s = dec.apply(dvars, tok, ds, method=RNNTDecoder.recurrency)
        return d[:, 0], s

    def joint(e, d):
        return dec.apply(dvars, e, d, method=RNNTDecoder.joint_step)

    fusion = make_lm_fusion(lm, lvars, weight=0.4)
    hyps, lens, scores = rnnt_beam_search(
        eouts, elens, rec, joint, num_layers=1, dec_hidden=12, beam_width=2,
        vocab_size=10, lm=fusion,
    )
    assert bool(jnp.isfinite(scores[:, 0]).all())
    # with fusion off, scores must differ (LM actually contributes)
    h2, l2, s2 = rnnt_beam_search(
        eouts, elens, rec, joint, num_layers=1, dec_hidden=12, beam_width=2,
        vocab_size=10, lm=None,
    )
    assert not np.allclose(np.asarray(scores), np.asarray(s2))


def _stateless_transformer_fusion(lm, variables, weight):
    """The round-1 O(L·prefix) fusion path: full-prefix re-encode per step
    (kept as the equivalence oracle for the KV-cached path)."""
    from emoasr_tpu.models.lm.lm import TransformerLM

    def predict_beams(hyps, lens, states):
        B, W, L = hyps.shape
        logp, _ = lm.apply(
            variables, hyps.reshape(B * W, L), lens.reshape(B * W), None,
            method=TransformerLM.predict,
        )
        return logp.reshape(B, W, -1), states

    return LMFusion(predict_beams, lambda B, W: None, weight)


def test_transformer_lm_predict_step_matches_predict():
    """KV-cached incremental predict == stateless full-prefix predict at
    every position."""
    from emoasr_tpu.models.lm.lm import TransformerLM

    V, L = 12, 7
    cfg = config_from_dict(
        dict(lm_type="transformer", vocab_size=V, hidden_size=16,
             num_layers=2, num_attention_heads=2, intermediate_size=32,
             max_seq_len=16, dropout_rate=0.0)
    )
    lm = TransformerLM(cfg)
    rng = np.random.default_rng(7)
    ys = rng.integers(2, V, size=(3, L)).astype(np.int32)
    variables = lm.init(
        jax.random.PRNGKey(0), jnp.asarray(ys), jnp.full((3,), L, jnp.int32)
    )
    caches = lm.apply(variables, 3, 16, method=TransformerLM.init_cache)
    for i in range(L):
        step_lp, caches = lm.apply(
            variables, jnp.asarray(ys[:, i]), jnp.full((3,), i, jnp.int32),
            caches, method=TransformerLM.predict_step,
        )
        full_lp, _ = lm.apply(
            variables, jnp.asarray(ys[:, : i + 1]),
            jnp.full((3,), i + 1, jnp.int32), None,
            method=TransformerLM.predict,
        )
        np.testing.assert_allclose(
            np.asarray(step_lp), np.asarray(full_lp), atol=2e-5, rtol=2e-5
        )


def test_ctc_beam_cached_transformer_fusion_matches_stateless():
    """The cached fusion must leave CTC prefix beam output unchanged."""
    from emoasr_tpu.models.lm.lm import TransformerLM

    V, W, T = 10, 3, 12
    cfg = config_from_dict(
        dict(lm_type="transformer", vocab_size=V, hidden_size=16,
             num_layers=2, num_attention_heads=2, intermediate_size=32,
             max_seq_len=32, dropout_rate=0.0)
    )
    lm = TransformerLM(cfg)
    variables = lm.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 2), jnp.int32),
        jnp.asarray([2])
    )
    rng = np.random.default_rng(5)
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.normal(size=(2, T, V)) * 2), -1),
        np.float32,
    )
    elens = jnp.asarray([T, T - 4])

    cached = make_lm_fusion(lm, variables, weight=0.5, mode="cached")
    stateless = _stateless_transformer_fusion(lm, variables, weight=0.5)

    out_c = ctc_beam_search(
        jnp.asarray(lp), elens, beam_width=W, len_weight=0.2, lm=cached
    )
    out_s = ctc_beam_search(
        jnp.asarray(lp), elens, beam_width=W, len_weight=0.2, lm=stateless
    )
    for a, b, name in zip(out_c, out_s, ("hyps", "lens", "scores")):
        if name == "scores":
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_step_indirect_matches_gathered_cached():
    """Ancestor-indirect LM steps == gather-then-predict_step, over a
    random label-sync episode (every slot extends each step, random
    parent permutations between steps)."""
    from emoasr_tpu.models.lm.lm import TransformerLM
    from emoasr_tpu.search.common import gather_beams

    B, W, Lc, V = 2, 4, 9, 12
    cfg = config_from_dict(
        dict(lm_type="transformer", vocab_size=V, hidden_size=16,
             num_layers=2, num_attention_heads=2, intermediate_size=32,
             max_seq_len=32, dropout_rate=0.0)
    )
    lm = TransformerLM(cfg)
    lvars = lm.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )
    rng = np.random.default_rng(11)

    flat0 = lm.apply(lvars, B * W, Lc, method=TransformerLM.init_cache)
    # gathered-reference carry: (B, W, ...) caches, physically permuted
    ref = jax.tree_util.tree_map(
        lambda x: x.reshape((B, W) + x.shape[1:]), flat0
    )
    # indirect carry: physical caches + ancestor table
    ind = jax.tree_util.tree_map(
        lambda x: x.reshape((B, W) + x.shape[1:]), flat0
    )
    anc = jnp.zeros((B, W, Lc), jnp.int32)
    bidx = jnp.arange(B)[:, None]
    widx = jnp.arange(W)[None, :]

    for step in range(Lc - 1):
        if step > 0:  # beam reindex between steps
            parent = jnp.asarray(rng.integers(0, W, size=(B, W)), jnp.int32)
            ref = gather_beams(ref, parent)
            anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
        tokens = jnp.asarray(rng.integers(3, V, size=(B, W)), jnp.int32)
        pos = jnp.full((B, W), step, jnp.int32)

        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((B * W,) + x.shape[2:]), ref
        )
        logp_ref, flat = lm.apply(
            lvars, tokens.reshape(-1), pos.reshape(-1), flat,
            method=TransformerLM.predict_step,
        )
        ref = jax.tree_util.tree_map(
            lambda x: x.reshape((B, W) + x.shape[1:]), flat
        )

        anc = anc.at[bidx, widx, pos].set(jnp.broadcast_to(widx, (B, W)))
        logp_ind, ind = lm.apply(
            lvars, tokens, pos, ind, anc,
            method=TransformerLM.predict_step_indirect,
        )
        np.testing.assert_allclose(
            np.asarray(logp_ind).reshape(B * W, V),
            np.asarray(logp_ref),
            atol=2e-5, rtol=2e-5,
            err_msg=f"step {step}",
        )


def test_attention_beam_cached_transformer_fusion_matches_stateless():
    from emoasr_tpu.config import config_from_dict as cfd
    from emoasr_tpu.models.decoders.transformer import TransformerDecoder
    from emoasr_tpu.search.attention_beam import attention_beam_search
    from emoasr_tpu.models.lm.lm import TransformerLM

    V, W = 10, 3
    dcfg = cfd(
        dict(decoder_type="transformer", vocab_size=V, enc_hidden_size=12,
             dec_hidden_size=12, dec_num_attention_heads=2, dec_num_layers=1,
             dec_intermediate_size=24, dropout_dec_rate=0.0,
             dropout_attn_rate=0.0, max_decode_ylen=8)
    )
    dec = TransformerDecoder(dcfg)
    rng = np.random.default_rng(6)
    B, T, E = 2, 6, 12
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    elens = jnp.asarray([6, 5])
    ys0 = jnp.full((B, 3), 2, jnp.int32)
    dvars = dec.init(
        jax.random.PRNGKey(0), eouts, elens, None, ys0[:, :2],
        jnp.full((B,), 2, jnp.int32), ys0, ys0,
    )

    lm_cfg = cfd(
        dict(lm_type="transformer", vocab_size=V, hidden_size=16,
             num_layers=1, num_attention_heads=2, intermediate_size=32,
             max_seq_len=32, dropout_rate=0.0)
    )
    lm = TransformerLM(lm_cfg)
    lvars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )

    def step_fn(ys_in, ylens, eouts_rep, elens_rep):
        return dec.apply(
            dvars, ys_in, ylens, eouts_rep,
            method=TransformerDecoder.forward_one_step,
        )

    W_ = W

    outs = {}
    for name, fusion in (
        ("cached", make_lm_fusion(lm, lvars, weight=0.4, mode="cached")),
        ("indirect", make_lm_fusion(lm, lvars, weight=0.4, mode="indirect")),
        ("stateless", _stateless_transformer_fusion(lm, lvars, weight=0.4)),
    ):
        outs[name] = attention_beam_search(
            eouts, elens, step_fn, vocab_size=V, beam_width=W_, eos_id=2,
            blank_id=0, len_weight=0.1, lm=fusion, max_decode_ylen=8,
        )
    for variant in ("cached", "indirect"):
        for a, b, name in zip(outs[variant], outs["stateless"],
                              ("hyps", "lens", "scores")):
            if name == "scores":
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                    err_msg=variant,
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=variant
                )
