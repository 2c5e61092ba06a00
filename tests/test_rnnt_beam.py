"""ALSD RNN-T beam search vs a host-side oracle that replicates the
reference algorithm (rnn_transducer.py:242-325) with Python dict beams,
sharing the exact same prediction/joint functions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.decoders.rnnt import RNNTDecoder
from emoasr_tpu.search.rnnt_beam import NUM_EXPANDS, rnnt_beam_search


def _oracle_alsd(eouts_b, T, recurrency, joint, W, V, layers, H, eos=2):
    """Direct transcription of the reference's dict-based ALSD loop."""
    beams = [
        {
            "hyp": [eos],
            "score": 0.0,
            "dstate": np.zeros((layers, 2, 1, H), np.float32),
        }
    ]

    def merge(bs):
        out = {}
        for b in bs:
            key = tuple(b["hyp"])
            if key in out:
                out[key]["score"] = np.logaddexp(out[key]["score"], b["score"])
            else:
                out[key] = b
        return list(out.values())

    for t in range(T):
        new_beams = []
        beams_v = beams[:]
        for v in range(NUM_EXPANDS):
            ys = np.array([[b["hyp"][-1]] for b in beams_v])
            ds = np.concatenate([b["dstate"] for b in beams_v], axis=2)
            douts, new_ds = recurrency(ys, ds)
            logits = joint(
                np.repeat(eouts_b[t : t + 1], len(beams_v), 0), douts[:, 0]
            )
            sa = jax.nn.log_softmax(jnp.asarray(logits), -1)
            sa = np.asarray(sa)

            for i, b in enumerate(beams_v):
                nb = dict(b)
                nb["score"] = b["score"] + sa[i, 0]
                new_beams.append(nb)

            for i, b in enumerate(beams_v):
                beams_v[i] = dict(b, dstate=new_ds[:, :, i : i + 1])

            if v < NUM_EXPANDS - 1:
                cands = []
                for i, b in enumerate(beams_v):
                    top = np.argsort(-sa[i, 1:])[:W] + 1
                    for tok in top:
                        cands.append(
                            {
                                "hyp": b["hyp"] + [int(tok)],
                                "score": b["score"] + sa[i, tok],
                                "dstate": b["dstate"],
                            }
                        )
                cands = sorted(cands, key=lambda x: x["score"], reverse=True)
                cands = merge(cands)
                beams_v = cands[:W]

        new_beams = sorted(new_beams, key=lambda x: x["score"], reverse=True)
        new_beams = merge(new_beams)
        beams = new_beams[:W]

    return beams


@pytest.mark.parametrize("seed", [0, 1])
def test_rnnt_beam_matches_oracle(seed):
    cfg = config_from_dict(
        dict(
            decoder_type="rnn_transducer",
            vocab_size=12,
            enc_hidden_size=16,
            dec_hidden_size=16,
            dec_num_layers=1,
            embedding_size=8,
            joint_hidden_size=16,
            eos_id=2,
            blank_id=0,
        )
    )
    dec = RNNTDecoder(cfg)
    rng = np.random.default_rng(seed)
    T, E = 6, 16
    eouts = rng.normal(size=(1, T, E)).astype(np.float32) * 0.5

    def _init_all(mdl, tokens, e_t):
        d, _ = mdl.recurrency(tokens, None)
        return mdl.joint_step(e_t, d[:, 0])

    variables = dec.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, E)),
        method=_init_all,
    )

    def recurrency(tokens, dstates):
        d, s = dec.apply(
            variables, jnp.asarray(tokens), jnp.asarray(dstates),
            method=RNNTDecoder.recurrency,
        )
        return np.asarray(d), np.asarray(s)

    def joint(e_t, d_t):
        return np.asarray(
            dec.apply(
                variables, jnp.asarray(e_t), jnp.asarray(d_t),
                method=RNNTDecoder.joint_step,
            )
        )

    W = 3
    oracle = _oracle_alsd(
        eouts[0], T, recurrency, joint, W, 12, 1, 16
    )

    def jrec(tokens, dstates):
        return dec.apply(
            variables, tokens, dstates, method=RNNTDecoder.recurrency
        )

    def jjoint(e, d):
        return dec.apply(variables, e, d, method=RNNTDecoder.joint_step)

    hyps, lens, scores = rnnt_beam_search(
        jnp.asarray(eouts), jnp.asarray([T]),
        lambda tok, ds: (jrec(tok, ds)[0][:, 0], jrec(tok, ds)[1]),
        jjoint,
        num_layers=1, dec_hidden=16, beam_width=W, vocab_size=12,
    )
    hyps, lens, scores = map(np.asarray, (hyps, lens, scores))
    got = {
        tuple(hyps[0, w, : lens[0, w]].tolist()): scores[0, w]
        for w in range(W)
    }
    want = {tuple(b["hyp"]): b["score"] for b in oracle}
    assert set(got.keys()) == set(want.keys()), (got, want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-4)


def test_rnnt_beam_batched_and_jitted():
    cfg = config_from_dict(
        dict(
            decoder_type="rnn_transducer",
            vocab_size=10,
            enc_hidden_size=12,
            dec_hidden_size=12,
            dec_num_layers=1,
            embedding_size=8,
            joint_hidden_size=12,
        )
    )
    dec = RNNTDecoder(cfg)
    rng = np.random.default_rng(2)
    B, T, E = 3, 8, 12
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    elens = jnp.array([8, 5, 3])
    def _init_all(mdl, tokens, e_t):
        d, _ = mdl.recurrency(tokens, None)
        return mdl.joint_step(e_t, d[:, 0])

    variables = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, E)), method=_init_all,
    )

    def rec(tok, ds):
        d, s = dec.apply(variables, tok, ds, method=RNNTDecoder.recurrency)
        return d[:, 0], s

    def joint(e, d):
        return dec.apply(variables, e, d, method=RNNTDecoder.joint_step)

    f = jax.jit(
        lambda eo, el: rnnt_beam_search(
            eo, el, rec, joint, num_layers=1, dec_hidden=12, beam_width=3,
            vocab_size=10,
        )
    )
    hyps, lens, scores = f(eouts, elens)
    assert hyps.shape[:2] == (B, 3)
    assert bool(jnp.isfinite(scores[:, 0]).all())
    # batch row consistency vs single decode
    h1, l1, s1 = f(eouts[1:2], elens[1:2])
    np.testing.assert_allclose(
        np.asarray(s1)[0, 0], np.asarray(scores)[1, 0], rtol=1e-5
    )
