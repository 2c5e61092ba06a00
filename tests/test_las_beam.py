"""LAS beam search vs a transcribed oracle of the reference algorithm.

Oracle = `LASDecoder.decode` (`/root/reference/asr/modeling/decoders/
las.py:176-285`) reproduced as host Python over the SAME one-step decoder
(so numerics are shared and only the beam bookkeeping is under test):
per-beam top-W expansion, W*W pool pruned by cumulative score, eos
finalization with `len_weight * |hyp|` bonus, "only eos" rejection, stop at
beam_width results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.decoders.las import LASDecoder

CFG = dict(
    vocab_size=20,
    dec_hidden_size=24,
    dec_num_attention_heads=4,
    dec_num_layers=2,
    dec_intermediate_size=48,
    dropout_dec_rate=0.0,
    dropout_attn_rate=0.0,
    lsm_prob=0.1,
    enc_hidden_size=16,
    decoder_type="las",
    embedding_size=12,
    max_decode_ylen=10,
)


@pytest.fixture(scope="module")
def las():
    cfg = config_from_dict(CFG)
    dec = LASDecoder(cfg, attn_dim=20)
    rng = np.random.default_rng(3)
    B, T, E = 3, 9, 16
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    elens = jnp.asarray([9, 6, 8])
    ys = jnp.asarray(rng.integers(3, 20, (B, 4)))
    ys_in = jnp.pad(ys, ((0, 0), (1, 0)), constant_values=2)
    ys_out = jnp.pad(ys, ((0, 0), (0, 1)), constant_values=2)
    variables = dec.init(
        jax.random.PRNGKey(1), eouts, elens, None, ys,
        jnp.asarray([4, 3, 4]), ys_in, ys_out,
    )
    # bias eos up so untrained hypotheses actually finish within Lmax
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = variables["params"]
    params["output"]["bias"] = params["output"]["bias"].at[2].add(1.5)
    return cfg, dec, {"params": params}, eouts, elens


def _single_row_step(dec, variables, eouts_row, elen_row):
    """Eager one-hypothesis step fn sharing the module's numerics."""
    step, carry0 = dec.apply(
        variables, eouts_row, elen_row,
        method=lambda m, e, el: m._make_step(e, el),
    )
    return step, carry0


def _oracle(dec, variables, eouts_row, elen_row, V, W, eos, len_weight, L):
    """Transcribed reference beam loop (las.py:196-285), bs=1."""
    step, carry0 = _single_row_step(dec, variables, eouts_row, elen_row)
    beams = [dict(hyp=[eos], score=0.0, carry=carry0)]
    results = []
    for _ in range(L):
        new_beams = []
        for beam in beams:
            carry, logp = step(
                beam["carry"], jnp.asarray([beam["hyp"][-1]], jnp.int32)
            )
            lp = np.asarray(logp, np.float32)[0]
            for v in np.argsort(-lp)[:W]:
                new_beams.append(
                    dict(
                        score=beam["score"] + float(lp[v]),
                        hyp=beam["hyp"] + [int(v)],
                        carry=carry,
                    )
                )
        beams = sorted(new_beams, key=lambda x: -x["score"])[:W]
        beams_extend = []
        for beam in beams:
            if beam["hyp"][-1] == eos:
                noeos = [t for t in beam["hyp"] if t != eos]
                if len(noeos) < 1:
                    continue
                results.append(
                    dict(
                        hyp=noeos,
                        score=beam["score"] + len_weight * len(beam["hyp"]),
                    )
                )
                if len(results) >= W:
                    break
            else:
                beams_extend.append(beam)
        if len(results) >= W:
            break
        beams = beams_extend
    return sorted(results, key=lambda x: -x["score"])


@pytest.mark.parametrize("len_weight", [0.0, 0.4])
def test_las_beam_matches_reference_oracle(las, len_weight):
    cfg, dec, variables, eouts, elens = las
    W = 3
    hyps, lens, scores = jax.jit(
        lambda v, e, el: dec.apply(
            v, e, el, W, len_weight, method=LASDecoder.decode_beam
        )
    )(variables, eouts, elens)
    hyps, lens, scores = map(np.asarray, (hyps, lens, scores))

    for b in range(eouts.shape[0]):
        ref = _oracle(
            dec, variables, eouts[b : b + 1], elens[b : b + 1],
            cfg.vocab_size, W, cfg.eos_id, len_weight, cfg.max_decode_ylen,
        )
        got = []
        for w in range(W):
            if scores[b, w] < -1e29:
                continue
            h = hyps[b, w, : lens[b, w]].tolist()
            got.append(
                dict(
                    hyp=[t for t in h if t != cfg.eos_id],
                    score=float(scores[b, w]),
                )
            )
        assert len(got) == len(ref), (b, got, ref)
        for g, r in zip(got, ref):
            assert g["hyp"] == r["hyp"], (b, got, ref)
            np.testing.assert_allclose(g["score"], r["score"], rtol=1e-4)


def _oracle_lm(dec, variables, eouts_row, elen_row, fusion, V, W, eos,
               len_weight, L):
    """Reference beam loop with the LM hook implemented the way the
    reference sketches it (las.py:233-236 stub): candidate score =
    att_logp + lm_weight * lm_logp, LM state advance-on-extend."""
    step, carry0 = _single_row_step(dec, variables, eouts_row, elen_row)
    st0 = fusion.init_states(1, 1)
    beams = [dict(hyp=[eos], score=0.0, carry=carry0, lm=st0)]
    results = []
    for _ in range(L):
        new_beams = []
        for beam in beams:
            carry, logp = step(
                beam["carry"], jnp.asarray([beam["hyp"][-1]], jnp.int32)
            )
            lp = np.asarray(logp, np.float32)[0]
            hyp_arr = jnp.asarray(beam["hyp"], jnp.int32)[None, None, :]
            lens_arr = jnp.asarray([[len(beam["hyp"])]], jnp.int32)
            lm_lp, lm_st = fusion.predict_beams(hyp_arr, lens_arr, beam["lm"])
            lp = lp + float(fusion.weight) * np.asarray(
                lm_lp, np.float32
            )[0, 0]
            for v in np.argsort(-lp)[:W]:
                new_beams.append(
                    dict(
                        score=beam["score"] + float(lp[v]),
                        hyp=beam["hyp"] + [int(v)],
                        carry=carry,
                        lm=lm_st,
                    )
                )
        beams = sorted(new_beams, key=lambda x: -x["score"])[:W]
        beams_extend = []
        for beam in beams:
            if beam["hyp"][-1] == eos:
                noeos = [t for t in beam["hyp"] if t != eos]
                if len(noeos) < 1:
                    continue
                results.append(
                    dict(
                        hyp=noeos,
                        score=beam["score"] + len_weight * len(beam["hyp"]),
                    )
                )
                if len(results) >= W:
                    break
            else:
                beams_extend.append(beam)
        if len(results) >= W:
            break
        beams = beams_extend
    return sorted(results, key=lambda x: -x["score"])


@pytest.mark.parametrize("lm_type", ["transformer", "rnn"])
def test_las_beam_lm_fusion_matches_oracle(las, lm_type):
    """LM shallow fusion inside the LAS beam (the reference's stubbed
    hook, las.py:233-236, implemented first-class) vs the per-hyp oracle
    sharing the same fusion numerics."""
    from emoasr_tpu.models.lm.lm import LM as LMFacade
    from emoasr_tpu.search.common import make_lm_fusion

    cfg, dec, variables, eouts, elens = las
    lm_cfg = config_from_dict(
        dict(
            lm_type=lm_type, vocab_size=cfg.vocab_size, hidden_size=16,
            num_layers=1, num_attention_heads=2, intermediate_size=32,
            max_seq_len=16, dropout_rate=0.0, embedding_size=16,
        )
    )
    lmf = LMFacade(lm_cfg)
    lvars = lmf.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 3), jnp.int32),
        jnp.asarray([3]),
    )
    fusion = make_lm_fusion(
        lmf, lvars, 0.4, max_len=16,
        mode="stateless" if lm_type == "transformer" else "auto",
    )
    # the LAS search uses the standard (non-indirect) LMFusion protocol
    fusion = fusion._replace(indirect=None)
    W, len_weight = 3, 0.2

    hyps, lens, scores = jax.jit(
        lambda v, e, el: dec.apply(
            v, e, el,
            method=lambda m, e2, el2: m.decode_beam(
                e2, el2, W, len_weight, lm=fusion
            ),
        )
    )(variables, eouts, elens)
    hyps, lens, scores = map(np.asarray, (hyps, lens, scores))

    for b in range(eouts.shape[0]):
        ref = _oracle_lm(
            dec, variables, eouts[b : b + 1], elens[b : b + 1], fusion,
            cfg.vocab_size, W, cfg.eos_id, len_weight, cfg.max_decode_ylen,
        )
        got = []
        for w in range(W):
            if scores[b, w] < -1e29:
                continue
            h = hyps[b, w, : lens[b, w]].tolist()
            got.append(
                dict(
                    hyp=[t for t in h if t != cfg.eos_id],
                    score=float(scores[b, w]),
                )
            )
        assert len(got) == len(ref), (b, got, ref)
        for g, r in zip(got, ref):
            assert g["hyp"] == r["hyp"], (b, got, ref)
            np.testing.assert_allclose(g["score"], r["score"], rtol=1e-4)


def test_las_beam_width1_matches_greedy(las):
    cfg, dec, variables, eouts, elens = las
    ghyps, glens = jax.jit(
        lambda v, e, el: dec.apply(v, e, el, method=LASDecoder.decode_greedy)
    )(variables, eouts, elens)
    bhyps, blens, bscores = jax.jit(
        lambda v, e, el: dec.apply(
            v, e, el, 1, 0.0, method=LASDecoder.decode_beam
        )
    )(variables, eouts, elens)
    for b in range(eouts.shape[0]):
        g = np.asarray(ghyps)[b, : int(glens[b])].tolist()
        if float(np.asarray(bscores)[b, 0]) < -1e29:
            # beam rejected an empty (eos-first) hyp; greedy must agree
            assert g == []
            continue
        h = np.asarray(bhyps)[b, 0, : int(np.asarray(blens)[b, 0])].tolist()
        assert [t for t in h if t != cfg.eos_id] == g


def test_las_beam_via_build_decode_fn():
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR

    cfg = config_from_dict(
        dict(
            CFG,
            encoder_type="transformer",
            input_layer="linear",
            feat_dim=8,
            enc_num_attention_heads=2,
            enc_num_layers=1,
            enc_intermediate_size=32,
        )
    )
    model = ASR(cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    xlens = jnp.asarray([12, 9])
    ys = jnp.asarray(rng.integers(3, 20, (2, 3)))
    ys_in = jnp.pad(ys, ((0, 0), (1, 0)), constant_values=2)
    ys_out = jnp.pad(ys, ((0, 0), (0, 1)), constant_values=2)
    variables = model.init(
        jax.random.PRNGKey(0), xs, xlens, ys, jnp.asarray([3, 3]),
        ys_in, ys_out,
    )
    fn = build_decode_fn(model, variables, cfg, beam_width=3, len_weight=0.1)
    hyps, lens, scores = fn(xs, xlens)
    assert hyps.shape[:2] == (2, 3)
    assert lens.shape == (2, 3)
