"""LM-integration checkpoint parity: the reference's three LM-integration
modes, driven end-to-end on IMPORTED reference checkpoints against the
reference's own implementations (round-2 verdict item 3).

1. Fused beam (the flagship L3-3 mode): reference Conformer-encoder
   attention ASR + reference TransformerLM, decoded with joint CTC
   (`decode_ctc_weight>0`) AND shallow fusion (`lm_weight>0`) through OUR
   real eval CLI vs the reference's own fused beam
   (`asr/test_asr.py:180-202` loads the LM; `transformer.py:222-244`
   fuses att+LM, pre-selects 1.5x candidates, re-scores with the CTC
   prefix delta — including its in-place aliasing that applies the LM
   with effective weight (2-w)*lm_weight).
2. N-best rescoring: reference `LM.score` (causal Transformer sum-NLL and
   BERT pseudo-likelihood) + `rescore` argmax/grid
   (`rescore/test_rescore_grid.py:30-78`) vs our `eval/rescore.py` CLI on
   the same n-best TSV and imported LM checkpoint.
3. Error correction: reference greedy-CTC -> `aggregate_logits` -> mask ->
   BERT fill (`test_asr_correct.py:75-152`; glue reimplemented here
   because the reference's `test_step` reads module-global `args`, but its
   own `aggregate_logits` and models are used) vs our `eval/correct.py`
   CLI on the same checkpoints.
"""

import os
import sys
import types

import numpy as np
import pandas as pd
import torch
import yaml

# path + warp_rnnt stub side effects
from tests.test_full_model_parity import (  # noqa: F401
    ENC_T,
    EP,
    FEAT,
    N_UTTS,
    P,
    T_FRAMES,
    V,
    _corpus,
    _save_ref_checkpoint,
    _write_conf,
)

# the reference correction script imports GitPython for run provenance
# (`test_asr_correct.py:11`); not needed for the functions under test
if "git" not in sys.modules:
    sys.modules["git"] = types.ModuleType("git")

LM_KW = dict(
    vocab_size=V, hidden_size=32, num_layers=2, num_attention_heads=4,
    intermediate_size=64, max_seq_len=32,
)


def _save_ref_lm(tmp_path, name, ref_lm, lm_type, mask_id=None):
    """Save the reference LM the way train_lm does (`model.ep{EP}`) and
    write an LM conf our `load_lm` can read."""
    conf_path = tmp_path / f"{name}.yaml"
    ckpt_dir = tmp_path / name / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    torch.save(ref_lm.state_dict(), ckpt_dir / f"model.ep{EP}")
    conf = dict(LM_KW, lm_type=lm_type, eos_id=2)
    if mask_id is not None:
        conf["mask_id"] = mask_id
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    return str(conf_path)


def _run_cli(conf_path, result_file, extra_argv):
    from emoasr_tpu.eval.test_asr import build_argparser
    from emoasr_tpu.eval.test_asr import test_main as run_test_main
    from emoasr_tpu.utils.paths import get_results_dir

    argv = ["-conf", conf_path, "-ep", str(EP)] + extra_argv
    args = build_argparser().parse_args(argv)
    assert run_test_main(args) is not None
    df = pd.read_table(
        os.path.join(get_results_dir(conf_path), result_file), comment="#"
    )
    return {
        r.utt_id: (None if pd.isna(r.token_id) else str(r.token_id))
        for r in df.itertuples()
    }


def test_fused_beam_joint_ctc_sf_checkpoint_parity(tmp_path):
    """L3-3 integration mode: imported reference ASR + imported reference
    TransformerLM, `decode_ctc_weight=0.3` + `lm_weight=0.5` +
    `len_weight=1.0`, our CLI vs the reference's own fused beam,
    hyp-for-hyp."""
    from asr.modeling.asr import ASR as RefASR
    from lm.modeling.lm import LM as RefLM
    from utils.converters import ints2str, strip_eos

    tsv, vocab, feats, utt_ids = _corpus(tmp_path, seed=5)
    torch.manual_seed(50)
    ref = RefASR(
        P(
            encoder_type="conformer", decoder_type="transformer",
            pos_encode_type="rel", vocab_size=V, blank_id=0, eos_id=2,
            kd_weight=0.0, mtl_phone_ctc_weight=0.0, mtl_inter_ctc_weight=0.0,
            mtl_ctc_weight=0.3, lsm_prob=0.0, loss_normalize_length=False,
            loss_normalize_batch=True, max_decode_ylen=6,
            dec_hidden_size=32, dec_num_attention_heads=4, dec_num_layers=2,
            dec_intermediate_size=64, dropout_dec_rate=0.0,
            **ENC_T,
        ),
        phase="test",
    ).eval()
    torch.manual_seed(51)
    ref_lm = RefLM(P(lm_type="transformer", **LM_KW), phase="test").eval()

    conf_path = _save_ref_checkpoint(tmp_path, "l33", ref)
    _write_conf(
        conf_path, tsv, vocab,
        encoder_type="conformer", decoder_type="transformer",
        pos_encode_type="rel", mtl_ctc_weight=0.3,
        enc_hidden_size=32, enc_num_attention_heads=4, enc_num_layers=2,
        enc_intermediate_size=64,
        dec_hidden_size=32, dec_num_attention_heads=4, dec_num_layers=2,
        dec_intermediate_size=64, max_decode_ylen=6,
        # this test pins the reference's cannot-decode semantics on an
        # untrained checkpoint; the best-effort forced finalization the
        # len cap adds is covered by test_attention_beam/test_eval_cli
        decode_len_cap="off",
    )
    lm_conf = _save_ref_lm(tmp_path, "l33lm", ref_lm, "transformer")

    # reference side: its own fused beam, batch-1 per utterance
    ref_hyps = []
    with torch.no_grad():
        for x in feats:
            hyps, _, _, _ = ref.decode(
                torch.tensor(x)[None], torch.tensor([x.shape[0]]),
                beam_width=4, len_weight=1.0, lm=ref_lm, lm_weight=0.5,
                decode_ctc_weight=0.3,
            )
            ref_hyps.append(
                ints2str(strip_eos(hyps[0], 2)) if len(hyps) >= 1 else None
            )

    ours = _run_cli(
        conf_path,
        f"result_test_beam4_len1.0_ctc0.3_lm0.50transformer_ep{EP}.tsv",
        [
            "--beam_width", "4", "--len_weight", "1.0",
            "--decode_ctc_weight", "0.3", "--lm_weight", "0.5",
            "--lm_conf", lm_conf, "--lm_ep", str(EP),
        ],
    )
    mismatches = [
        (u, r, ours[u])
        for u, r in zip(utt_ids, ref_hyps)
        if (r or None) != (ours[u] or None)
    ]
    assert not mismatches, mismatches


def _nbest_corpus(tmp_path, n_utts=4, n_best=3, seed=8):
    """Synthetic n-best TSV (utt_id/score_asr/token_id/text) + ref TSV."""
    rng = np.random.default_rng(seed)
    rows, ref_rows = [], []
    for i in range(n_utts):
        truth = rng.integers(3, V, size=int(rng.integers(3, 6)))
        ref_rows.append(
            dict(
                utt_id=f"spk-u{i}-{i * 1000}-{i * 1000 + 400}",
                text=" ".join(f"w{t}" for t in truth),
            )
        )
        for _ in range(n_best):
            # hyps are light perturbations of the truth (0-1 substitution,
            # maybe one insertion) so grid WERs are < 100% and the argmax
            # actually discriminates
            hyp = truth.copy()
            if rng.random() < 0.7:
                hyp[rng.integers(0, len(hyp))] = rng.integers(3, V)
            if rng.random() < 0.3:
                hyp = np.append(hyp, rng.integers(3, V))
            rows.append(
                dict(
                    utt_id=ref_rows[-1]["utt_id"],
                    score_asr=float(-rng.uniform(1, 20)),
                    token_id=" ".join(map(str, hyp)),
                    text=" ".join(f"w{t}" for t in hyp),
                )
            )
    nbest_tsv = tmp_path / "nbest.tsv"
    pd.DataFrame(rows).to_csv(nbest_tsv, sep="\t", index=False)
    ref_tsv = tmp_path / "ref.tsv"
    pd.DataFrame(ref_rows).to_csv(ref_tsv, sep="\t", index=False)
    return str(nbest_tsv), str(ref_tsv)


def _rescore_parity(tmp_path, lm_type, mask_id, torch_seed):
    """Shared body: reference score_lm+grid vs our rescore CLI."""
    from asr.rescore.test_rescore_grid import rescore as ref_rescore
    from asr.rescore.test_rescore_grid import score_lm as ref_score_lm
    from lm.modeling.lm import LM as RefLM

    from emoasr_tpu.eval.rescore import build_argparser, main

    nbest_tsv, ref_tsv = _nbest_corpus(tmp_path)
    torch.manual_seed(torch_seed)
    ref_lm = RefLM(
        P(lm_type=lm_type, mask_id=mask_id, **LM_KW), phase="test"
    ).eval()
    lm_conf = _save_ref_lm(tmp_path, f"rs_{lm_type}", ref_lm, lm_type, mask_id)

    # reference side (its grid loop, test_rescore_grid.py:166-185)
    df_ref = pd.read_table(nbest_tsv).dropna()
    dfref = pd.read_table(ref_tsv)
    df_ref = ref_score_lm(df_ref, ref_lm, torch.device("cpu"))
    best = (100.0, None, None, None)
    for lm_w in (0.2, 0.5, 0.8):
        for len_w in (0.0, 1.0):
            wer, _, df_best = ref_rescore(df_ref.copy(), dfref, lm_w, len_w)
            if wer < best[0]:
                best = (wer, lm_w, len_w, df_best)
    ref_wer, ref_lmw, ref_lenw, ref_best = best

    # our side: the real CLI on the same TSV + imported checkpoint
    args = build_argparser().parse_args(
        [
            nbest_tsv, "-ref", ref_tsv, "-lm_conf", lm_conf,
            "-lm_ep", str(EP),
            "--lm_min", "0.2", "--lm_max", "0.8", "--lm_step", "0.3",
            "--len_min", "0.0", "--len_max", "1.0", "--len_step", "1.0",
        ]
    )
    wer_min, lm_best, len_best = main(args)

    # per-hyp LM scores match the reference's torch implementation
    scored = pd.read_table(nbest_tsv.replace(".tsv", f"_{lm_type}.tsv"))
    np.testing.assert_allclose(
        scored["score_lm"].to_numpy(),
        df_ref["score_lm"].to_numpy(),
        rtol=1e-4, atol=1e-3,
    )
    # same grid optimum and same selected hypotheses (isclose: our grid
    # comes from np.arange, the reference loop above from literals)
    assert wer_min == ref_wer
    assert np.isclose(lm_best, ref_lmw) and np.isclose(len_best, ref_lenw)
    best_tsv = nbest_tsv.replace(
        ".tsv", f"_{lm_type}_lm{lm_best:.2f}_len{len_best:.2f}.tsv"
    )
    ours_best = pd.read_table(best_tsv)
    assert list(ours_best["token_id"]) == list(ref_best["token_id"])
    assert list(ours_best["utt_id"]) == list(ref_best["utt_id"])


def test_rescore_transformer_lm_checkpoint_parity(tmp_path):
    """Causal-LM rescoring (`TransformerLM.score`) vs the reference
    rescore grid on an imported checkpoint."""
    _rescore_parity(tmp_path, "transformer", None, torch_seed=60)


def test_rescore_bert_pll_checkpoint_parity(tmp_path):
    """BERT pseudo-likelihood rescoring (`BERTMaskedLM.score`, one masked
    copy per position) vs the reference on an imported checkpoint; ours
    scores all masked positions of a batch in one forward."""
    _rescore_parity(tmp_path, "bert", V - 1, torch_seed=61)


def test_correct_mask_fill_checkpoint_parity(tmp_path):
    """Error correction: imported reference CTC ASR + imported reference
    BERT through our `eval/correct.py` CLI vs the reference's own
    pipeline (`aggregate_logits` imported from `asr.test_asr_correct`;
    the mask/fill glue of `test_step:75-152` applied per utterance)."""
    from asr.modeling.asr import ASR as RefASR
    from asr.test_asr_correct import aggregate_logits as ref_aggregate
    from lm.modeling.lm import LM as RefLM
    from utils.converters import ints2str

    from emoasr_tpu.eval.correct import build_argparser, test_main
    from emoasr_tpu.utils.paths import get_results_dir

    MASK_TH, LM_W, MASK_ID = 0.5, 0.5, V - 1

    tsv, vocab, feats, utt_ids = _corpus(tmp_path, seed=6)
    torch.manual_seed(70)
    ref = RefASR(
        P(
            encoder_type="transformer", decoder_type="ctc",
            pos_encode_type="abs", vocab_size=V, blank_id=0, eos_id=2,
            kd_weight=0.0, mtl_phone_ctc_weight=0.0, mtl_inter_ctc_weight=0.0,
            **ENC_T,
        ),
        phase="test",
    ).eval()
    torch.manual_seed(71)
    ref_lm = RefLM(P(lm_type="bert", mask_id=MASK_ID, **LM_KW), phase="test").eval()

    conf_path = _save_ref_checkpoint(tmp_path, "corr", ref)
    _write_conf(
        conf_path, tsv, vocab,
        encoder_type="transformer", decoder_type="ctc",
        enc_hidden_size=32, enc_num_attention_heads=4, enc_num_layers=2,
        enc_intermediate_size=64,
    )
    lm_conf = _save_ref_lm(tmp_path, "corrlm", ref_lm, "bert", MASK_ID)

    # reference pipeline per utterance (test_asr_correct.py:96-152)
    ref_out = {}
    with torch.no_grad():
        for x, utt_id in zip(feats, utt_ids):
            hyps, _, logits, aligns = ref.decode(
                torch.tensor(x)[None], torch.tensor([x.shape[0]]),
                beam_width=0, len_weight=0,
            )
            hyp = np.array(hyps[0])
            if len(hyp) < 1:
                ref_out[utt_id] = None
                continue
            token_probs, token_probs_v = ref_aggregate(
                logits[0], aligns[0], blank_id=0
            )
            assert len(hyp) == len(token_probs_v)
            mask_indices = token_probs_v < MASK_TH
            hyp_masked = hyp.copy()
            hyp_masked[mask_indices] = MASK_ID
            lm_logits = ref_lm(torch.tensor(hyp_masked)[None])
            lm_probs = torch.softmax(lm_logits[0], dim=-1).numpy()
            mix = (1 - LM_W) * token_probs[:, :V] + LM_W * lm_probs[:, :V]
            y_gen = np.argmax(mix, axis=-1)
            hyp_cor = hyp.copy()
            hyp_cor[mask_indices] = y_gen[mask_indices]
            hyp_cor = [int(t) for t in hyp_cor if t != 0]
            ref_out[utt_id] = ints2str(hyp_cor) if hyp_cor else None

    args = build_argparser().parse_args(
        [
            "-conf", str(conf_path), "-ep", str(EP),
            "--lm_conf", lm_conf, "--lm_ep", str(EP),
            "--mask_th", str(MASK_TH), "--lm_weight", str(LM_W),
        ]
    )
    assert test_main(args) is not None
    out = os.path.join(
        get_results_dir(str(conf_path)),
        f"result_correct_test_th{MASK_TH:.2f}_lm{LM_W:.2f}_ep{EP}.tsv",
    )
    df = pd.read_table(out, comment="#")
    ours = {
        r.utt_id: (None if pd.isna(r.token_id) else str(r.token_id))
        for r in df.itertuples()
    }
    mismatches = [
        (u, ref_out[u], ours[u]) for u in utt_ids if ref_out[u] != ours[u]
    ]
    assert not mismatches, mismatches
