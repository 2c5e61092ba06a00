"""One-time measurement of the REFERENCE's decode RTF on this machine's CPU.

Protocol = the reference's own runtime mode (`asr/test_asr.py:226-263`):
torch CPU, single thread, per-utterance batch-1 decoding, RTF = decode
wall-time / audio seconds (10 ms frames).  Measured at the same model sizes
as tools/bench_decode.py / bench.py so `vs_baseline` in BENCH_r*.json is an
apples-to-apples protocol comparison (the reference's only published RTF is
CTC greedy 0.0033, `asr/correct/README.md:55-58` — this script re-derives
the rest).

Run once: `python tools/measure_ref_rtf.py [--quick]`; paste the printed
constants into bench.py.
"""

import argparse
import sys
import time
import types
from collections import namedtuple

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

if "warp_rnnt" not in sys.modules:  # CUDA-only; decode never calls it
    stub = types.ModuleType("warp_rnnt")
    stub.__version__ = "stub"
    stub.rnnt_loss = None
    sys.modules["warp_rnnt"] = stub


def P(**kw):
    return namedtuple("Params", kw.keys())(**kw)


ENC = dict(
    input_layer="conv2d", feat_dim=80, num_framestacks=1,
    enc_num_attention_heads=4, enc_num_layers=12, dropout_enc_rate=0.0,
    dropout_attn_rate=0.0,
)


def measure(model, T, n_utts, decode_kw):
    torch.manual_seed(0)
    xs = [torch.randn(1, T, 80) for _ in range(n_utts)]
    xlens = torch.tensor([T])
    model.eval()
    with torch.no_grad():
        model.decode(xs[0], xlens, **decode_kw)  # warm
        t0 = time.perf_counter()
        for x in xs:
            model.decode(x, xlens, **decode_kw)
        dt = time.perf_counter() - t0
    rtf = dt / (n_utts * T * 0.01)
    return rtf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer/shorter utts")
    args = ap.parse_args()
    torch.set_num_threads(1)  # the reference's CPU protocol
    T = 500 if args.quick else 1000
    N = 2 if args.quick else 5

    from asr.modeling.asr import ASR

    out = {}

    # L1 CTC(Transformer) 20M — greedy and prefix beam W=8
    m = ASR(P(
        encoder_type="transformer", decoder_type="ctc", pos_encode_type="abs",
        enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=10000,
        blank_id=0, eos_id=2, kd_weight=0.0, mtl_phone_ctc_weight=0.0,
        mtl_inter_ctc_weight=0.0, **ENC,
    ), phase="test")
    out["ctc_greedy_L1"] = measure(m, T, N, dict(beam_width=1))
    out["ctc_beam8_L1"] = measure(m, T, max(1, N // 2),
                                  dict(beam_width=8, len_weight=2.0))

    # T5-class RNN-T(Conformer) — greedy and ALSD beam W=10
    m = ASR(P(
        encoder_type="conformer", decoder_type="rnn_transducer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, vocab_size=1000, blank_id=0, eos_id=2,
        kd_weight=0.0, mtl_ctc_weight=0.0, embedding_size=128,
        dropout_emb_rate=0.0, dropout_dec_rate=0.0, dec_hidden_size=512,
        dec_num_layers=1, joint_hidden_size=512, **ENC,
    ), phase="test")
    out["rnnt_greedy_T5"] = measure(m, T, N, dict(beam_width=1))
    out["rnnt_beam10_T5"] = measure(m, T, max(1, N // 2), dict(beam_width=10))

    # L3-class attention(Conformer) + joint CTC — label-sync beam W=10
    m = ASR(P(
        encoder_type="conformer", decoder_type="transformer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, vocab_size=10000, blank_id=0, eos_id=2,
        kd_weight=0.0, mtl_ctc_weight=0.3, lsm_prob=0.0,
        loss_normalize_length=False, loss_normalize_batch=True,
        max_decode_ylen=64, dec_hidden_size=256, dec_num_attention_heads=4,
        dec_num_layers=6, dec_intermediate_size=2048, dropout_dec_rate=0.0,
        **ENC,
    ), phase="test")
    out["att_beam10_ctc_L3"] = measure(
        m, T, max(1, N // 2),
        dict(beam_width=10, len_weight=2.0, decode_ctc_weight=0.3),
    )

    # BERT PLL n-best rescoring — the reference's --runtime protocol
    # (`rescore/test_rescore_grid.py:120-145`: BATCH_SIZE=1, RTF =
    # scoring wall / wavtime).  12M-class BERT (lm/README.md), 5 hyps of
    # ~20 tokens per 10 s utterance.
    import pandas as pd

    import asr.rescore.test_rescore_grid as rg
    from lm.modeling.lm import LM

    lm = LM(P(
        lm_type="bert", vocab_size=10000, hidden_size=512, num_layers=4,
        num_attention_heads=8, intermediate_size=2048, max_seq_len=256,
        mask_id=9999,  # 256 positions: untrained CTC can emit ~T/4 tokens
    ), phase="test").eval()
    rng = np.random.default_rng(0)
    n_utts = 4 if args.quick else 10
    rows = []
    for i in range(n_utts):
        for _ in range(5):
            hyp = rng.integers(3, 9999, size=20)
            rows.append(dict(
                utt_id=f"s-u{i}-0-{T * 10}",
                token_id=" ".join(map(str, hyp)),
            ))
    df = pd.DataFrame(rows)
    rg.BATCH_SIZE = 1  # its runtime mode
    rg.score_lm(df.head(5).copy(), lm, torch.device("cpu"))  # warm
    t0 = time.perf_counter()
    rg.score_lm(df.copy(), lm, torch.device("cpu"))
    out["rescore_bert"] = (time.perf_counter() - t0) / (n_utts * T * 0.01)

    # mask-and-fill correction — `test_asr_correct.py` protocol: batch-1
    # greedy CTC + aggregate_logits + BERT fill (published RTF 0.0094,
    # asr/correct/README.md:55-58).
    import types as _types

    if "git" not in sys.modules:
        sys.modules["git"] = _types.ModuleType("git")
    from asr.test_asr_correct import aggregate_logits

    asr_m = ASR(P(
        encoder_type="transformer", decoder_type="ctc", pos_encode_type="abs",
        enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=10000,
        blank_id=0, eos_id=2, kd_weight=0.0, mtl_phone_ctc_weight=0.0,
        mtl_inter_ctc_weight=0.0, **ENC,
    ), phase="test").eval()

    def correct_one(x):
        with torch.no_grad():
            hyps, _, logits, aligns = asr_m.decode(
                x, torch.tensor([x.shape[1]]), beam_width=0, len_weight=0
            )
            hyp = np.array(hyps[0])
            if len(hyp) < 1:
                return []
            tp, tv = aggregate_logits(logits[0], aligns[0], blank_id=0)
            mask_idx = tv < 0.9
            hyp_masked = hyp.copy()
            hyp_masked[mask_idx] = 9999
            lm_logits = lm(torch.tensor(hyp_masked)[None])
            lm_probs = torch.softmax(lm_logits[0], dim=-1).numpy()
            mix = 0.5 * tp[:, :10000] + 0.5 * lm_probs[:, :10000]
            y = np.argmax(mix, -1)
            hyp_cor = hyp.copy()
            hyp_cor[mask_idx] = y[mask_idx]
            return [t for t in hyp_cor if t != 0]

    xs = [torch.randn(1, T, 80) for _ in range(max(2, N))]
    correct_one(xs[0])  # warm
    t0 = time.perf_counter()
    for x in xs:
        correct_one(x)
    out["correct_bert"] = (time.perf_counter() - t0) / (len(xs) * T * 0.01)

    print("\n# measured reference CPU RTFs (torch 1 thread, batch-1):")
    for k, v in out.items():
        print(f'REF_RTF["{k}"] = {v:.5f}')


if __name__ == "__main__":
    main()
