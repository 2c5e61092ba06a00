"""Diagnostics: frame-level CTC probability dump + side-by-side WER diff.

Parity targets:
- `/root/reference/asr/analysis/analyse_ctc_prob.py:26-83` — top-k CTC
  probabilities per frame for one utterance.
- `/root/reference/asr/analysis/compare_wer.py:15-68` — per-utterance WER
  comparison between two result TSVs.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from emoasr_tpu.config import load_config
from emoasr_tpu.data.asr_dataset import ASRDataset
from emoasr_tpu.eval.test_asr import load_asr_variables
from emoasr_tpu.eval.wer import compute_wer
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.train.step import preprocess
from emoasr_tpu.utils.paths import get_model_path, rel_to_abs_path
from emoasr_tpu.utils.vocab import Vocab


def analyse_ctc_prob(conf: str, ep: str, utt_id: str, topk: int = 5,
                     data: Optional[str] = None):
    """Print per-frame top-k CTC probabilities for one utterance."""
    cfg = load_config(conf)
    model = ASR(cfg)
    variables = load_asr_variables(get_model_path(conf, ep), cfg)
    vocab = Vocab(rel_to_abs_path(cfg.vocab_path))
    dataset = ASRDataset(cfg, rel_to_abs_path(data or cfg.test_path), "test")

    idx = dataset.data.index[dataset.data["utt_id"] == utt_id]
    assert len(idx) == 1, f"utt {utt_id} not found"
    ex = dataset[int(idx[0])]
    xs = jnp.asarray(ex["x"])[None]
    xlens = jnp.asarray([ex["xlen"]])
    xs, xlens = preprocess(cfg, xs, xlens, None, False)
    eouts, elens, _ = model.apply(variables, xs, xlens, method=ASR.encode)
    logits = model.apply(variables, eouts, method=lambda m, e: m.decoder.logits(e))
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[0]), -1))

    lines = []
    for t in range(int(elens[0])):
        order = np.argsort(-probs[t])[:topk]
        lines.append(
            f"t={t:4d} | "
            + " | ".join(
                f"{vocab.id2token(int(v))}: {probs[t, v]:.3f}" for v in order
            )
        )
    print("\n".join(lines))
    return probs


def compare_wer(tsv1: str, tsv2: str, show_all: bool = False):
    """Per-utterance WER diff of two result TSVs (compare_wer.py:15-68)."""
    df1 = pd.read_table(tsv1, comment="#")
    df2 = pd.read_table(tsv2, comment="#")
    id2row = {r.utt_id: r for r in df2.itertuples()}
    rows = []
    for r1 in df1.itertuples():
        if r1.utt_id not in id2row:
            continue
        r2 = id2row[r1.utt_id]
        ref = str(r1.reftext).split()
        h1 = str(r1.text).split() if isinstance(r1.text, str) else []
        h2 = str(r2.text).split() if isinstance(r2.text, str) else []
        wer1, _ = compute_wer(h1, ref)
        wer2, _ = compute_wer(h2, ref)
        if show_all or abs(wer1 - wer2) > 1e-9:
            rows.append((r1.utt_id, wer1, wer2, " ".join(h1), " ".join(h2),
                         " ".join(ref)))
    out = pd.DataFrame(
        rows, columns=["utt_id", "wer1", "wer2", "hyp1", "hyp2", "ref"]
    )
    for r in out.itertuples():
        print(f"*** {r.utt_id}: {r.wer1:.1f} vs {r.wer2:.1f}")
        print(f"  hyp1: {r.hyp1}")
        print(f"  hyp2: {r.hyp2}")
        print(f"  ref : {r.ref}")
    return out


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("ctc_prob")
    p1.add_argument("-conf", required=True)
    p1.add_argument("-ep", required=True)
    p1.add_argument("-utt_id", required=True)
    p1.add_argument("--topk", type=int, default=5)
    p1.add_argument("--data", default=None)
    p2 = sub.add_parser("compare_wer")
    p2.add_argument("tsv1")
    p2.add_argument("tsv2")
    p2.add_argument("--all", action="store_true")
    args = parser.parse_args()
    if args.cmd == "ctc_prob":
        analyse_ctc_prob(args.conf, args.ep, args.utt_id, args.topk, args.data)
    else:
        compare_wer(args.tsv1, args.tsv2, args.all)


if __name__ == "__main__":
    main()
