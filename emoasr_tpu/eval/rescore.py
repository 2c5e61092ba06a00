"""N-best rescoring with LM scores + (lm_weight, len_weight) grid search.

Parity target: `/root/reference/asr/rescore/test_rescore_grid.py:30-213` —
`score_lm` adds a cached `score_lm` column to the n-best TSV (cache file
`*_{lm_tag}.tsv`), `rescore` picks the argmax of
`score_asr + lm_w * score_lm + len_w * ylen` per utterance, grid over both
weights, best TSV saved as `*_lm{w}_len{w}.tsv`; `--runtime` RTF mode.

TPU-first: hypotheses are scored in fixed-shape padded batches through the
jitted `LM.score` (one forward per batch; the BERT PLL path scores every
masked position of the whole batch in a single forward), replacing the
reference's 100-hyp host chunks.
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import time
from typing import List

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from emoasr_tpu.config import load_config
from emoasr_tpu.eval.test_asr import get_eval_path, load_lm
from emoasr_tpu.eval.wer import compute_wers_df, wer_info_line
from emoasr_tpu.models.lm.lm import LM
from emoasr_tpu.utils.converters import str2ints
from emoasr_tpu.utils.log import setup_logging
from emoasr_tpu.utils.paths import get_model_path

BATCH_SIZE = 128

# jitted LM.score per LM instance (avoid per-call retrace/compile)
_SCORE_FN_CACHE: dict = {}
EPS = 1e-5


def score_lm(
    df: pd.DataFrame,
    lm_model: LM,
    variables,
    max_len: int = 256,
    batch_size: int = BATCH_SIZE,
    num_samples: int = -1,
) -> pd.DataFrame:
    """Add a `score_lm` column: batched jitted LM.score over padded hyps.

    The jitted scorer is cached per LM instance and takes `variables` as
    an argument (a fresh `jax.jit` per call would recompile on every
    invocation — the --runtime mode repeats this function); hyp length is
    rounded up to a multiple of 16 so different n-best files reuse a
    small set of compiled shapes."""
    key = id(lm_model)
    if key not in _SCORE_FN_CACHE:
        _SCORE_FN_CACHE[key] = jax.jit(
            lambda v, ys, ylens: lm_model.apply(
                v, ys, ylens, method=LM.score
            )
        )
    jitted = _SCORE_FN_CACHE[key]

    def score_fn(ys, ylens):
        return jitted(variables, ys, ylens)

    token_lists: List[List[int]] = [
        str2ints(t) for t in df["token_id"].tolist()
    ]
    lens = np.asarray([len(t) for t in token_lists], np.int32)
    L = int(min(max(lens.max(), 1), max_len))
    L = min(((L + 15) // 16) * 16, max_len)

    scores = np.zeros(len(df), np.float32)
    n_utts = df["utt_id"].nunique()
    if num_samples > 0:
        keep_utts = set(df["utt_id"].unique()[:num_samples])
        idx_keep = df["utt_id"].isin(keep_utts).to_numpy().nonzero()[0]
    else:
        idx_keep = np.arange(len(df))

    for s in range(0, len(idx_keep), batch_size):
        idxs = idx_keep[s : s + batch_size]
        B = len(idxs)
        ys = np.zeros((batch_size, L), np.int32)
        yl = np.ones(batch_size, np.int32)
        for j, i in enumerate(idxs):
            t = token_lists[i][:L]
            ys[j, : len(t)] = t
            yl[j] = max(len(t), 1)
        out = np.asarray(score_fn(jnp.asarray(ys), jnp.asarray(yl)))
        scores[idxs] = out[:B]

    df = df.copy()
    df["score_lm"] = scores
    return df


def rescore(df: pd.DataFrame, dfref: pd.DataFrame, lm_weight, len_weight):
    """Pick the best-scoring hyp per utterance (test_rescore_grid.py:70-78)."""
    df = df.copy()
    df["ylen"] = df["token_id"].apply(lambda s: len(str(s).split()))
    df["score"] = (
        df["score_asr"] + lm_weight * df["score_lm"] + len_weight * df["ylen"]
    )
    df_best = df.loc[df.groupby("utt_id")["score"].idxmax(), :]
    df_best = df_best[["utt_id", "text", "token_id", "score_asr"]]
    wer, wer_dict = compute_wers_df(df_best, dfref)
    return wer, wer_dict, df_best


def grid_search(df, dfref, lm_range, len_range):
    best = (100.0, 0.0, 0.0, None)
    for lm_w in lm_range:
        for len_w in len_range:
            wer, wer_dict, df_result = rescore(df, dfref, lm_w, len_w)
            logging.info(
                f"lm_weight: {lm_w:.3f} len_weight: {len_w:.3f} - "
                f"{wer_info_line(wer, wer_dict)}"
            )
            if wer < best[0]:
                best = (wer, lm_w, len_w, df_result)
    return best


def main(args):
    lm_cfg = load_config(args.lm_conf)
    lm_tag = args.lm_tag or lm_cfg.lm_type
    setup_logging(None, logging.DEBUG if args.debug else logging.INFO)

    df = pd.read_table(args.tsv_path).dropna()
    dfref = pd.read_table(get_eval_path(args.ref))

    lm_path = get_model_path(args.lm_conf, args.lm_ep)
    lm_model, variables, lm_cfg = load_lm(args.lm_conf, lm_path)
    logging.info(f"LM: {lm_path}")

    if args.runtime:
        runtimes, rtfs = [], []
        for j in range(args.runtime_num_repeats):
            t0 = time.time()
            scored = score_lm(
                df, lm_model, variables, max_len=lm_cfg.max_seq_len,
                num_samples=args.runtime_num_samples,
            )
            runtime = time.time() - t0
            utts = scored["utt_id"].unique()[: args.runtime_num_samples]
            wavtime = 0.0
            for u in utts:
                parts = re.split("_|-", u)
                wavtime += (int(parts[-1]) - int(parts[-2])) / args.wavtime_factor
            rtf = runtime / max(wavtime, 1e-9)
            logging.info(f"Run {j + 1} runtime: {runtime:.5f}s | RTF: {rtf:.5f}")
            runtimes.append(runtime)
            rtfs.append(rtf)
        logging.info(
            f"Averaged runtime {np.mean(runtimes):.5f}s, RTF {np.mean(rtfs):.5f}"
        )
        return None

    scored_tsv_path = args.tsv_path.replace(".tsv", f"_{lm_tag}.tsv")
    if not os.path.exists(scored_tsv_path):
        df = score_lm(df, lm_model, variables, max_len=lm_cfg.max_seq_len)
        df.to_csv(scored_tsv_path, sep="\t", index=False)
    else:
        logging.info(f"load score_lm: {scored_tsv_path}")
        df = pd.read_table(scored_tsv_path)

    lm_range = np.arange(args.lm_min, args.lm_max + EPS, args.lm_step)
    len_range = np.arange(args.len_min, args.len_max + EPS, args.len_step)
    wer_min, lm_best, len_best, df_best = grid_search(df, dfref, lm_range, len_range)

    best_tsv_path = scored_tsv_path.replace(
        ".tsv", f"_lm{lm_best:.2f}_len{len_best:.2f}.tsv"
    )
    logging.info(f"best lm_weight: {lm_best:.3f} len_weight: {len_best:.3f}")
    if df_best is not None:
        df_best.to_csv(best_tsv_path, sep="\t", index=False)
    logging.info(f"best WER: {wer_min:.3f}")
    return wer_min, lm_best, len_best


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("tsv_path", type=str)
    parser.add_argument("-ref", type=str, required=True)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--runtime", action="store_true")
    parser.add_argument("--runtime_num_samples", type=int, default=20)
    parser.add_argument("--runtime_num_repeats", type=int, default=5)
    parser.add_argument("--wavtime_factor", type=float, default=1000)
    parser.add_argument("-lm_conf", type=str, required=True)
    parser.add_argument("-lm_ep", type=str, required=True)
    parser.add_argument("--lm_tag", type=str, default=None)
    parser.add_argument("--lm_min", type=float, default=0)
    parser.add_argument("--lm_max", type=float, default=1)
    parser.add_argument("--lm_step", type=float, default=0.1)
    parser.add_argument("--len_min", type=float, default=0)
    parser.add_argument("--len_max", type=float, default=5)
    parser.add_argument("--len_step", type=float, default=1)
    return parser


if __name__ == "__main__":
    main(build_argparser().parse_args())
