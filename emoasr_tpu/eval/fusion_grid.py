"""Shallow-fusion grid search over (lm_weight, len_weight).

Parity target: `/root/reference/asr/fusion/test_fusion_grid.py:20-99` — the
reference fans each grid point out to a CPU `multiprocessing.Pool` worker
running `test_main`; on TPU a single device runs each decode orders of
magnitude faster than a CPU worker, so the grid runs sequentially on-device
(one jitted decode per weight pair; shapes are identical so only the
weight constants change between compiles).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from emoasr_tpu.eval.test_asr import get_eval_path, test_main
from emoasr_tpu.utils.log import setup_logging
from emoasr_tpu.utils.paths import get_results_dir

EPS = 1e-5


def main(args):
    log_dir = get_results_dir(args.conf)
    data_path = get_eval_path(args.data)
    data_tag = (
        args.data
        if args.data_tag == "test" and data_path != args.data
        else args.data_tag
    )
    log_file = (
        f"test_fusion_grid_{data_tag}_ctc{args.decode_ctc_weight}_ep{args.ep}.log"
    )
    setup_logging(os.path.join(log_dir, log_file))

    lm_cands = np.arange(args.lm_min, args.lm_max + EPS, args.lm_step)
    len_cands = np.arange(args.len_min, args.len_max + EPS, args.len_step)

    best = (100.0, 0.0, 0.0, "")
    for lm_weight in lm_cands:
        for len_weight in len_cands:
            out = test_main(args, float(lm_weight), float(len_weight))
            if out is None:
                continue
            lm_w, len_w, wer, wer_info = out
            logging.info(
                f"lm_weight: {lm_w:.3f} len_weight: {len_w:.3f} - {wer_info}"
            )
            if wer < best[0]:
                best = (wer, lm_w, len_w, wer_info)

    logging.info("***** best WER:")
    logging.info(
        f"lm_weight: {best[1]:.3f} len_weight: {best[2]:.3f} - {best[3]}"
    )
    return best


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-conf", type=str, required=True)
    parser.add_argument("-ep", type=str, required=True)
    parser.add_argument("--data", type=str, default=None)
    parser.add_argument("--data_tag", type=str, default="test")
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--beam_width", type=int, default=None)
    parser.add_argument("--decode_ctc_weight", type=float, default=0)
    parser.add_argument("--lm_min", type=float, default=0)
    parser.add_argument("--lm_max", type=float, default=1)
    parser.add_argument("--lm_step", type=float, default=0.1)
    parser.add_argument("--len_min", type=float, default=0)
    parser.add_argument("--len_max", type=float, default=5)
    parser.add_argument("--len_step", type=float, default=1)
    parser.add_argument("--lm_conf", type=str, default=None)
    parser.add_argument("--lm_ep", type=str, default=None)
    parser.add_argument("--lm_tag", type=str, default=None)
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel eval over all visible "
                             "devices (GSPMD batch sharding; the "
                             "reference fans grid points to CPU pool "
                             "workers instead)")
    return parser


if __name__ == "__main__":
    args = build_argparser().parse_args()
    args.cpu = False
    args.nbest = False
    args.debug = False
    args.utt_id = None
    args.runtime = False
    args.len_weight = None
    args.lm_weight = None
    args.decode_phone = False
    main(args)
