"""Non-autoregressive error correction with masked LMs (BERT / PC-MLM).

Parity target: `/root/reference/asr/test_asr_correct.py` —
- CTC greedy decode with frame alignments
- `aggregate_logits` (:39-72): per decoded token, the softmax row of the
  frame (within its alignment segment) where that token's prob peaks
- tokens with confidence < `mask_th` are replaced by `<mask>`
- fill-in from `(1 - w) * ASR + w * LM` mixed probabilities, where the LM is
  BERT or a phone-conditioned P2W ("pbert"; phone hyps from the hierarchical
  phone-CTC head); inserted `<mask>` predicted as pad are deleted
  (deletable PC-MLM)
- `pctc` cascade path: phone-CTC hyp -> P2W CTC decode
- RTF mode like test_asr.

TPU-first: ASR decode and LM fill-in run batched; the segment aggregation
is small host numpy per utterance.
"""

from __future__ import annotations

import argparse
import logging
import re
import time
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from emoasr_tpu.config import ExpConfig, load_config
from emoasr_tpu.data.asr_dataset import ASRDataset
from emoasr_tpu.eval.test_asr import get_eval_path, load_asr_variables
from emoasr_tpu.eval.wer import compute_wers_df, wer_info_line
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.train.step import preprocess
from emoasr_tpu.utils.converters import ints2str
from emoasr_tpu.utils.log import insert_comment, setup_logging
from emoasr_tpu.utils.paths import get_model_path, get_results_dir, rel_to_abs_path
from emoasr_tpu.utils.vocab import Vocab


def aggregate_logits(
    logits: np.ndarray, aligns: np.ndarray, blank_id: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token probability rows + confidences (test_asr_correct.py:39-72).

    logits: (T, V) frame logits; aligns: (T,) frame alignment.
    Returns (token_probs (U, V), confidences (U,)).
    """
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    token_probs, token_probs_v = [], []
    seg_rows, tok_prev = [], None
    for t in range(len(aligns)):
        tok = int(aligns[t])
        if tok == blank_id:
            continue
        if tok_prev is not None and tok != int(aligns[t - 1]):
            rows = np.asarray(seg_rows)
            i = int(np.argmax(rows[:, tok_prev]))
            token_probs.append(rows[i])
            token_probs_v.append(rows[i, tok_prev])
            seg_rows = []
        seg_rows.append(probs[t])
        tok_prev = tok
    if seg_rows:
        rows = np.asarray(seg_rows)
        i = int(np.argmax(rows[:, tok_prev]))
        token_probs.append(rows[i])
        token_probs_v.append(rows[i, tok_prev])
    return np.asarray(token_probs), np.asarray(token_probs_v)


class Corrector:
    """Bundles the ASR model + correction LM and applies one batch."""

    def __init__(
        self,
        cfg: ExpConfig,
        model: ASR,
        variables,
        lm_cfg: Optional[ExpConfig] = None,
        lm_model=None,
        lm_variables=None,
        mask_th: float = 0.0,
        lm_weight: float = 0.0,
        cascade_ctc: bool = False,
    ):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.lm_cfg = lm_cfg
        self.lm_model = lm_model
        self.lm_variables = lm_variables
        self.mask_th = mask_th
        self.lm_weight = lm_weight
        self.cascade_ctc = cascade_ctc
        self.use_phone = lm_cfg is not None and lm_cfg.lm_type in (
            "pbert", "pctc", "pelectra"
        )

        # variables are jit ARGUMENTS, not closed over: closing over
        # concrete param arrays embeds them as HLO constants (slow
        # lowering, ~4x module size at L1 scale, defeats the persistent
        # compile cache across processes)
        self._decode = jax.jit(
            lambda v, xs, xlens: self._greedy(v, xs, xlens, False)
        )
        self._decode_phone = jax.jit(
            lambda v, xs, xlens: self._greedy(v, xs, xlens, True)
        )
        self._lm_fill_jit = None  # built lazily (needs lm_model presence)

    def _greedy(self, variables, xs, xlens, phone):
        xs, xlens = preprocess(self.cfg, xs, xlens, None, False)
        return self.model.apply(
            variables, xs, xlens, phone, method=ASR.decode_greedy
        )

    def _lm_fill(self, ys, ylens, ps=None, plens=None):
        # jitted once per Corrector (unjitted apply dispatches every
        # primitive eagerly — orders of magnitude slower on accelerators)
        if self._lm_fill_jit is None:
            if self.use_phone:
                self._lm_fill_jit = jax.jit(
                    lambda v, ys, yl, ps, pl: jax.nn.softmax(
                        self.lm_model.apply(
                            v, ys, yl, None, ps, pl,
                            method=type(self.lm_model).__call__,
                        ),
                        -1,
                    )
                )
            else:
                self._lm_fill_jit = jax.jit(
                    lambda v, ys, yl: jax.nn.softmax(
                        self.lm_model.apply(
                            v, ys, yl, None,
                            method=type(self.lm_model).__call__,
                        ),
                        -1,
                    )
                )
        if self.use_phone:
            probs = self._lm_fill_jit(self.lm_variables, ys, ylens, ps, plens)
        else:
            probs = self._lm_fill_jit(self.lm_variables, ys, ylens)
        return np.asarray(probs)

    def correct_batch(self, batch) -> List[Tuple[str, List[int], str, int, int]]:
        """Returns rows (utt_id, corrected_ids, reftext, n_masked, n_tokens)."""
        cfg = self.cfg
        xs = jnp.asarray(batch["xs"])
        xlens = jnp.asarray(batch["xlens"])
        hyps, hyp_lens, logits, aligns = self._decode(self.variables, xs, xlens)
        hyps, hyp_lens = np.asarray(hyps), np.asarray(hyp_lens)
        logits, aligns = np.asarray(logits), np.asarray(aligns)

        hyp_phone = None
        if self.use_phone:
            ph, pl, _, _ = self._decode_phone(self.variables, xs, xlens)
            hyp_phone, phone_lens = np.asarray(ph), np.asarray(pl)

        out = []
        if self.cascade_ctc:
            ps = jnp.asarray(hyp_phone)
            hyp_cor, cor_lens = self.lm_model.apply(
                self.lm_variables, ps, jnp.asarray(phone_lens),
                method=lambda m, p, pl: m.lm.decode_greedy(p, pl),
            )
            hyp_cor, cor_lens = np.asarray(hyp_cor), np.asarray(cor_lens)
            for b, utt_id in enumerate(batch["utt_ids"]):
                out.append(
                    (
                        utt_id,
                        hyp_cor[b, : cor_lens[b]].tolist(),
                        batch["texts"][b],
                        0, 0,
                    )
                )
            return out

        # mask low-confidence tokens per utterance
        masked_list, info = [], []
        for b, utt_id in enumerate(batch["utt_ids"]):
            hyp = hyps[b, : hyp_lens[b]]
            if len(hyp) == 0:
                info.append((utt_id, None, batch["texts"][b], 0, 0))
                masked_list.append(np.zeros(0, np.int32))
                continue
            elen = int(np.asarray(batch["xlens"])[b]) // cfg.num_framestacks
            # logits/aligns live on the subsampled time axis
            T_sub = logits.shape[1]
            al = aligns[b][:T_sub]
            tp, tv = aggregate_logits(logits[b], al, cfg.blank_id)
            assert len(hyp) == len(tv), (len(hyp), len(tv))
            mask_idx = tv < self.mask_th
            hyp_masked = hyp.copy()
            hyp_masked[mask_idx] = self.lm_cfg.mask_id
            masked_list.append(hyp_masked)
            info.append(
                (utt_id, (hyp, tp, mask_idx), batch["texts"][b],
                 int(mask_idx.sum()), len(hyp))
            )

        # batched LM fill over padded masked hyps
        Lmax = max((len(m) for m in masked_list), default=1) or 1
        B = len(masked_list)
        ys = np.full((B, Lmax), self.lm_cfg.eos_id, np.int32)
        yl = np.ones(B, np.int32)
        for b, m in enumerate(masked_list):
            ys[b, : len(m)] = m
            yl[b] = max(len(m), 1)
        if self.use_phone:
            PL = hyp_phone.shape[1]
            lm_probs = self._lm_fill(
                jnp.asarray(ys), jnp.asarray(yl),
                jnp.asarray(hyp_phone), jnp.asarray(phone_lens),
            )
        else:
            lm_probs = self._lm_fill(jnp.asarray(ys), jnp.asarray(yl))

        V = self.cfg.vocab_size
        results = []
        for b, (utt_id, payload, reftext, n_masked, n_tokens) in enumerate(info):
            if payload is None:
                results.append((utt_id, [], reftext, 0, 0))
                continue
            hyp, tp, mask_idx = payload
            mix = (1 - self.lm_weight) * tp[:, :V] + self.lm_weight * lm_probs[
                b, : len(hyp), :V
            ]
            y_gen = np.argmax(mix, axis=-1)
            hyp_cor = hyp.copy()
            hyp_cor[mask_idx] = y_gen[mask_idx]
            # deletable PC-MLM: masks predicted as pad/blank are removed
            hyp_cor = [int(x) for x in hyp_cor if x != cfg.blank_id]
            results.append((utt_id, hyp_cor, reftext, n_masked, n_tokens))
        return results


def test_main(args):
    cfg = load_config(args.conf)
    setup_logging(None, logging.DEBUG if args.debug else logging.INFO)

    model_path = get_model_path(args.conf, args.ep)
    model = ASR(cfg)
    variables = load_asr_variables(model_path, cfg)
    vocab = Vocab(rel_to_abs_path(cfg.vocab_path))

    lm_cfg = lm_model = lm_variables = None
    cascade = False
    if args.lm_conf:
        # dual orbax-dir / torch-file dispatch (an imported reference BERT
        # or P2W checkpoint is a torch pickle, same flow as test_asr)
        from emoasr_tpu.eval.test_asr import load_lm

        lm_path = get_model_path(args.lm_conf, args.lm_ep)
        lm_model, lm_variables, lm_cfg = load_lm(args.lm_conf, lm_path)
        cascade = lm_cfg.lm_type == "pctc"
        if "lm" not in lm_variables["params"]:
            # tolerate bare-module orbax checkpoints (train_lm saves the
            # facade tree {"lm": {...}})
            lm_variables = {"params": {"lm": lm_variables["params"]}}

    corr = Corrector(
        cfg, model, variables, lm_cfg, lm_model, lm_variables,
        mask_th=args.mask_th, lm_weight=args.lm_weight, cascade_ctc=cascade,
    )

    data_path = rel_to_abs_path(get_eval_path(args.data) or cfg.test_path)
    dataset = ASRDataset(cfg, data_path, phase="test")
    batcher = dataset.make_batcher(shuffle=False, drop_tail=False)

    if args.runtime:
        # RTF protocol of test_asr_correct.py:312-348
        rtfs = []
        for j in range(args.runtime_num_repeats):
            t0 = time.time()
            n_done, wavtime = 0, 0.0
            for batch in dataset.batches(batcher):
                results = corr.correct_batch(batch)
                for utt_id, *_ in results:
                    parts = re.split("_|-", utt_id)
                    wavtime += (
                        int(parts[-1]) - int(parts[-2])
                    ) / args.wavtime_factor
                    n_done += 1
                    if n_done >= args.runtime_num_samples:
                        break
                if n_done >= args.runtime_num_samples:
                    break
            rtf = (time.time() - t0) / max(wavtime, 1e-9)
            logging.info(f"Run {j + 1} | RTF: {rtf:.5f}")
            rtfs.append(rtf)
        logging.info(f"Averaged RTF {np.mean(rtfs):.5f}")
        return None

    rows = []
    n_masked_total = n_tokens_total = 0
    t0 = time.time()
    for batch in dataset.batches(batcher):
        for utt_id, ids, reftext, n_masked, n_tokens in corr.correct_batch(batch):
            rows.append([utt_id, ints2str(ids), vocab.ids2text(ids), reftext])
            n_masked_total += n_masked
            n_tokens_total += n_tokens
    runtime = time.time() - t0

    df = pd.DataFrame(rows, columns=["utt_id", "token_id", "text", "reftext"])
    results_dir = get_results_dir(args.conf)
    out = (
        f"{results_dir}/result_correct_{args.data_tag}"
        f"_th{args.mask_th:.2f}_lm{args.lm_weight:.2f}_ep{args.ep}.tsv"
    )
    df.to_csv(out, sep="\t", index=False)
    wer, wer_dict = compute_wers_df(df)
    wer_info = wer_info_line(wer, wer_dict)
    logging.info(wer_info)
    if n_tokens_total:
        logging.info(
            f"masked: {n_masked_total}/{n_tokens_total} "
            f"({100 * n_masked_total / n_tokens_total:.1f}%), "
            f"runtime {runtime:.2f}s"
        )
    insert_comment(out, wer_info)
    return wer, wer_info


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-conf", type=str, required=True)
    parser.add_argument("-ep", type=str, required=True)
    parser.add_argument("--data", type=str, default=None)
    parser.add_argument("--data_tag", type=str, default="test")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--lm_conf", type=str, default=None)
    parser.add_argument("--lm_ep", type=str, default=None)
    parser.add_argument("--mask_th", type=float, default=0.5)
    parser.add_argument("--lm_weight", type=float, default=0.5)
    parser.add_argument("--runtime", action="store_true")
    parser.add_argument("--runtime_num_samples", type=int, default=20)
    parser.add_argument("--runtime_num_repeats", type=int, default=5)
    parser.add_argument("--wavtime_factor", type=float, default=1000)
    return parser


if __name__ == "__main__":
    test_main(build_argparser().parse_args())
