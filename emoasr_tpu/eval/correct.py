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


def aggregate_logits_device(
    logits: jnp.ndarray, aligns: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device `aggregate_logits`: same per-segment peak-frame
    rule (test_asr_correct.py:39-72), vectorized over (B, T).

    Returns (token_probs (B, T, V), confidences (B, T)): segment k of row
    b (k-th greedy token) fills slot [b, k]; unused tail slots carry -inf
    confidence.  Keeping this on device avoids shipping the (B, T, V)
    logits through host transfers (~10 MB/utterance over the TPU tunnel —
    it dominated correction RTF when done per utterance on host).
    """
    B, T, V = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    nb = aligns != blank_id  # (B, T) non-blank frames
    prev = jnp.pad(aligns, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    boundary = nb & (aligns != prev)  # segment starts (== greedy emissions)
    seg = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1  # (B, T)
    seg_safe = jnp.where(nb, seg, T)  # park blank frames out of range

    ptok = jnp.take_along_axis(
        probs, aligns[:, :, None].astype(jnp.int32), axis=2
    )[:, :, 0]
    ptok = jnp.where(nb, ptok, -jnp.inf)  # (B, T)

    # member[b, k, t]: frame t belongs to segment k
    member = seg_safe[:, None, :] == jnp.arange(T)[None, :, None]
    conf = jnp.max(
        jnp.where(member, ptok[:, None, :], -jnp.inf), axis=2
    )  # (B, T)

    # first frame achieving the segment max (np.argmax tie-break)
    t_idx = jnp.arange(T)[None, None, :]
    hit = member & (ptok[:, None, :] == conf[:, :, None])
    best_t = jnp.min(jnp.where(hit, t_idx, T), axis=2)  # (B, T)

    token_probs = jnp.take_along_axis(
        probs, jnp.minimum(best_t, T - 1)[:, :, None], axis=1
    )  # (B, T, V); rows beyond the segment count are arbitrary
    return token_probs, conf


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
        self._correct_core_jit = None

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

    def _correct_core(
        self, lm_variables, hyps, hyp_lens, logits, aligns,
        ps=None, plens=None,
    ):
        """Device pipeline: aggregate -> confidence mask -> LM fill ->
        probability mix -> corrected tokens.

        Runs entirely on device between the greedy decode and the final
        small host pull; the previous host loop shipped the full (B, T, V)
        logits through the tunnel per batch (RTF-dominating).
        Returns (hyp_cor (B, K), mask (B, K), conf_ok_len (B,)) where K =
        min(T_sub, lm max_seq_len).
        """
        cfg = self.cfg
        B, T, V = logits.shape
        K = hyps.shape[1]
        max_len = getattr(self.lm_cfg, "max_seq_len", K) or K
        K = min(K, max_len)

        tp, conf = aggregate_logits_device(logits, aligns, cfg.blank_id)
        tp, conf = tp[:, :K], conf[:, :K]
        hyps_k = hyps[:, :K]
        lens_k = jnp.minimum(hyp_lens, K)
        in_hyp = jnp.arange(K)[None, :] < lens_k[:, None]  # (B, K)
        mask = in_hyp & (conf < self.mask_th)

        ys = jnp.where(mask, self.lm_cfg.mask_id, hyps_k)
        ys = jnp.where(in_hyp, ys, self.lm_cfg.eos_id).astype(jnp.int32)
        ylens = jnp.maximum(lens_k, 1).astype(jnp.int32)

        if self.use_phone:
            lm_logits = self.lm_model.apply(
                lm_variables, ys, ylens, None, ps, plens,
                method=type(self.lm_model).__call__,
            )
        else:
            lm_logits = self.lm_model.apply(
                lm_variables, ys, ylens, None,
                method=type(self.lm_model).__call__,
            )
        lm_probs = jax.nn.softmax(lm_logits.astype(jnp.float32), -1)

        Vmix = min(V, lm_probs.shape[-1])
        mix = (
            (1.0 - self.lm_weight) * tp[:, :, :Vmix]
            + self.lm_weight * lm_probs[:, :, :Vmix]
        )
        y_gen = jnp.argmax(mix, axis=-1).astype(hyps_k.dtype)
        hyp_cor = jnp.where(mask, y_gen, hyps_k)
        return hyp_cor, mask, lens_k

    def correct_batch(self, batch) -> List[Tuple[str, List[int], str, int, int]]:
        """Returns rows (utt_id, corrected_ids, reftext, n_masked, n_tokens)."""
        cfg = self.cfg
        xs = jnp.asarray(batch["xs"])
        xlens = jnp.asarray(batch["xlens"])
        hyps_d, hyp_lens_d, logits_d, aligns_d = self._decode(
            self.variables, xs, xlens
        )
        hyps, hyp_lens = np.asarray(hyps_d), np.asarray(hyp_lens_d)

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

        # device pipeline: aggregate -> mask -> LM fill -> mix -> argmax
        if self._correct_core_jit is None:
            self._correct_core_jit = jax.jit(self._correct_core)
        if self.use_phone:
            hyp_cor_d, mask_d, lens_d = self._correct_core_jit(
                self.lm_variables, hyps_d, hyp_lens_d, logits_d, aligns_d,
                jnp.asarray(hyp_phone), jnp.asarray(phone_lens),
            )
        else:
            hyp_cor_d, mask_d, lens_d = self._correct_core_jit(
                self.lm_variables, hyps_d, hyp_lens_d, logits_d, aligns_d
            )
        hyp_cor = np.asarray(hyp_cor_d)
        mask = np.asarray(mask_d)
        lens_k = np.asarray(lens_d)

        results = []
        for b, utt_id in enumerate(batch["utt_ids"]):
            n = int(lens_k[b])
            if n == 0:
                results.append((utt_id, [], batch["texts"][b], 0, 0))
                continue
            # deletable PC-MLM: masks predicted as pad/blank are removed
            cor = [int(x) for x in hyp_cor[b, :n] if x != cfg.blank_id]
            results.append(
                (utt_id, cor, batch["texts"][b], int(mask[b, :n].sum()), n)
            )
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
