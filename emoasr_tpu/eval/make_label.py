"""Generate soft labels from an LM for knowledge distillation.

Parity target: `/root/reference/asr/distill/make_label.py:30-292` — same
pickle format `{utt_id: [[(vocab, prob), ...], ...], ...}`: per position the
top-k (default 8) vocab entries with temperature-T (default 3.0) softmax
probs; causal mode reads position-1 logits (hard label for position 0);
BERT mode reads the `mask_pos` logits of pre-masked rows; `<eos>` entries
dropped when `add_sos_eos`.  (The reference file imports the nonexistent
`utils.io_utils` — broken as-is; this is the working equivalent.)

TPU-first: top-k + temperature softmax run on device per padded batch.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
from typing import Dict, List

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from emoasr_tpu.config import load_config
from emoasr_tpu.eval.test_asr import load_lm
from emoasr_tpu.models.lm.lm import LM
from emoasr_tpu.search.common import topk_lastdim
from emoasr_tpu.utils.converters import str2ints
from emoasr_tpu.utils.log import setup_logging
from emoasr_tpu.utils.paths import get_model_path, rel_to_abs_path

BATCH_SIZE = 128


def _topk_temp(logits_rows: jnp.ndarray, topk: int, temp: float):
    """(N, V) -> (values (N, k) ids, probs (N, k)) on device."""
    o_topk, v_topk = topk_lastdim(logits_rows, topk)
    p_topk = jax.nn.softmax(o_topk.astype(jnp.float32) / temp, axis=-1)
    return np.asarray(v_topk), np.asarray(p_topk)


def _frame(ids: List[int], add_sos_eos: bool, eos_id: int, max_seq_len: int,
           pos_shift_ok: bool):
    if not add_sos_eos:
        return ids, 0
    if len(ids) <= max_seq_len - 2:
        return [eos_id] + ids + [eos_id], 1
    return [eos_id] + ids[1:-1] + [eos_id], 0


def make_lm_label(
    df: pd.DataFrame,
    lm_model: LM,
    variables,
    save_path: str,
    topk: int = 8,
    temp: float = 3.0,
    add_sos_eos: bool = False,
    eos_id: int = 2,
    max_seq_len: int = 256,
) -> Dict:
    """Causal LM soft labels over [start_pos, end_pos) per row."""
    labels: Dict[str, List] = {}
    fwd = jax.jit(
        lambda ys, ylens: lm_model.apply(variables, ys, ylens, method=LM.__call__)
    )

    rows = list(df.itertuples())
    for s in range(0, len(rows), BATCH_SIZE):
        chunk = rows[s : s + BATCH_SIZE]
        framed = []
        for row in chunk:
            ids = str2ints(row.token_id)
            ids, shift = _frame(ids, add_sos_eos, eos_id, max_seq_len, True)
            framed.append(
                (row.utt_id, ids, row.start_pos + shift, row.end_pos + shift)
            )
        L = max(len(f[1]) for f in framed)
        ys = np.zeros((len(framed), L), np.int32)
        yl = np.zeros(len(framed), np.int32)
        for j, (_, ids, _, _) in enumerate(framed):
            ys[j, : len(ids)] = ids
            yl[j] = len(ids)
        logits = np.asarray(fwd(jnp.asarray(ys), jnp.asarray(yl)))

        for j, (utt_id, ids, start_pos, end_pos) in enumerate(framed):
            for pos in range(start_pos, end_pos):
                if pos == 0:
                    v_topk = np.array([ids[pos]])
                    p_topk = np.array([1.0])
                    logging.warning(f"hard label is used: {v_topk}")
                else:
                    v_topk, p_topk = _topk_temp(
                        jnp.asarray(logits[j, pos - 1][None]), topk, temp
                    )
                    v_topk, p_topk = v_topk[0], p_topk[0]
                label = [
                    (int(v), float(p))
                    for v, p in zip(v_topk, p_topk)
                    if not (add_sos_eos and v == eos_id)
                ]
                labels.setdefault(utt_id, []).append(label)
        if (s // BATCH_SIZE) % 100 == 0:
            logging.info(f"{s + len(chunk)} / {len(rows)}")

    with open(save_path, "wb") as f:
        pickle.dump(labels, f)
    logging.info(f"pickle saved to {save_path}")
    return labels


def make_bert_label(
    df: pd.DataFrame,
    lm_model: LM,
    variables,
    save_path: str,
    topk: int = 8,
    temp: float = 3.0,
    add_sos_eos: bool = False,
    eos_id: int = 2,
    max_seq_len: int = 256,
) -> Dict:
    """BERT soft labels at `mask_pos` of pre-masked rows (one per row)."""
    labels: Dict[str, List] = {}
    fwd = jax.jit(
        lambda ys, ylens: lm_model.apply(variables, ys, ylens, method=LM.__call__)
    )

    rows = list(df.itertuples())
    for s in range(0, len(rows), BATCH_SIZE):
        chunk = rows[s : s + BATCH_SIZE]
        framed = []
        for row in chunk:
            ids = str2ints(row.token_id)
            ids, shift = _frame(ids, add_sos_eos, eos_id, max_seq_len, True)
            assert len(ids) <= max_seq_len
            framed.append((row.utt_id, ids, row.mask_pos + shift))
        L = max(len(f[1]) for f in framed)
        ys = np.zeros((len(framed), L), np.int32)
        yl = np.zeros(len(framed), np.int32)
        for j, (_, ids, _) in enumerate(framed):
            ys[j, : len(ids)] = ids
            yl[j] = len(ids)
        logits = np.asarray(fwd(jnp.asarray(ys), jnp.asarray(yl)))

        pos_rows = np.asarray([f[2] for f in framed])
        v_topk, p_topk = _topk_temp(
            jnp.asarray(logits[np.arange(len(framed)), pos_rows]), topk, temp
        )
        for j, (utt_id, ids, mask_pos) in enumerate(framed):
            label = [
                (int(v), float(p))
                for v, p in zip(v_topk[j], p_topk[j])
                if not (add_sos_eos and v == eos_id)
            ]
            labels.setdefault(utt_id, []).append(label)

    with open(save_path, "wb") as f:
        pickle.dump(labels, f)
    logging.info(f"pickle saved to {save_path}")
    return labels


def accuracy(labels: Dict, dfref: pd.DataFrame, vocab=None):
    """Top-1/top-k accuracy of soft labels vs refs (eval_label.py:20-56)."""
    id2ref = {row.utt_id: str2ints(row.token_id) for row in dfref.itertuples()}
    cnt = acc1 = acck = 0
    for utt_id, label in labels.items():
        ref = id2ref[utt_id]
        cnt += len(label)
        for i, vps in enumerate(label):
            v1, _ = vps[0]
            acc1 += int(v1 == ref[i])
            acck += int(any(v == ref[i] for v, _ in vps))
    return acc1 / cnt * 100, acck / cnt * 100, cnt


def main(args):
    setup_logging(None)
    lm_cfg = load_config(args.lm_conf)
    lm_path = get_model_path(args.lm_conf, args.lm_ep)
    lm_model, variables, lm_cfg = load_lm(args.lm_conf, lm_path)
    df = pd.read_table(rel_to_abs_path(args.data)).dropna()

    fn = make_bert_label if lm_cfg.lm_type == "bert" else make_lm_label
    fn(
        df, lm_model, variables, args.save_path,
        topk=args.topk, temp=args.temp,
        add_sos_eos=lm_cfg.add_sos_eos, eos_id=lm_cfg.eos_id,
        max_seq_len=lm_cfg.max_seq_len,
    )


def eval_label_main(args):
    """Soft-label accuracy CLI (replaces `asr/distill/eval_label.py`)."""
    with open(args.pkl_path, "rb") as f:
        labels = pickle.load(f)
    dfref = pd.read_table(rel_to_abs_path(args.ref))
    acc1, acck, cnt = accuracy(labels, dfref)
    print(f"{cnt} tokens")
    print(f"Accuracy top1: {acc1:.3f} topk: {acck:.3f}")
    return acc1, acck, cnt


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd")
    mk = sub.add_parser("make")
    mk.add_argument("-lm_conf", type=str, required=True)
    mk.add_argument("-lm_ep", type=str, required=True)
    mk.add_argument("-data", type=str, required=True)
    mk.add_argument("-save_path", type=str, required=True)
    mk.add_argument("--topk", type=int, default=8)
    mk.add_argument("--temp", type=float, default=3.0)
    ev = sub.add_parser("eval")
    ev.add_argument("pkl_path", type=str)
    ev.add_argument("-ref", type=str, required=True)
    args = parser.parse_args()
    if args.cmd == "eval":
        eval_label_main(args)
    else:
        main(args)
