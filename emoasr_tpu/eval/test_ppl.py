"""LM perplexity evaluation (causal PPL and masked pseudo-PPL) + CLI.

Parity target: `/root/reference/lm/test_ppl.py:32-223` — causal PPL skips
the first-token and <eos> predictions when `add_sos_eos`; masked PPL masks
each position in turn; PPL = exp(total NLL / token count).  (The reference
file has a stale `utils.io_utils` import and is broken as-is —
SURVEY.md §7 quirk; this module is the working equivalent.)

TPU-first: both modes run as batched jitted computations (the masked mode
evaluates all positions of a batch in one forward) instead of per-utterance
per-position host loops.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from emoasr_tpu.config import ExpConfig, load_config
from emoasr_tpu.data.lm_dataset import LMDataset, P2WDataset
from emoasr_tpu.models.lm.lm import LM
from emoasr_tpu.train import checkpoint as ckpt
from emoasr_tpu.utils.log import setup_logging
from emoasr_tpu.utils.paths import get_model_path, rel_to_abs_path


def _causal_nll(model, params, ys, ylens, ps, plens, add_sos_eos: bool):
    """Summed next-token NLL + token count (pure; jit-friendly)."""
    ys_in = ys[:, :-1]
    ys_out = ys[:, 1:]
    lens_in = ylens - 1
    logits = model.apply({"params": params}, ys_in, lens_in, None, ps, plens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    tok_lp = jnp.take_along_axis(
        logp, ys_out[:, :, None].astype(jnp.int32), axis=2
    )[:, :, 0]
    L = ys_out.shape[1]
    pos = jnp.arange(L)[None, :]
    valid = pos < lens_in[:, None]
    if add_sos_eos:
        # skip first-token and <eos> predictions (test_ppl.py:62-66)
        valid = valid & (pos >= 1) & (pos < (lens_in - 1)[:, None])
    nll = -jnp.sum(jnp.where(valid, tok_lp, 0.0))
    return nll, jnp.sum(valid)


def _masked_nll(model, params, ys, ylens, ps, plens, mask_id: int):
    """Pseudo-NLL: mask each valid position; one batched forward (pure)."""
    B, L = ys.shape
    eye = jnp.eye(L, dtype=bool)[None]
    masked = jnp.where(eye, mask_id, ys[:, None, :]).reshape(B * L, L)
    rep_lens = jnp.repeat(ylens, L)
    if ps is not None:
        ps = jnp.repeat(ps, L, axis=0)
        plens = jnp.repeat(plens, L)
    logits = model.apply({"params": params}, masked, rep_lens, None, ps, plens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    pos = jnp.tile(jnp.arange(L), B)
    tgt = ys.reshape(-1)
    lp = logp[jnp.arange(B * L), pos, tgt].reshape(B, L)
    valid = jnp.arange(L)[None, :] < ylens[:, None]
    nll = -jnp.sum(jnp.where(valid, lp, 0.0))
    return nll, jnp.sum(valid)


def _batch_arrays(batch):
    return (
        jnp.asarray(batch["ys_in"]),
        jnp.asarray(batch["ylens"]),
        jnp.asarray(batch["ps"]) if "ps" in batch else None,
        jnp.asarray(batch["plens"]) if "plens" in batch else None,
    )


def causal_nll_batch(model, variables, batch, add_sos_eos: bool):
    ys, ylens, ps, plens = _batch_arrays(batch)
    nll, cnt = _causal_nll(
        model, variables["params"], ys, ylens, ps, plens, add_sos_eos
    )
    return float(nll), int(cnt)


def masked_nll_batch(model, variables, batch, mask_id: int):
    ys, ylens, ps, plens = _batch_arrays(batch)
    nll, cnt = _masked_nll(
        model, variables["params"], ys, ylens, ps, plens, mask_id
    )
    return float(nll), int(cnt)


def evaluate_ppl(
    cfg: ExpConfig, model: LM, variables, dataset
) -> Tuple[int, float]:
    """Corpus (pseudo-)perplexity through ONE jitted NLL program per
    bucket shape (an unjitted apply would dispatch eagerly per batch)."""
    masked = cfg.lm_type in ("bert", "pbert")
    if masked:
        nll_fn = jax.jit(
            lambda p, ys, yl, ps, pl: _masked_nll(
                model, p, ys, yl, ps, pl, cfg.mask_id
            )
        )
    else:
        nll_fn = jax.jit(
            lambda p, ys, yl, ps, pl: _causal_nll(
                model, p, ys, yl, ps, pl, cfg.add_sos_eos
            )
        )
    total_nll, total_cnt = 0.0, 0
    batcher = dataset.make_batcher(shuffle=False, drop_tail=False)
    for batch in dataset.batches(batcher):
        ys, ylens, ps, plens = _batch_arrays(batch)
        nll, cnt = nll_fn(variables["params"], ys, ylens, ps, plens)
        total_nll += float(nll)
        total_cnt += int(cnt)
    return total_cnt, math.exp(total_nll / max(total_cnt, 1))


def test_main(args):
    cfg = load_config(args.conf)
    setup_logging(None)
    model_path = get_model_path(args.conf, args.ep)
    if not os.path.exists(model_path):
        ckpt.model_average(args.conf, args.ep)
    logging.info(f"LM: {model_path}")

    model = LM(cfg)
    if os.path.isdir(model_path):
        tree = ckpt.load_model(model_path)
        variables = {"params": tree["params"]}
    else:
        from emoasr_tpu.eval.test_asr import _import_lm_params
        from emoasr_tpu.utils import torch_import as ti

        sd = ti.load_state_dict_np(model_path)
        variables = {"params": {"lm": _import_lm_params(sd, cfg)}}

    data_path = rel_to_abs_path(args.data or cfg.test_path)
    if cfg.lm_type in ("ptransformer", "pbert", "pctc", "pelectra"):
        dataset = P2WDataset(cfg, data_path, phase="test")
    else:
        dataset = LMDataset(cfg, data_path, phase="test")

    cnt, ppl = evaluate_ppl(cfg, model, variables, dataset)
    logging.info(f"{cnt} tokens | PPL: {ppl:.3f}")
    print(f"PPL: {ppl:.3f}")
    return cnt, ppl


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-conf", type=str, required=True)
    parser.add_argument("-ep", type=str, required=True)
    parser.add_argument("--data", type=str, default=None)
    args = parser.parse_args()
    test_main(args)


if __name__ == "__main__":
    main()
