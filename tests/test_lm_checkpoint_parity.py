"""Whole-LM checkpoint parity through the real PPL CLI.

Companion to tests/test_full_model_parity.py: the reference LM
(vendored-HF BERT stack, `lm/modeling/transformer.py` / `bert.py`) is
built in-process, its torch `state_dict` saved in the reference
`model.ep{N}` format, and evaluated through our `eval/test_ppl.py`
`test_main` (checkpoint import -> LMDataset -> batched causal / masked
pseudo-PPL).  The resulting perplexity must equal the reference model's
own NLL computed utterance-by-utterance — the flow a user with real
emoASR LM checkpoints runs (`lm/test_ppl.py`, import-broken in the
reference; semantics per its `ppl_lm`/`ppl_masked_lm`).
"""

import math
import os
import sys
from collections import namedtuple

import numpy as np
import pandas as pd
import pytest
import torch
import yaml

sys.path.insert(0, "/root/reference")

V = 24
EP = 3


def P(**kw):
    return namedtuple("Params", kw.keys())(**kw)


def _corpus(tmp_path, n_utts=8, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    seqs = []
    for i in range(n_utts):
        L = int(rng.integers(4, 12))
        toks = rng.integers(3, V - 1, size=L)  # V-1 reserved as <mask>
        seqs.append(toks)
        rows.append(
            dict(utt_id=f"u{i}", token_id=" ".join(map(str, toks)), ylen=L)
        )
    tsv = tmp_path / "test_lm.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    return str(tsv), seqs


def _conf(tmp_path, name, tsv, lm_type):
    conf_path = tmp_path / f"{name}.yaml"
    conf = dict(
        lm_type=lm_type,
        vocab_size=V,
        hidden_size=16,
        num_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        max_seq_len=32,
        eos_id=2,
        mask_id=V - 1,
        add_sos_eos=False,
        test_path=tsv,
        vocab_path="",
        batch_size=4,
        max_ylens_batch=512,
        dropout_rate=0.0,
    )
    conf_path.write_text(yaml.safe_dump(conf))
    ckpt_dir = tmp_path / name / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    return str(conf_path), ckpt_dir


def _run_ppl(conf_path):
    from emoasr_tpu.eval.test_ppl import test_main

    Args = namedtuple("Args", "conf ep data")
    cnt, ppl = test_main(Args(conf=conf_path, ep=str(EP), data=None))
    return cnt, ppl


def test_transformer_lm_checkpoint_ppl_parity(tmp_path):
    from lm.modeling.transformer import TransformerLM as RefTLM

    tsv, seqs = _corpus(tmp_path)
    torch.manual_seed(20)
    ref = RefTLM(
        P(vocab_size=V, hidden_size=16, num_layers=2, num_attention_heads=2,
          intermediate_size=32, max_seq_len=32)
    ).eval()
    conf_path, ckpt_dir = _conf(tmp_path, "tlm", tsv, "transformer")
    torch.save(ref.state_dict(), ckpt_dir / f"model.ep{EP}")

    # reference NLL, utterance by utterance (causal next-token,
    # emoasr_tpu's causal_nll_batch semantics with add_sos_eos=False)
    nll, cnt = 0.0, 0
    with torch.no_grad():
        for toks in seqs:
            ys = torch.tensor(toks)[None]
            logits = ref(ys[:, :-1])
            logp = torch.log_softmax(logits.float(), -1)
            tgt = ys[:, 1:]
            lp = logp.gather(2, tgt[:, :, None].long())[:, :, 0]
            nll -= float(lp.sum())
            cnt += tgt.shape[1]
    ref_ppl = math.exp(nll / cnt)

    got_cnt, got_ppl = _run_ppl(conf_path)
    assert got_cnt == cnt, (got_cnt, cnt)
    np.testing.assert_allclose(got_ppl, ref_ppl, rtol=1e-4)


def test_bert_lm_checkpoint_pseudo_ppl_parity(tmp_path):
    from lm.modeling.bert import BERTMaskedLM as RefBERT

    tsv, seqs = _corpus(tmp_path, seed=1)
    torch.manual_seed(21)
    ref = RefBERT(
        P(vocab_size=V, hidden_size=16, num_layers=2, num_attention_heads=2,
          intermediate_size=32, max_seq_len=32, mask_id=V - 1)
    ).eval()
    conf_path, ckpt_dir = _conf(tmp_path, "bertlm", tsv, "bert")
    torch.save(ref.state_dict(), ckpt_dir / f"model.ep{EP}")

    mask_id = V - 1
    nll, cnt = 0.0, 0
    with torch.no_grad():
        for toks in seqs:
            L = len(toks)
            for i in range(L):
                ys = torch.tensor(toks)[None].clone()
                ys[0, i] = mask_id
                logits = ref(ys)
                logp = torch.log_softmax(logits.float(), -1)
                nll -= float(logp[0, i, int(toks[i])])
                cnt += 1
    ref_ppl = math.exp(nll / cnt)

    got_cnt, got_ppl = _run_ppl(conf_path)
    assert got_cnt == cnt, (got_cnt, cnt)
    np.testing.assert_allclose(got_ppl, ref_ppl, rtol=1e-4)
