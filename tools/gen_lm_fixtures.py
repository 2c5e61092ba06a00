"""Generate golden fixtures for LM parity tests (reference torch CPU).

Covers TransformerLM (causal forward + score), BERTMaskedLM (MLM forward +
PLL score), RNNLM (forward + predict), ELECTRA (discriminator score +
forward_disc loss).  ELECTRA joint training involves sampling and is
compared structurally, not numerically.
"""

import os
import sys
from collections import namedtuple

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from lm.modeling.transformer import TransformerLM  # noqa: E402
from lm.modeling.bert import BERTMaskedLM  # noqa: E402
from lm.modeling.rnn import RNNLM  # noqa: E402
from lm.modeling.electra import ELECTRAModel  # noqa: E402


def P(**kw):
    return namedtuple("Params", kw.keys())(**kw)


def sd_np(model):
    return {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()}


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "../tests")
    V = 40
    base = dict(
        vocab_size=V,
        hidden_size=32,
        num_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_seq_len=24,
        mask_id=V - 1,
    )
    torch.manual_seed(5)
    B, L = 3, 10
    ys = torch.randint(3, V - 1, (B, L))
    ylens = torch.tensor([10, 7, 5])
    labels = ys.clone()
    labels[:, ::2] = -100

    # --- TransformerLM ---
    m = TransformerLM(P(**base)).eval()
    with torch.no_grad():
        logits = m(ys, ylens)
        loss, _ = m(ys, ylens, labels=labels)
        scores = m.score(ys, ylens)
        preds, _ = m.predict(ys, ylens)
    np.savez(
        os.path.join(out_dir, "fixtures_lm_transformer.npz"),
        ys=ys.numpy(), ylens=ylens.numpy(), labels=labels.numpy(),
        logits=logits.numpy(), loss=loss.numpy(),
        scores=np.array(scores), preds=preds.numpy(), **sd_np(m),
    )
    print("transformer lm:", float(loss), scores)

    # --- BERTMaskedLM ---
    torch.manual_seed(6)
    m = BERTMaskedLM(P(**base)).eval()
    with torch.no_grad():
        logits = m(ys, ylens)
        loss, _ = m(ys, ylens, labels=labels)
        scores = m.score(ys, ylens)
    np.savez(
        os.path.join(out_dir, "fixtures_lm_bert.npz"),
        ys=ys.numpy(), ylens=ylens.numpy(), labels=labels.numpy(),
        logits=logits.numpy(), loss=loss.numpy(), scores=np.array(scores),
        **sd_np(m),
    )
    print("bert lm:", float(loss), scores)

    # --- RNNLM ---
    torch.manual_seed(7)
    rp = dict(
        vocab_size=V, embedding_size=16, hidden_size=24, num_layers=2,
        dropout_rate=0.0, tie_weights=False,
    )
    m = RNNLM(P(**rp)).eval()
    with torch.no_grad():
        logits = m(ys, ylens)
        loss, _ = m(ys, ylens, labels=labels)
        states = m.zero_states(B, ys.device)
        preds, new_states = m.predict(ys, ylens, states)
    np.savez(
        os.path.join(out_dir, "fixtures_lm_rnn.npz"),
        ys=ys.numpy(), ylens=ylens.numpy(), labels=labels.numpy(),
        logits=logits.numpy(), loss=loss.numpy(), preds=preds.numpy(),
        h=new_states[0].detach().numpy(), c=new_states[1].detach().numpy(),
        **sd_np(m),
    )
    print("rnn lm:", float(loss))

    # --- ELECTRA ---
    torch.manual_seed(8)
    ep = dict(
        vocab_size=V, max_seq_len=24,
        gen_hidden_size=32, gen_embedding_size=16, gen_num_layers=2,
        gen_num_attention_heads=4, gen_intermediate_size=64,
        disc_hidden_size=32, disc_embedding_size=16, disc_num_layers=2,
        disc_num_attention_heads=4, disc_intermediate_size=64,
        electra_disc_weight=50,
    )
    m = ELECTRAModel(P(**ep)).eval()
    error_labels = (torch.rand(B, L) > 0.8).long()
    with torch.no_grad():
        scores = m.score(ys, ylens)
        dloss, _ = m.forward_disc(ys, ylens, error_labels)
    np.savez(
        os.path.join(out_dir, "fixtures_lm_electra.npz"),
        ys=ys.numpy(), ylens=ylens.numpy(),
        error_labels=error_labels.numpy(),
        scores=np.array(scores), dloss=dloss.numpy(), **sd_np(m),
    )
    print("electra:", scores, float(dloss))


if __name__ == "__main__":
    main()
