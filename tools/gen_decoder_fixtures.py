"""Generate golden fixtures for decoder parity tests (reference torch CPU).

Covers the Transformer attention decoder (logits + loss) and the LAS decoder
(logits path).  The RNN-T decoder module cannot be instantiated on CPU (it
imports the CUDA-only warp_rnnt at module import), so its lattice loss is
covered by the DP oracle in tests/test_rnnt_ops.py instead.
"""

import os
import sys
from collections import namedtuple

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from asr.modeling.decoders.transformer import TransformerDecoder  # noqa: E402
from asr.modeling.decoders.las import LASDecoder  # noqa: E402


def P(**kw):
    return namedtuple("Params", kw.keys())(**kw)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "../tests")
    torch.manual_seed(3)

    V = 30
    base = dict(
        vocab_size=V,
        dec_hidden_size=32,
        dec_num_attention_heads=4,
        dec_num_layers=2,
        dec_intermediate_size=64,
        dropout_dec_rate=0.0,
        dropout_attn_rate=0.0,
        mtl_ctc_weight=0.0,
        lsm_prob=0.1,
        loss_normalize_length=False,
        loss_normalize_batch=True,
        kd_weight=0.0,
        blank_id=0,
        eos_id=2,
        max_decode_ylen=16,
        enc_hidden_size=32,
    )

    B, T, U = 3, 12, 6
    eouts = torch.randn(B, T, 32)
    elens = torch.tensor([12, 9, 7])
    ys = torch.randint(3, V, (B, U))
    ylens = torch.tensor([6, 4, 3])
    # frame with sos/eos like asr/datasets.py collate (eos on both sides)
    ys_in = torch.full((B, U + 1), 2)
    ys_out = torch.full((B, U + 1), 2)
    for b in range(B):
        n = int(ylens[b])
        ys_in[b, 1 : 1 + n] = ys[b, :n]
        ys_out[b, :n] = ys[b, :n]
        ys_out[b, n] = 2

    dec = TransformerDecoder(P(**base)).eval()
    with torch.no_grad():
        loss, loss_dict, logits = dec(
            eouts, elens, None, ys, ylens, ys_in, ys_out
        )
        # uniform prefix lengths: the reference's forward_one_step always
        # reads the literal last position (transformer.py:156), which only
        # coincides with "per-row last" when lengths are uniform (as in its
        # beam search); fixture uses that regime.
        ylens_one = torch.full_like(ylens, U + 1)
        logits_one = dec.forward_one_step(ys_in, ylens_one, eouts)
    sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    np.savez(
        os.path.join(out_dir, "fixtures_dec_transformer.npz"),
        eouts=eouts.numpy(), elens=elens.numpy(), ys=ys.numpy(),
        ylens=ylens.numpy(), ys_in=ys_in.numpy(), ys_out=ys_out.numpy(),
        loss=loss.numpy(), loss_att=loss_dict["loss_att"].numpy(),
        logits=logits.numpy(), logits_one=logits_one.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("transformer decoder fixture saved; loss", float(loss))

    torch.manual_seed(4)
    lasp = dict(
        base,
        embedding_size=24,
        attn_dim=20,
    )
    dec = LASDecoder(P(**lasp)).eval()
    with torch.no_grad():
        loss, loss_dict, logits = dec(
            eouts, elens, None, ys, ylens, ys_in, ys_out
        )
    sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    np.savez(
        os.path.join(out_dir, "fixtures_dec_las.npz"),
        eouts=eouts.numpy(), elens=elens.numpy(), ys=ys.numpy(),
        ylens=ylens.numpy(), ys_in=ys_in.numpy(), ys_out=ys_out.numpy(),
        loss=loss.numpy(), logits=logits.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("las decoder fixture saved; loss", float(loss))


if __name__ == "__main__":
    main()
