"""Generate golden fixtures for encoder parity tests.

Runs the REFERENCE (torch) encoders at /root/reference on seeded random
inputs in eval mode and saves state_dict + inputs + outputs.  The fixtures
let `tests/test_encoders.py` verify that the JAX encoders reproduce the
reference bit-for-bit (up to float32 tolerance) after weight import —
required for the checkpoint-parity goal (SURVEY.md §7 hard part 3).

Run once: `python tools/gen_encoder_fixtures.py` (torch CPU).
"""

import os
import sys
from collections import namedtuple

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from asr.modeling.encoders.transformer import TransformerEncoder  # noqa: E402
from asr.modeling.encoders.rnn import RNNEncoder  # noqa: E402


def P(**kw):
    return namedtuple("Params", kw.keys())(**kw)


def save(path, model, xs, xlens, outs):
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez(
        path,
        xs=xs.numpy(),
        xlens=xlens.numpy(),
        eouts=outs[0].numpy(),
        elens=outs[1].numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print(path, "saved;", len(sd), "tensors; eouts", outs[0].shape)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "../tests")
    torch.manual_seed(0)

    base = dict(
        input_layer="conv2d",
        feat_dim=20,
        num_framestacks=1,
        enc_hidden_size=32,
        enc_num_attention_heads=4,
        enc_num_layers=2,
        enc_intermediate_size=64,
        dropout_enc_rate=0.0,
        dropout_attn_rate=0.0,
        pos_encode_type="abs",
    )

    xs = torch.randn(3, 45, 20)
    xlens = torch.tensor([45, 30, 17])

    # --- plain Transformer encoder ---
    enc = TransformerEncoder(P(**base)).eval()
    with torch.no_grad():
        outs = enc(xs, xlens)
    save(os.path.join(out_dir, "fixtures_enc_transformer.npz"), enc, xs, xlens, outs)

    # --- Conformer encoder (rel pos) ---
    torch.manual_seed(1)
    conf = dict(base, pos_encode_type="rel")
    enc = TransformerEncoder(P(**conf), is_conformer=True).eval()
    with torch.no_grad():
        outs = enc(xs, xlens)
    save(os.path.join(out_dir, "fixtures_enc_conformer.npz"), enc, xs, xlens, outs)

    # --- RNN encoder ---
    torch.manual_seed(2)
    rnnp = dict(
        input_layer="conv2d",
        feat_dim=20,
        num_framestacks=1,
        enc_hidden_size=32,
        enc_num_layers=2,
        dropout_enc_rate=0.0,
        enc_hidden_sum_fwd_bwd=True,
    )
    enc = RNNEncoder(P(**rnnp)).eval()
    with torch.no_grad():
        outs = enc(xs, xlens)
    save(os.path.join(out_dir, "fixtures_enc_rnn.npz"), enc, xs, xlens, outs)


if __name__ == "__main__":
    main()
