"""Decode benchmark suite: every search path at realistic sizes on chip.

Reproduces the numbers in README.md's performance table (not the driver
contract — that is bench.py).  Usage: python tools/bench_decode.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, sync, n=3):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR

    key = jax.random.PRNGKey(0)
    rows = []

    def make_fusion(mode):
        from emoasr_tpu.models.lm.lm import TransformerLM
        from emoasr_tpu.search.common import make_lm_fusion

        lm_cfg = config_from_dict(
            dict(lm_type="transformer", vocab_size=10000, hidden_size=512,
                 num_layers=4, num_attention_heads=8, intermediate_size=2048,
                 max_seq_len=128, dropout_rate=0.0)
        )
        lm = TransformerLM(lm_cfg)
        lvars = lm.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32),
            jnp.asarray([2]),
        )
        return make_lm_fusion(lm, lvars, 0.5, max_len=80, mode=mode)

    def bench(name, cfg_kw, B, T, beams):
        cfg = config_from_dict(cfg_kw)
        model = ASR(cfg)
        xs = jax.jit(lambda k: jax.random.normal(k, (B, T, 80)))(key)
        xlens = jnp.full((B,), T, jnp.int32)
        v = model.init(
            key, xs, xlens, jnp.ones((B, 4), jnp.int32), jnp.full((B,), 4),
            jnp.ones((B, 5), jnp.int32), jnp.ones((B, 5), jnp.int32),
        )
        np.asarray(xs[0, 0, :1])
        for W, kw in beams:
            kw = dict(kw)
            fusion_mode = kw.pop("fusion", None)
            lm = make_fusion(fusion_mode) if fusion_mode else None
            dec = build_decode_fn(model, v, cfg, beam_width=W, lm=lm, **kw)
            dt = timeit(lambda: dec(xs, xlens), lambda o: np.asarray(o[0]))
            rtf = dt / (B * T * 0.01)
            tag = f"{name} W={W}" + (f" +SF[{fusion_mode}]" if fusion_mode else "")
            rows.append((tag, f"{dt*1000:.0f} ms", f"{rtf:.2e}"))
            print(f"{tag}: {dt*1000:.0f} ms (RTF {rtf:.2e})", flush=True)

    enc = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    bench(
        "L1 CTC(Trf)",
        dict(enc, encoder_type="transformer", decoder_type="ctc",
             enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=10000),
        64, 1000, [(0, {}), (8, {"len_weight": 2.0})],
    )
    bench(
        "T5 RNN-T(Cf)",
        dict(enc, encoder_type="conformer", decoder_type="rnn_transducer",
             pos_encode_type="rel", enc_hidden_size=256,
             enc_intermediate_size=1024, embedding_size=128,
             dec_hidden_size=512, dec_num_layers=1, joint_hidden_size=512,
             vocab_size=1000, max_decode_ylen=100),
        8, 1000, [(0, {}), (10, {})],
    )
    bench(
        "L3-3 Trf(Cf)+CTC",
        dict(enc, encoder_type="conformer", decoder_type="transformer",
             pos_encode_type="rel", enc_hidden_size=256,
             enc_intermediate_size=1024, dec_hidden_size=256,
             dec_num_attention_heads=4, dec_num_layers=6,
             dec_intermediate_size=2048, vocab_size=10000,
             mtl_ctc_weight=0.3, max_decode_ylen=64, dropout_dec_rate=0.0),
        8, 1000, [
            (10, {"len_weight": 2.0, "decode_ctc_weight": 0.3}),
            # the flagship L3-3 decode: + Transformer-LM shallow fusion
            (10, {"len_weight": 2.0, "decode_ctc_weight": 0.3,
                  "fusion": "stateless"}),
            (10, {"len_weight": 2.0, "decode_ctc_weight": 0.3,
                  "fusion": "cached"}),
        ],
    )
    bench(
        "LAS(Trf)",
        dict(enc, encoder_type="transformer", decoder_type="las",
             enc_hidden_size=256, enc_intermediate_size=2048,
             dec_hidden_size=256, dec_num_layers=1,
             dec_intermediate_size=256, embedding_size=128,
             vocab_size=10000, max_decode_ylen=64, dropout_dec_rate=0.0),
        8, 1000, [(0, {}), (4, {"len_weight": 1.0})],
    )
    print()
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} |")


if __name__ == "__main__":
    main()
