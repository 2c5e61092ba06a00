"""A/B the CTC and RNN-T beam rows: compute dtype x top-k strategy.

The r3 mid-round snapshot (f32, pre-rebuild, commit 5cd9f) measured
ctc_beam8 7.9e-5 @B=128 and rnnt_beam10 4.15e-4 @B=16; the end-of-round
rows (bf16, post-rebuild) measure 1.04e-4 and 1.05e-3 — slower, and the
quiet-host rerun reproduced it, so it is code/dtype, not host load.
Candidate causes: the bf16 row switch (707dbd0) and the chunked
vocab top-k (9c1900d/06efeda, tuned at V=10k for the attention beam).

Variants per row: {bf16, f32} x {chunked topk_lastdim, direct
lax.top_k} — four compiles each, timed round-robin with the standard
one-fetch protocol.

Usage: python tools/ablate_beam_dtype.py [--row ctc|rnnt|both]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default="both", choices=["ctc", "rnnt", "both"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR
    import emoasr_tpu.search.common as search_common
    import emoasr_tpu.search.ctc_beam as ctc_beam
    import emoasr_tpu.search.rnnt_beam as rnnt_beam

    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=2 if args.tiny else 12,
        dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    H = 64 if args.tiny else 256
    rows = {}
    if args.row in ("ctc", "both"):
        rows["ctc_beam8"] = (
            dict(
                ENC, encoder_type="transformer", decoder_type="ctc",
                enc_hidden_size=H,
                enc_intermediate_size=H * 8,
                vocab_size=100 if args.tiny else 10000,
            ),
            8, {"len_weight": 2.0},
            2 if args.tiny else 128,
        )
    if args.row in ("rnnt", "both"):
        rows["rnnt_beam10"] = (
            dict(
                ENC, encoder_type="conformer",
                decoder_type="rnn_transducer", pos_encode_type="rel",
                enc_hidden_size=H, enc_intermediate_size=H * 4,
                embedding_size=128, dec_hidden_size=H * 2,
                dec_num_layers=1, joint_hidden_size=H * 2,
                vocab_size=100 if args.tiny else 1000,
                max_decode_ylen=100,
            ),
            10, {},
            2 if args.tiny else 16,
        )

    T = 100 if args.tiny else 1000
    key = jax.random.PRNGKey(0)

    # direct top_k stand-in with the exact topk_lastdim signature
    def direct_topk(x, k, chunk=128):
        return jax.lax.top_k(x, k)

    patch_points = [search_common, ctc_beam, rnnt_beam]

    variants = {}
    for row_name, (cfg_kw, W, beam_kw, B) in rows.items():
        xs = jax.jit(lambda k: jax.random.normal(k, (B, T, 80)))(key)
        xlens = jnp.full((B,), T, jnp.int32)
        for dtype in ("bfloat16", "float32"):
            cfg = config_from_dict(dict(cfg_kw, compute_dtype=dtype))
            model = ASR(cfg)
            v = model.init(
                key, xs, xlens, jnp.ones((B, 4), jnp.int32),
                jnp.full((B,), 4), jnp.ones((B, 5), jnp.int32),
                jnp.ones((B, 5), jnp.int32),
            )
            for tk_name, tk in (("chunked", None), ("direct", direct_topk)):
                saved = [
                    getattr(m, "topk_lastdim", None) for m in patch_points
                ]
                try:
                    if tk is not None:
                        for m in patch_points:
                            if hasattr(m, "topk_lastdim"):
                                m.topk_lastdim = tk
                    dec = build_decode_fn(
                        model, v, cfg, beam_width=W, **beam_kw
                    )
                    dec = dec.bind_compiled(dec.lower(xs, xlens).compile())
                finally:
                    for m, s in zip(patch_points, saved):
                        if s is not None:
                            m.topk_lastdim = s
                variants[f"{row_name}_{dtype[:4]}_{tk_name}"] = (
                    lambda dec=dec, xs=xs, xlens=xlens: dec(xs, xlens),
                    B,
                )
        print(f"{row_name}: 4 variants compiled", flush=True)

    names = list(variants)

    def sync(out):
        a = out[0]
        return np.asarray(a[(0,) * a.ndim])

    for n in names:
        sync(variants[n][0]())
    xl0 = jnp.zeros((4,), jnp.int32)
    ftriv = jax.jit(lambda x: x[0] * 1).lower(xl0).compile()
    np.asarray(ftriv(xl0))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(xl0))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)

    PIPE = 2
    times = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:
            f, _ = variants[n]
            out = f()
            sync(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = f()
            sync(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    print("\n| variant | median ms | RTF |")
    print("|---|---|---|")
    for n in names:
        med = float(np.median(times[n]))
        B = variants[n][1]
        print(f"| {n} | {med * 1e3:.1f} | {med / (B * T * 0.01):.6f} |")


if __name__ == "__main__":
    main()
