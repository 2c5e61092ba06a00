"""L3-3 fused-decode breakdown on the chip.

Times the flagship attention-beam decode (B configurable, W=10, T=1000
frames -> 250 encoder frames, vocab 10k) in component ablations, all
AOT-compiled in one process, round-robin:

- att            plain attention beam (no CTC, no LM)
- att_ctc        + joint CTC prefix scoring (w=0.3)
- att_sf         + stateless-LM shallow fusion only (w=0.5)
- att_sf_cached  + KV-cached-LM shallow fusion only
- full           att + CTC + stateless LM (the bench L3-3 row)
- full_cached    att + CTC + cached LM

Deltas vs `att` isolate each component's per-decode cost.

Usage: python tools/profile_l33.py [--batch 16] [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    help="decode compute dtype (float32 | bfloat16)")
    ap.add_argument("--step-mode", default="dense",
                    help="decoder beam step: dense | fused | auto "
                         "(ops/decoder_step_pallas.py)")
    ap.add_argument("--max-ylen", type=int, default=64)
    ap.add_argument("--variants", default=(
        "encode,att,att_ctc,att_sf,att_sf_cached,full,full_cached"
    ))
    ap.add_argument("--topk", default=None, choices=[None, "direct",
                                                     "chunked"],
                    help="force the beam top-k strategy (r4 ablation: "
                         "direct lax.top_k beat the chunked kernel "
                         "in-pipeline for ctc/rnnt beams)")
    ap.add_argument("--lm-step", default="auto",
                    choices=["auto", "fused", "xla"],
                    help="indirect LM layer step: fused Pallas kernel "
                         "(ops/lm_step_pallas.py) vs the XLA chain")
    args = ap.parse_args()
    want = set(args.variants.split(","))

    import jax
    import jax.numpy as jnp

    # honor JAX_PLATFORMS (the injected axon plugin force-sets
    # jax_platforms at interpreter start; prep.py:489 pattern)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

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
    from emoasr_tpu.models.lm.lm import TransformerLM
    import emoasr_tpu.search.common as search_common
    from emoasr_tpu.search.common import make_lm_fusion

    if args.topk:
        search_common.TOPK_MODE = args.topk
    if args.lm_step != "auto":
        import emoasr_tpu.models.lm.bert as bert_mod

        bert_mod.FUSED_INDIRECT_STEP = args.lm_step == "fused"

    B, T = args.batch, 1000
    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    L3 = dict(
        ENC, encoder_type="conformer", decoder_type="transformer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, dec_hidden_size=256,
        dec_num_attention_heads=4, dec_num_layers=6,
        dec_intermediate_size=2048, vocab_size=10000, mtl_ctc_weight=0.3,
        max_decode_ylen=args.max_ylen, dropout_dec_rate=0.0,
        compute_dtype=args.dtype, dec_step_mode=args.step_mode,
    )
    cfg = config_from_dict(L3)
    model = ASR(cfg)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    xs = jax.jit(lambda k: jax.random.normal(k, (B, T, 80)))(key)
    xlens = jnp.full((B,), T, jnp.int32)
    variables = model.init(
        key, xs, xlens, jnp.ones((B, 4), jnp.int32), jnp.full((B,), 4),
        jnp.ones((B, 5), jnp.int32), jnp.ones((B, 5), jnp.int32),
    )

    lm_cfg = config_from_dict(
        dict(
            lm_type="transformer", vocab_size=10000, hidden_size=512,
            num_layers=4, num_attention_heads=8, intermediate_size=2048,
            max_seq_len=128, dropout_rate=0.0,
        )
    )
    lm = TransformerLM(lm_cfg)
    lvars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )
    if args.dtype == "bfloat16":
        from emoasr_tpu.utils.precision import cast_floating

        lvars = cast_floating(lvars, jnp.bfloat16)

    def build(beam_kw, lm_mode=None):
        lmf = (
            make_lm_fusion(lm, lvars, 0.5, max_len=80, mode=lm_mode)
            if lm_mode
            else None
        )
        decode = build_decode_fn(
            model, variables, cfg, beam_width=10, lm=lmf, **beam_kw
        )
        return decode.bind_compiled(decode.lower(xs, xlens).compile())

    specs = {
        "att": ({"len_weight": 2.0}, None),
        "att_ctc": ({"len_weight": 2.0, "decode_ctc_weight": 0.3}, None),
        "att_sf": ({"len_weight": 2.0}, "stateless"),
        "att_sf_cached": ({"len_weight": 2.0}, "cached"),
        "full": ({"len_weight": 2.0, "decode_ctc_weight": 0.3}, "stateless"),
        "full_cached": (
            {"len_weight": 2.0, "decode_ctc_weight": 0.3}, "cached"
        ),
        "full_ind": (
            {"len_weight": 2.0, "decode_ctc_weight": 0.3}, "indirect"
        ),
    }
    runs = {}
    if "encode" in want:
        # encoder + cross-KV + CTC head alone: splits the utterance-level
        # prologue from the beam loop
        from emoasr_tpu.utils.precision import cast_floating, is_half

        evars = (
            cast_floating(variables, jnp.bfloat16)
            if is_half(cfg) else variables
        )

        def enc_all(v, xs_, xlens_):
            x2 = xs_.astype(jnp.bfloat16) if is_half(cfg) else xs_
            eouts, elens, _ = model.apply(v, x2, xlens_, method=ASR.encode)
            ckv = model.apply(
                v, eouts, method=lambda m, e: m.decoder.precompute_cross_kv(e)
            )
            lp = model.apply(
                v, eouts, method=lambda m, e: m.decoder.ctc.logits(e)
            )
            return eouts, ckv, lp

        cenc = jax.jit(enc_all).lower(evars, xs, xlens).compile()
        runs["encode"] = lambda: cenc(evars, xs, xlens)
    for name, (kw, mode) in specs.items():
        if name not in want:
            continue
        t0 = time.perf_counter()
        c = build(kw, mode)
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
        runs[name] = lambda c=c: c(xs, xlens)

    def sync(out):
        # fetch ONE element, not the whole leading output: the encode
        # variant's eouts is ~4 MB and fetching it charges tunnel
        # BANDWIDTH to the variant (the subtracted floor only covers a
        # scalar fetch's RTT) — that bulk fetch once mis-attributed
        # ~33 ms to "encode" (40.2 ms reported vs ~7 ms real, see
        # tools/ablate_conformer.py)
        a = out[0]
        return np.asarray(a[(0,) * a.ndim])

    for n in runs:
        sync(runs[n]())
    # one-fetch transport floor (every np.asarray pays the tunnel RTT)
    ftriv = jax.jit(lambda l: l[0] * 1).lower(xlens).compile()
    np.asarray(ftriv(xlens))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(xlens))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)
    times = {n: [] for n in runs}
    PIPE = 2  # amortize the tunnel round trip; decodes are 100s of ms
    for _ in range(args.reps):
        for n in runs:
            out = runs[n]()
            sync(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = runs[n]()
            sync(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)
    audio_s = B * T * 0.01
    print(f"\n| variant | median ms | RTF (B={B}) |")
    print("|---|---|---|")
    for n in runs:
        med = float(np.median(times[n]))
        print(f"| {n} | {med * 1e3:.1f} | {med / audio_s:.5f} |")


if __name__ == "__main__":
    main()
