"""Per-component breakdown of the FULL L3-3 fused beam step on chip.

VERDICT r3 #1 asks for the post-indirect step split: decoder-stack math
/ LM indirect step / CTC psi / pre-select top-k / loop carry.  This
tool times the REAL `attention_beam_search` (joint CTC 0.3 + indirect
LM SF 0.5, the bench L3-3 configuration) on precomputed encoder
outputs, with each component individually replaced by a near-zero-cost
stub.  `attention_beam.FORCE_FULL_STEPS` pins every variant to the same
trip count, so `full - stub_X` is component X's in-pipeline cost.

Variants:
  full       everything real (minus the encoder, timed separately by
             tools/profile_l33.py `encode`)
  nodec      decoder indirect step returns const logits (caches carried
             untouched) -> delta = decoder stack step
  nolm       LM fusion returns const logp, stateless -> delta = LM step
             + LM state carry
  noctc      psi/state_update stubbed (selection shape kept) -> delta =
             CTC prefix scoring
  notopk     pre-select topk_lastdim replaced by a slice -> delta =
             the (B, W, V) -> K2 selection
  floor      all of the above at once -> residual loop machinery

Usage: python tools/stub_full.py [--batch 64] [--steps 64] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="toy shapes on CPU (wiring check)")
    ap.add_argument("--variants",
                    default="full,nodec,nolm,noctc,notopk,floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
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
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.models.layers import make_pad_mask
    from emoasr_tpu.models.lm.lm import TransformerLM
    import emoasr_tpu.search.attention_beam as ab
    import emoasr_tpu.search.common as sc
    from emoasr_tpu.search.common import LMFusion, make_lm_fusion
    from emoasr_tpu.utils.precision import cast_floating

    # scoped: trace-time knob; restore on exit so an in-process caller
    # (tests importing this module's main) is not silently pinned to the
    # step cap afterwards (ADVICE r4)
    import contextlib

    ctx = ab.force_full_steps(True)
    ctx.__enter__()
    import atexit

    atexit.register(lambda: ctx.__exit__(None, None, None))

    if args.tiny:
        B, W, V, S, T, E = 2, 3, 64, 8, 17, 32
        dec_layers, lm_layers, inter = 2, 2, 64
        H, LMH = 32, 32
    else:
        B, W, V, S = args.batch, args.beam, args.vocab, args.steps
        T, E = 249, 256
        dec_layers, lm_layers, inter = 6, 4, 2048
        H, LMH = 256, 512
    N = B * W
    adt = jnp.dtype(args.dtype) if not args.tiny else jnp.float32

    cfg = config_from_dict(
        dict(
            encoder_type="conformer", decoder_type="transformer",
            pos_encode_type="rel", enc_hidden_size=E,
            enc_num_attention_heads=4, enc_num_layers=2,
            enc_intermediate_size=inter, dec_hidden_size=H,
            dec_num_attention_heads=4, dec_num_layers=dec_layers,
            dec_intermediate_size=inter, vocab_size=V, mtl_ctc_weight=0.3,
            max_decode_ylen=S, dropout_dec_rate=0.0,
        )
    )
    model = ASR(cfg)
    rng = np.random.default_rng(0)
    xs0 = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), xs0, jnp.asarray([40, 40]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 4]),
        jnp.ones((2, 5), jnp.int32), jnp.ones((2, 5), jnp.int32),
    )
    if adt != jnp.float32:
        variables = cast_floating(variables, adt)

    lm_cfg = config_from_dict(
        dict(
            lm_type="transformer", vocab_size=V, hidden_size=LMH,
            num_layers=lm_layers, num_attention_heads=4,
            intermediate_size=inter, max_seq_len=128, dropout_rate=0.0,
        )
    )
    lm = TransformerLM(lm_cfg)
    lvars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )
    if adt != jnp.float32:
        lvars = cast_floating(lvars, adt)

    eouts = jnp.asarray(
        rng.normal(size=(B, T, E)).astype(np.float32)
    ).astype(adt)
    elens = jnp.full((B,), T, jnp.int32)
    emask = make_pad_mask(elens, T)[:, None, None, :]
    logits_const = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))
    lm_logp_const = jnp.asarray(
        rng.normal(size=(B, W, V)).astype(np.float32)
    )
    ctc_lp = jnp.asarray(
        np.log(
            rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32) + 1e-8
        )
    )

    cross_kvs = model.apply(
        variables, eouts, method=lambda m, e: m.decoder.precompute_cross_kv(e)
    )

    def init_cache_fn(n, L):
        return model.apply(
            variables, n, L,
            method=lambda m, a, Lm: m.decoder.init_cache(a, Lm, dtype=adt),
        )

    def step_cached_fn(tokens, pos, caches):
        return model.apply(
            variables, tokens, pos, caches, cross_kvs, emask,
            method=lambda m, *a: m.decoder.decode_step_cached(
                *a, beam_width=W, step_mode="indirect", elens=elens
            ),
        )

    def step_indirect_fn(tokens, pos, caches, anc):
        return model.apply(
            variables, tokens, pos, caches, anc, cross_kvs, emask,
            method=lambda m, *a: m.decoder.decode_step_cached_indirect(
                *a, beam_width=W, step_mode="indirect", elens=elens
            ),
        )

    def stub_indirect_fn(tokens, pos, caches, anc):
        # data-dependence on tokens so nothing hoists; caches untouched
        return (
            logits_const + tokens[:, None].astype(jnp.float32) * 1e-9,
            caches,
        )

    real_lmf = make_lm_fusion(lm, lvars, 0.5, max_len=80, mode="indirect")

    def stub_lm_predict(hyps, lens, states):
        return (
            lm_logp_const + lens[:, :, None].astype(jnp.float32) * 1e-9,
            None,
        )

    stub_lmf = LMFusion(stub_lm_predict, lambda b, w, init_len=None: None,
                        0.5)

    real_psi = ab.ctc_prefix_score_psi
    real_upd = ab.ctc_prefix_state_update

    def stub_psi(lp_T, el, hyps, lens, cs, r_prev, blank, eos):
        return cs.astype(jnp.float32) * 1e-9

    def stub_upd(lp_T, el, hyps, lens, tok, r_prev, blank):
        return r_prev + tok[:, :, None, None].astype(jnp.float32) * 1e-9

    real_topk = ab.topk_lastdim

    def stub_topk(x, k, **kw):
        sh = x.shape[:-1] + (k,)
        return (
            jax.lax.slice_in_dim(x, 0, k, axis=-1),
            jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), sh),
        )

    def build(name):
        nodec = name in ("nodec", "floor")
        nolm = name in ("nolm", "floor")
        noctc = name in ("noctc", "floor")
        notopk = name in ("notopk", "floor")
        ab.ctc_prefix_score_psi = stub_psi if noctc else real_psi
        ab.ctc_prefix_state_update = stub_upd if noctc else real_upd
        ab.topk_lastdim = stub_topk if notopk else real_topk
        try:
            fn = lambda: ab.attention_beam_search(
                eouts, elens, None, vocab_size=V, beam_width=W,
                len_weight=2.0,
                lm=stub_lmf if nolm else real_lmf,
                decode_ctc_weight=0.3, ctc_log_probs=ctc_lp,
                max_decode_ylen=S,
                cached_step=(
                    init_cache_fn, step_cached_fn,
                    stub_indirect_fn if nodec else step_indirect_fn,
                ),
            )
            return jax.jit(fn).lower().compile()
        finally:
            ab.ctc_prefix_score_psi = real_psi
            ab.ctc_prefix_state_update = real_upd
            ab.topk_lastdim = real_topk

    want = args.variants.split(",")
    compiled = {}
    for name in want:
        t0 = time.perf_counter()
        compiled[name] = build(name)
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    ftriv = jax.jit(lambda l: l[0] * 1).lower(elens).compile()
    np.asarray(ftriv(elens))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(elens))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)

    times = {n: [] for n in compiled}
    for n, c in compiled.items():
        np.asarray(c()[0][(0, 0, 0)])  # warm
    PIPE = 2
    for _ in range(args.reps):
        for n, c in compiled.items():
            out = c()
            np.asarray(out[0][(0, 0, 0)])
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = c()
            np.asarray(out[0][(0, 0, 0)])
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    med = {n: float(np.median(ts)) for n, ts in times.items()}
    print(f"\nB={B} W={W} V={V} steps={S} dtype={adt}")
    print("| variant | ms | ms/step | delta vs full (= component cost) |")
    print("|---|---|---|---|")
    for n in compiled:
        if "full" in med:
            d = med["full"] - med[n]
            delta = f"{d * 1e3:.1f} ms ({d * 1e3 / S:.3f}/step)"
        else:
            delta = "n/a (full variant not run)"
        print(
            f"| {n} | {med[n] * 1e3:.1f} | {med[n] * 1e3 / S:.3f} "
            f"| {delta} |"
        )


if __name__ == "__main__":
    main()
