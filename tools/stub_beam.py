"""Time the REAL attention_beam_search with the decoder step stubbed.

Splits the measured att-variant time (tools/profile_l33) into
decoder-step vs selection/bookkeeping machinery as they run inside the
actual staged while_loop (the microbench in tools/ablate_beam measures
components in isolation, which can fuse differently).

Variants:
  real   - KV-cached decoder step (same as profile_l33 att)
  stub   - step returns precomputed constant logits, caches untouched
  stub0  - like stub but with NO caches in the loop state at all
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.search.attention_beam import attention_beam_search


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--step-mode", default="dense",
                    help="real-variant decoder step: dense | fused")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    B, W, V, S = args.batch, args.beam, args.vocab, args.steps
    N = B * W

    # honor JAX_PLATFORMS (the injected axon plugin force-sets
    # jax_platforms at interpreter start; prep.py:489 pattern)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    cfg = config_from_dict(
        dict(
            encoder_type="conformer", decoder_type="transformer",
            pos_encode_type="rel", enc_hidden_size=256,
            enc_num_attention_heads=4, enc_num_layers=12,
            enc_intermediate_size=1024, dec_hidden_size=256,
            dec_num_attention_heads=4, dec_num_layers=6,
            dec_intermediate_size=2048, vocab_size=V, mtl_ctc_weight=0.3,
            max_decode_ylen=S, dropout_dec_rate=0.0,
        )
    )
    model = ASR(cfg)
    rng = np.random.default_rng(0)
    T, E = 249, 256
    xs = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), xs, jnp.asarray([40, 40]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 4]),
        jnp.ones((2, 5), jnp.int32), jnp.ones((2, 5), jnp.int32),
    )
    adt = jnp.dtype(args.dtype)
    if adt != jnp.float32:
        from emoasr_tpu.utils.precision import cast_floating

        variables = cast_floating(variables, adt)
    eouts = jnp.asarray(
        rng.normal(size=(B, T, E)).astype(np.float32)
    ).astype(adt)
    elens = jnp.full((B,), T, jnp.int32)
    emask = jnp.ones((B, 1, 1, T), bool)
    logits_const = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))

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
                *a, beam_width=W, step_mode=args.step_mode, elens=elens
            ),
        )

    def step_noshare_fn(tokens, pos, caches):
        # pre-r3 layout: cross-KV replicated across beams
        ckv_rep = [
            tuple(
                jnp.broadcast_to(x[:, None], (B, W) + x.shape[1:]).reshape(
                    (N,) + x.shape[1:]
                )
                for x in kv
            )
            for kv in cross_kvs
        ]
        emask_rep = jnp.ones((N, 1, 1, T), bool)
        return model.apply(
            variables, tokens, pos, caches, ckv_rep, emask_rep,
            method=lambda m, *a: m.decoder.decode_step_cached(*a),
        )

    def stub_step_fn(tokens, pos, caches):
        # data-dependence on tokens so nothing hoists, but ~zero work
        return logits_const + tokens[:, None].astype(jnp.float32) * 1e-9, caches

    def stub_touch_fn(tokens, pos, caches):
        # caches stay live (write+read) but no decoder math: isolates the
        # cache carry/gather/freeze traffic of the real loop
        new_caches = [
            (
                k.at[jnp.arange(N), pos].add(tokens[:, None, None] * 1e-9),
                v,
            )
            for (k, v) in caches
        ]
        probe = sum(k[0, 0, 0, 0] for k, _ in new_caches)
        return logits_const + probe * 1e-9 + tokens[:, None] * 0.0, new_caches

    def stub0_step_fn(hyps_flat, lens_flat, eo, el):
        return logits_const + lens_flat[:, None].astype(jnp.float32) * 1e-9

    def run(mode):
        if mode == "real":
            cs = (init_cache_fn, step_cached_fn)
        elif mode == "real_noshare":
            cs = (init_cache_fn, step_noshare_fn)
        elif mode == "stub":
            cs = (init_cache_fn, stub_step_fn)
        elif mode == "stub_touch":
            cs = (init_cache_fn, stub_touch_fn)
        else:
            return attention_beam_search(
                eouts, elens, stub0_step_fn, vocab_size=V, beam_width=W,
                len_weight=2.0, max_decode_ylen=S,
            )
        return attention_beam_search(
            eouts, elens, None, vocab_size=V, beam_width=W,
            len_weight=2.0, max_decode_ylen=S, cached_step=cs,
        )

    compiled = {}
    for mode in ("real", "real_noshare", "stub", "stub_touch", "stub0"):
        t0 = time.perf_counter()
        c = jax.jit(lambda m=mode: run(m)).lower().compile()
        compiled[mode] = c
        print(f"{mode}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    ftriv = jax.jit(lambda l: l[0] * 1).lower(elens).compile()
    np.asarray(ftriv(elens))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(elens))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"fetch floor: {floor * 1000:.1f} ms", flush=True)

    for mode, c in compiled.items():
        np.asarray(c()[0])  # warm
        meds = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = c()
            np.asarray(out[0])
            meds.append((time.perf_counter() - t0) / 4)
        dt = min(meds) - floor
        print(f"{mode}: {dt * 1000:.1f} ms ({dt * 1000 / S:.3f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
