"""Ablate the attention-beam loop body on the real chip.

Each variant runs the SAME 64-iteration fori_loop carrying realistic
state, with one component of the beam body active, AOT-compiled, timed
with pipelined dispatch + one fetch (minus the transport floor).  This
splits the ~5.4 ms/step observed in the full search (tools/profile_l33)
into: decoder step, vocab top-k, softmax, cache beam-gather, hyp
bookkeeping.

Usage: python tools/ablate_beam.py [--batch 16] [--beam 10]
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


def timeit(fn, n=8, reps=3):
    outs = [fn() for _ in range(2)]
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, outs[-1]
    )
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)
        meds.append((time.perf_counter() - t0) / n)
    return min(meds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=10000)
    args = ap.parse_args()
    B, W, V, S = args.batch, args.beam, args.vocab, args.steps
    N = B * W
    Lmax = S + 2

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
    T = 249  # subsampled length for 1000 frames
    E = 256
    xs = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), xs, jnp.asarray([40, 40]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 4]),
        jnp.ones((2, 5), jnp.int32), jnp.ones((2, 5), jnp.int32),
    )
    eouts = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    emask = jnp.ones((B, 1, 1, T), bool)

    cross_kvs = model.apply(
        variables, eouts, method=lambda m, e: m.decoder.precompute_cross_kv(e)
    )

    def init_cache(n):
        return model.apply(
            variables, n, Lmax,
            method=lambda m, a, L: m.decoder.init_cache(a, L),
        )

    def step_cached(tokens, pos, caches):
        return model.apply(
            variables, tokens, pos, caches, cross_kvs, emask,
            method=lambda m, *a: m.decoder.decode_step_cached(
                *a, beam_width=W
            ),
        )

    rows = {}

    # ---- 1. decoder step only (carry token, no selection) ----
    def run_step_only(eo_unused):
        caches = init_cache(N)

        def body(i, carry):
            tok, caches = carry
            logits, caches = step_cached(
                tok, jnp.full((N,), i, jnp.int32), caches
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), caches

        tok, caches = jax.lax.fori_loop(
            0, S, body, (jnp.zeros((N,), jnp.int32), caches)
        )
        return tok

    # ---- 2. log_softmax + top_k(W) over (B, W, V) ----
    logits0 = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))

    # ---- 3. cache beam-gather only ----
    def run_gather(eo_unused):
        caches = init_cache(N)
        caches = jax.tree_util.tree_map(
            lambda x: x.reshape((B, W) + x.shape[1:]), caches
        )
        parent0 = jnp.asarray(
            rng.integers(0, W, size=(B, W)).astype(np.int32)
        )

        def body(i, carry):
            caches, parent = carry
            caches = jax.tree_util.tree_map(
                lambda x: jnp.take_along_axis(
                    x,
                    parent.reshape(B, W, *([1] * (x.ndim - 2))),
                    axis=1,
                ),
                caches,
            )
            return caches, (parent + 1) % W

        caches, _ = jax.lax.fori_loop(0, S, body, (caches, parent0))
        return jax.tree_util.tree_leaves(caches)[0][:, 0, 0, 0, 0]

    # ---- 4. hyp scatter + result bookkeeping ----
    def run_bookkeep(eo_unused):
        b_idx = jnp.arange(B)[:, None]
        w_idx = jnp.arange(W)[None, :]
        hyps = jnp.zeros((B, W, Lmax), jnp.int32)
        lens = jnp.ones((B, W), jnp.int32)

        def body(i, carry):
            hyps, lens = carry
            parent = (w_idx + i) % W * jnp.ones((B, W), jnp.int32)
            hyps = jnp.take_along_axis(hyps, parent[:, :, None], axis=1)
            lens = jnp.take_along_axis(lens, parent, axis=1) + 1
            pos = jnp.minimum(lens - 1, Lmax - 1)
            hyps = hyps.at[b_idx, w_idx, pos].set(i)
            return hyps, lens

        hyps, lens = jax.lax.fori_loop(0, S, body, (hyps, lens))
        return lens

    # ---- 5. top-k strategy variants (same loop shape as 2) ----
    def topk_2level(x, k, chunk):
        lead = x.shape[:-1]
        Vx = x.shape[-1]
        C = -(-Vx // chunk)
        pad = C * chunk - Vx
        xp = jnp.pad(
            x, [(0, 0)] * len(lead) + [(0, pad)],
            constant_values=-jnp.inf,
        )
        xc = xp.reshape(lead + (C, chunk))
        v1, i1 = jax.lax.top_k(xc, k)
        i1 = i1 + (jnp.arange(C) * chunk)[:, None]
        v1 = v1.reshape(lead + (C * k,))
        i1 = i1.reshape(lead + (C * k,))
        v2, i2 = jax.lax.top_k(v1, k)
        return v2, jnp.take_along_axis(i1, i2, -1)

    def make_run_topk(impl):
        def run(logits):
            def body(i, carry):
                sc = jax.nn.log_softmax(
                    (logits + carry[:, None] * 1e-6).astype(jnp.float32), -1
                ).reshape(B, W, V)
                sel_sc, sel_tok = impl(sc, W)
                pool = sel_sc.reshape(B, W * W)
                top_sc, top_idx = jax.lax.top_k(pool, W)
                return top_sc.reshape(-1).repeat(W)[:N] + carry * 0

            return jax.lax.fori_loop(0, S, body, jnp.zeros((N,), jnp.float32))

        return run

    def topk_iter(x, k):
        vals, idxs = [], []
        cur = x
        for _ in range(k):
            i = jnp.argmax(cur, -1)
            v = jnp.take_along_axis(cur, i[..., None], -1)[..., 0]
            vals.append(v)
            idxs.append(i)
            cur = cur.at[
                jnp.arange(B)[:, None], jnp.arange(W)[None, :], i
            ].set(-jnp.inf)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)

    def run_topk_raw(logits):
        # lse trick: top_k on RAW logits, normalize the k winners only
        def body(i, carry):
            lg = (logits + carry[:, None] * 1e-6).reshape(B, W, V)
            lse = jax.scipy.special.logsumexp(
                lg.astype(jnp.float32), axis=-1, keepdims=True
            )
            sel_sc, sel_tok = topk_2level(lg, W, 512)
            sel_sc = sel_sc.astype(jnp.float32) - lse
            pool = sel_sc.reshape(B, W * W)
            top_sc, top_idx = jax.lax.top_k(pool, W)
            return top_sc.reshape(-1).repeat(W)[:N] + carry * 0

        return jax.lax.fori_loop(0, S, body, jnp.zeros((N,), jnp.float32))

    progs = {
        "decoder_step": run_step_only,
        "softmax_topk": None,  # special input
        "topk2l_128": None,
        "topk2l_512": None,
        "topk2l_1024": None,
        "topk_iter": None,
        "topk_raw_lse": None,
        "cache_gather": run_gather,
        "bookkeeping": run_bookkeep,
    }
    topk_fns = {
        "softmax_topk": make_run_topk(jax.lax.top_k),
        "topk2l_128": make_run_topk(lambda x, k: topk_2level(x, k, 128)),
        "topk2l_512": make_run_topk(lambda x, k: topk_2level(x, k, 512)),
        "topk2l_1024": make_run_topk(lambda x, k: topk_2level(x, k, 1024)),
        "topk_iter": make_run_topk(topk_iter),
        "topk_raw_lse": run_topk_raw,
    }

    compiled = {}
    for name, fn in progs.items():
        t0 = time.perf_counter()
        if name in topk_fns:
            c = jax.jit(topk_fns[name]).lower(logits0).compile()
            compiled[name] = lambda c=c: c(logits0)
        else:
            c = jax.jit(fn).lower(eouts).compile()
            compiled[name] = lambda c=c: c(eouts)
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    ftriv = jax.jit(lambda l: l[0] * 1).lower(jnp.arange(4)).compile()
    np.asarray(ftriv(jnp.arange(4)))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(jnp.arange(4)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"fetch floor: {floor * 1000:.1f} ms", flush=True)

    print(f"\n{S}-step loops at B={B} W={W} V={V}:")
    print("| component | total ms | ms/step |")
    print("|---|---|---|")
    for name, fn in compiled.items():
        dt = timeit(fn) - floor
        print(
            f"| {name} | {dt * 1000:.1f} | {dt * 1000 / S:.3f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
