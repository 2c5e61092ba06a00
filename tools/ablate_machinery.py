"""Split the attention-beam MACHINERY cost (tools/stub_beam stub0:
2.11 ms/step at B=64, W=10, V=10k — half the whole fused-decode step).

Times candidate pieces as 64-iteration fori_loops (the in-loop fusion
context, not isolated dispatches): log-softmax over (B*W, V), the
chunked and direct top-k, the W*W pool top-k, and combinations.  The
loop carries a scalar data dependence so nothing hoists.

Usage: python tools/ablate_machinery.py [--batch 64] [--tiny]
"""

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
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.vocab, args.steps = 2, 200, 4
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from emoasr_tpu.search.common import topk_lastdim

    B, W, V, S = args.batch, args.beam, args.vocab, args.steps
    N = B * W
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(N, V)).astype(np.float32))

    def loop(piece):
        def body(i, carry):
            x = logits + carry * 1e-9
            out = piece(x)
            return out.astype(jnp.float32).reshape(-1)[0]

        return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

    pieces = {
        "noop": lambda x: x[:1, :1],
        "logsm": lambda x: jax.nn.log_softmax(x, -1)[:1, :1],
        "topk_chunked": lambda x: topk_lastdim(
            x.reshape(B, W, V), W, mode="chunked"
        )[0],
        "topk_direct": lambda x: topk_lastdim(
            x.reshape(B, W, V), W, mode="direct"
        )[0],
        "logsm_topk": lambda x: topk_lastdim(
            jax.nn.log_softmax(x, -1).reshape(B, W, V), W, mode="chunked"
        )[0],
        "pool_topk": lambda x: jax.lax.top_k(
            x[:, : W * W].reshape(B, W * W)
            if False else x.reshape(B, W, V)[:, :, : W * W].reshape(B, -1),
            W,
        )[0],
        # max instead of topk: the cheapest possible selection
        "logsm_argmax": lambda x: jnp.max(
            jax.nn.log_softmax(x, -1), axis=-1, keepdims=True
        )[:1],
        "topk_pallas": lambda x: topk_lastdim(
            x.reshape(B, W, V), W, mode="pallas"
        )[0],
        "logsm_topk_pallas": lambda x: topk_lastdim(
            jax.nn.log_softmax(x, -1).reshape(B, W, V), W, mode="pallas"
        )[0],
    }

    compiled = {}
    for name, piece in pieces.items():
        t0 = time.perf_counter()
        compiled[name] = jax.jit(lambda p=piece: loop(p)).lower().compile()
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    def sync(out):
        return np.asarray(out)

    for c in compiled.values():
        sync(c())
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

    PIPE = 4
    print(f"\n| piece | ms/step (S={S}) |")
    print("|---|---|")
    for name, c in compiled.items():
        meds = []
        for _ in range(3):
            out = c()
            sync(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = c()
            sync(out)
            meds.append((time.perf_counter() - t0 - rtt) / PIPE)
        print(f"| {name} | {float(np.median(meds)) * 1e3 / S:.3f} |")


if __name__ == "__main__":
    main()
