"""A/B the fused Pallas LSTM vs the lax.scan path on the chip.

Times fwd and fwd+bwd at transducer prediction-net shapes (the VERDICT
r3 #5 target: 5.9 ms of the 24.1 ms T5 step) and RNN-encoder shapes,
with the standard AOT + pipelined-dispatch + one-fetch protocol.

Usage: python tools/bench_lstm.py [--reps 5] [--tiny]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
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

    import emoasr_tpu.ops.lstm as lstm_mod
    from emoasr_tpu.ops.lstm_pallas import lstm_scan_pallas

    shapes = (
        [(2, 9, 64)] if args.tiny
        else [
            (16, 49, 512),   # T5 prediction net (B, U+1, H)
            (64, 49, 512),   # wider batch
            (32, 200, 320),  # RNN-encoder-class (per direction)
        ]
    )
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def scan_ref(xp, whh, h0, c0):
        lstm_mod.USE_PALLAS = False
        try:
            return lstm_mod.lstm_scan(xp, whh, h0, c0)
        finally:
            lstm_mod.USE_PALLAS = None

    variants = {}
    for (B, T, H) in shapes:
        xp = jnp.asarray(
            rng.normal(size=(B, T, 4 * H)).astype(np.float32)
        ).astype(dt)
        whh = jnp.asarray(
            (rng.normal(size=(4 * H, H)) * 0.1).astype(np.float32)
        ).astype(dt)
        h0 = jnp.zeros((B, H), dt)
        c0 = jnp.zeros((B, H), dt)

        def loss(fn):
            def f(xp, whh, h0, c0):
                ys, (h, c) = fn(xp, whh, h0, c0)
                return (
                    ys.astype(jnp.float32).sum()
                    + h.astype(jnp.float32).sum()
                )
            return f

        for name, fn in (("scan", scan_ref), ("pallas", lstm_scan_pallas)):
            cf = jax.jit(lambda a, b, c, d, fn=fn: fn(a, b, c, d)[0]).lower(
                xp, whh, h0, c0
            ).compile()
            cg = jax.jit(
                jax.grad(loss(fn), argnums=(0, 1))
            ).lower(xp, whh, h0, c0).compile()
            variants[f"{B}x{T}x{H}_{name}_fwd"] = (
                lambda cf=cf, a=xp, b=whh, c=h0, d=c0: cf(a, b, c, d)
            )
            variants[f"{B}x{T}x{H}_{name}_fwdbwd"] = (
                lambda cg=cg, a=xp, b=whh, c=h0, d=c0: cg(a, b, c, d)
            )
        print(f"{B}x{T}x{H}: compiled", flush=True)

    def sync(out):
        a = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(a[(0,) * a.ndim])

    for n, f in variants.items():
        sync(f())
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

    # sub-ms kernels vs a ~30 ms tunnel RTT: the floor subtraction's
    # jitter must be amortized over MANY dispatches or it dominates
    PIPE = 2 if args.tiny else 50
    times = {n: [] for n in variants}
    for _ in range(args.reps):
        for n, f in variants.items():
            out = f()
            sync(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = f()
            sync(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    print("\n| variant | median ms |")
    print("|---|---|")
    for n in times:
        print(f"| {n} | {float(np.median(times[n])) * 1e3:.2f} |")


if __name__ == "__main__":
    main()
