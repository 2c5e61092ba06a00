"""Beam-reindex gather formulations on the chip.

The per-step beam gather of KV caches is the dominant cost of both the
attention-beam loop and cached LM fusion (tools/stub_lm.py: 795 us/step
for the LM's 8 leaves at Lc=64 bf16 = ~26% of HBM speed-of-light).
This tool times one step's worth of cache gather (8 leaves of
(B, W, Lc, H, dk)) under different formulations:

- tala_axis1   take_along_axis on axis 1 of (B, W, ...) [current]
- flat_rows    reshape to (B*W, ...) + leading-axis int gather
- onehot_mm    (B, W', W) one-hot matmul over the beam axis
- tala_fused   axis-1 gather with indices precomputed outside the scan

Usage: python tools/ablate_gather.py [--lc 64] [--reps 5]
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
    ap.add_argument("--beams", type=int, default=10)
    ap.add_argument("--lc", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--leaves", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    B, W, Lc, H, dk = args.batch, args.beams, args.lc, args.heads, args.dk
    S, nl = args.steps, args.leaves
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    leaves = [
        jax.random.normal(jax.random.fold_in(key, i),
                          (B, W, Lc, H, dk)).astype(dt)
        for i in range(nl)
    ]
    bytes_per_step = nl * B * W * Lc * H * dk * dt.itemsize
    print(f"cache bytes/step: {bytes_per_step / 1e6:.1f} MB "
          f"(read+write = {2 * bytes_per_step / 1e6:.1f} MB)")

    def rot_idx(i):
        return ((jnp.arange(B * W) + i) % W).reshape(B, W)

    def run_tala(leaves):
        def step(carry, i):
            idx = rot_idx(i)
            out = [
                jnp.take_along_axis(
                    x, idx.reshape(B, W, 1, 1, 1), axis=1
                )
                for x in carry
            ]
            return out, out[0][0, 0, 0, 0, 0]

        out, tick = jax.lax.scan(step, leaves, jnp.arange(S))
        return tick.sum()

    def run_flat(leaves):
        base = jnp.arange(B)[:, None] * W

        def step(carry, i):
            fidx = (base + rot_idx(i)).reshape(-1)
            out = [
                x.reshape(B * W, Lc, H, dk)[fidx].reshape(B, W, Lc, H, dk)
                for x in carry
            ]
            return out, out[0][0, 0, 0, 0, 0]

        out, tick = jax.lax.scan(step, leaves, jnp.arange(S))
        return tick.sum()

    def run_onehot(leaves):
        def step(carry, i):
            oh = jax.nn.one_hot(rot_idx(i), W, dtype=dt)  # (B, W', W)
            out = [
                jnp.einsum(
                    "bvw,bwlhd->bvlhd", oh,
                    x, preferred_element_type=dt,
                )
                for x in carry
            ]
            return out, out[0][0, 0, 0, 0, 0]

        out, tick = jax.lax.scan(step, leaves, jnp.arange(S))
        return tick.sum()

    def run_stacked(leaves):
        # single stacked array: one big gather instead of nl small ones
        stacked = jnp.stack(leaves, axis=2)  # (B, W, nl, Lc, H, dk)

        def step(carry, i):
            idx = rot_idx(i)
            out = jnp.take_along_axis(
                carry, idx.reshape(B, W, 1, 1, 1, 1), axis=1
            )
            return out, out[0, 0, 0, 0, 0, 0]

        out, tick = jax.lax.scan(step, stacked, jnp.arange(S))
        return tick.sum()

    runs = {
        "tala_axis1": jax.jit(run_tala).lower(leaves).compile(),
        "flat_rows": jax.jit(run_flat).lower(leaves).compile(),
        "onehot_mm": jax.jit(run_onehot).lower(leaves).compile(),
        "stacked": jax.jit(run_stacked).lower(leaves).compile(),
    }

    for n in runs:
        np.asarray(runs[n](leaves))
    z = jnp.zeros(())
    ftriv = jax.jit(lambda x: x * 1).lower(z).compile()
    np.asarray(ftriv(z))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(z))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)

    PIPE = 4
    times = {n: [] for n in runs}
    for _ in range(args.reps):
        for n in runs:
            np.asarray(runs[n](leaves))
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = runs[n](leaves)
            np.asarray(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    print(f"\nB={B} W={W} Lc={Lc} H={H} dk={dk} leaves={nl} "
          f"steps={S} dtype={dt}")
    print("| variant | total ms | per-step us | GB/s (rd+wr) |")
    print("|---|---|---|---|")
    for n in runs:
        med = float(np.median(times[n]))
        bw = 2 * bytes_per_step * S / med / 1e9
        print(f"| {n} | {med * 1e3:.2f} | {med / S * 1e6:.0f} | {bw:.0f} |")


if __name__ == "__main__":
    main()
