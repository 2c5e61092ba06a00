"""Conformer encode cost split at L3-3 decode shapes (on chip).

After the r3 ancestor-indirect beam rebuild, the flagship L3-3 decode
row is 131.8 ms at B=16 of which the ENCODE is 40.2 ms
(tools/profile_l33.py) — now the largest single component.  This tool
splits the forward-only Conformer encode (bf16, inference) into
subsampler vs rel-pos MHSA vs conv module vs macaron FFs vs glue to
decide what to fuse next.

Variants (12 layers, H=256, I=1024, NH=4, k=31; T=1000 raw frames ->
T'=249 after the 4x subsampler; params and activations bf16,
deterministic=True as in decode):

- subsampler        Conv2dSubsampler alone on (B, 1000, 80)
- blocks_full       the real ConformerEncoderLayer stack at (B, 249, 256)
- blocks_ff_only    LN + macaron-FF halves + final FF + residuals
- blocks_attn_only  LN + rel-MHSA + residual
- blocks_conv_only  LN + ConvModule + residual

Usage: python tools/ablate_conformer.py [--batch 16]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emoasr_tpu.models.layers import (
        Conv2dSubsampler,
        ConformerEncoderLayer,
        ConvModule,
        PositionwiseFeedForward,
        RelMultiHeadAttention,
        RelPositionalEncoder,
    )

    B, T_RAW, H, L = args.batch, 1000, 256, 12
    NH, FF, K = 4, 1024, 31
    T = ((T_RAW - 1) // 2 - 1) // 2  # 249
    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(
        rng.normal(size=(B, T_RAW, 80)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    mask = jnp.ones((B, 1, 1, T), bool)

    class Blocks(nn.Module):
        mode: str

        @nn.compact
        def __call__(self, x):
            pos = RelPositionalEncoder(H, 0.0, name="pe")
            x, pos_emb = pos(x, deterministic=True)
            for i in range(L):
                if self.mode == "full":
                    x = ConformerEncoderLayer(
                        NH, H, FF, 0.0, 0.0, conv_kernel_size=K,
                        name=f"l{i}",
                    )(x, mask, pos_emb, deterministic=True)
                elif self.mode == "ff":
                    h = nn.LayerNorm(name=f"nm{i}")(x)
                    h = PositionwiseFeedForward(
                        FF, H, 0.0, activation="swish", name=f"fm{i}"
                    )(h, True)
                    x = x + 0.5 * h
                    h = nn.LayerNorm(name=f"nf{i}")(x)
                    h = PositionwiseFeedForward(
                        FF, H, 0.0, activation="swish", name=f"ff{i}"
                    )(h, True)
                    x = x + 0.5 * h
                    x = nn.LayerNorm(name=f"no{i}")(x)
                elif self.mode == "attn":
                    h = nn.LayerNorm(name=f"na{i}")(x)
                    h = RelMultiHeadAttention(NH, H, 0.0, name=f"a{i}")(
                        h, h, h, pos_emb, mask, True
                    )
                    x = x + h
                else:  # conv
                    h = nn.LayerNorm(name=f"nc{i}")(x)
                    h = ConvModule(H, K, name=f"c{i}")(h, True)
                    x = x + h
            return x

    def bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree,
        )

    key = jax.random.PRNGKey(0)
    runs = {}

    sub = Conv2dSubsampler(H)
    xlens = jnp.full((B,), T_RAW, jnp.int32)
    vs = bf16(sub.init(key, x_raw, xlens))
    runs["subsampler"] = (
        jax.jit(lambda v, x: sub.apply(v, x, xlens)[0])
        .lower(vs, x_raw)
        .compile(),
        vs,
        x_raw,
    )

    for name, mode in [
        ("blocks_full", "full"),
        ("blocks_ff_only", "ff"),
        ("blocks_attn_only", "attn"),
        ("blocks_conv_only", "conv"),
    ]:
        m = Blocks(mode)
        v = bf16(m.init(key, x0))
        # mutable=[] not needed: BN runs in inference (running stats)
        c = (
            jax.jit(lambda v, x, m=m: m.apply(v, x))
            .lower(v, x0)
            .compile()
        )
        runs[name] = (c, v, x0)

    PIPE = 8
    roll = jax.jit(lambda x, i: jnp.roll(x, i, axis=1))
    inputs = {
        "raw": [roll(x_raw, 1 + 3 * i) for i in range(PIPE)],
        "sub": [roll(x0, 1 + 3 * i) for i in range(PIPE)],
    }
    np.asarray(inputs["raw"][-1][0, 0, :1])
    np.asarray(inputs["sub"][-1][0, 0, :1])

    ftriv = jax.jit(lambda l: l[0, 0, 0] * 1).lower(x0).compile()
    np.asarray(ftriv(x0))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(x0))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms  (B={B}, T'={T})", flush=True)

    def feed(name):
        return inputs["raw" if name == "subsampler" else "sub"]

    for n, (c, v, _) in runs.items():
        np.asarray(c(v, feed(n)[0])[0, 0, :1])
    times = {n: [] for n in runs}
    for _ in range(6):
        for n, (c, v, _) in runs.items():
            ins = feed(n)
            np.asarray(c(v, ins[0])[0, 0, :1])
            t0 = time.perf_counter()
            out = None
            for i in range(PIPE):
                out = c(v, ins[i])
            np.asarray(out[0, 0, :1])
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)
    print("| variant | fwd ms |")
    print("|---|---|")
    for n in runs:
        print(f"| {n} | {np.median(times[n]) * 1e3:.2f} |")
    glue = (
        np.median(times["blocks_full"])
        - np.median(times["blocks_ff_only"])
        - np.median(times["blocks_attn_only"])
        - np.median(times["blocks_conv_only"])
    )
    print(f"| glue (full - ff - attn - conv) | {glue * 1e3:.2f} |")


if __name__ == "__main__":
    main()
