"""Encoder-block cost split at L1 shapes (on chip).

profile_train.py (honest r3 protocol: np.asarray sync, fetch-floor
subtraction, bf16-cast params) puts enc_fwd_bwd at ~13.2 ms of the
16.6 ms step, of which the subsampler is ~3.8 ms — so the 12
transformer blocks cost ~9.4 ms against ~3.6 ms of MXU speed-of-light.
This tool splits the blocks into attention vs feed-forward vs glue to
decide whether a fused (flash-style) attention kernel is worth
building at T'=199.

Variants (12 layers, (B=32, T'=199, H=256), bf16 params+activations,
dropout 0.1 as in the train step, fwd+bwd of mean):

- blocks_full      the real TransformerEncoderLayer stack
- blocks_ff_only   LN + FF + residual only (attention removed)
- blocks_attn_only LN + MHSA + residual only (FF removed)
- blocks_no_drop   full stack, dropout 0.0 (isolates mask generation)

Usage: python tools/ablate_encoder.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
        MultiHeadAttention,
        PositionwiseFeedForward,
        TransformerEncoderLayer,
    )

    B, T, H, L = 32, 199, 256, 12
    NH, FF = 4, 2048
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    mask = jnp.ones((B, 1, 1, T), bool)

    class Stack(nn.Module):
        mode: str
        drop: float = 0.1

        @nn.compact
        def __call__(self, x, deterministic=False):
            for i in range(L):
                if self.mode == "full":
                    x = TransformerEncoderLayer(
                        NH, H, FF, self.drop, self.drop, name=f"l{i}"
                    )(x, mask, deterministic=deterministic)
                elif self.mode == "ff":
                    h = nn.LayerNorm(epsilon=1e-12, name=f"n{i}")(x)
                    h = PositionwiseFeedForward(
                        FF, H, self.drop, name=f"f{i}"
                    )(h, deterministic)
                    x = x + nn.Dropout(self.drop)(
                        h, deterministic=deterministic
                    )
                else:  # attn
                    h = nn.LayerNorm(epsilon=1e-12, name=f"n{i}")(x)
                    h = MultiHeadAttention(
                        NH, H, self.drop, name=f"a{i}"
                    )(h, h, h, mask, deterministic)
                    x = x + nn.Dropout(self.drop)(
                        h, deterministic=deterministic
                    )
            return x

    def bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree,
        )

    key = jax.random.PRNGKey(0)
    dkey = jax.random.key(1, impl="unsafe_rbg")

    runs = {}
    for name, mode, drop in [
        ("blocks_full", "full", 0.1),
        ("blocks_ff_only", "ff", 0.1),
        ("blocks_attn_only", "attn", 0.1),
        ("blocks_no_drop", "full", 0.0),
    ]:
        m = Stack(mode, drop)
        v = bf16(m.init(key, x0, deterministic=True))

        def loss(p, x, m=m):
            return jnp.mean(
                m.apply(
                    p, x, deterministic=False, rngs={"dropout": dkey}
                ).astype(jnp.float32)
            )

        c = jax.jit(jax.value_and_grad(loss)).lower(v, x0).compile()
        runs[name] = (c, v)

    PIPE = 8
    roll = jax.jit(lambda x, i: jnp.roll(x, i, axis=1))
    inputs = [roll(x0, 1 + 3 * i) for i in range(PIPE)]
    np.asarray(inputs[-1][0, 0, :1])

    ftriv = jax.jit(lambda l: l[0, 0, 0] * 1).lower(x0).compile()
    np.asarray(ftriv(x0))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(x0))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)

    for n, (c, v) in runs.items():
        np.asarray(c(v, inputs[0])[0])
    times = {n: [] for n in runs}
    for _ in range(6):
        for n, (c, v) in runs.items():
            np.asarray(c(v, inputs[0])[0])
            t0 = time.perf_counter()
            out = None
            for i in range(PIPE):
                out = c(v, inputs[i])
            np.asarray(out[0])
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)
    print("| variant | fwd+bwd ms |")
    print("|---|---|")
    for n in runs:
        print(f"| {n} | {np.median(times[n]) * 1e3:.2f} |")


if __name__ == "__main__":
    main()
