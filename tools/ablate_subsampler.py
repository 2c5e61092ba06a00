"""Subsampler cost split + conv1-as-matmul experiment (on chip).

tools/profile_train.py showed the Conv2dSubsampler at ~8.3 ms standalone
fwd+bwd (~35% of the L1 step) for ~450 GFLOP of nominal work.  Suspect:
conv1 has C_in=1, and the TPU convolution pads the channel dim toward
the MXU's native width, multiplying effective FLOPs.  This ablation
times, AOT in one process:

- conv1 / conv2 / output Dense separately (fwd+bwd)
- conv1 as an explicit 3x3-patch matmul ((B*T2*F2, 9) @ (9, C)) with
  bit-equal math
- conv2 as 9 shifted (N, C) @ (C, C) matmuls (no im2col buffer)
- the full current Conv2dSubsampler for a sanity anchor

Usage: python tools/ablate_subsampler.py
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

    B, T, F, C = 32, 800, 80, 256
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.normal(size=(B, T, F, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    conv1 = nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID")
    v1 = conv1.init(jax.random.PRNGKey(0), xs)
    h1 = conv1.apply(v1, xs)
    h1 = jax.nn.relu(h1)

    conv2 = nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID")
    v2 = conv2.init(jax.random.PRNGKey(1), h1)
    h2 = jax.nn.relu(conv2.apply(v2, h1))
    B_, T4, F4, _ = h2.shape
    dense = nn.Dense(C)
    v3 = dense.init(
        jax.random.PRNGKey(2),
        h2.transpose(0, 1, 3, 2).reshape(B_, T4, C * F4),
    )

    def conv1_matmul(p, x):
        """Same math as VALID 3x3 stride-2 nn.Conv with C_in=1, as a
        patch matmul (reduction dim 9 instead of a 1-channel conv)."""
        k = p["params"]["kernel"]  # (3, 3, 1, C)
        b = p["params"]["bias"]
        T2 = (x.shape[1] - 3) // 2 + 1
        F2 = (x.shape[2] - 3) // 2 + 1
        cols = []
        for i in range(3):
            for j in range(3):
                cols.append(
                    x[:, i : i + 2 * T2 : 2, j : j + 2 * F2 : 2, 0]
                )
        patches = jnp.stack(cols, axis=-1)  # (B, T2, F2, 9)
        out = patches.reshape(-1, 9) @ k.reshape(9, -1).astype(patches.dtype)
        return out.reshape(x.shape[0], T2, F2, -1) + b

    def conv2_shifted(p, x):
        """3x3 stride-2 conv as 9 shifted 1x1 matmuls (no im2col buffer)."""
        k = p["params"]["kernel"]  # (3, 3, C, C)
        b = p["params"]["bias"]
        T2 = (x.shape[1] - 3) // 2 + 1
        F2 = (x.shape[2] - 3) // 2 + 1
        C_in = x.shape[-1]
        acc = None
        for i in range(3):
            for j in range(3):
                xi = x[:, i : i + 2 * T2 : 2, j : j + 2 * F2 : 2, :]
                t = xi.reshape(-1, C_in) @ k[i, j].astype(xi.dtype)
                acc = t if acc is None else acc + t
        return acc.reshape(x.shape[0], T2, F2, -1) + b

    # numerics check (bf16): matmul formulations == convs
    ref = conv1.apply(v1, xs)
    alt = conv1_matmul(v1, xs)
    err = float(
        jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32)))
    )
    print(f"conv1 matmul-vs-conv maxdiff: {err:.3e}", flush=True)
    ref2 = conv2.apply(v2, h1)
    alt2 = conv2_shifted(v2, h1)
    err2 = float(
        jnp.max(jnp.abs(ref2.astype(jnp.float32) - alt2.astype(jnp.float32)))
    )
    print(f"conv2 shifted-vs-conv maxdiff: {err2:.3e}", flush=True)

    def g(f, *args):
        return jax.jit(
            jax.value_and_grad(lambda *a: jnp.mean(f(*a).astype(jnp.float32)))
        ).lower(*args).compile()

    from emoasr_tpu.models.layers import Conv2dSubsampler

    sub = Conv2dSubsampler(C)
    xs3 = xs[..., 0]  # (B, T, F)
    xlens = jnp.full((B,), T, jnp.int32)
    vs = sub.init(jax.random.PRNGKey(3), xs3, xlens)

    runs = {
        "full_subsampler": (
            g(lambda p, x: sub.apply(p, x, xlens)[0], vs, xs3), (vs, xs3),
        ),
        "conv1_conv": (g(lambda p, x: conv1.apply(p, x), v1, xs), (v1, xs)),
        "conv1_matmul": (g(conv1_matmul, v1, xs), (v1, xs)),
        "conv2_conv": (g(lambda p, x: conv2.apply(p, x), v2, h1), (v2, h1)),
        "conv2_shifted": (g(conv2_shifted, v2, h1), (v2, h1)),
        "out_dense": (
            g(
                lambda p, x: dense.apply(
                    p, x.transpose(0, 1, 3, 2).reshape(B_, T4, C * F4)
                ),
                v3, h2,
            ),
            (v3, h2),
        ),
    }
    for k_ in runs:
        c, a = runs[k_]
        c(*a)[0].block_until_ready()
    times = {k_: [] for k_ in runs}
    for _ in range(5):
        for k_ in runs:
            c, a = runs[k_]
            c(*a)[0].block_until_ready()
            t0 = time.perf_counter()
            out = None
            for _ in range(8):
                out = c(*a)
            out[0].block_until_ready()
            times[k_].append((time.perf_counter() - t0) / 8)
    print("| piece | fwd+bwd ms |")
    print("|---|---|")
    for k_ in runs:
        print(f"| {k_} | {np.median(times[k_]) * 1e3:.2f} |")


if __name__ == "__main__":
    main()
