"""Subsampler cost split + conv-as-matmul experiments (on chip).

History: profile_train.py originally showed Conv2dSubsampler at ~8.3 ms
standalone fwd+bwd.  That number had two artifacts this tool now
avoids:

1. **f32 promotion** — the standalone piece kept params in f32, so flax
   promoted the whole piece to f32 (the real train step casts params to
   the compute dtype).  bf16-cast truth is ~3.8 ms.
2. **Broken sync** — `block_until_ready` is a NO-OP on the axon
   transport; only an `np.asarray` fetch truly syncs, and each fetch
   pays the ~30 ms tunnel RTT.  This tool fetches once per timing
   window and subtracts a measured trivial-fetch floor.

Conclusion from the measured split (kept for the record): conv2
dominates (~430 GFLOP fwd+bwd, ~2.2 ms speed-of-light), the bf16
subsampler runs at ~60% MXU efficiency, and neither the conv1 patch
matmul nor the conv2 shifted-matmul reformulation beats XLA's native
convolutions — the subsampler is NOT the train-step bottleneck it
first appeared to be.

Timed pieces, AOT in one process, round-robin, distinct rolled inputs
per call (defeats any transport-level result reuse):

- conv1 / conv2 / output Dense separately (fwd+bwd, bf16 params)
- conv1 as an explicit 3x3-patch matmul ((B*T2*F2, 9) @ (9, C)) with
  bit-equal math
- conv2 as 9 shifted (N, C) @ (C, C) matmuls (no im2col buffer)
- the full Conv2dSubsampler for a sanity anchor

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

    def bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree,
        )

    conv1 = nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID")
    v1 = bf16(conv1.init(jax.random.PRNGKey(0), xs))
    h1 = jax.nn.relu(conv1.apply(v1, xs))

    conv2 = nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID")
    v2 = bf16(conv2.init(jax.random.PRNGKey(1), h1))
    h2 = jax.nn.relu(conv2.apply(v2, h1))
    B_, T4, F4, _ = h2.shape
    dense = nn.Dense(C)
    v3 = bf16(
        dense.init(
            jax.random.PRNGKey(2),
            h2.transpose(0, 1, 3, 2).reshape(B_, T4, C * F4),
        )
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
    vs = bf16(sub.init(jax.random.PRNGKey(3), xs3, xlens))

    # distinct per-call inputs: roll along time (device-side, cheap)
    PIPE = 8
    roll = jax.jit(lambda x, i: jnp.roll(x, i, axis=1))

    def inputs_for(x):
        out = [roll(x, 1 + 3 * i) for i in range(PIPE)]
        np.asarray(out[-1][0, 0, :1])
        return out

    xs_r, xs3_r, h1_r, h2_r = (
        inputs_for(xs), inputs_for(xs3), inputs_for(h1), inputs_for(h2)
    )

    runs = {
        "full_subsampler": (
            g(lambda p, x: sub.apply(p, x, xlens)[0], vs, xs3), vs, xs3_r,
        ),
        "conv1_conv": (g(lambda p, x: conv1.apply(p, x), v1, xs), v1, xs_r),
        "conv1_matmul": (g(conv1_matmul, v1, xs), v1, xs_r),
        "conv2_conv": (g(lambda p, x: conv2.apply(p, x), v2, h1), v2, h1_r),
        "conv2_shifted": (g(conv2_shifted, v2, h1), v2, h1_r),
        "out_dense": (
            g(
                lambda p, x: dense.apply(
                    p, x.transpose(0, 1, 3, 2).reshape(B_, T4, C * F4)
                ),
                v3, h2,
            ),
            v3, h2_r,
        ),
    }

    # one-fetch transport floor (np.asarray pays the tunnel RTT)
    ftriv = jax.jit(lambda x: x[0] * 1).lower(xlens).compile()
    np.asarray(ftriv(xlens))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ftriv(xlens))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    print(f"fetch floor: {rtt * 1e3:.1f} ms", flush=True)

    for k_, (c, p, xr) in runs.items():
        np.asarray(c(p, xr[0])[0])  # warm
    times = {k_: [] for k_ in runs}
    for _ in range(5):
        for k_, (c, p, xr) in runs.items():
            np.asarray(c(p, xr[0])[0])
            t0 = time.perf_counter()
            out = None
            for i in range(PIPE):
                out = c(p, xr[i])
            np.asarray(out[0])
            times[k_].append((time.perf_counter() - t0 - rtt) / PIPE)
    print("| piece | fwd+bwd ms |")
    print("|---|---|")
    for k_ in runs:
        print(f"| {k_} | {np.median(times[k_]) * 1e3:.2f} |")


if __name__ == "__main__":
    main()
