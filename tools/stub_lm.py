"""Isolate the per-step cost of cached Transformer-LM fusion on the chip.

`tools/profile_l33.py` measures the LM fusion delta end-to-end
(att_sf - att); this stub splits that delta into its parts at the same
flagship shapes (B=16, W=10 -> 160 rows, 4L/512/2048 LM, V=10k):

- step_only     fori_loop of predict_step (fixed Lc cache), no beam ops
- step_gather   + per-step beam gather of the caches (search traffic)
- stateless_L   one full-prefix re-encode at L in {16, 32, 64}

Usage: python tools/stub_lm.py [--reps 5] [--steps 64] [--lc 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=160)  # B*W
    ap.add_argument("--batch", type=int, default=16)  # B (for gather sim)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--lc", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cache-dtype", default=None,
                    help="KV cache dtype (default: follow --dtype)")
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

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.lm.lm import TransformerLM
    from emoasr_tpu.utils.precision import cast_floating

    lm_cfg = config_from_dict(
        dict(
            lm_type="transformer", vocab_size=10000, hidden_size=512,
            num_layers=4, num_attention_heads=8, intermediate_size=2048,
            max_seq_len=128, dropout_rate=0.0,
        )
    )
    lm = TransformerLM(lm_cfg)
    lvars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32), jnp.asarray([2])
    )
    if args.dtype == "bfloat16":
        lvars = cast_floating(lvars, jnp.bfloat16)
    cdtype = jnp.dtype(args.cache_dtype or args.dtype)

    R, B, Lc, S = args.rows, args.batch, args.lc, args.steps
    W = R // B

    def init_caches():
        caches = lm.apply(lvars, R, Lc, method=TransformerLM.init_cache)
        return [(k.astype(cdtype), v.astype(cdtype)) for k, v in caches]

    def one_step(carry, _):
        pos, caches = carry
        tokens = jnp.full((R,), 5, jnp.int32)
        logp, caches = lm.apply(
            lvars, tokens, jnp.minimum(pos, Lc - 1), caches,
            method=TransformerLM.predict_step,
        )
        return (pos + 1, caches), logp[0, 0]

    def run_step_only(caches):
        (pos, caches), tick = jax.lax.scan(
            one_step, (jnp.zeros((R,), jnp.int32), caches), None, length=S
        )
        return tick.sum()

    def one_step_gather(carry, i):
        pos, caches = carry
        # per-step beam reindex: leading-axis gather like gather_beams
        idx = (jnp.arange(B * W) + i) % W  # rotate beams, data-dependent-ish
        idx = idx.reshape(B, W)
        caches = jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(
                x.reshape((B, W) + x.shape[1:]),
                idx.reshape((B, W) + (1,) * (x.ndim - 1)),
                axis=1,
            ).reshape(x.shape),
            caches,
        )
        tokens = jnp.full((R,), 5, jnp.int32)
        logp, caches = lm.apply(
            lvars, tokens, jnp.minimum(pos, Lc - 1), caches,
            method=TransformerLM.predict_step,
        )
        return (pos + 1, caches), logp[0, 0]

    def run_step_gather(caches):
        (pos, caches), tick = jax.lax.scan(
            one_step_gather, (jnp.zeros((R,), jnp.int32), caches),
            jnp.arange(S), length=S,
        )
        return tick.sum()

    def one_step_gather_flat(carry, i):
        pos, caches = carry
        base = jnp.arange(B)[:, None] * W
        fidx = (base + (jnp.arange(B * W).reshape(B, W) + i) % W).reshape(-1)
        caches = jax.tree_util.tree_map(lambda x: x[fidx], caches)
        tokens = jnp.full((R,), 5, jnp.int32)
        logp, caches = lm.apply(
            lvars, tokens, jnp.minimum(pos, Lc - 1), caches,
            method=TransformerLM.predict_step,
        )
        return (pos + 1, caches), logp[0, 0]

    def run_step_gather_flat(caches):
        (pos, caches), tick = jax.lax.scan(
            one_step_gather_flat, (jnp.zeros((R,), jnp.int32), caches),
            jnp.arange(S), length=S,
        )
        return tick.sum()

    def run_head_only():
        # vocab head + f32 log_softmax alone, S times
        h = jnp.ones((R, 512), jnp.dtype(args.dtype))

        def step(c, _):
            logits = lm.apply(
                lvars, c, method=lambda m, x: m.head(x)
            )
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return c + lp[0, :1].astype(c.dtype) * 0, lp[0, 0]

        (_, tick) = jax.lax.scan(step, h, None, length=S)
        return tick[1].sum()

    def run_stateless(L):
        ys = jnp.full((R, L), 5, jnp.int32)
        yl = jnp.full((R,), L, jnp.int32)

        def step(c, _):
            logp, _ = lm.apply(
                lvars, ys, yl + c * 0, method=TransformerLM.predict
            )
            return c, logp[0, 0]

        (_, tick) = jax.lax.scan(
            step, jnp.zeros((), jnp.int32), None, length=S
        )
        return tick.sum()

    caches = init_caches()
    runs = {
        "step_only": jax.jit(run_step_only).lower(caches).compile(),
        "step_gather": jax.jit(run_step_gather).lower(caches).compile(),
        "step_gather_flat": (
            jax.jit(run_step_gather_flat).lower(caches).compile()
        ),
        "head_only": jax.jit(run_head_only).lower().compile(),
        "stateless_L16": jax.jit(lambda: run_stateless(16)).lower().compile(),
        "stateless_L32": jax.jit(lambda: run_stateless(32)).lower().compile(),
        "stateless_L64": jax.jit(lambda: run_stateless(64)).lower().compile(),
    }

    def call(name):
        if name.startswith("step"):
            return runs[name](caches)
        return runs[name]()

    for n in runs:
        np.asarray(call(n))
    ftriv = jax.jit(lambda x: x * 1).lower(jnp.zeros(())).compile()
    z = jnp.zeros(())
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
            np.asarray(call(n))
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = call(n)
            np.asarray(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    print(f"\nrows={R} Lc={Lc} steps={S} dtype={args.dtype} "
          f"cache_dtype={cdtype}")
    print("| variant | total ms | per-step us |")
    print("|---|---|---|")
    for n in runs:
        med = float(np.median(times[n]))
        print(f"| {n} | {med * 1e3:.2f} | {med / S * 1e6:.0f} |")


if __name__ == "__main__":
    main()
