"""Sweep ops.ctc.SCAN_UNROLL on the chip: standalone CTC grad + full
L1 train step per factor, one process, AOT-compiled.

Usage: python tools/sweep_ctc_unroll.py [--factors 1,4,8,16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,8,16")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import emoasr_tpu.ops.ctc as ctc_mod
    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    B, T, U, V = 32, 800, 48, 10000
    T4 = ((T - 1) // 2 - 1) // 2
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(rng.normal(size=(B, T4, V)).astype(np.float32))
    ys = jnp.asarray(rng.integers(3, V - 1, size=(B, U)).astype(np.int32))
    ylens = jnp.full((B,), U, jnp.int32)
    elens = jnp.full((B,), T4, jnp.int32)

    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, encoder_type="transformer", decoder_type="ctc",
        enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=V,
        spec_augment=True, lr_schedule_type="noam", learning_rate=5.0,
        num_warmup_steps=25000, lsm_prob=0.0, rng_impl="unsafe_rbg",
        compute_dtype="bfloat16", dropout_enc_rate=0.1, dropout_attn_rate=0.1,
    )
    xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    xlens = jnp.full((B,), T, jnp.int32)
    ys_in = jnp.concatenate([jnp.full((B, 1), 2, jnp.int32), ys[:, :-1]], 1)
    batch = dict(xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in,
                 ys_out=ys)

    cfg = config_from_dict(ENC)
    model = ASR(cfg)
    init = model.init(key, xs, xlens, ys, ylens, ys_in, ys)
    tx = build_optimizer(cfg)
    tkey = jax.random.key(0, impl=cfg.rng_impl)

    runs = {}
    vals = {}
    for f in factors:
        ctc_mod.SCAN_UNROLL = f

        def loss_ctc(lg):
            return ctc_mod.ctc_loss_fn(lg, ys, elens, ylens, blank_id=0)

        c1 = jax.jit(jax.value_and_grad(loss_ctc)).lower(logits).compile()
        runs[f"ctc_grad_u{f}"] = (lambda c=c1: c(logits)[0])
        vals[f] = float(c1(logits)[0])

        state = init_train_state(init["params"], init.get("batch_stats", {}),
                                 tx)
        step = make_train_step(model, cfg, tx)
        c2 = step.lower(state, batch, tkey).compile()
        holder = {"s": state}

        def run(c=c2, h=holder):
            h["s"], m = c(h["s"], batch, tkey)
            return m["loss_total"]

        runs[f"train_u{f}"] = run

    # numerics: loss identical across factors
    base = vals[factors[0]]
    for f in factors[1:]:
        assert abs(vals[f] - base) < 1e-4 * max(1.0, abs(base)), (
            f, vals[f], base
        )
    print(f"# loss agrees across factors: {base:.6f}")

    names = list(runs)
    for n in names:
        np.asarray(runs[n]())
    times = {n: [] for n in names}
    PIPE = 8  # async pipeline + single sync (tunnel RTT ~30 ms/call)
    for _ in range(args.reps):
        for n in names:
            out = runs[n]()
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = runs[n]()
            np.asarray(out)
            times[n].append((time.perf_counter() - t0) / PIPE)
    print("| variant | median ms |")
    print("|---|---|")
    for n in names:
        print(f"| {n} | {np.median(times[n]) * 1e3:.2f} |")


if __name__ == "__main__":
    main()
