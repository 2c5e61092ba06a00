"""Train-step time breakdown at L1 shapes (VERDICT r2 item 4).

Cross-process timing on the remote chip is too noisy to ablate <1.5x
effects, so every variant here is AOT-compiled and timed in ONE process,
interleaved round-robin (A B C A B C ...) so slow drift hits all
variants equally.  Components are isolated two ways:

1. **Ablation deltas** — the full train step (bench.py's
   `l1_train_step_bf16` protocol: B=32, T=800, U=48, bf16 compute,
   SpecAugment on, dropout 0.1, rng_impl=unsafe_rbg, noam) minus
   variants with one piece removed (no SpecAugment, no dropout, no
   optimizer/clip/NaN-skip, fwd only).
2. **Standalone pieces** — subsampler-only and encoder-only grad steps,
   and the CTC head+loss grad on a frozen encoder output, each timed as
   its own compiled program (sum of parts > full step is expected: XLA
   fuses across boundaries in the full program).

Optionally (`--trace DIR`) captures a jax.profiler device trace around
the full step and aggregates op time by XLA op category from the
perfetto JSON (works only if the PJRT backend exports a device track;
the axon tunnel may not — the table above is the load-bearing output).

Usage:  python tools/profile_train.py [--trace /tmp/l1trace] [--quick]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="capture device trace here")
    ap.add_argument("--quick", action="store_true", help="fewer reps")
    ap.add_argument("--tiny", action="store_true",
                    help="toy shapes (CPU wiring check, numbers meaningless)")
    ap.add_argument("--json", action="store_true", help="emit JSON rows too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        # wiring check must not touch the chip; the axon sitecustomize
        # force-sets jax_platforms, so re-pin AFTER importing jax
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.models.layers import Conv2dSubsampler
    from emoasr_tpu.ops.ctc import ctc_loss_fn
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    B, T, U = (2, 64, 6) if args.tiny else (32, 800, 48)
    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=2 if args.tiny else 12,
        encoder_type="transformer", decoder_type="ctc",
        enc_hidden_size=64 if args.tiny else 256,
        enc_intermediate_size=128 if args.tiny else 2048,
        vocab_size=100 if args.tiny else 10000,
        spec_augment=True, lr_schedule_type="noam", learning_rate=5.0,
        num_warmup_steps=25000, lsm_prob=0.0, rng_impl="unsafe_rbg",
        compute_dtype="bfloat16", dropout_enc_rate=0.1, dropout_attn_rate=0.1,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    xlens = jnp.full((B,), T, jnp.int32)
    H, V = ENC["enc_hidden_size"], ENC["vocab_size"]
    ys = jnp.asarray(rng.integers(3, V - 1, size=(B, U)).astype(np.int32))
    ylens = jnp.full((B,), U, jnp.int32)
    # dataset convention (data/asr_dataset.py): ys_in/ys_out are U+1 long
    ys_in = jnp.full((B, U + 1), 2, jnp.int32).at[:, 1:].set(ys)
    ys_out = jnp.full((B, U + 1), 2, jnp.int32).at[:, :U].set(ys)
    batch = dict(xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in,
                 ys_out=ys_out)

    variants = {}  # name -> (callable() -> device out, sync fn)

    def add_train_variant(name, cfg_over, batch_over=None):
        cfg = config_from_dict({**ENC, **cfg_over})
        model = ASR(cfg)
        init = variants.get("_shared_init")
        if init is None:
            init = model.init(key, xs, xlens, ys, ylens, ys_in, ys_out)
            variants["_shared_init"] = init
        tx = build_optimizer(cfg)
        state = init_train_state(init["params"], init.get("batch_stats", {}), tx)
        step = make_train_step(model, cfg, tx)
        tkey = jax.random.key(0, impl=cfg.rng_impl)
        b = dict(batch)
        if batch_over:
            b.update(batch_over)
        compiled = step.lower(state, b, tkey).compile()
        holder = {"s": state}

        def run():
            holder["s"], m = compiled(holder["s"], b, tkey)
            return m["loss_total"]

        variants[name] = run

    def add_grad_variant(name, loss_fn, params, *xargs):
        """value_and_grad of loss_fn(params, *xargs), AOT."""
        vg = jax.value_and_grad(loss_fn)
        f = jax.jit(vg).lower(params, *xargs).compile()

        def run():
            v, g = f(params, *xargs)
            return v

        variants[name] = run

    # ---- full step and ablations (same compiled-protocol as bench) ----
    add_train_variant("full", {})
    add_train_variant("no_specaug", dict(spec_augment=False))
    add_train_variant(
        "no_dropout", dict(dropout_enc_rate=0.0, dropout_attn_rate=0.0)
    )
    add_train_variant("threefry_rng", dict(rng_impl="threefry2x32"))
    add_train_variant("f32_compute", dict(compute_dtype="float32"))
    add_train_variant("fused_attn", dict(enc_fused_attn=True))

    # fwd+bwd only (no clip/optimizer/NaN-skip): raw value_and_grad of the
    # same loss the train step differentiates
    cfg_full = config_from_dict(ENC)
    model_full = ASR(cfg_full)
    init = variants["_shared_init"]
    tkey = jax.random.key(0, impl="unsafe_rbg")
    from emoasr_tpu.train.step import preprocess
    from emoasr_tpu.utils.precision import (
        cast_batch_for_compute,
        cast_params_for_compute,
    )

    def loss_full(params, rng_):
        sa, do = jax.random.split(rng_)
        x2, l2 = preprocess(cfg_full, xs, xlens, sa, True)
        x2 = cast_batch_for_compute(cfg_full, x2)
        loss, _ = model_full.apply(
            {"params": cast_params_for_compute(cfg_full, params)},
            x2, l2, ys, ylens, ys_in, ys_out, None, None, None,
            deterministic=False, rngs={"dropout": do},
        )
        return loss

    vg = jax.jit(jax.value_and_grad(loss_full))
    cfb = vg.lower(init["params"], tkey).compile()
    variants["fwd_bwd"] = lambda: cfb(init["params"], tkey)[0]
    cff = jax.jit(loss_full).lower(init["params"], tkey).compile()
    variants["fwd_only"] = lambda: cff(init["params"], tkey)

    # ---- standalone pieces ----
    # encoder (+subsampler) only: grad of mean(encode)
    def loss_enc(params, rng_):
        sa, do = jax.random.split(rng_)
        x2, l2 = preprocess(cfg_full, xs, xlens, sa, True)
        x2 = cast_batch_for_compute(cfg_full, x2)
        eouts, elens, _ = model_full.apply(
            {"params": cast_params_for_compute(cfg_full, params)},
            x2, l2, False,  # deterministic=False: keep dropout in play
            method=lambda m, xs_, xl_, det: m.encoder(xs_, xl_, det),
            rngs={"dropout": do},
        )
        return jnp.mean(eouts.astype(jnp.float32))

    cenc = jax.jit(jax.value_and_grad(loss_enc)).lower(
        init["params"], tkey
    ).compile()
    variants["enc_fwd_bwd"] = lambda: cenc(init["params"], tkey)[0]

    # subsampler only.  Params MUST be cast to the compute dtype: with
    # f32 params flax promotes the whole piece back to f32, which reads
    # ~2x slower than the bf16 path the real train step runs.
    sub = Conv2dSubsampler(output_dim=H)
    sub_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        sub.init(key, xs, xlens),
    )

    def loss_sub(p, x):
        h, _ = sub.apply(p, x.astype(jnp.bfloat16), xlens)
        return jnp.mean(h.astype(jnp.float32))

    csub = jax.jit(jax.value_and_grad(loss_sub)).lower(sub_vars, xs).compile()
    variants["subsampler_fwd_bwd"] = lambda: csub(sub_vars, xs)[0]

    # CTC head+loss on a frozen encoder output: Dense(V) + ctc_loss
    T4 = ((T - 1) // 2 - 1) // 2
    eouts_fixed = jnp.asarray(
        rng.normal(size=(B, T4, H)).astype(np.float32)
    )
    import flax.linen as nn

    head = nn.Dense(V)
    head_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        head.init(key, eouts_fixed),
    )
    elens_fixed = jnp.full((B,), T4, jnp.int32)

    def loss_head_ctc(p, e):
        logits = head.apply(p, e.astype(jnp.bfloat16))
        return ctc_loss_fn(
            logits.astype(jnp.float32), ys, elens_fixed, ylens, blank_id=0
        )

    chead = jax.jit(jax.value_and_grad(loss_head_ctc)).lower(
        head_vars, eouts_fixed
    ).compile()
    variants["ctc_head_loss_fwd_bwd"] = lambda: chead(head_vars, eouts_fixed)[0]

    # the same head+loss through the fused Pallas path the real step runs
    from emoasr_tpu.ops.ctc import ctc_loss_fused_head

    def loss_head_fused(p, e):
        return ctc_loss_fused_head(
            e.astype(jnp.bfloat16), p["params"]["kernel"],
            p["params"]["bias"], ys, elens_fixed, ylens, blank_id=0,
        )

    cfused = jax.jit(jax.value_and_grad(loss_head_fused)).lower(
        head_vars, eouts_fixed
    ).compile()
    variants["ctc_head_loss_fused_fwd_bwd"] = (
        lambda: cfused(head_vars, eouts_fixed)[0]
    )

    # CTC loss alone on random logits (isolates the T-step scans)
    logits_fixed = jnp.asarray(
        rng.normal(size=(B, T4, V)).astype(np.float32)
    )

    def loss_ctc(lg):
        return ctc_loss_fn(lg, ys, elens_fixed, ylens, blank_id=0)

    cctc = jax.jit(jax.value_and_grad(loss_ctc)).lower(logits_fixed).compile()
    variants["ctc_loss_fwd_bwd"] = lambda: cctc(logits_fixed)[0]

    variants.pop("_shared_init", None)

    # ---- round-robin timing ----
    names = list(variants)
    for n in names:  # warm
        np.asarray(variants[n]())
    reps = 3 if args.quick else 8
    # pipeline PIPE async dispatches per measurement with ONE sync
    # (np.asarray — the only true sync on this transport;
    # block_until_ready is a no-op on axon arrays), then subtract the
    # measured fetch floor: every np.asarray pays the tunnel RTT, so a
    # window of PIPE calls + one fetch overstates per-call time by
    # RTT/PIPE
    PIPE = 2 if args.tiny else 8
    ftriv = jax.jit(lambda x: x[0] * 1.0).lower(xlens).compile()
    np.asarray(ftriv(xlens))
    floors = []
    for _ in range(max(reps, 5)):
        t0 = time.perf_counter()
        np.asarray(ftriv(xlens))
        floors.append(time.perf_counter() - t0)
    rtt = float(np.median(floors))
    times = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            f = variants[n]
            out = f()
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(PIPE):
                out = f()
            np.asarray(out)
            times[n].append((time.perf_counter() - t0 - rtt) / PIPE)

    full_med = float(np.median(times["full"]))
    print(f"\n## L1 train-step breakdown (B={B}, T={T}, U={U}, bf16, "
          f"{jax.devices()[0].device_kind}; median of {reps}, one process, "
          f"round-robin; fetch floor {rtt * 1e3:.1f} ms subtracted)\n")
    print("| variant | ms | Δ vs full | share of full |")
    print("|---|---|---|---|")
    rows = []
    for n in names:
        med = float(np.median(times[n]))
        delta = full_med - med
        rows.append((n, med, delta))
        print(
            f"| {n} | {med * 1e3:.2f} | {delta * 1e3:+.2f} | "
            f"{med / full_med * 100:.0f}% |"
        )
    if args.json:
        print(json.dumps({n: round(m * 1e3, 3) for n, m, _ in rows}))

    # ---- optional device trace ----
    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        try:
            jax.profiler.start_trace(args.trace)
            for _ in range(5):
                np.asarray(variants["full"]())
            jax.profiler.stop_trace()
            agg = parse_trace(args.trace)
            if agg:
                print("\n## device-trace op categories (5 full steps)\n")
                print("| op group | total ms | % |")
                print("|---|---|---|")
                tot = sum(agg.values())
                for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
                    print(f"| {k} | {v / 1e3:.2f} | {v / tot * 100:.1f}% |")
            else:
                print("\n(trace captured but no device op track found — "
                      "tunnel backend may not export one)")
        except Exception as e:  # noqa: BLE001
            print(f"\n(trace capture failed: {e!r})")


def parse_trace(trace_dir):
    """Aggregate device-op durations by fusion-name prefix from the
    perfetto/chrome JSON the profiler writes."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return {}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find process ids whose name suggests a device (TPU/accelerator)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "").lower()
            if "tpu" in nm or "device" in nm or "xla" in nm:
                dev_pids.add(e.get("pid"))
    agg = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        group = name.split(".")[0].split("_")[0] or name
        agg[group] = agg.get(group, 0.0) + float(e.get("dur", 0.0))
    return agg


if __name__ == "__main__":
    main()
