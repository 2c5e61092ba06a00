"""T5 transducer train-step breakdown on the chip.

The `t5_train_step_bf16` scoreboard row measures ~25.7 ms (MFU 0.149)
at B=16, T=800, U=48 — far below the L1 row's 0.388.  This tool splits
the step into its pieces with the same AOT + round-robin + one-fetch
protocol as tools/profile_train.py:

- full            the bench-protocol train step (pallas joint)
- full_chunked    same with rnnt_joint_mode=chunked
- no_dropout      dropout 0 (mask generation share)
- fwd_bwd         raw value_and_grad (no clip/optimizer)
- enc_fwd_bwd     Conformer encoder + subsampler alone
- pred_fwd_bwd    embed + prediction-net LSTM scan alone (U+1 steps)
- joint_loss_fwd_bwd  fused joint + rowscan lattice on frozen
                  h_enc/h_dec (isolates the loss pipeline)
- rowscan_fwd_bwd rnnt_alpha_rowscan alone on fixed lp_blank/lp_label
                  (isolates the T-step sequential lattice scan)

Usage: python tools/profile_t5.py [--quick] [--tiny] [--json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="toy shapes on CPU (wiring check)")
    ap.add_argument("--json", action="store_true")
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import (
        init_train_state,
        make_train_step,
        preprocess,
    )
    from emoasr_tpu.utils.precision import (
        cast_batch_for_compute,
        cast_params_for_compute,
    )

    B, T, U = (2, 64, 6) if args.tiny else (16, 800, 48)
    T5 = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=2 if args.tiny else 12,
        encoder_type="conformer", decoder_type="rnn_transducer",
        pos_encode_type="rel",
        enc_hidden_size=64 if args.tiny else 256,
        enc_intermediate_size=128 if args.tiny else 1024,
        embedding_size=128, dec_hidden_size=64 if args.tiny else 512,
        dec_num_layers=1, joint_hidden_size=64 if args.tiny else 512,
        vocab_size=100 if args.tiny else 1000,
        spec_augment=True, lr_schedule_type="noam", learning_rate=5.0,
        num_warmup_steps=25000, rng_impl="unsafe_rbg",
        compute_dtype="bfloat16", dropout_enc_rate=0.1,
        dropout_attn_rate=0.1, dropout_dec_rate=0.1, dropout_emb_rate=0.1,
        rnnt_joint_mode="pallas", max_decode_ylen=100,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    xlens = jnp.full((B,), T, jnp.int32)
    V = T5["vocab_size"]
    ys = jnp.asarray(rng.integers(3, V - 1, size=(B, U)).astype(np.int32))
    ylens = jnp.full((B,), U, jnp.int32)
    ys_in = jnp.full((B, U + 1), 2, jnp.int32).at[:, 1:].set(ys)
    ys_out = jnp.full((B, U + 1), 2, jnp.int32).at[:, :U].set(ys)
    batch = dict(xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in,
                 ys_out=ys_out)

    variants = {}
    shared = {}

    def add_train_variant(name, cfg_over):
        cfg = config_from_dict({**T5, **cfg_over})
        model = ASR(cfg)
        if "init" not in shared:
            shared["init"] = model.init(
                key, xs, xlens, ys, ylens, ys_in, ys_out
            )
        init = shared["init"]
        tx = build_optimizer(cfg)
        state = init_train_state(
            init["params"], init.get("batch_stats", {}), tx
        )
        step = make_train_step(model, cfg, tx)
        tkey = jax.random.key(0, impl=cfg.rng_impl)
        compiled = step.lower(state, batch, tkey).compile()
        holder = {"s": state}

        def run():
            holder["s"], m = compiled(holder["s"], batch, tkey)
            return m["loss_total"]

        variants[name] = run

    add_train_variant("full", {})
    add_train_variant("full_chunked", dict(rnnt_joint_mode="chunked"))
    add_train_variant("no_dropout", dict(
        dropout_enc_rate=0.0, dropout_attn_rate=0.0, dropout_dec_rate=0.0,
        dropout_emb_rate=0.0,
    ))

    # full-vs-fwd_bwd gap ablations: buffer donation (in-place optimizer
    # update) and a no-NaN-skip step (optimizer applied unconditionally)
    def add_donated_variant():
        cfg = config_from_dict(T5)
        model = ASR(cfg)
        # PRIVATE copy: donation deletes the input buffers on first
        # execution, and the init tree is shared by every other variant
        init = jax.tree_util.tree_map(jnp.array, shared["init"])
        tx = build_optimizer(cfg)
        state0 = init_train_state(
            init["params"], init.get("batch_stats", {}), tx
        )
        step = make_train_step(model, cfg, tx)
        tkey = jax.random.key(0, impl=cfg.rng_impl)
        compiled = (
            jax.jit(lambda s, b, k: step(s, b, k), donate_argnums=(0,))
            .lower(state0, batch, tkey)
            .compile()
        )
        holder = {"s": state0}

        def run():
            holder["s"], m = compiled(holder["s"], batch, tkey)
            return m["loss_total"]

        variants["full_donated"] = run

    add_donated_variant()

    def add_noskip_variant():
        import optax

        from emoasr_tpu.train.optim import make_lr_fn, scale_updates

        cfg = config_from_dict(T5)
        model = ASR(cfg)
        init = shared["init"]
        tx = build_optimizer(cfg)
        state0 = init_train_state(
            init["params"], init.get("batch_stats", {}), tx
        )
        lr_fn = make_lr_fn(cfg, None)

        def step_fn(state, b, rng_):
            sa, do = jax.random.split(rng_)
            x2, l2 = preprocess(cfg, b["xs"], b["xlens"], sa, True)
            x2 = cast_batch_for_compute(cfg, x2)

            def loss_fn(params):
                vs = {"params": cast_params_for_compute(cfg, params)}
                mutable = False
                if state.batch_stats:
                    vs["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(
                    vs, x2, l2, b["ys"], b["ylens"], b["ys_in"],
                    b["ys_out"], None, None, None, deterministic=False,
                    rngs={"dropout": do}, mutable=mutable,
                )
                if mutable:
                    (loss, ld), up = out
                    return loss, (ld, up.get("batch_stats", {}))
                loss, ld = out
                return loss, (ld, {})

            (loss, (ld, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            lr = lr_fn(state.step + 1, state.epoch_scale)
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params
            )
            updates = scale_updates(updates, lr)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=stats if stats else state.batch_stats,
                opt_state=new_opt,
            )
            return state, ld

        tkey = jax.random.key(0, impl=cfg.rng_impl)
        compiled = jax.jit(step_fn).lower(state0, batch, tkey).compile()
        holder = {"s": state0}

        def run():
            holder["s"], m = compiled(holder["s"], batch, tkey)
            return m["loss_total"]

        variants["full_noskip"] = run

    add_noskip_variant()

    cfg = config_from_dict(T5)
    model = ASR(cfg)
    init = shared["init"]
    tkey = jax.random.key(0, impl="unsafe_rbg")

    def loss_fwd(params, rng_):
        sa, do = jax.random.split(rng_)
        x2, l2 = preprocess(cfg, xs, xlens, sa, True)
        x2 = cast_batch_for_compute(cfg, x2)
        vs = {"params": cast_params_for_compute(cfg, params)}
        if init.get("batch_stats"):
            vs["batch_stats"] = init["batch_stats"]
        out = model.apply(
            vs, x2, l2, ys, ylens, ys_in, ys_out, None, None, None,
            deterministic=False, rngs={"dropout": do},
            mutable=["batch_stats"],
        )
        return out[0][0]

    cfb = jax.jit(jax.value_and_grad(loss_fwd)).lower(
        init["params"], tkey
    ).compile()
    variants["fwd_bwd"] = lambda: cfb(init["params"], tkey)[0]

    # encoder alone
    def loss_enc(params, rng_):
        sa, do = jax.random.split(rng_)
        x2, l2 = preprocess(cfg, xs, xlens, sa, True)
        x2 = cast_batch_for_compute(cfg, x2)
        vs = {"params": cast_params_for_compute(cfg, params)}
        if init.get("batch_stats"):
            vs["batch_stats"] = init["batch_stats"]
        out = model.apply(
            vs, x2, l2, False,
            method=lambda m, a, b, det: m.encoder(a, b, det),
            rngs={"dropout": do}, mutable=["batch_stats"],
        )
        return jnp.mean(out[0][0].astype(jnp.float32))

    cenc = jax.jit(jax.value_and_grad(loss_enc)).lower(
        init["params"], tkey
    ).compile()
    variants["enc_fwd_bwd"] = lambda: cenc(init["params"], tkey)[0]

    # prediction net alone
    def loss_pred(params, rng_):
        vs = {"params": cast_params_for_compute(cfg, params)}
        out = model.apply(
            vs, ys_in, None, False,
            method=lambda m, a, st, det: m.decoder.recurrency(a, st, det),
            rngs={"dropout": jax.random.split(rng_)[1]},
        )
        return jnp.mean(out[0].astype(jnp.float32))

    cpred = jax.jit(jax.value_and_grad(loss_pred)).lower(
        init["params"], tkey
    ).compile()
    variants["pred_fwd_bwd"] = lambda: cpred(init["params"], tkey)[0]

    # joint + lattice loss on frozen encoder/prediction activations
    T4 = ((T - 1) // 2 - 1) // 2
    E = cfg.enc_hidden_size
    D = cfg.dec_hidden_size
    eouts_fixed = jnp.asarray(
        rng.normal(size=(B, T4, E)).astype(np.float32)
    ).astype(jnp.bfloat16)
    douts_fixed = jnp.asarray(
        rng.normal(size=(B, U + 1, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    elens4 = jnp.full((B,), T4, jnp.int32)

    from emoasr_tpu.ops.rnnt import (
        rnnt_alpha_rowscan,
        rnnt_gathered_from_joint,
    )
    from emoasr_tpu.ops.rnnt_pallas import fused_joint_gather

    jp = {
        k: cast_params_for_compute(cfg, init["params"])["decoder"][k]
        for k in ("w_enc", "w_dec", "output")
    }

    def loss_joint(p, mode):
        h_enc = eouts_fixed @ p["w_enc"]["kernel"] + p["w_enc"]["bias"]
        h_dec = douts_fixed @ p["w_dec"]["kernel"] + p["w_dec"]["bias"]
        if mode == "pallas":
            lp_b, lp_l = fused_joint_gather(
                h_enc, h_dec, p["output"]["kernel"], p["output"]["bias"],
                ys, cfg.blank_id,
            )
        else:
            lp_b, lp_l = rnnt_gathered_from_joint(
                h_enc, h_dec, p["output"]["kernel"], p["output"]["bias"],
                ys, cfg.blank_id,
            )
        return -jnp.mean(rnnt_alpha_rowscan(lp_b, lp_l, elens4, ylens))

    cjl = jax.jit(
        jax.value_and_grad(lambda p: loss_joint(p, "pallas"))
    ).lower(jp).compile()
    variants["joint_loss_fwd_bwd"] = lambda: cjl(jp)[0]
    cjlc = jax.jit(
        jax.value_and_grad(lambda p: loss_joint(p, "chunked"))
    ).lower(jp).compile()
    variants["joint_loss_chunked_fwd_bwd"] = lambda: cjlc(jp)[0]

    # lattice rowscan alone on fixed log-probs
    lp_blank = jnp.asarray(
        rng.normal(size=(B, T4, U + 1)).astype(np.float32)
    )
    lp_label = jnp.asarray(  # label emissions exist only for u < U
        rng.normal(size=(B, T4, U)).astype(np.float32)
    )

    def loss_scan(lb, ll):
        return -jnp.mean(rnnt_alpha_rowscan(lb, ll, elens4, ylens))

    cscan = jax.jit(jax.value_and_grad(loss_scan, argnums=(0, 1))).lower(
        lp_blank, lp_label
    ).compile()
    variants["rowscan_fwd_bwd"] = lambda: cscan(lp_blank, lp_label)[0]

    # ---- round-robin timing (profile_train.py protocol) ----
    names = list(variants)
    for n in names:
        np.asarray(variants[n]())
    reps = 3 if args.quick else 8
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
    print(f"\n## T5 train-step breakdown (B={B}, T={T}, U={U}, bf16, "
          f"{jax.devices()[0].device_kind}; median of {reps}, "
          f"fetch floor {rtt * 1e3:.1f} ms subtracted)\n")
    print("| variant | ms | share of full |")
    print("|---|---|---|")
    rows = []
    for n in names:
        med = float(np.median(times[n]))
        rows.append((n, med))
        print(f"| {n} | {med * 1e3:.2f} | {med / full_med * 100:.0f}% |")
    if args.json:
        print(json.dumps({n: round(m * 1e3, 3) for n, m in rows}))


if __name__ == "__main__":
    main()
