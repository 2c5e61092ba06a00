"""Driver benchmark scoreboard: one JSON line per metric (headline first).

Rows (all measured on the real chip, synthetic 80-dim fbank inputs,
10 ms frame shift):

- l1_train_step_bf16      train step (fwd+bwd+clip+update) at L1 shapes,
                          with FLOP-accounted MFU (XLA cost analysis /
                          device peak); vs_baseline = f32 step / bf16 step
- ctc_beam8_rtf_L1        batched CTC prefix beam, W=8
- rnnt_greedy_rtf_T5      batched RNN-T greedy (T5-class Conformer)
- rnnt_beam10_rtf_T5      batched ALSD beam, W=10
- att_joint_sf_rtf_L3_3   label-sync beam + joint CTC + KV-cached
                          Transformer-LM shallow fusion (the flagship
                          L3-3 decode mode)
- ctc_greedy_batched_rtf_L1  headline row (emitted FIRST), SAME protocol as round 1

vs_baseline for decode rows = reference_RTF / our_RTF (>1 = faster).
The reference's only published RTF is CTC greedy 0.0033 on the author's
CPU (`asr/correct/README.md:55-58`); the other baselines were measured on
THIS host with the reference's own protocol (torch CPU, 1 thread, batch-1
— `tools/measure_ref_rtf.py`), tagged baseline_src="measured_ref_cpu".
This host's CPU measures CTC greedy at 0.038 (10 s utts), i.e. ~10x the
published number, so measured-baseline ratios are NOT comparable to the
published anchor; the headline row keeps the published 0.0033.
"""

import json
import time

import numpy as np

FRAME_SHIFT_S = 0.010

# reference CPU RTFs (see module docstring for provenance)
REF_PUBLISHED_CTC_GREEDY = 0.0033
REF_RTF = {  # tools/measure_ref_rtf.py on this host (1 thread, batch-1,
    # 10 s utterances — same shapes as the rows below)
    "ctc_greedy_L1": 0.03808,
    "ctc_beam8_L1": 0.12323,
    "rnnt_greedy_T5": 0.05975,
    "rnnt_beam10_T5": 0.40556,
    "att_beam10_ctc_L3": 4.49134,
}

# bf16 peak TFLOP/s by TPU generation (public specs); MFU is reported
# against this assumed peak and the assumption is emitted alongside.
PEAK_TFLOPS_BF16 = {
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def device_peak_tflops(dev) -> tuple:
    kind = getattr(dev, "device_kind", "unknown")
    for k, v in PEAK_TFLOPS_BF16.items():
        if k.lower() in kind.lower():
            return v, kind
    return 197.0, kind  # conservative default (v5e-class)


def emit(row):
    print(json.dumps(row), flush=True)


def timeit(fn, sync, n=5):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.models.asr import ASR

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    peak_tflops, dev_kind = device_peak_tflops(jax.devices()[0])

    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    L1 = dict(
        ENC, encoder_type="transformer", decoder_type="ctc",
        enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=10000,
    )


    # ---------------- decode rows ----------------
    _var_cache = {}

    def decode_rtf(cfg_kw, B, T, beam_width, beam_kw, lm=None, n=5):
        cfg = config_from_dict(cfg_kw)
        model = ASR(cfg)
        xs = jax.jit(lambda k: jax.random.normal(k, (B, T, 80)))(key)
        xlens = jnp.full((B,), T, jnp.int32)
        ck = (cfg.encoder_type, cfg.decoder_type, cfg.vocab_size)
        if ck not in _var_cache:
            _var_cache[ck] = model.init(
                key, xs, xlens, jnp.ones((B, 4), jnp.int32),
                jnp.full((B,), 4), jnp.ones((B, 5), jnp.int32),
                jnp.ones((B, 5), jnp.int32),
            )
        v = _var_cache[ck]
        np.asarray(xs[0, 0, :1])
        dec = build_decode_fn(
            model, v, cfg, beam_width=beam_width, lm=lm, **beam_kw
        )
        flops = None
        try:  # AOT: reuse one compile for cost analysis + timing
            compiled = dec.lower(xs, xlens).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
            # decode fns take (variables, xs, xlens); rebind to (xs, xlens)
            dec = dec.bind_compiled(compiled)
        except Exception:
            pass
        dt = timeit(lambda: dec(xs, xlens), lambda o: np.asarray(o[0]), n=n)
        mfu = (
            round(flops / dt / (peak_tflops * 1e12), 4) if flops else None
        )
        return dt / (B * T * FRAME_SHIFT_S), mfu

    # ---------------- headline: round-1 protocol, unchanged ----------
    cfg = config_from_dict(dict(L1, dropout_enc_rate=0.0, dropout_attn_rate=0.0))
    model = ASR(cfg)
    B, T = 64, 1000
    xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    xlens = jnp.full((B,), T, jnp.int32)
    variables = model.init(key, xs, xlens, method=ASR.decode_greedy)
    # the CTC-beam row below reuses this tree (same modules; params are
    # shape-independent of B) to avoid a second expensive remote init
    _var_cache[("transformer", "ctc", 10000)] = variables
    decode = jax.jit(
        lambda v, x, l: model.apply(v, x, l, method=ASR.decode_greedy)
    )
    # distinct inputs per iteration (defeats transport-level caching),
    # derived ON DEVICE from one staged buffer (the remote tunnel's H2D
    # path is not what we measure)
    n_iters = 10
    base = jax.device_put(xs)
    roll = jax.jit(lambda x, i: jnp.roll(x, i, axis=1))
    inputs = [roll(base, i) for i in range(n_iters)]
    np.asarray(inputs[-1][0, 0, :1])
    hyps, hyp_lens, _, _ = decode(variables, xs, xlens)
    np.asarray(hyps)
    t0 = time.perf_counter()
    outs = []
    for it in range(n_iters):
        hyps, hyp_lens, _, _ = decode(variables, inputs[it], xlens)
        outs.append(hyps)
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    rtf = dt / (n_iters * B * T * FRAME_SHIFT_S)
    emit(
        {
            "metric": "ctc_greedy_batched_rtf_L1",
            "value": round(rtf, 6),
            "unit": "decode_s_per_audio_s",
            "vs_baseline": round(REF_PUBLISHED_CTC_GREEDY / rtf, 2),
            "baseline_src": "published_0.0033",
        }
    )

    # ---------------- L1 train step: steps/s + MFU ----------------
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    _train_shared = {}

    def train_step_time(compute_dtype):
        cfg = config_from_dict(
            dict(
                L1, spec_augment=True, lr_schedule_type="noam",
                learning_rate=5.0, num_warmup_steps=25000, lsm_prob=0.0,
                compute_dtype=compute_dtype,
                dropout_enc_rate=0.1, dropout_attn_rate=0.1,
            )
        )
        # production RNG for dropout/specaug streams (train/loop.py):
        # threefry mask generation costs ~half the step at these shapes
        tkey = jax.random.key(0, impl=cfg.rng_impl)
        model = ASR(cfg)
        B, T, U = 32, 800, 48
        if not _train_shared:
            xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
            xlens = jnp.full((B,), T, jnp.int32)
            ys = jnp.asarray(
                rng.integers(3, cfg.vocab_size, (B, U)), dtype=jnp.int32
            )
            ylens = jnp.full((B,), U, jnp.int32)
            ys_in = (
                jnp.full((B, U + 1), cfg.eos_id, jnp.int32).at[:, 1:].set(ys)
            )
            ys_out = (
                jnp.full((B, U + 1), cfg.eos_id, jnp.int32).at[:, :U].set(ys)
            )
            batch = dict(
                xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in,
                ys_out=ys_out,
            )
            # params are dtype-independent (f32 masters): init ONCE
            _train_shared["batch"] = batch
            _train_shared["variables"] = model.init(
                key, xs, xlens, ys, ylens, ys_in, ys_out
            )
        batch = _train_shared["batch"]
        variables = _train_shared["variables"]
        tx = build_optimizer(cfg)
        state = init_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )
        step = make_train_step(model, cfg, tx)

        # AOT: ONE compile per dtype, reused for cost analysis AND timing
        flops = None
        try:
            compiled = step.lower(state, batch, tkey).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
            step = compiled
        except Exception:
            pass

        def one(s):
            s2, m = step(s, batch, tkey)
            return s2, m

        state, m = one(state)
        np.asarray(m["loss_total"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, m = one(state)
        np.asarray(m["loss_total"])
        dt = (time.perf_counter() - t0) / n
        return dt, flops

    dt16, flops16 = train_step_time("bfloat16")
    dt32, _ = train_step_time("float32")
    mfu = (
        round(flops16 / dt16 / (peak_tflops * 1e12), 4)
        if flops16
        else None
    )
    emit(
        {
            "metric": "l1_train_step_bf16",
            "value": round(1.0 / dt16, 2),
            "unit": "steps_per_s",
            "vs_baseline": round(dt32 / dt16, 2),
            "step_ms": round(dt16 * 1000, 1),
            "step_ms_f32": round(dt32 * 1000, 1),
            "mfu": mfu,
            "flops_per_step": flops16,
            "assumed_peak_tflops_bf16": peak_tflops,
            "device_kind": dev_kind,
            "note": "vs_baseline = f32 step / bf16 step on-chip",
        }
    )

    T5 = dict(
        ENC, encoder_type="conformer", decoder_type="rnn_transducer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, embedding_size=128, dec_hidden_size=512,
        dec_num_layers=1, joint_hidden_size=512, vocab_size=1000,
        max_decode_ylen=100,
    )
    L3 = dict(
        ENC, encoder_type="conformer", decoder_type="transformer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, dec_hidden_size=256,
        dec_num_attention_heads=4, dec_num_layers=6,
        dec_intermediate_size=2048, vocab_size=10000, mtl_ctc_weight=0.3,
        max_decode_ylen=64, dropout_dec_rate=0.0,
    )

    rtf, mfu = decode_rtf(L1, 64, 1000, 8, {"len_weight": 2.0})
    emit(
        {
            "metric": "ctc_beam8_rtf_L1",
            "value": round(rtf, 6),
            "unit": "decode_s_per_audio_s",
            "vs_baseline": round(REF_RTF["ctc_beam8_L1"] / rtf, 2),
            "mfu": mfu,
            "baseline_src": "measured_ref_cpu",
        }
    )
    rtf, mfu = decode_rtf(T5, 8, 1000, 0, {})
    emit(
        {
            "metric": "rnnt_greedy_rtf_T5",
            "value": round(rtf, 6),
            "unit": "decode_s_per_audio_s",
            "vs_baseline": round(REF_RTF["rnnt_greedy_T5"] / rtf, 2),
            "mfu": mfu,
            "baseline_src": "measured_ref_cpu",
        }
    )
    rtf, mfu = decode_rtf(T5, 8, 1000, 10, {}, n=3)
    emit(
        {
            "metric": "rnnt_beam10_rtf_T5",
            "value": round(rtf, 6),
            "unit": "decode_s_per_audio_s",
            "vs_baseline": round(REF_RTF["rnnt_beam10_T5"] / rtf, 2),
            "mfu": mfu,
            "baseline_src": "measured_ref_cpu",
        }
    )

    # L3-3: joint CTC + KV-cached Transformer-LM shallow fusion
    from emoasr_tpu.models.lm.lm import TransformerLM
    from emoasr_tpu.search.common import make_lm_fusion

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
    fusion = make_lm_fusion(lm, lvars, 0.5, max_len=80)
    rtf, mfu = decode_rtf(
        L3, 8, 1000, 10,
        {"len_weight": 2.0, "decode_ctc_weight": 0.3}, lm=fusion, n=3,
    )
    emit(
        {
            "metric": "att_joint_sf_rtf_L3_3",
            "value": round(rtf, 6),
            "unit": "decode_s_per_audio_s",
            "mfu": mfu,
            # reference baseline measured WITHOUT SF (its fusion would only
            # be slower); conservative
            "vs_baseline": round(REF_RTF["att_beam10_ctc_L3"] / rtf, 2),
            "baseline_src": "measured_ref_cpu_no_sf",
        }
    )


if __name__ == "__main__":
    main()
