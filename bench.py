"""Driver benchmark scoreboard: one JSON line per metric.

The HEADLINE row (`ctc_greedy_batched_rtf_L1`, protocol unchanged since
round 1) is emitted LAST — the driver parses the final JSON line.

Rows (all measured on the real chip, synthetic 80-dim fbank inputs,
10 ms frame shift):

- l1_train_step_bf16      train step (fwd+bwd+clip+update) at L1 shapes,
                          FLOP-accounted MFU; vs_baseline = f32/bf16 step
- t5_train_step_bf16      Conformer-transducer train step with the Pallas
                          fused joint; vs_baseline = chunked-joint step /
                          Pallas-joint step (the fused-kernel win)
- ctc_beam8_rtf_L1        batched CTC prefix beam W=8, batch swept to the
                          chip's saturation point
- rnnt_greedy_rtf_T5      batched RNN-T greedy, batch swept
- rnnt_beam10_rtf_T5      batched ALSD beam W=10, batch swept
- att_joint_sf_rtf_L3_3   label-sync beam + joint CTC + Transformer-LM
                          shallow fusion (flagship L3-3 mode), batch
                          swept; `fusion_mode` tags what actually ran
                          (mode="auto" resolves to ancestor-INDIRECT
                          cached fusion, search/common.py: physical-slot
                          KV caches + a (B, W, Lc) ancestor table, no
                          per-step cache beam gather — chip A/B in
                          ROUND3_NOTES: 159 ms vs 202 ms gathered-cached
                          vs 289 ms stateless at B=16)
- rescore_rtf_bert        BERT pseudo-likelihood n-best rescoring RTF
                          (protocol: rescore/test_rescore_grid.py:120-145)
- correct_rtf_bert        mask-and-fill error-correction RTF (protocol:
                          test_asr_correct.py; published 0.0094,
                          asr/correct/README.md:55-58)
- ctc_greedy_batched_rtf_L1  HEADLINE (last), same protocol as round 1

Decode rows carry BOTH of BASELINE.json's north-star fields: `value` =
RTF (decode_s_per_audio_s) and `utts_per_s_per_chip` (= 1/(RTF x 10 s)
at these 10 s utterances), plus the (batch, beam) that produced them and
the full sweep.

Fault isolation (r3): each row runs under a guard — a row that fails
(e.g. a transient error on this remote-TPU transport) emits
`{"metric": ..., "error": ...}` and the remaining rows still run, so
one flake cannot take down the whole scoreboard.  `BENCH_SMOKE=1`
shrinks every shape for a fast CPU validation pass of the full script
(protocol/labels unchanged; numbers meaningless) and `BENCH_PLATFORM`
pins the JAX platform (the axon plugin otherwise force-registers).

Timing protocol (r3 fix): every window of n pipelined dispatches ends in
ONE np.asarray fetch, and that fetch pays the remote-tunnel round trip
(~30 ms) regardless of n — block_until_ready is a no-op on this
transport, so the fetch is the only true sync.  r1/r2 rows therefore
overstated per-call time by RTT/n (+3 ms on the 10-step train window,
+10 ms on 3-iteration decode windows).  r3 measures the one-fetch floor
with a trivial program and subtracts it from each window; the floor is
emitted in the headline row (`rtt_floor_ms`) and the correction is
noted where it moves a row vs r2.

vs_baseline for decode rows = reference_RTF / our_RTF (>1 = faster).
The reference's published RTFs are CTC greedy 0.0033 and correction
0.0094 on the author's CPU (`asr/correct/README.md:55-58`); all other
baselines were measured on THIS host with the reference's own protocol
(torch CPU, 1 thread, batch-1 — `tools/measure_ref_rtf.py`), tagged
baseline_src="measured_ref_cpu".  This host measures CTC greedy at
0.038 (10 s utts), ~10x the published number, so measured-baseline
ratios are NOT comparable to published anchors; rows against published
numbers say so in baseline_src.
"""

import json
import os
import time

import numpy as np

FRAME_SHIFT_S = 0.010

SMOKE = bool(os.environ.get("BENCH_SMOKE"))

# Durable scoreboard (r4, VERDICT r3 #3): the driver's BENCH_r{N}.json
# capture is tail-truncated — it kept only the last few stdout lines of
# the r3 run and lost the train-step rows.  Every emit() therefore also
# rewrites BENCH_SELF_r{N}.json in-repo (full rows, crash-safe rewrite
# per row), so results can always be read back from a committed
# artifact.  Smoke runs divert to /tmp so CPU validation passes can
# never clobber the real-chip scoreboard.
BENCH_ROUND = os.environ.get("BENCH_ROUND", "05")
SELF_PATH = os.environ.get(
    "BENCH_SELF_PATH",
    os.path.join(
        "/tmp" if SMOKE else os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_SELF_r{BENCH_ROUND}.json",
    ),
)
_self_rows = []

# Best prior value per metric across all previous rounds, with the
# improvement direction, so every row self-reports vs_best_prior
# (>1 = better than any previous round).  Sources: BENCH_r03.json tail,
# ROUND3_NOTES.md mid-round table (the r3 driver capture truncated the
# early rows), BENCH_r02.json.
BEST_PRIOR = {  # metric: (best_value, higher_is_better)
    "l1_train_step_bf16": (56.35, True),      # BENCH_SELF_r04
    "t5_train_step_bf16": (40.18, True),      # ROUND3_NOTES mid-round
    "ctc_beam8_rtf_L1": (7.9e-05, False),     # ROUND3_NOTES (f32, B=128)
    "rnnt_greedy_rtf_T5": (4.4e-05, False),   # BENCH_SELF_r04
    "rnnt_beam10_rtf_T5": (3.66e-04, False),  # BENCH_SELF_r04
    "att_joint_sf_rtf_L3_3": (5.16e-04, False),  # BENCH_SELF_r04 (B=64)
    "rescore_rtf_bert": (1.225e-03, False),   # BENCH_r03
    "correct_rtf_bert": (1.26e-03, False),    # ROUND3_NOTES mid-round
    "ctc_greedy_batched_rtf_L1": (2.0e-05, False),  # BENCH_r03
    "eval_cli_greedy_rtf_L1": (1.959e-03, False),   # BENCH_SELF_r04
    "eval_cli_joint_sf_rtf_L3_3": (2.523e-03, False),  # BENCH_SELF_r04
}

# published reference CPU RTFs (asr/correct/README.md:55-58)
REF_PUBLISHED_CTC_GREEDY = 0.0033
REF_PUBLISHED_CORRECT = 0.0094

REF_RTF = {  # tools/measure_ref_rtf.py on this host (1 thread, batch-1,
    # 10 s utterances — same shapes as the rows below). Measured twice
    # (round 2, round 3); cross-process CPU timing noise on this host is
    # up to ~2x (rnnt_beam10: 0.41 r2 vs 0.80 r3), so each row keeps the
    # FASTER (minimum) of the two runs — conservative for vs_baseline.
    "ctc_greedy_L1": 0.02676,
    "ctc_beam8_L1": 0.12323,
    "rnnt_greedy_T5": 0.05975,
    "rnnt_beam10_T5": 0.40556,
    "att_beam10_ctc_L3": 4.41807,
    "rescore_bert": 0.24531,
    "correct_bert": 0.03221,
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
    prior = BEST_PRIOR.get(row.get("metric"))
    if prior and isinstance(row.get("value"), (int, float)) and row["value"]:
        best, higher_better = prior
        row.setdefault("best_prior", best)
        row.setdefault(
            "vs_best_prior",
            round(
                (row["value"] / best) if higher_better
                else (best / row["value"]),
                3,
            ),
        )
    print(json.dumps(row), flush=True)
    _self_rows.append(row)
    with open(SELF_PATH, "w") as f:  # full rewrite per row: crash-safe
        for r in _self_rows:
            f.write(json.dumps(r) + "\n")


ONLY = {
    m for m in os.environ.get("BENCH_ONLY", "").split(",") if m
}  # e.g. BENCH_ONLY=t5_train_step_bf16,rnnt_beam10_rtf_T5 re-measures
# single rows without the full-scoreboard run (driver runs everything)


def guard(name, fn):
    """Fault isolation per scoreboard row: report the failure as a row
    and keep going so one transport flake cannot lose every later row
    (the driver's end-of-round run gets whatever succeeded)."""
    if ONLY and name not in ONLY:
        return None
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — the whole point is isolation
        emit({"metric": name, "error": f"{type(e).__name__}: {e}"})
        return None


RTT_FLOOR = [0.0]  # measured in main(): the one-fetch transport cost


def timeit(fn, sync, n=5, ret_out=False):
    """Median-free steady-state per-call time: n pipelined dispatches,
    ONE final fetch.  The fetch pays the remote-transport round trip
    (~30 ms on this tunnel — block_until_ready is a no-op on axon
    arrays, so np.asarray is the only true sync); subtracting the
    measured floor removes the RTT/n overstatement that inflated every
    r1/r2 row (~+3 ms/step on a 10-iteration train window).
    `ret_out=True` also returns the final call's output so callers can
    inspect results without paying an extra run."""
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0 - RTT_FLOOR[0]) / n
    return (dt, out) if ret_out else dt


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        # must land before backend init; overrides the axon plugin's
        # force-registration (tests/conftest.py pattern)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

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

    # measure the one-fetch transport floor (trivial program + fetch)
    _xtriv = jnp.zeros((8,), jnp.int32)
    _ftriv = jax.jit(lambda x: x[0] * 1).lower(_xtriv).compile()
    np.asarray(_ftriv(_xtriv))
    _floors = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(_ftriv(_xtriv))
        _floors.append(time.perf_counter() - t0)
    RTT_FLOOR[0] = float(np.median(_floors))

    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    L1 = dict(
        ENC, encoder_type="transformer", decoder_type="ctc",
        enc_hidden_size=256, enc_intermediate_size=2048, vocab_size=10000,
    )

    # protocol shapes (SMOKE shrinks them for a CPU validation pass only)
    DEC_T = 100 if SMOKE else 1000
    TRAIN_BTU = (2, 64, 8) if SMOKE else (32, 800, 48)
    T5_TRAIN_BTU = (2, 64, 8) if SMOKE else (16, 800, 48)

    def sweep_batches(full):
        return [2] if SMOKE else full

    # ---------------- decode machinery ----------------
    _var_cache = {}

    def decode_rtf(cfg_kw, B, T, beam_width, beam_kw, lm=None, n=3,
                   want_n_decoded=False):
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
        dt, out = timeit(
            lambda: dec(xs, xlens), lambda o: np.asarray(o[0]), n=n,
            ret_out=True,
        )
        mfu = (
            round(flops / dt / (peak_tflops * 1e12), 4) if flops else None
        )
        n_decoded = None
        if want_n_decoded:  # reuse the final timed run's outputs
            scores = np.asarray(out[2])
            n_decoded = (
                int((scores[:, 0] > -1e29).sum()) if scores.ndim == 2 else B
            )
        return dt / (B * T * FRAME_SHIFT_S), mfu, n_decoded

    def decode_row(metric, cfg_kw, T, beam_width, beam_kw, batches,
                   ref_key, lm=None, n=3, extra=None,
                   want_n_decoded=False):
        """Sweep batch to saturation; report RTF + utts/sec/chip
        (BASELINE.json's north-star metric) at the best point."""
        sweep = []
        for B in batches:
            rtf, mfu, nd = decode_rtf(
                cfg_kw, B, T, beam_width, beam_kw, lm=lm, n=n,
                want_n_decoded=want_n_decoded,
            )
            sweep.append(
                dict(
                    batch=B,
                    rtf=round(rtf, 6),
                    utts_per_s_per_chip=round(1.0 / (rtf * T * FRAME_SHIFT_S), 2),
                    mfu=mfu,
                    **({"n_decoded": nd} if nd is not None else {}),
                )
            )
        best = min(sweep, key=lambda c: c["rtf"])
        ref = REF_RTF.get(ref_key)
        row = {
            "metric": metric,
            "value": best["rtf"],
            "unit": "decode_s_per_audio_s",
            "utts_per_s_per_chip": best["utts_per_s_per_chip"],
            "batch": best["batch"],
            "beam": beam_width,
            "mfu": best["mfu"],
            "vs_baseline": round(ref / best["rtf"], 2) if ref else None,
            "baseline_src": "measured_ref_cpu",
            "batch_sweep": sweep,
        }
        if extra:
            row.update(extra)
        emit(row)
        return best

    # ---------------- train-step machinery ----------------
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    _train_shared = {}

    def train_step_time(cfg_extra, shared_key, B, T, U, n=10):
        base = dict(
            spec_augment=True, lr_schedule_type="noam",
            learning_rate=5.0, num_warmup_steps=25000, lsm_prob=0.0,
            # hardware RNG: the production-config opt-in
            # (configs/*/: rng_impl: unsafe_rbg; threefry masks cost
            # ~half the step at these shapes)
            rng_impl="unsafe_rbg",
        )
        base.update(cfg_extra)  # cfg_extra wins on conflicts
        base.update(dropout_enc_rate=0.1, dropout_attn_rate=0.1)
        cfg = config_from_dict(base)
        tkey = jax.random.key(0, impl=cfg.rng_impl)
        model = ASR(cfg)
        if shared_key not in _train_shared:
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
            # params are dtype/joint-mode independent: init ONCE per family
            _train_shared[shared_key] = (
                batch,
                model.init(key, xs, xlens, ys, ylens, ys_in, ys_out),
            )
        batch, variables = _train_shared[shared_key]
        tx = build_optimizer(cfg)
        state = init_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )
        step = make_train_step(model, cfg, tx)

        # AOT: ONE compile per variant, reused for cost analysis + timing
        def _flops_of(c):
            ca = c.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)) or None

        flops = None
        try:
            compiled = step.lower(state, batch, tkey).compile()
            flops = _flops_of(compiled)
            step = compiled
        except Exception:
            pass
        if cfg.decoder_type == "ctc":
            # the fused Pallas CTC head hides its matmul from XLA cost
            # analysis (custom call); account flops from the equivalent
            # dense-path compile so MFU stays comparable across rounds
            import emoasr_tpu.ops.ctc as ops_ctc

            try:
                ops_ctc.USE_PALLAS = False
                dense_step = make_train_step(model, cfg, tx)
                flops = _flops_of(
                    dense_step.lower(state, batch, tkey).compile()
                ) or flops
            except Exception:
                pass
            finally:
                ops_ctc.USE_PALLAS = True

        state, m = step(state, batch, tkey)
        np.asarray(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, tkey)
        np.asarray(m["loss_total"])
        dt = (time.perf_counter() - t0 - RTT_FLOOR[0]) / n
        return dt, flops

    # ---------------- L1 train step: steps/s + MFU ----------------
    def row_l1_train():
        B, T, U = TRAIN_BTU
        dt16, flops16 = train_step_time(
            dict(L1, compute_dtype="bfloat16"), "l1", B, T, U
        )
        dt32, _ = train_step_time(
            dict(L1, compute_dtype="float32"), "l1", B, T, U
        )
        mfu = (
            round(flops16 / dt16 / (peak_tflops * 1e12), 4)
            if flops16 else None
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
                "rng_impl": "unsafe_rbg",
                "note": "vs_baseline = f32 step / bf16 step on-chip; r3 "
                        "subtracts the one-fetch transport floor (r2's "
                        "22.6 ms included ~3 ms of tunnel RTT: RTT/n with "
                        "n=10)",
            }
        )

    guard("l1_train_step_bf16", row_l1_train)

    T5 = dict(
        ENC, encoder_type="conformer", decoder_type="rnn_transducer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, embedding_size=128, dec_hidden_size=512,
        dec_num_layers=1, joint_hidden_size=512, vocab_size=1000,
        max_decode_ylen=100,
    )

    # T5 transducer train step: Pallas fused joint vs chunked lattice
    # (the fused-kernel end-to-end win, driver-captured)
    def row_t5_train():
        B, T, U = T5_TRAIN_BTU
        T5_TRAIN = dict(
            T5, spec_augment=True, compute_dtype="bfloat16",
            dropout_dec_rate=0.1, dropout_emb_rate=0.1,
        )
        dt_pallas, _ = train_step_time(
            dict(T5_TRAIN, rnnt_joint_mode="pallas"), "t5", B, T, U, n=5
        )
        # MFU flops come from the CHUNKED compile: XLA cost analysis
        # cannot see inside the Pallas custom call, so the pallas-mode
        # count would omit the joint matmul
        dt_chunk, flops_t5 = train_step_time(
            dict(T5_TRAIN, rnnt_joint_mode="chunked"), "t5", B, T, U, n=5
        )
        emit(
            {
                "metric": "t5_train_step_bf16",
                "value": round(1.0 / dt_pallas, 2),
                "unit": "steps_per_s",
                "vs_baseline": round(dt_chunk / dt_pallas, 2),
                "step_ms": round(dt_pallas * 1000, 1),
                "step_ms_chunked_joint": round(dt_chunk * 1000, 1),
                "mfu": (
                    round(flops_t5 / dt_pallas / (peak_tflops * 1e12), 4)
                    if flops_t5 else None
                ),
                "note": "vs_baseline = chunked-joint step / Pallas-joint "
                        "step",
            }
        )

    guard("t5_train_step_bf16", row_t5_train)

    # ---------------- decode rows (batch swept) ----------------
    L3 = dict(
        ENC, encoder_type="conformer", decoder_type="transformer",
        pos_encode_type="rel", enc_hidden_size=256,
        enc_intermediate_size=1024, dec_hidden_size=256,
        dec_num_attention_heads=4, dec_num_layers=6,
        dec_intermediate_size=2048, vocab_size=10000, mtl_ctc_weight=0.3,
        max_decode_ylen=64, dropout_dec_rate=0.0,
    )

    # Decode rows measure the production precision policy: params cast
    # once to bf16, KV caches bf16, search scores/log-softmaxes f32
    # (utils/precision.py).  r2 measured these rows in f32 — the dtype
    # is tagged on each row so round-over-round deltas self-explain.
    BF16 = dict(compute_dtype="bfloat16")
    DTYPE_NOTE = "bf16 decode (production policy; r2 rows ran f32)"

    guard("ctc_beam8_rtf_L1", lambda: decode_row(
        "ctc_beam8_rtf_L1", dict(L1, **BF16), DEC_T, 8, {"len_weight": 2.0},
        batches=sweep_batches([64, 128]), ref_key="ctc_beam8_L1",
        extra={"compute_dtype": "bfloat16", "note": DTYPE_NOTE},
    ))
    guard("rnnt_greedy_rtf_T5", lambda: decode_row(
        "rnnt_greedy_rtf_T5", dict(T5, **BF16), DEC_T, 0, {},
        batches=sweep_batches([64, 128]), ref_key="rnnt_greedy_T5",
        extra={"compute_dtype": "bfloat16", "note": DTYPE_NOTE},
    ))
    guard("rnnt_beam10_rtf_T5", lambda: decode_row(
        "rnnt_beam10_rtf_T5", dict(T5, **BF16), DEC_T, 10, {},
        batches=sweep_batches([16, 64]), ref_key="rnnt_beam10_T5", n=2,
        extra={"compute_dtype": "bfloat16", "note": DTYPE_NOTE},
    ))

    # L3-3: joint CTC + Transformer-LM shallow fusion (flagship)
    def row_l3_fusion():
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
            jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32),
            jnp.asarray([2])
        )
        # LM params cast once to bf16 like the ASR params (the LM's
        # log-softmax stays f32 inside the module, utils/precision.py)
        from emoasr_tpu.utils.precision import cast_floating

        fusion = make_lm_fusion(
            lm, cast_floating(lvars, jnp.bfloat16), 0.5, max_len=80
        )
        decode_row(
            "att_joint_sf_rtf_L3_3", dict(L3, **BF16), DEC_T, 10,
            {"len_weight": 2.0, "decode_ctc_weight": 0.3, "top1": True},
            batches=sweep_batches([16, 64]), ref_key="att_beam10_ctc_L3",
            lm=fusion, n=2, want_n_decoded=True,
            extra={
                "fusion_mode": "indirect (auto-selected)",
                "dec_step_mode": "indirect (auto-selected)",
                "compute_dtype": "bfloat16",
                "baseline_src": "measured_ref_cpu_no_sf",
                "note": "reference baseline measured WITHOUT SF (its "
                        "fusion would only be slower); conservative. "
                        "r5: production top-1 protocol (admissible "
                        "early stop + CTC-len row caps, exact — "
                        "search/attention_beam.py); on this UNTRAINED "
                        "checkpoint beams never finalize early, so trip "
                        "counts (and comparability with best_prior) are "
                        "unchanged — the mechanism's wins show on the "
                        "eval_cli/trained rows.  n_decoded now == batch "
                        "via forced finalization at the row cap. "
                        + DTYPE_NOTE,
            },
        )

    guard("att_joint_sf_rtf_L3_3", row_l3_fusion)

    # ---------------- BERT PLL n-best rescoring RTF ----------------
    _bert_memo = {}

    def make_bert():
        """BERT LM shared by the rescore and correction rows; memoized
        so either row can build it if the other's guard tripped."""
        if "bert" not in _bert_memo:
            from emoasr_tpu.models.lm.lm import LM as LMFacade

            bert_cfg = config_from_dict(
                dict(
                    lm_type="bert", vocab_size=10000, hidden_size=512,
                    num_layers=4, num_attention_heads=8,
                    intermediate_size=2048, max_seq_len=256, mask_id=9999,
                    dropout_rate=0.0,
                )
            )
            bert = LMFacade(bert_cfg)
            bvars = bert.init(
                jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                jnp.full((1,), 4, jnp.int32), jnp.full((1, 4), -100, jnp.int32),
            )
            _bert_memo["bert"] = (bert_cfg, bert, bvars)
        return _bert_memo["bert"]

    def row_rescore():
        import pandas as pd

        from emoasr_tpu.eval.rescore import score_lm

        _, bert, bvars = make_bert()
        n_utts, n_best, hyp_len = (2, 2, 8) if SMOKE else (10, 5, 20)
        rows = []
        for i in range(n_utts):
            for _ in range(n_best):
                hyp = rng.integers(3, 9999, size=hyp_len)
                rows.append(
                    dict(utt_id=f"s-u{i}-0-10000",
                         token_id=" ".join(map(str, hyp)))
                )
        nbest_df = pd.DataFrame(rows)
        score_lm(nbest_df.copy(), bert, bvars, max_len=256)  # warm/compile
        t0 = time.perf_counter()
        score_lm(nbest_df.copy(), bert, bvars, max_len=256)
        # one transport fetch floor removed: the pipeline syncs once at
        # the end; on a local host that latency does not exist
        dt = time.perf_counter() - t0 - RTT_FLOOR[0]
        rtf = dt / (n_utts * 10.0)
        ref = REF_RTF.get("rescore_bert")
        emit(
            {
                "metric": "rescore_rtf_bert",
                "value": round(rtf, 6),
                "unit": "rescore_s_per_audio_s",
                "vs_baseline": round(ref / rtf, 2) if ref else None,
                "baseline_src": "measured_ref_cpu",
                "note": f"{n_best}-best x {hyp_len} tokens per 10 s utt, "
                        "BERT PLL scored in batched single forwards (all "
                        "masked positions at once) vs the reference's "
                        "1-hyp chunks",
            }
        )

    guard("rescore_rtf_bert", row_rescore)

    # ---------------- mask-and-fill correction RTF ----------------
    def row_correct():
        from emoasr_tpu.eval.correct import Corrector

        bert_cfg, bert, bvars = make_bert()
        ccfg = config_from_dict(dict(L1))
        cmodel = ASR(ccfg)
        B = 2 if SMOKE else 20
        cvars = _var_cache.get(("transformer", "ctc", 10000))
        if cvars is None:
            cvars = cmodel.init(
                key, jnp.zeros((B, DEC_T, 80)), jnp.full((B,), DEC_T,
                                                         jnp.int32),
                method=ASR.decode_greedy,
            )
        corr = Corrector(
            ccfg, cmodel, cvars, bert_cfg, bert, bvars,
            mask_th=0.9, lm_weight=0.5,
        )
        cbatch = dict(
            xs=rng.normal(size=(B, DEC_T, 80)).astype(np.float32),
            xlens=np.full((B,), DEC_T, np.int32),
            utt_ids=[f"s-u{i}-0-10000" for i in range(B)],
            texts=[""] * B,
        )
        corr.correct_batch(cbatch)  # warm/compile
        t0 = time.perf_counter()
        corr.correct_batch(cbatch)
        dt = time.perf_counter() - t0 - RTT_FLOOR[0]
        rtf = dt / (B * 10.0)
        ref = REF_RTF.get("correct_bert")
        emit(
            {
                "metric": "correct_rtf_bert",
                "value": round(rtf, 6),
                "unit": "correct_s_per_audio_s",
                "vs_baseline": round(REF_PUBLISHED_CORRECT / rtf, 2),
                "baseline_src": "published_0.0094",
                "vs_measured_ref": round(ref / rtf, 2) if ref else None,
                "batch": B,
                "note": "greedy CTC + confidence mask (th=0.9) + BERT "
                        "fill, batched; published RTF is the author's CPU",
            }
        )

    guard("correct_rtf_bert", row_correct)

    # -------- honest end-to-end eval-CLI throughput (VERDICT r3 #7) ----
    # The decode rows above run fixed-length single-batch jitted loops;
    # these rows run the REAL `eval/test_asr.py` pipeline — TSV manifest,
    # np.load per utterance, VARIABLE lengths over real buckets, host
    # collate, batched decode, detokenization — under the reference's own
    # --runtime protocol (`asr/test_asr.py:226-263`: repeat the decode
    # loop, report RTF from utt-id-embedded timestamps; result writing
    # excluded on both sides).  value = best warm repeat (first repeat
    # pays jit compiles, which the torch CPU reference does not have).
    def _eval_cli_row(metric, cfg_kw, beam_argv, n_utts, ref_key,
                      lm_kw=None, extra=None):
        import tempfile

        import pandas as pd
        import yaml

        from emoasr_tpu.eval.test_asr import build_argparser
        from emoasr_tpu.eval.test_asr import test_main as run_test_main
        from emoasr_tpu.train import checkpoint as ckpt

        wd = tempfile.mkdtemp(prefix=f"bench_{metric}_")
        lo, hi = (30, 100) if SMOKE else (400, 1000)
        crng = np.random.default_rng(7)
        rows = []
        os.makedirs(os.path.join(wd, "feats"), exist_ok=True)
        for i in range(n_utts):
            T = int(crng.integers(lo, hi + 1))
            x = crng.normal(size=(T, 80)).astype(np.float32)
            p = os.path.join(wd, "feats", f"u{i}.npy")
            np.save(p, x)
            U = int(crng.integers(3, 9))
            toks = crng.integers(3, cfg_kw["vocab_size"], size=U)
            rows.append(
                dict(
                    feat_path=p,
                    utt_id=f"s-u{i:03d}-{i * 20000}-{i * 20000 + T * 10}",
                    token_id=" ".join(map(str, toks)),
                    text=" ".join(f"w{t}" for t in toks),
                    xlen=T, ylen=U,
                )
            )
        audio_s = sum(r["xlen"] for r in rows) * FRAME_SHIFT_S
        tsv = os.path.join(wd, "test.tsv")
        pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
        vocab = os.path.join(wd, "vocab.txt")
        with open(vocab, "w", encoding="utf-8") as f:
            f.write("<blank> 0\n<unk> 1\n<eos> 2\n")
            for i in range(3, cfg_kw["vocab_size"]):
                f.write(f"w{i} {i}\n")
        conf = dict(
            cfg_kw, vocab_path=vocab, test_path=tsv,
            buckets=[[(lo + hi) // 2, 64], [hi, 64]],
            batch_size=64, max_xlens_batch=hi * 64, max_ylens_batch=1024,
            spec_augment=False, max_decode_ylen=24,
        )
        conf_path = os.path.join(wd, "exp.yaml")
        with open(conf_path, "w") as f:
            yaml.safe_dump(conf, f)

        cfg = config_from_dict(conf)
        model = ASR(cfg)
        v = model.init(
            key, jnp.zeros((2, 64, 80)), jnp.full((2,), 64, jnp.int32),
            jnp.ones((2, 4), jnp.int32), jnp.full((2,), 4),
            jnp.ones((2, 5), jnp.int32), jnp.ones((2, 5), jnp.int32),
        )
        # Termination nudge for the joint-CTC row (r4's `cannot decode`
        # storm root cause, same physics as tools/parity_fullsize.py):
        # an UNTRAINED model never finalizes a hypothesis under joint
        # CTC — the eos candidate's CTC term is a full-blank alignment
        # of every remaining frame (~ -9.2 nats/frame at V=10k uniform),
        # so every beam dies at the step cap with zero results and the
        # row's RTF is measured partly on early-exited rows.  Trained
        # CTC models are blank-dominated and DO finalize; biasing the
        # random checkpoint's CTC blank and decoder eos logits makes the
        # row execute trained-like decode work (n_decoded == n_utts).
        dec = v["params"].get("decoder", {})
        if cfg_kw.get("decoder_type") == "transformer" and "ctc" in dec:
            dec["output"]["bias"] = (
                dec["output"]["bias"].at[2].add(5.5)  # eos
            )
            dec["ctc"]["output"]["bias"] = (
                dec["ctc"]["output"]["bias"].at[0].add(9.0)  # blank
            )
        ckpt_dir = os.path.join(wd, "exp", "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        ckpt.save_model(
            os.path.join(ckpt_dir, "model.ep1"), v["params"],
            v.get("batch_stats"),
        )

        argv = ["-conf", conf_path, "-ep", "1", "--runtime",
                "--runtime_num_samples", str(n_utts),
                "--runtime_num_repeats", "3"] + beam_argv
        if lm_kw:
            from emoasr_tpu.models.lm.lm import LM as LMFacade

            lm_cfg = config_from_dict(lm_kw)
            lm_m = LMFacade(lm_cfg)
            lv = lm_m.init(
                jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                jnp.full((1,), 4, jnp.int32),
            )
            lm_dir = os.path.join(wd, "lm", "checkpoints")
            os.makedirs(lm_dir, exist_ok=True)
            ckpt.save_model(os.path.join(lm_dir, "model.ep1"), lv["params"])
            lm_conf = os.path.join(wd, "lm.yaml")
            with open(lm_conf, "w") as f:
                yaml.safe_dump(dict(lm_kw), f)
            argv += ["--lm_conf", lm_conf, "--lm_ep", "1"]
        args = build_argparser().parse_args(argv)
        runtimes, rtfs, n_decoded = run_test_main(args)
        best = float(min(rtfs[1:] if len(rtfs) > 1 else rtfs))
        ref = REF_RTF.get(ref_key)
        row = {
            "metric": metric,
            "value": round(best, 6),
            "unit": "decode_s_per_audio_s",
            "utts_per_s_per_chip": round(
                n_utts / (best * audio_s), 2
            ),
            "n_utts": n_utts,
            "n_decoded": n_decoded,
            "audio_s": round(audio_s, 1),
            "rtf_cold": round(float(rtfs[0]), 6),
            "vs_baseline": round(ref / best, 2) if ref else None,
            "baseline_src": "measured_ref_cpu",
            "note": "REAL eval/test_asr.py pipeline (manifest, np.load, "
                    "variable lengths over buckets, host collate, "
                    "detok), reference --runtime protocol; value = best "
                    "warm repeat of 3 (cold repeat pays jit compiles)",
        }
        if extra:
            row.update(extra)
        emit(row)

    guard("eval_cli_greedy_rtf_L1", lambda: _eval_cli_row(
        "eval_cli_greedy_rtf_L1", dict(L1, **BF16), ["--beam_width", "0"],
        n_utts=4 if SMOKE else 96, ref_key="ctc_greedy_L1",
        extra={"compute_dtype": "bfloat16"},
    ))
    guard("eval_cli_joint_sf_rtf_L3_3", lambda: _eval_cli_row(
        "eval_cli_joint_sf_rtf_L3_3", dict(L3, **BF16),
        ["--beam_width", "10", "--len_weight", "2.0",
         "--decode_ctc_weight", "0.3", "--lm_weight", "0.5"],
        n_utts=4 if SMOKE else 64, ref_key="att_beam10_ctc_L3",
        lm_kw=dict(
            lm_type="transformer", vocab_size=10000, hidden_size=512,
            num_layers=4, num_attention_heads=8, intermediate_size=2048,
            max_seq_len=128, dropout_rate=0.0, eos_id=2,
        ),
        extra={
            "compute_dtype": "bfloat16",
            "baseline_src": "measured_ref_cpu_no_sf",
            "termination_nudge": "ctc blank +9.0 / dec eos +5.5 on the "
                                 "random ckpt so beams finalize like a "
                                 "trained model's would (r4 storm fix)",
        },
    ))

    # ---------------- HEADLINE (emitted last): round-1 protocol --------
    def row_headline():
        cfg = config_from_dict(
            dict(L1, dropout_enc_rate=0.0, dropout_attn_rate=0.0)
        )
        model = ASR(cfg)
        B, T = (2, 100) if SMOKE else (64, 1000)
        xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        xlens = jnp.full((B,), T, jnp.int32)
        variables = _var_cache.get(("transformer", "ctc", 10000))
        if variables is None:
            variables = model.init(key, xs, xlens, method=ASR.decode_greedy)
        decode = jax.jit(
            lambda v, x, l: model.apply(v, x, l, method=ASR.decode_greedy)
        )
        # distinct inputs per iteration (defeats transport-level caching),
        # derived ON DEVICE from one staged buffer (the remote tunnel's
        # H2D path is not what we measure)
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
        dt = time.perf_counter() - t0 - RTT_FLOOR[0]
        rtf = dt / (n_iters * B * T * FRAME_SHIFT_S)
        emit(
            {
                "metric": "ctc_greedy_batched_rtf_L1",
                "value": round(rtf, 6),
                "unit": "decode_s_per_audio_s",
                "utts_per_s_per_chip": round(
                    1.0 / (rtf * T * FRAME_SHIFT_S), 2
                ),
                "batch": B,
                "vs_baseline": round(REF_PUBLISHED_CTC_GREEDY / rtf, 2),
                "baseline_src": "published_0.0033",
                "rtt_floor_ms": round(RTT_FLOOR[0] * 1e3, 1),
                "note": "protocol unchanged since r1 except the r3 "
                        "fetch-floor subtraction (see module docstring): "
                        "the final np.asarray pays the ~30 ms tunnel RTT "
                        "once per 10-iteration window, which r1/r2 "
                        "mis-charged to decode (~+5% here). r1->r2 delta "
                        "(2.5e-5 -> 2.7e-5) came from r2's switch to "
                        "distinct on-device rolled inputs per iteration "
                        "(defeats transport-level result caching that "
                        "flattered r1)",
            }
        )

    guard("ctc_greedy_batched_rtf_L1", row_headline)


if __name__ == "__main__":
    main()
