"""Phase breakdown of the REAL eval-CLI decode loop on chip.

VERDICT r4 #1: `eval_cli_greedy_rtf_L1` ran 13.66x vs the measured
reference CPU (north star >=20x) while the same decode does 151x
synthetically — an ~89x host tax.  This tool builds the exact bench
`_eval_cli_row` workload (synthetic manifest, real ASRDataset buckets,
real test_asr CLI) and reports the per-phase seconds that
`decode_dataset(timing=...)` accumulates:

  collate      producer thread: np.load + pad + host bf16 cast
               (overlapped with device compute)
  dispatch     main thread: async H2D device_put + jitted decode
               dispatch
  fetch        np.asarray of the previous batch's outputs (D2H)
  postproc     numpy eos-strip + detok + row building

Phases overlap, so their sum can exceed wall; wall is the honest
number, the phases say where to dig.

Usage: python tools/profile_eval_cli.py [--joint] [--n-utts 96]
       [--repeats 3] [--smoke]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--joint", action="store_true",
                    help="L3-3 joint CTC + SF instead of L1 greedy")
    ap.add_argument("--n-utts", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (BENCH_SMOKE) for a CPU wiring run")
    args = ap.parse_args()

    if args.smoke:
        os.environ["BENCH_SMOKE"] = "1"
        os.environ.setdefault("BENCH_PLATFORM", "cpu")

    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    # reuse the bench row builder wholesale so the workload is identical
    import bench

    bench.SMOKE = bool(os.environ.get("BENCH_SMOKE"))

    import tempfile

    import pandas as pd
    import yaml

    import jax.numpy as jnp

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.data.asr_dataset import ASRDataset
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.eval import test_asr as ta
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train import checkpoint as ckpt
    from emoasr_tpu.utils.vocab import Vocab

    smoke = bench.SMOKE
    n_utts = args.n_utts or (4 if smoke else 96)
    V = 10000
    ENC = dict(
        input_layer="conv2d", feat_dim=80, enc_num_attention_heads=4,
        enc_num_layers=12, dropout_enc_rate=0.0, dropout_attn_rate=0.0,
    )
    if args.joint:
        cfg_kw = dict(
            ENC, encoder_type="conformer", decoder_type="transformer",
            pos_encode_type="rel", enc_hidden_size=256,
            enc_intermediate_size=1024, dec_hidden_size=256,
            dec_num_attention_heads=4, dec_num_layers=6,
            dec_intermediate_size=2048, vocab_size=V,
            mtl_ctc_weight=0.3, max_decode_ylen=64, dropout_dec_rate=0.0,
            compute_dtype="bfloat16",
        )
        beam_width, len_weight, ctc_w = 10, 2.0, 0.3
    else:
        cfg_kw = dict(
            ENC, encoder_type="transformer", decoder_type="ctc",
            enc_hidden_size=256, enc_intermediate_size=2048,
            vocab_size=V, compute_dtype="bfloat16",
        )
        beam_width, len_weight, ctc_w = 0, 0.0, 0.0

    wd = tempfile.mkdtemp(prefix="profile_eval_cli_")
    lo, hi = (30, 100) if smoke else (400, 1000)
    crng = np.random.default_rng(7)
    rows = []
    os.makedirs(os.path.join(wd, "feats"), exist_ok=True)
    for i in range(n_utts):
        T = int(crng.integers(lo, hi + 1))
        x = crng.normal(size=(T, 80)).astype(np.float32)
        p = os.path.join(wd, "feats", f"u{i}.npy")
        np.save(p, x)
        U = int(crng.integers(3, 9))
        toks = crng.integers(3, V, size=U)
        rows.append(dict(
            feat_path=p,
            utt_id=f"s-u{i:03d}-{i * 20000}-{i * 20000 + T * 10}",
            token_id=" ".join(map(str, toks)),
            text=" ".join(f"w{t}" for t in toks),
            xlen=T, ylen=U,
        ))
    audio_s = sum(r["xlen"] for r in rows) * 0.010
    tsv = os.path.join(wd, "test.tsv")
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    vocab_path = os.path.join(wd, "vocab.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        f.write("<blank> 0\n<unk> 1\n<eos> 2\n")
        for i in range(3, V):
            f.write(f"w{i} {i}\n")
    conf = dict(
        cfg_kw, vocab_path=vocab_path, test_path=tsv,
        buckets=[[(lo + hi) // 2, 64], [hi, 64]],
        batch_size=64, max_xlens_batch=hi * 64, max_ylens_batch=1024,
        spec_augment=False,
    )
    conf.setdefault("max_decode_ylen", 24)
    cfg = config_from_dict(conf)

    model = ASR(cfg)
    key = jax.random.PRNGKey(0)
    v = model.init(
        key, jnp.zeros((2, 64, 80)), jnp.full((2,), 64, jnp.int32),
        jnp.ones((2, 4), jnp.int32), jnp.full((2,), 4),
        jnp.ones((2, 5), jnp.int32), jnp.ones((2, 5), jnp.int32),
    )
    if args.joint:
        dec = v["params"]["decoder"]
        dec["output"]["bias"] = dec["output"]["bias"].at[2].add(5.5)
        dec["ctc"]["output"]["bias"] = (
            dec["ctc"]["output"]["bias"].at[0].add(9.0)
        )
    variables = {"params": v["params"]}
    if v.get("batch_stats"):
        variables["batch_stats"] = v["batch_stats"]
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    lm_fusion = None
    if args.joint:
        from emoasr_tpu.models.lm.lm import LM as LMFacade
        from emoasr_tpu.search.common import make_lm_fusion

        lm_kw = dict(
            lm_type="transformer", vocab_size=V, hidden_size=512,
            num_layers=4, num_attention_heads=8, intermediate_size=2048,
            max_seq_len=128, dropout_rate=0.0, eos_id=2,
        )
        lm_cfg = config_from_dict(lm_kw)
        lm_m = LMFacade(lm_cfg)
        lv = lm_m.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                       jnp.full((1,), 4, jnp.int32))
        lm_fusion = make_lm_fusion(lm_m, {"params": lv["params"]}, 0.5)

    decode_fn = build_decode_fn(
        model, variables, cfg, beam_width, len_weight, ctc_w, lm_fusion,
        top1=True,  # the CLI's non-nbest protocol (test_asr.py)
    )
    dataset = ASRDataset(cfg, tsv, phase="test")
    vocab = Vocab(vocab_path)

    # transport floor: the real pipeline must move every feature batch
    # host->device (the synthetic decode rows keep inputs resident, and
    # the reference's CPU loop has no transfer at all).  One timed
    # device_put of a full bucket batch bounds the attainable wall.
    probe = np.zeros((conf["batch_size"], hi, 80), np.float32)
    if str(cfg.compute_dtype or "") .startswith("bf"):
        import ml_dtypes

        probe = probe.astype(ml_dtypes.bfloat16)
    jax.block_until_ready(jax.device_put(probe))  # connection warm
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(probe))
    h2d_s = time.perf_counter() - t0
    mb = probe.nbytes / 1e6
    out = {"n_utts": n_utts, "audio_s": round(audio_s, 1),
           "mode": "joint" if args.joint else "greedy",
           "h2d_probe": {"mb": round(mb, 1), "s": round(h2d_s, 4),
                         "mb_per_s": round(mb / max(h2d_s, 1e-9), 1)},
           "runs": []}
    for j in range(args.repeats):
        timing = {}
        t0 = time.perf_counter()
        results = ta.decode_dataset(
            cfg, dataset, decode_fn, vocab, timing=timing,
        )
        wall = time.perf_counter() - t0
        n_decoded = sum(1 for r in results if r[1] is not None)
        run = {
            "wall_s": round(wall, 4),
            "rtf": round(wall / audio_s, 6),
            "n_decoded": n_decoded,
            **{k: round(t, 4) for k, t in sorted(timing.items())},
        }
        out["runs"].append(run)
        print(json.dumps(run))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
