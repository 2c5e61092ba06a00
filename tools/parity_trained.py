"""bf16 decode accuracy on TRAINED weights (VERDICT r4 #3).

The round-4 full-size parity run measured the bf16 dtype policy on an
UNTRAINED model (27/50 hyp agreement), waving the result off with an
untested "random-weight near-ties are the worst case" rationale.  The
reference's acceptance surface is trained-model WER
(`/root/reference/README.md:31-67`), so the policy must be validated on
trained weights: this tool takes sustained-soak checkpoints
(tools/train_sustained.py families l1 / t5 / l33), decodes the held-out
split once in true f32 (CPU-pinned, HIGHEST matmul precision — TPU
"f32" matmuls default to bf16-pass arithmetic, which belongs in the
bf16 column) and once under the production bf16 policy (default
platform = the TPU when present), and records hyp agreement + WER delta
into PARITY_FULLSIZE_r05.json under `trained_{family}`.

Usage:
  python tools/train_sustained.py --family l33 --steps 2500 \
      --out /tmp/soak_l33           # train first (on the chip)
  python tools/parity_trained.py --family l33 --soak-dir /tmp/soak_l33

Internal: --phase {f32,bf16} runs one decode in a subprocess (the JAX
platform is per-process).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPORT = os.path.join(REPO, "PARITY_FULLSIZE_r05.json")

BEAM_ARGV = {
    "l1": ["--beam_width", "0"],
    "t5": ["--beam_width", "10"],
    "l33": ["--beam_width", "10", "--decode_ctc_weight", "0.3",
            "--len_weight", "2.0"],
}


def _find_ckpt_ep(run_dir):
    import glob

    ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "model.ep*"))
    if not ckpts:
        raise SystemExit(f"no checkpoints under {run_dir} — run "
                         "tools/train_sustained.py first")
    return sorted(int(c.rsplit("ep", 1)[1]) for c in ckpts)[-1]


def _derived_conf(soak_dir, family, dtype_tag):
    """Write a decode conf named so its run dir (and checkpoint dir) is a
    symlink-shared view of the soak's run dir."""
    import yaml

    base = os.path.join(soak_dir, f"{family}_sustained.yaml")
    with open(base) as f:
        conf = yaml.safe_load(f)
    if dtype_tag == "f32":
        conf.pop("compute_dtype", None)
    else:
        conf["compute_dtype"] = "bfloat16"
    name = f"{family}_sustained_{dtype_tag}dec"
    conf_path = os.path.join(soak_dir, f"{name}.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    run_dir = os.path.join(soak_dir, name)
    os.makedirs(run_dir, exist_ok=True)
    link = os.path.join(run_dir, "checkpoints")
    target = os.path.join(soak_dir, f"{family}_sustained", "checkpoints")
    if not os.path.exists(link):
        os.symlink(target, link)
    return conf_path


def phase_decode(args):
    """Subprocess phase: one decode on the current process's platform."""
    import jax

    if args.phase == "f32":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import pandas as pd

    from emoasr_tpu.eval.test_asr import build_argparser, test_main
    from emoasr_tpu.utils.paths import get_results_dir

    conf = _derived_conf(args.soak_dir, args.family, args.phase)
    ep = _find_ckpt_ep(os.path.join(
        args.soak_dir, f"{args.family}_sustained"
    ))
    t0 = time.perf_counter()
    targs = build_argparser().parse_args(
        ["-conf", conf, "-ep", str(ep)] + BEAM_ARGV[args.family]
    )
    out = test_main(targs)
    dt = time.perf_counter() - t0
    assert out is not None
    rdir = get_results_dir(conf)
    tsvs = [os.path.join(rdir, f) for f in os.listdir(rdir)
            if f.endswith(".tsv")]
    df = pd.read_table(max(tsvs, key=os.path.getmtime), comment="#")
    hyps = {
        r.utt_id: (None if pd.isna(r.token_id) else str(r.token_id))
        for r in df.itertuples()
    }
    json.dump(
        {
            "hyps": hyps,
            "wer": out[2],
            "wer_info": out[3],
            "wall_s": round(dt, 1),
            "platform": jax.devices()[0].platform,
            "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
            "ep": ep,
        },
        open(os.path.join(
            args.soak_dir, f"{args.family}_{args.phase}_hyps.json"
        ), "w"),
    )
    print(f"{args.phase} decode done in {dt:.1f}s on {jax.devices()[0]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["l1", "t5", "l33"])
    ap.add_argument("--soak-dir", required=True)
    ap.add_argument("--phase", default=None, choices=["f32", "bf16"])
    args = ap.parse_args()

    if args.phase:
        phase_decode(args)
        return

    for phase in ("f32", "bf16"):
        env = dict(os.environ)
        if phase == "f32":
            env["JAX_PLATFORMS"] = "cpu"
            # keep the CPU phase off the remote-TPU tunnel entirely:
            # the axon PJRT plugin registers at interpreter start
            # (sitecustomize) and holds a tunnel connection even for
            # processes that then run on CPU
            env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--family", args.family, "--soak-dir", args.soak_dir,
             "--phase", phase],
            cwd=REPO, env=env,
        )
        if r.returncode != 0:
            raise SystemExit(f"{phase} phase failed: {r.returncode}")

    f32 = json.load(open(os.path.join(
        args.soak_dir, f"{args.family}_f32_hyps.json"
    )))
    bf16 = json.load(open(os.path.join(
        args.soak_dir, f"{args.family}_bf16_hyps.json"
    )))
    utt_ids = sorted(f32["hyps"])
    agree = sum(
        1 for u in utt_ids if bf16["hyps"].get(u) == f32["hyps"][u]
    )

    from emoasr_tpu.eval.wer import compute_wers

    def toks(s):
        return [int(t) for t in s.split()] if s else []

    bf16_vs_f32_wer, _ = compute_wers(
        [toks(bf16["hyps"].get(u)) for u in utt_ids],
        [toks(f32["hyps"][u]) for u in utt_ids],
    )
    entry = {
        "ep": f32["ep"],
        "n_utts": len(utt_ids),
        "hyp_agreement_bf16_vs_f32": f"{agree}/{len(utt_ids)}",
        "bf16_wer_vs_f32_hyps": round(bf16_vs_f32_wer, 4),
        "f32_wer_vs_truth": f32["wer"],
        "bf16_wer_vs_truth": bf16["wer"],
        "bf16_wer_delta_vs_truth": round(bf16["wer"] - f32["wer"], 4),
        "n_decoded_f32": sum(1 for u in utt_ids if f32["hyps"][u]),
        "n_decoded_bf16": sum(
            1 for u in utt_ids if bf16["hyps"].get(u)
        ),
        "bf16_platform": bf16.get("device_kind", bf16.get("platform")),
        "beam_argv": " ".join(BEAM_ARGV[args.family]),
    }
    report = {}
    if os.path.exists(REPORT):
        report = json.load(open(REPORT))
    report[f"trained_{args.family}"] = entry
    json.dump(report, open(REPORT, "w"), indent=1)
    print(json.dumps({f"trained_{args.family}": entry}, indent=1))
    print(f"merged into {REPORT}")


if __name__ == "__main__":
    main()
