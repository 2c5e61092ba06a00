"""Training-throughput benchmark on the real chip.

Measures the full jitted train step (SpecAugment -> forward -> backward ->
clip -> update) for reference-benchmark model configs on synthetic bucket
batches, reporting steps/sec and audio-hours/hour-of-compute.

Usage: python tools/bench_train.py [--config L1|T5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="L1", choices=["L1", "T5"])
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=800)
    parser.add_argument("--tokens", type=int, default=64)
    parser.add_argument("--joint_mode", default="chunked",
                        choices=["chunked", "full", "pallas"],
                        help="T5 transducer joint memory strategy")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.parallel.mesh import make_mesh, shard_batch
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state, make_train_step

    if args.config == "L1":
        cfg = config_from_dict(
            dict(
                encoder_type="transformer", decoder_type="ctc",
                input_layer="conv2d", feat_dim=80, enc_hidden_size=256,
                enc_num_attention_heads=4, enc_num_layers=12,
                enc_intermediate_size=2048, vocab_size=10000,
                spec_augment=True, lr_schedule_type="noam",
                learning_rate=5.0, num_warmup_steps=25000,
            )
        )
    else:  # T5 RNN-T conformer with the chunked joint
        cfg = config_from_dict(
            dict(
                encoder_type="conformer", decoder_type="rnn_transducer",
                pos_encode_type="rel", input_layer="conv2d", feat_dim=80,
                enc_hidden_size=256, enc_num_attention_heads=4,
                enc_num_layers=12, enc_intermediate_size=1024,
                embedding_size=128, dec_hidden_size=512, dec_num_layers=1,
                joint_hidden_size=512, vocab_size=1000,
                rnnt_joint_mode=args.joint_mode, spec_augment=True,
                lr_schedule_type="noam", learning_rate=5.0,
                num_warmup_steps=25000,
            )
        )

    B, T, U = args.batch, args.frames, args.tokens
    rng = np.random.default_rng(0)
    batch = dict(
        xs=rng.normal(size=(B, T, 80)).astype(np.float32),
        xlens=np.full((B,), T, np.int32),
        ys=rng.integers(3, cfg.vocab_size, (B, U)).astype(np.int32),
        ylens=np.full((B,), U, np.int32),
        ys_in=np.full((B, U + 1), cfg.eos_id, np.int32),
        ys_out=np.full((B, U + 1), cfg.eos_id, np.int32),
    )
    batch["ys_in"][:, 1:] = batch["ys"]
    batch["ys_out"][:, :U] = batch["ys"]

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model = ASR(cfg)
    key = jax.random.PRNGKey(0)
    from emoasr_tpu.train.step import preprocess

    xs_j = jnp.asarray(batch["xs"])
    xs_p, xlens_p = preprocess(cfg, xs_j, jnp.asarray(batch["xlens"]), None, False)
    variables = model.init(
        key, xs_p, xlens_p, jnp.asarray(batch["ys"]),
        jnp.asarray(batch["ylens"]), jnp.asarray(batch["ys_in"]),
        jnp.asarray(batch["ys_out"]),
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"{args.config}: {n_params/1e6:.1f}M params, batch {B}x{T}f")

    tx = build_optimizer(cfg)
    state = init_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)
    sb = shard_batch(mesh, batch)

    t0 = time.time()
    state, metrics = step_fn(state, sb, key)
    np.asarray(metrics["loss_total"])
    print(f"compile+1: {time.time() - t0:.1f}s loss={float(metrics['loss_total']):.2f}")

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, sb, k)
    np.asarray(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / n
    audio_s = B * T * 0.01
    print(
        f"train step: {dt*1000:.1f} ms | {1/dt:.1f} steps/s | "
        f"{audio_s/dt:.0f}x real time"
    )


if __name__ == "__main__":
    main()
