"""LM / P2W training loop + CLI.

Parity target: `/root/reference/lm/train_lm.py:40-327` — same skeleton as
ASR training with AdamW + no-decay parameter groups (:188-195), total steps
computed from `train_size` for lindecay / warmup_proportion (:183-186),
sharded train directories iterated with per-epoch file shuffling (:217-253),
model selection P2W for lm_type in {ptransformer, pbert, pctc} (:165-168),
discriminator-only training for `*-disc` types.

Usage: `python -m emoasr_tpu.train.train_lm -conf exp.yaml [--resume]`
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emoasr_tpu.config import ExpConfig, load_config
from emoasr_tpu.data.lm_dataset import LMDataset, P2WDataset
from emoasr_tpu.models.lm.lm import LM
from emoasr_tpu.parallel.mesh import make_mesh
from emoasr_tpu.train import checkpoint as ckpt
from emoasr_tpu.train.optim import build_optimizer, finite_or_zero, make_lr_fn, scale_updates
from emoasr_tpu.train.step import TrainState, init_train_state
from emoasr_tpu.utils.log import log_provenance, setup_logging
from emoasr_tpu.utils.paths import get_log_save_paths, get_resume_paths


def is_p2w(cfg: ExpConfig) -> bool:
    return cfg.lm_type in ("ptransformer", "pbert", "pctc")


def make_lm_train_step(model: LM, cfg: ExpConfig, tx, num_total_steps,
                       mesh=None, params=None):
    lr_fn = make_lr_fn(cfg, num_total_steps)
    disc_only = cfg.lm_type in ("electra-disc", "pelectra-disc")

    def step_fn(state: TrainState, batch: Dict, rng):
        def loss_fn(params):
            # mixed precision: forward in cfg.compute_dtype, f32 masters
            from emoasr_tpu.utils.precision import cast_params_for_compute

            variables = {"params": cast_params_for_compute(cfg, params)}
            rngs = {"sample": rng}
            if disc_only:
                loss, loss_dict = model.apply(
                    variables, batch["ys_in"], batch["ylens"],
                    batch["error_labels"],
                    method=LM.forward_disc, rngs=rngs,
                    deterministic=False,
                )
            else:
                loss, loss_dict = model.apply(
                    variables, batch["ys_in"], batch["ylens"],
                    batch.get("labels"), batch.get("ps"), batch.get("plens"),
                    deterministic=False,
                    rngs={**rngs, "dropout": jax.random.fold_in(rng, 1)},
                )
            return loss, loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads, finite = finite_or_zero(grads)
        new_step = state.step + 1
        opt_step = (new_step + cfg.accum_grad - 1) // cfg.accum_grad
        lr = lr_fn(opt_step, state.epoch_scale)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates(updates, lr)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt_state, state.opt_state
        )
        metrics = dict(loss_dict)
        metrics["lr"] = lr
        return (
            state.replace(
                step=new_step, params=new_params, opt_state=new_opt_state,
                skipped=state.skipped + jnp.where(finite, 0, 1),
            ),
            metrics,
        )

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        if params is not None and "model" in mesh.axis_names:
            from emoasr_tpu.train.step import _state_shardings

            state_specs, data, repl = _state_shardings(mesh, tx, params)
            return jax.jit(step_fn, in_shardings=(state_specs, data, repl),
                           out_shardings=(state_specs, repl))
        return jax.jit(step_fn, in_shardings=(repl, data, repl),
                       out_shardings=(repl, repl))
    return jax.jit(step_fn)


def _train_files(cfg: ExpConfig, epoch: int):
    """Sharded train dirs: iterate files, shuffled per epoch (:217-253)."""
    path = cfg.train_path
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(".")
        )
        rng = np.random.default_rng(cfg.seed + epoch)
        rng.shuffle(files)
        return files
    return [path]


def _make_dataset(cfg, path, phase, seed):
    if is_p2w(cfg) or cfg.lm_type in ("pelectra", "pelectra-disc"):
        return P2WDataset(cfg, path, phase=phase, seed=seed)
    return LMDataset(cfg, path, phase=phase, seed=seed)


def train(conf_path: str, resume: bool = False, cfg: Optional[ExpConfig] = None):
    cfg = cfg or load_config(conf_path)
    log_dir, save_fmt, optim_save_fmt = get_log_save_paths(conf_path)
    setup_logging(os.path.join(log_dir, "train.log"))
    log_provenance()

    num_total_steps = None
    if cfg.train_size is not None:
        steps_per_epoch = cfg.train_size // cfg.batch_size
        num_total_steps = steps_per_epoch * cfg.num_epochs // cfg.accum_grad
        logging.info(f"total steps: {num_total_steps}")

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model = LM(cfg)
    init_rng = jax.random.PRNGKey(cfg.seed)  # params: always threefry
    rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)  # step streams

    # representative init batch
    L = min(cfg.max_seq_len, 32)
    B = 2
    ys = jnp.full((B, L), cfg.eos_id, jnp.int32)
    ylens = jnp.full((B,), L, jnp.int32)
    labels = jnp.full((B, L), -100, jnp.int32).at[:, 0].set(cfg.eos_id)
    kw = {}
    init_args = (ys, ylens, labels)
    if is_p2w(cfg) or cfg.lm_type in ("pelectra", "pelectra-disc"):
        init_args = (ys, ylens, labels, ys % (cfg.src_vocab_size or 4), ylens)
    variables = model.init(
        {"params": init_rng, "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        *init_args,
    )
    num_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logging.info(f"LM model #parameters: {num_params}")

    tx = build_optimizer(cfg, num_total_steps, use_adamw=True)
    state = init_train_state(variables["params"], {}, tx)

    model_path, optim_path, start_epoch = cfg.model_path, cfg.optim_path, cfg.startep
    if resume:
        r_model, r_optim, r_ep = get_resume_paths(conf_path)
        model_path, optim_path, start_epoch = (
            r_model or model_path, r_optim or optim_path, r_ep or start_epoch
        )
    if model_path:
        tree = ckpt.load_model(model_path)
        state = state.replace(params=tree["params"])
        logging.info(f"model loaded: {model_path}")
    if optim_path:
        tree = ckpt.load_optim(optim_path, state.opt_state)
        state = state.replace(
            opt_state=tree["opt_state"], step=jnp.asarray(tree["step"]),
            epoch_scale=jnp.asarray(tree["epoch_scale"]),
            skipped=jnp.asarray(tree["skipped"]),
        )

    step_fn = make_lm_train_step(
        model, cfg, tx, num_total_steps, mesh, params=state.params
    )

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        n_steps = 0
        accum: Dict[str, float] = {}
        for path in _train_files(cfg, epoch):
            dataset = _make_dataset(cfg, path, "train", cfg.seed + epoch)
            from emoasr_tpu.train.loop import prefetch_to_device

            for batch in prefetch_to_device(
                dataset.batches(seed=cfg.seed + epoch), mesh
            ):
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, step_rng)
                n_steps += 1
                # device-side accumulation (no per-step sync)
                for k, v in metrics.items():
                    accum[k] = accum.get(k, 0.0) + v
                if n_steps % cfg.log_step == 0:
                    avg = {k: float(v) / cfg.log_step for k, v in accum.items()}
                    loss_str = " ".join(
                        f"{k}: {v:.3f}" for k, v in avg.items() if k != "lr"
                    )
                    logging.info(
                        f"epoch {epoch + 1} step {n_steps} {loss_str} "
                        f"lr: {float(metrics['lr']):.6f}"
                    )
                    accum = {}
        logging.info(
            f"epoch {epoch + 1} done in {time.time() - t0:.1f}s "
            f"({n_steps} steps, skipped {int(state.skipped)})"
        )
        if (epoch + 1) % cfg.save_step == 0:
            ckpt.save_model(save_fmt.format(epoch + 1), state.params, {})
            ckpt.save_optim(
                optim_save_fmt.format(epoch + 1), state.opt_state,
                state.step, state.epoch_scale, state.skipped,
            )
            logging.info(f"checkpoint saved: {save_fmt.format(epoch + 1)}")
    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-conf", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()
    train(args.conf, resume=args.resume)


if __name__ == "__main__":
    main()
