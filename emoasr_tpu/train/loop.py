"""ASR training loop + CLI.

Parity target: `/root/reference/asr/train_asr.py` — epoch loop with
grad-accum, clip + NaN skip, per-`log_step` averaged loss logging with LR,
per-epoch greedy-WER validation, `model.ep{N}`/`optim.ep{N}` checkpointing,
`--resume`, warm start via `model_path`, epoch wall-clock + ETA logging.

Usage: `python -m emoasr_tpu.train.loop -conf exp.yaml [--resume]`
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

from emoasr_tpu.config import ExpConfig, load_config
from emoasr_tpu.data.asr_dataset import ASRDataset
from emoasr_tpu.eval.wer import compute_wers
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.parallel.mesh import make_mesh, shard_batch
from emoasr_tpu.train import checkpoint as ckpt
from emoasr_tpu.train.optim import build_optimizer
from emoasr_tpu.train.step import (
    TrainState,
    init_train_state,
    make_train_step,
    preprocess,
)
from emoasr_tpu.utils.log import log_provenance, setup_logging
from emoasr_tpu.utils.paths import get_log_save_paths, get_resume_paths
from emoasr_tpu.utils.vocab import Vocab


def array_only(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


def prefetch_to_device(batch_iter, mesh, depth: int = 3):
    """Producer-thread pipeline: collate + `shard_batch` (H2D) run ahead of
    the training step so transfers overlap device compute.

    The reference gets this from DataLoader(num_workers=2)
    (`asr/train_asr.py:248-257`); here the host path is a thread (collate
    is numpy/IO releasing the GIL, and device_put is async) feeding a
    bounded queue — on remote-TPU transports the H2D hop dominates the
    step, so overlap is the difference between host-bound and
    compute-bound epochs.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []

    def producer():
        try:
            for batch in batch_iter:
                q.put(shard_batch(mesh, array_only(batch)))
        except BaseException as e:  # noqa: BLE001 - surfaced in consumer
            err.append(e)
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    if err:
        raise err[0]


def init_model(cfg: ExpConfig, model: ASR, rng):
    """Initialize with a minimal representative batch (smallest bucket)."""
    T, U = min(cfg.buckets)
    T *= cfg.num_framestacks
    B = 2
    xs = jnp.zeros((B, T, cfg.feat_dim))
    xs, xlens = preprocess(cfg, xs, jnp.full((B,), T, jnp.int32), None, False)
    ys = jnp.full((B, U), cfg.eos_id, jnp.int32)
    ylens = jnp.full((B,), min(U, 4), jnp.int32)
    ys_in = jnp.full((B, U + 1), cfg.eos_id, jnp.int32)
    ys_out = jnp.full((B, U + 1), cfg.eos_id, jnp.int32)
    ps = plens = None
    if cfg.mtl_phone_ctc_weight > 0:
        ps = jnp.full((B, U), cfg.phone_eos_id or cfg.eos_id, jnp.int32)
        plens = ylens
    variables = model.init(
        rng, xs, xlens, ys, ylens, ys_in, ys_out, None, ps, plens
    )
    return variables["params"], variables.get("batch_stats", {})


# per-run cache of the validation decode program (rebind params per epoch)
_VALID_DECODE_CACHE: dict = {}


def greedy_valid_wer(cfg, model, state, dataset, vocab=None) -> float:
    """Per-epoch greedy WER on the dev set (train_asr.py:146-184).

    Attention decoders run a width-1 beam (the reference's decode with
    beam_width=1); ctc/rnnt/las use their batched greedy paths."""
    from emoasr_tpu.eval.decode import build_decode_fn
    from emoasr_tpu.utils.converters import strip_eos

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    # the decode program is built (traced) once; later epochs only rebind
    # the updated params (runtime inputs — no retrace/compile per epoch)
    ck = (id(model), cfg.decoder_type, bool(state.batch_stats))
    base = _VALID_DECODE_CACHE.get(ck)
    if base is None:
        base = build_decode_fn(model, variables, cfg, beam_width=1)
        _VALID_DECODE_CACHE.clear()
        _VALID_DECODE_CACHE[ck] = base
    decode_fn = base.with_variables(variables)
    hyps_all, refs_all = [], []
    for batch in dataset.batches():
        hyps, hyp_lens, _ = decode_fn(
            jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"])
        )
        hyps, hyp_lens = np.asarray(hyps), np.asarray(hyp_lens)
        multi = hyps.ndim == 3
        for b in range(len(batch["utt_ids"])):
            if multi:
                hyp_ids = strip_eos(
                    hyps[b, 0, : hyp_lens[b, 0]].tolist(), cfg.eos_id
                )
            else:
                hyp_ids = hyps[b, : hyp_lens[b]].tolist()
            ref_ids = batch["ys"][b, : batch["ylens"][b]].tolist()
            if vocab is not None:
                hyps_all.append(vocab.ids2words(hyp_ids))
                refs_all.append(vocab.ids2words(ref_ids))
            else:
                hyps_all.append(list(map(str, hyp_ids)))
                refs_all.append(list(map(str, ref_ids)))
    wer, wer_dict = compute_wers(hyps_all, refs_all)
    return wer


def train(conf_path: str, resume: bool = False, cfg: Optional[ExpConfig] = None,
          profile_dir: Optional[str] = None, max_steps: Optional[int] = None):
    """Run the training loop; `max_steps` bounds the run (a checkpoint is
    saved on early stop), for bounded benchmark/demo runs."""
    cfg = cfg or load_config(conf_path)
    log_dir, save_fmt, optim_save_fmt = get_log_save_paths(conf_path)
    setup_logging(os.path.join(log_dir, "train.log"))
    log_provenance()
    logging.info(f"config: {conf_path}")

    dataset = ASRDataset(cfg, cfg.train_path, phase="train")
    dev_dataset = (
        ASRDataset(cfg, cfg.dev_path, phase="valid") if cfg.dev_path else None
    )
    vocab = Vocab(cfg.vocab_path) if cfg.vocab_path and os.path.exists(
        cfg.vocab_path
    ) else None

    batcher = dataset.make_batcher(seed=cfg.seed)
    steps_per_epoch = len(batcher)
    num_total_steps = None
    if cfg.lr_schedule_type == "lindecay" or cfg.warmup_proportion is not None:
        num_total_steps = steps_per_epoch * cfg.num_epochs // cfg.accum_grad

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    logging.info(f"mesh: {mesh}")
    model = ASR(cfg)
    init_rng = jax.random.PRNGKey(cfg.seed)  # params: always threefry
    # step streams (dropout/SpecAugment): hardware RNG by default
    # (cfg.rng_impl; ~2x step time at L1 shapes vs threefry masks)
    rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    params, batch_stats = init_model(cfg, model, init_rng)
    num_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logging.info(f"ASR model #parameters: {num_params}")

    tx = build_optimizer(cfg, num_total_steps)
    state = init_train_state(params, batch_stats, tx)

    # resume / warm start (paths.py:81-129, train_asr.py:215-227)
    model_path, optim_path, start_epoch = cfg.model_path, cfg.optim_path, cfg.startep
    if resume:
        r_model, r_optim, r_ep = get_resume_paths(conf_path)
        model_path, optim_path, start_epoch = (
            r_model or model_path, r_optim or optim_path, r_ep or start_epoch
        )
    if model_path:
        tree = ckpt.load_model(model_path)
        state = state.replace(
            params=tree["params"], batch_stats=tree.get("batch_stats", {})
        )
        logging.info(f"model loaded: {model_path}")
    if optim_path:
        tree = ckpt.load_optim(optim_path, state.opt_state)
        state = state.replace(
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]),
            epoch_scale=jnp.asarray(tree["epoch_scale"]),
            skipped=jnp.asarray(tree["skipped"]),
        )
        logging.info(f"optim loaded: {optim_path}")

    train_step = make_train_step(
        model, cfg, tx, num_total_steps, mesh, params=state.params
    )

    stopped_early = False
    # host-side mirror of state.step: reading int(state.step) every
    # iteration would sync the device per step and defeat dispatch-ahead
    host_step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        batcher = dataset.make_batcher(seed=cfg.seed + epoch)
        accum: Dict[str, float] = {}
        n_acc = 0
        for i, batch in enumerate(
            prefetch_to_device(dataset.batches(batcher), mesh)
        ):
            if max_steps is not None and host_step >= max_steps:
                stopped_early = True
                break
            rng, step_rng = jax.random.split(rng)
            if profile_dir and epoch == start_epoch and i == 8:
                jax.profiler.start_trace(profile_dir)
            state, metrics = train_step(state, batch, step_rng)
            host_step += 1  # step_fn advances state.step by exactly 1
            if profile_dir and epoch == start_epoch and i == 12:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics
                )
                jax.profiler.stop_trace()
                logging.info(f"profiler trace written to {profile_dir}")
            # accumulate ON DEVICE; a per-step float() would sync the
            # pipeline every step and stall dispatch-ahead
            for k, v in metrics.items():
                accum[k] = accum.get(k, 0.0) + v
            n_acc += 1
            if (i + 1) % cfg.log_step == 0:
                avg = {k: float(v) / n_acc for k, v in accum.items()}
                avg.pop("lr", None)  # reported from the live step below
                loss_str = " ".join(
                    f"{k}: {v:.3f}" for k, v in avg.items() if k != "grad_finite"
                )
                logging.info(
                    f"epoch {epoch + 1} step {i + 1}/{steps_per_epoch} "
                    f"{loss_str} lr: {float(metrics['lr']):.6f}"
                )
                accum, n_acc = {}, 0

        # epdecay epoch update (optimizers.py:88-97)
        if (
            cfg.lr_schedule_type == "epdecay"
            and cfg.lr_decay_start_epoch is not None
            and (epoch + 1) >= cfg.lr_decay_start_epoch
        ):
            state = state.replace(
                epoch_scale=state.epoch_scale * cfg.lr_decay_rate
            )
            logging.info(f"learning rate decayed: scale={float(state.epoch_scale):.6f}")

        elapsed = time.time() - t0
        eta = elapsed * (cfg.num_epochs - epoch - 1)
        logging.info(
            f"epoch {epoch + 1} done in {elapsed:.1f}s (ETA {eta / 3600:.2f}h), "
            f"skipped steps: {int(state.skipped)}"
        )

        # per-epoch greedy WER validation (train_asr.py:146-184)
        if dev_dataset is not None:
            try:
                wer = greedy_valid_wer(cfg, model, state, dev_dataset, vocab)
                logging.info(f"epoch {epoch + 1} dev WER (greedy): {wer:.2f}")
            except Exception as e:  # noqa: BLE001 (reference logs and continues)
                logging.error(f"validation failed: {e}")

        if (epoch + 1) % cfg.save_step == 0 or stopped_early:
            ckpt.save_model(
                save_fmt.format(epoch + 1), state.params, state.batch_stats
            )
            ckpt.save_optim(
                optim_save_fmt.format(epoch + 1),
                state.opt_state, state.step, state.epoch_scale, state.skipped,
            )
            logging.info(f"checkpoint saved: {save_fmt.format(epoch + 1)}")
        if stopped_early:
            logging.info(f"stopping at max_steps={max_steps}")
            break

    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-conf", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--profile", type=str, default=None,
                        help="trace steps 8-12 of the first epoch to this dir")
    args = parser.parse_args()
    train(args.conf, resume=args.resume, profile_dir=args.profile)


if __name__ == "__main__":
    main()
