"""Jitted SPMD train / valid steps.

Replaces the reference's `train_step` (`asr/train_asr.py:35-98`): H2D copies,
forward, backward, clip, NaN-skip, scheduled LR, optimizer step — all fused
into ONE compiled program per bucket shape, sharded over the mesh's data
axis (parameters replicated, XLA inserts the gradient all-reduce on ICI).

On-device preprocessing (SpecAugment -> frame stacking) runs inside the same
program, keeping the host path IO-only.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.ops.specaug import spec_augment
from emoasr_tpu.train.optim import finite_or_zero, make_lr_fn, scale_updates
from emoasr_tpu.utils.precision import (
    cast_batch_for_compute,
    cast_params_for_compute,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # optimizer step count (int32)
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch_scale: jnp.ndarray  # cumulative epdecay factor (float32)
    skipped: jnp.ndarray  # NaN-skipped step count (int32)


def init_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats or {},
        opt_state=tx.init(params),
        epoch_scale=jnp.float32(1.0),
        skipped=jnp.int32(0),
    )


def preprocess(cfg: ExpConfig, xs, xlens, rng, train: bool):
    """On-device SpecAugment + frame stacking (reference order:
    spec_augment.py applied before _stack_frames, datasets.py:94-101)."""
    if train and cfg.spec_augment:
        xs = spec_augment(
            rng, xs, xlens,
            max_mask_freq=cfg.max_mask_freq,
            num_masks_freq=cfg.num_masks_freq,
            max_mask_time=cfg.max_mask_time,
            num_masks_time=cfg.num_masks_time,
            max_mask_time_ratio=cfg.max_mask_time_ratio,
            num_masks_time_ratio=cfg.num_masks_time_ratio,
            replace_with_zero=cfg.replace_with_zero,
        )
    n = cfg.num_framestacks
    if n > 1:
        B, T, F = xs.shape
        xs = xs[:, : (T // n) * n].reshape(B, T // n, F * n)
        xlens = xlens // n
    return xs, xlens


def _state_shardings(mesh, tx, params):
    """(TrainState-shaped sharding tree, batch sharding, replicated).

    Params (and the optimizer moments, which mirror the param tree) get
    Megatron-style specs over the mesh's "model" axis when present —
    `parallel.mesh.param_partition_specs`; everything scalar/stat-like is
    replicated, batches split over the leading "data" axis."""
    from emoasr_tpu.parallel.mesh import param_partition_specs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    pspecs = param_partition_specs(params, mesh)

    pdef = jax.tree_util.tree_structure(params)

    def is_param_tree(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:  # noqa: BLE001
            return False

    opt_shape = jax.eval_shape(tx.init, params)
    opt_specs = jax.tree_util.tree_map(
        lambda x: pspecs if is_param_tree(x) else repl,
        opt_shape,
        is_leaf=lambda x: is_param_tree(x),
    )
    state_specs = TrainState(
        step=repl, params=pspecs, batch_stats=repl,
        opt_state=opt_specs, epoch_scale=repl, skipped=repl,
    )
    return state_specs, data, repl


def make_train_step(
    model, cfg: ExpConfig, tx, num_total_steps: Optional[int] = None,
    mesh=None, params=None,
) -> Callable:
    """Build the jitted train step.

    Returns step_fn(state, batch, rng) -> (state, metrics).
    batch: dict with xs/xlens/ys/ylens/ys_in/ys_out (+ps/plens/soft_labels).
    """
    lr_fn = make_lr_fn(cfg, num_total_steps)

    def step_fn(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        sa_rng, do_rng = jax.random.split(rng)
        xs, xlens = preprocess(cfg, batch["xs"], batch["xlens"], sa_rng, True)
        xs = cast_batch_for_compute(cfg, xs)

        def loss_fn(params):
            # mixed precision: the forward pass sees a compute-dtype copy of
            # the float32 master params; the cast's transpose returns
            # float32 gradients (utils/precision.py)
            variables = {"params": cast_params_for_compute(cfg, params)}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables,
                xs, xlens, batch["ys"], batch["ylens"],
                batch["ys_in"], batch["ys_out"],
                batch.get("soft_labels"), batch.get("ps"), batch.get("plens"),
                deterministic=False,
                rngs={"dropout": do_rng},
                mutable=mutable,
            )
            if mutable:
                (loss, loss_dict), updates = out
                return loss, (loss_dict, updates.get("batch_stats", {}))
            loss, loss_dict = out
            return loss, (loss_dict, {})

        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grads, finite = finite_or_zero(grads)
        new_step = state.step + 1
        # with grad accumulation, the reference's scheduler counts optimizer
        # updates (one per accum_grad micro-steps, train_asr.py:106-121)
        opt_step = (new_step + cfg.accum_grad - 1) // cfg.accum_grad
        lr = lr_fn(opt_step, state.epoch_scale)

        # NaN-skip: keep old params/opt_state when grads were non-finite
        # (train_asr.py:83-90); the step counter still advances, matching
        # the reference's scheduler (its optimizer.step is skipped but the
        # loop continues).  lax.cond executes ONE branch on TPU — the old
        # per-leaf where-guards re-read and re-wrote the whole param AND
        # moment trees every step (hundreds of extra small kernels).
        def _apply(operand):
            grads_, opt_state_, params_ = operand
            updates, new_opt = tx.update(grads_, opt_state_, params_)
            updates = scale_updates(updates, lr)
            return optax.apply_updates(params_, updates), new_opt

        new_params, new_opt_state = jax.lax.cond(
            finite,
            _apply,
            lambda operand: (operand[2], operand[1]),
            (grads, state.opt_state, state.params),
        )
        new_stats = new_stats if new_stats else state.batch_stats

        metrics = dict(loss_dict)
        metrics["lr"] = lr
        metrics["grad_finite"] = finite
        state = state.replace(
            step=new_step,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            skipped=state.skipped + jnp.where(finite, 0, 1),
        )
        return state, metrics

    # explicit shardings only for true multi-device meshes: on a single
    # device the NamedSharding path forces per-call resharding through the
    # runtime (23x step overhead observed on the remote-TPU transport)
    if mesh is not None and mesh.devices.size > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        if params is not None and "model" in mesh.axis_names:
            # dp x tp: params/moments laid out over the model axis
            state_specs, data, repl = _state_shardings(mesh, tx, params)
            return jax.jit(
                step_fn,
                in_shardings=(state_specs, data, repl),
                out_shardings=(state_specs, repl),
            )
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
        )
    return jax.jit(step_fn)


def make_eval_loss_step(model, cfg: ExpConfig, mesh=None, tx=None,
                        params=None) -> Callable:
    """Validation loss (no specaug, deterministic).

    INVARIANT: eval batches built with `pad_to_batch` duplicate the first
    utterance into tail rows (`data/asr_dataset.py` pads to the bucket's
    batch size for one-program-shape decoding).  The returned loss_dict is
    a whole-batch mean, so on a padded tail batch it double-counts the
    duplicated rows — callers aggregating over utterances must weight by
    `batch["n_valid"]` (or slice device arrays to `n_valid` rows) before
    reducing across batches."""

    def step_fn(state: TrainState, batch: Dict) -> Dict:
        xs, xlens = preprocess(cfg, batch["xs"], batch["xlens"], None, False)
        xs = cast_batch_for_compute(cfg, xs)
        variables = {"params": cast_params_for_compute(cfg, state.params)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        loss, loss_dict = model.apply(
            variables,
            xs, xlens, batch["ys"], batch["ylens"],
            batch["ys_in"], batch["ys_out"],
            batch.get("soft_labels"), batch.get("ps"), batch.get("plens"),
            deterministic=True,
        )
        return loss_dict

    if mesh is not None and mesh.devices.size > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        if params is not None and tx is not None and "model" in mesh.axis_names:
            state_specs, data, repl = _state_shardings(mesh, tx, params)
            return jax.jit(
                step_fn, in_shardings=(state_specs, data), out_shardings=repl
            )
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)
    return jax.jit(step_fn)
