"""Training runtime tests: LR schedule parity with the reference's
ScheduledOptimizer math, NaN-skip, bucketing, and an end-to-end SPMD
training run on the virtual 8-device mesh (loss must drop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict
from emoasr_tpu.data.batching import Bucket, BucketBatcher, derive_buckets
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.parallel.mesh import make_mesh, shard_batch
from emoasr_tpu.train.optim import build_optimizer, make_lr_fn
from emoasr_tpu.train.step import init_train_state, make_train_step


def _ref_lr(schedule, base, step, warmup, d_model=None, total=None):
    """Direct transcription of optimizers.py:45-77 for golden comparison."""
    if schedule == "noam":
        return base * d_model ** -0.5 * min(step ** -0.5, step * warmup ** -1.5)
    if schedule == "epdecay":
        return (base / max(1.0, warmup)) * step if step <= warmup else base
    if schedule == "lindecay":
        if step <= warmup:
            return (base / max(1.0, warmup)) * step
        return base * max(0.0, (total - step) / max(1.0, total - warmup))
    raise ValueError


@pytest.mark.parametrize("schedule", ["noam", "epdecay", "lindecay"])
def test_lr_schedules_match_reference(schedule):
    cfg = config_from_dict(
        dict(
            lr_schedule_type=schedule,
            learning_rate=5.0 if schedule == "noam" else 1e-3,
            num_warmup_steps=100,
            enc_hidden_size=256,
        )
    )
    total = 1000
    lr_fn = make_lr_fn(cfg, total)
    for step in [1, 50, 100, 101, 500, 999, 1000]:
        got = float(lr_fn(jnp.asarray(step), 1.0))
        want = _ref_lr(
            schedule, cfg.learning_rate, step, 100, d_model=256, total=total
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"step {step}")


def test_epdecay_epoch_scale():
    cfg = config_from_dict(
        dict(lr_schedule_type="epdecay", learning_rate=1e-3, num_warmup_steps=10)
    )
    lr_fn = make_lr_fn(cfg, None)
    assert float(lr_fn(jnp.asarray(100), 0.5)) == pytest.approx(0.5e-3)


def test_bucket_batcher():
    buckets = derive_buckets(
        [(400, 64), (200, 48)], max_xlens_batch=800, max_ylens_batch=300,
        batch_size=8,
    )
    # sorted buckets: (200,48) B=min(8, 4, 6)=4 ; (400,64) B=min(8,2,4)=2
    assert buckets[0].batch_size == 4 and buckets[1].batch_size == 2
    xlens = np.array([100, 150, 180, 190, 300, 350, 390, 120])
    ylens = np.array([10, 20, 30, 40, 50, 60, 60, 5])
    b = BucketBatcher(xlens, ylens, buckets, shuffle=False, drop_tail=True)
    batches = list(b)
    # 4 short utts -> one batch of 4 in bucket 0; 3 long -> one batch of 2,
    # tail of 1 dropped
    sizes = sorted(len(idx) for _, idx in batches)
    assert sizes == [2, 4]


def _synthetic_batch(rng, cfg, B, T, U):
    """Features carry the label identity so a tiny model can learn."""
    ys = rng.integers(3, cfg.vocab_size, size=(B, U)).astype(np.int32)
    xs = np.zeros((B, T, cfg.feat_dim), np.float32)
    seg = T // U
    for b in range(B):
        for u in range(U):
            xs[b, u * seg : (u + 1) * seg, ys[b, u] % cfg.feat_dim] = 2.0
    xs += rng.normal(size=xs.shape).astype(np.float32) * 0.1
    ylens = np.full((B,), U, np.int32)
    xlens = np.full((B,), T, np.int32)
    ys_in = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_in[:, 1:] = ys
    ys_out = np.full((B, U + 1), cfg.eos_id, np.int32)
    ys_out[:, :U] = ys
    return dict(xs=xs, xlens=xlens, ys=ys, ylens=ylens, ys_in=ys_in, ys_out=ys_out)


def test_spmd_training_loss_decreases():
    assert len(jax.devices()) == 8, "virtual 8-device CPU mesh expected"
    cfg = config_from_dict(
        dict(
            encoder_type="transformer",
            decoder_type="ctc",
            input_layer="linear",
            feat_dim=16,
            enc_hidden_size=32,
            enc_num_attention_heads=2,
            enc_num_layers=1,
            enc_intermediate_size=64,
            vocab_size=12,
            lr_schedule_type="noam",
            learning_rate=5.0,
            num_warmup_steps=20,
            dropout_enc_rate=0.0,
            dropout_attn_rate=0.0,
            spec_augment=False,
            clip_grad_norm=5.0,
        )
    )
    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == 8
    model = ASR(cfg)
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng, cfg, B=16, T=24, U=4)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        key,
        jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]),
        jnp.asarray(batch["ys_in"]), jnp.asarray(batch["ys_out"]),
    )
    tx = build_optimizer(cfg)
    state = init_train_state(variables["params"], {}, tx)
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)

    losses = []
    for i in range(40):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, shard_batch(mesh, batch), k)
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.step) == 40
    assert int(state.skipped) == 0


def test_nan_skip():
    cfg = config_from_dict(
        dict(
            encoder_type="transformer",
            decoder_type="ctc",
            input_layer="linear",
            feat_dim=8,
            enc_hidden_size=16,
            enc_num_attention_heads=2,
            enc_num_layers=1,
            enc_intermediate_size=32,
            vocab_size=8,
            lr_schedule_type="noam",
            learning_rate=5.0,
            num_warmup_steps=10,
            dropout_enc_rate=0.0,
            dropout_attn_rate=0.0,
        )
    )
    model = ASR(cfg)
    rng = np.random.default_rng(1)
    batch = _synthetic_batch(rng, cfg, B=4, T=12, U=3)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key,
        jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]),
        jnp.asarray(batch["ys_in"]), jnp.asarray(batch["ys_out"]),
    )
    tx = build_optimizer(cfg)
    state = init_train_state(variables["params"], {}, tx)
    step_fn = make_train_step(model, cfg, tx)

    bad = dict(batch)
    bad["xs"] = batch["xs"] * np.nan
    state2, metrics = step_fn(state, bad, key)
    assert int(state2.skipped) == 1
    assert not bool(metrics["grad_finite"])
    # params unchanged
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_spec_augment_shapes_and_validity():
    from emoasr_tpu.ops.specaug import spec_augment

    rng = jax.random.PRNGKey(0)
    xs = jnp.ones((3, 50, 20))
    xlens = jnp.array([50, 30, 10])
    out = spec_augment(rng, xs, xlens, max_mask_freq=5, num_masks_freq=2,
                       max_mask_time=10, num_masks_time=2)
    out = np.asarray(out)
    assert out.shape == xs.shape
    assert (out == 0).any()  # some masking happened
    assert not (out == 0).all()
    # adaptive variant
    out2 = spec_augment(
        rng, xs, xlens, max_mask_time_ratio=0.05, num_masks_time_ratio=0.04
    )
    assert np.asarray(out2).shape == xs.shape


def test_prefetch_to_device_order_and_errors():
    """prefetch_to_device preserves batch order and surfaces producer
    exceptions (train/loop.py)."""
    import numpy as np
    import pytest

    from emoasr_tpu.parallel.mesh import make_mesh
    from emoasr_tpu.train.loop import prefetch_to_device

    mesh = make_mesh((1,), ("data",))
    batches = [{"xs": np.full((2, 3), i, np.float32)} for i in range(7)]
    out = list(prefetch_to_device(iter(batches), mesh, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["xs"])[0, 0]) == i

    def bad_iter():
        yield {"xs": np.zeros((1, 1), np.float32)}
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad_iter(), mesh))


def test_greedy_valid_wer_cached_rebind():
    """Per-epoch validation reuses one decode program; rebinding updated
    params must give the same WER as a fresh build (train/loop.py)."""
    import numpy as np
    import pandas as pd

    from emoasr_tpu import config as _c
    from emoasr_tpu.models.asr import ASR
    from emoasr_tpu.train import loop as tl
    from emoasr_tpu.train.optim import build_optimizer
    from emoasr_tpu.train.step import init_train_state

    import tempfile, os
    cfg = _c.config_from_dict(dict(
        encoder_type="transformer", decoder_type="ctc", input_layer="linear",
        feat_dim=8, enc_hidden_size=16, enc_num_attention_heads=2,
        enc_num_layers=1, enc_intermediate_size=32, vocab_size=10,
        dropout_enc_rate=0.0, dropout_attn_rate=0.0,
        buckets=[[16, 8]], batch_size=4, max_xlens_batch=512,
        max_ylens_batch=64,
    ))
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        x = rng.normal(size=(16, 8)).astype(np.float32)
        p = os.path.join(tmp, f"u{i}.npy")
        np.save(p, x)
        rows.append(dict(feat_path=p, utt_id=f"u{i}", token_id="3 4",
                         text="w3 w4", xlen=16, ylen=2))
    tsv = os.path.join(tmp, "dev.tsv")
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    from emoasr_tpu.data.asr_dataset import ASRDataset
    ds = ASRDataset(cfg, tsv, phase="valid")

    model = ASR(cfg)
    import jax, jax.numpy as jnp
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 8)),
                   jnp.full((2,), 16, jnp.int32), method=ASR.decode_greedy)
    tx = build_optimizer(cfg)
    s1 = init_train_state(v["params"], v.get("batch_stats", {}), tx)
    # perturbed params = a "later epoch"
    p2 = jax.tree_util.tree_map(lambda x: x + 0.01, v["params"])
    s2 = init_train_state(p2, v.get("batch_stats", {}), tx)

    tl._VALID_DECODE_CACHE.clear()
    w1 = tl.greedy_valid_wer(cfg, model, s1, ds)
    w2_cached = tl.greedy_valid_wer(cfg, model, s2, ds)  # cache hit, rebound
    assert len(tl._VALID_DECODE_CACHE) == 1
    tl._VALID_DECODE_CACHE.clear()
    w2_fresh = tl.greedy_valid_wer(cfg, model, s2, ds)
    assert w2_cached == w2_fresh
    assert np.isfinite(w1) and np.isfinite(w2_cached)
