"""Driver benchmark: batched greedy ASR inference throughput on one chip.

Metric: real-time factor (decode wall-time / audio duration) for the
L1-class CTC(Transformer) 20M configuration on synthetic 80-dim fbank
inputs (10 ms frame shift).  The reference's published RTF protocol is CPU
single-thread per-utterance decoding (`asr/test_asr.py:226-263`); its CTC
greedy baseline is RTF 0.0033 (`asr/correct/README.md:55-58`).

`vs_baseline` = reference_RTF / our_RTF (higher is better; >1 = faster
than the PyTorch CPU reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_RTF = 0.0033  # reference CTC greedy RTF (CPU, 1 thread)
FRAME_SHIFT_S = 0.010  # 10 ms per input frame


def main():
    import jax
    import jax.numpy as jnp

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.models.asr import ASR

    # L1: CTC(Transformer) 20M (README.md L1 row; enc 256x12, vocab 10k)
    cfg = config_from_dict(
        dict(
            encoder_type="transformer",
            decoder_type="ctc",
            input_layer="conv2d",
            feat_dim=80,
            enc_hidden_size=256,
            enc_num_attention_heads=4,
            enc_num_layers=12,
            enc_intermediate_size=2048,
            vocab_size=10000,
            dropout_enc_rate=0.0,
            dropout_attn_rate=0.0,
        )
    )
    model = ASR(cfg)

    B, T = 64, 1000  # 64 utterances x 10 s (batch sweet spot on v5e)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    xlens = jnp.full((B,), T, jnp.int32)

    variables = model.init(
        jax.random.PRNGKey(0), xs, xlens, method=ASR.decode_greedy
    )

    decode = jax.jit(
        lambda v, x, l: model.apply(v, x, l, method=ASR.decode_greedy)
    )
    # distinct inputs per iteration (defeats any transport-level caching)
    # derived ON DEVICE from one staged buffer — the remote tunnel's H2D
    # path is not what we are measuring (production inputs stream via
    # infeed), and it is far too slow to ship n_iters buffers through
    n_iters = 10
    base = jax.device_put(xs)
    roll = jax.jit(lambda x, i: jnp.roll(x, i, axis=1))
    inputs = [roll(base, i) for i in range(n_iters)]
    np.asarray(inputs[-1][0, 0, :1])  # force materialization of the queue
    # warmup / compile
    hyps, hyp_lens, _, _ = decode(variables, xs, xlens)
    np.asarray(hyps)

    # NOTE: block_until_ready returns early on this remote-TPU transport;
    # force a D2H of each result to bound completion.
    t0 = time.perf_counter()
    outs = []
    for it in range(n_iters):
        hyps, hyp_lens, _, _ = decode(variables, inputs[it], xlens)
        outs.append(hyps)
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0

    audio_seconds = n_iters * B * T * FRAME_SHIFT_S
    rtf = dt / audio_seconds
    out = {
        "metric": "ctc_greedy_batched_rtf_L1",
        "value": round(rtf, 6),
        "unit": "decode_s_per_audio_s",
        "vs_baseline": round(REF_RTF / rtf, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
