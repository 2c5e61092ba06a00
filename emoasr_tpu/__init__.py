"""emoasr_tpu: a TPU-native (JAX / XLA / Pallas / pjit) end-to-end ASR + LM framework.

Re-designed from scratch with the capability surface of emoASR
(reference: /root/reference), but built TPU-first:

- CTC / RNN-T losses and forced aligners are on-device vectorized
  forward-backward scans (Pallas kernels for the transducer lattice),
  not external CUDA kernels.
- Encoders (Transformer / Conformer / RNN) compile to XLA with static
  bucket shapes; SpecAugment and the log-mel front-end are batched
  device ops.
- Decoding (greedy / CTC prefix beam / label-sync attention beam /
  ALSD transducer beam, with LM shallow fusion) runs as batched,
  jit-compiled `lax.scan` loops, instead of per-utterance Python.
- Data parallelism is SPMD over a `jax.sharding.Mesh` (pjit),
  not torch DataParallel.
"""

__version__ = "0.1.0"
