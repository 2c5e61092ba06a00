"""End-to-end eval CLI test: synthetic corpus -> checkpoint -> test_asr
decode -> result TSV with WER comment; covers greedy + beam + nbest paths."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

import jax
import jax.numpy as jnp

from emoasr_tpu.config import config_from_dict, load_config
from emoasr_tpu.eval.test_asr import build_argparser
from emoasr_tpu.eval.test_asr import test_main as run_test_main
from emoasr_tpu.models.asr import ASR
from emoasr_tpu.train import checkpoint as ckpt


def _make_corpus(tmp_path, n_utts=6, V=20, F=8):
    rng = np.random.default_rng(0)
    rows = []
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(n_utts):
        T = int(rng.integers(20, 40))
        U = int(rng.integers(2, 5))
        x = rng.normal(size=(T, F)).astype(np.float32)
        p = feat_dir / f"utt{i}.npy"
        np.save(p, x)
        toks = rng.integers(3, V, size=U)
        # utt ids embed start/end times (for the RTF mode contract)
        rows.append(
            dict(
                feat_path=str(p),
                utt_id=f"spk-utt{i}-{i * 1000}-{i * 1000 + T * 10}",
                token_id=" ".join(map(str, toks)),
                text=" ".join(f"w{t}" for t in toks),
                xlen=T,
                ylen=U,
            )
        )
    tsv = tmp_path / "test.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    vocab_path = tmp_path / "vocab.txt"
    lines = ["<blank> 0", "<unk> 1", "<eos> 2"] + [
        f"▁w{i} {i}" for i in range(3, V)
    ]
    vocab_path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(tsv), str(vocab_path)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    return tmp, *_make_corpus(tmp)


def _write_conf(tmp_path, tsv, vocab, V=20, F=8, decoder="ctc"):
    conf = {
        "encoder_type": "transformer",
        "decoder_type": decoder,
        "input_layer": "linear",
        "feat_dim": F,
        "enc_hidden_size": 16,
        "enc_num_attention_heads": 2,
        "enc_num_layers": 1,
        "enc_intermediate_size": 32,
        "dec_hidden_size": 16,
        "dec_num_attention_heads": 2,
        "dec_num_layers": 1,
        "dec_intermediate_size": 32,
        "embedding_size": 12,
        "joint_hidden_size": 16,
        "vocab_size": V,
        "vocab_path": vocab,
        "test_path": tsv,
        "max_decode_ylen": 10,
        "buckets": [[64, 16]],
        "batch_size": 4,
        "max_xlens_batch": 256,
        "max_ylens_batch": 64,
        "lr_schedule_type": "noam",
        "num_warmup_steps": 10,
    }
    conf_path = tmp_path / f"exp_{decoder}.yaml"
    conf_path.write_text(yaml.safe_dump(conf))
    return str(conf_path)


def _save_ckpt(conf_path, ep="1"):
    cfg = load_config(conf_path)
    model = ASR(cfg)
    xs = jnp.zeros((2, 32, cfg.feat_dim))
    xlens = jnp.array([32, 20])
    ys = jnp.full((2, 4), 3, jnp.int32)
    ylens = jnp.array([4, 3])
    ys_in = jnp.full((2, 5), 2, jnp.int32)
    ys_out = jnp.full((2, 5), 2, jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), xs, xlens, ys, ylens, ys_in, ys_out
    )
    run_dir = os.path.splitext(conf_path)[0]
    os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
    ckpt.save_model(
        os.path.join(run_dir, "checkpoints", f"model.ep{ep}"),
        variables["params"],
        variables.get("batch_stats", {}),
    )
    return conf_path


@pytest.mark.parametrize("decoder,beam", [("ctc", 0), ("ctc", 3),
                                          ("rnn_transducer", 0),
                                          ("transformer", 3)])
def test_eval_cli_end_to_end(corpus, decoder, beam):
    tmp, tsv, vocab = corpus
    conf = _write_conf(tmp, tsv, vocab, decoder=decoder)
    _save_ckpt(conf)

    args = build_argparser().parse_args(
        ["-conf", conf, "-ep", "1", "--beam_width", str(beam)]
    )
    out = run_test_main(args)
    assert out is not None
    lm_w, len_w, wer, wer_info = out
    assert wer_info.startswith("WER:")

    result_dir = os.path.join(os.path.splitext(conf)[0], "results")
    files = os.listdir(result_dir)
    assert any(f"beam{beam}" in f for f in files)
    f = [x for x in files if f"beam{beam}" in x][0]
    with open(os.path.join(result_dir, f)) as fh:
        first = fh.readline()
    assert first.startswith("# WER:")
    df = pd.read_table(os.path.join(result_dir, f), comment="#")
    assert len(df) == 6  # all utterances decoded
    assert set(df.columns) == {"utt_id", "token_id", "text", "reftext"}


def test_eval_cli_nbest_and_runtime(corpus):
    tmp, tsv, vocab = corpus
    conf = _write_conf(tmp, tsv, vocab, decoder="ctc")
    _save_ckpt(conf)

    args = build_argparser().parse_args(
        ["-conf", conf, "-ep", "1", "--beam_width", "3", "--nbest"]
    )
    assert run_test_main(args) is None
    result_dir = os.path.join(os.path.splitext(conf)[0], "results")
    f = [x for x in os.listdir(result_dir) if "nbest" in x][0]
    df = pd.read_table(os.path.join(result_dir, f))
    assert "score_asr" in df.columns
    assert len(df) >= 6  # n-best rows

    args = build_argparser().parse_args(
        [
            "-conf", conf, "-ep", "1", "--beam_width", "0", "--runtime",
            "--runtime_num_samples", "4", "--runtime_num_repeats", "1",
        ]
    )
    runtimes, rtfs, n_decoded = run_test_main(args)
    assert len(runtimes) == 1 and len(rtfs) == 1
    assert rtfs[0] > 0
    assert n_decoded == 4  # every runtime utt produced a hypothesis


def test_decode_dataset_slow_consumer_terminates(corpus):
    """Regression: the producer's end-of-stream sentinel must survive a
    full queue.  With more batches than queue slots and a consumer
    slower than the producer (here: an artificial sleep standing in for
    a long jit compile), the pre-fix loop dropped the final None after
    one 0.2 s timed put and the consumer blocked on q.get() forever."""
    import threading
    import time as _time

    from emoasr_tpu.config import config_from_dict
    from emoasr_tpu.data.asr_dataset import ASRDataset
    from emoasr_tpu.eval import test_asr as ta
    from emoasr_tpu.utils.vocab import Vocab

    tmp, tsv, vocab_path = corpus
    conf = dict(
        encoder_type="transformer", decoder_type="ctc",
        input_layer="linear", feat_dim=8, enc_hidden_size=16,
        enc_num_attention_heads=2, enc_num_layers=1,
        enc_intermediate_size=32, vocab_size=20, vocab_path=vocab_path,
        test_path=tsv, buckets=[[64, 16]], batch_size=2,  # 6 utts -> 3 batches
        max_xlens_batch=256, max_ylens_batch=64,
    )
    cfg = config_from_dict(conf)
    dataset = ASRDataset(cfg, tsv, phase="test")
    vocab = Vocab(vocab_path)

    def slow_decode(xs, xlens):
        _time.sleep(1.0)  # > 2 batches x producer time + sentinel window
        B = xs.shape[0]
        hyps = jnp.full((B, 3), 3, jnp.int32)
        return hyps, jnp.full((B,), 3, jnp.int32), jnp.zeros((B,))

    done = {}

    def run():
        done["rows"] = ta.decode_dataset(cfg, dataset, slow_decode, vocab)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "decode_dataset deadlocked on a slow consumer"
    assert len(done["rows"]) == 6


def test_eval_cli_joint_ctc_all_utts_decoded(corpus):
    """Flagship joint-CTC mode: every utterance must yield a hypothesis
    even on a checkpoint whose beams never emit a viable eos (the r4
    `cannot decode` storm) — the CTC-length row cap force-finalizes the
    surviving beams (decode_len_cap auto; VERDICT r4 #2)."""
    import jax.numpy as jnp

    from emoasr_tpu.models.decoders.transformer import TransformerDecoder

    tmp, tsv, vocab = corpus
    conf = _write_conf(tmp, tsv, vocab, decoder="transformer")
    # joint CTC needs the aux ctc head
    d = yaml.safe_load(open(conf))
    d["mtl_ctc_weight"] = 0.3
    conf = os.path.join(tmp, "exp_joint_storm.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(d, f)
    _save_ckpt(conf)
    # push eos far down so it never survives selection
    run_dir = os.path.splitext(conf)[0]
    path = os.path.join(run_dir, "checkpoints", "model.ep1")
    tree = ckpt.load_model(path)
    b = tree["params"]["decoder"]["output"]["bias"]
    tree["params"]["decoder"]["output"]["bias"] = (
        jnp.asarray(b).at[2].add(-30.0)
    )
    ckpt.save_model(path, tree["params"], tree.get("batch_stats", {}))

    args = build_argparser().parse_args(
        [
            "-conf", conf, "-ep", "1", "--beam_width", "3",
            "--decode_ctc_weight", "0.3", "--runtime",
            "--runtime_num_samples", "-1", "--runtime_num_repeats", "1",
        ]
    )
    runtimes, rtfs, n_decoded = run_test_main(args)
    assert n_decoded == 6, n_decoded
