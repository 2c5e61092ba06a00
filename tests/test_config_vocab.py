import numpy as np
import pytest

from emoasr_tpu.config import ExpConfig, config_from_dict
from emoasr_tpu.utils.converters import add_sos_eos_np, get_utt_id_nosp, strip_eos
from emoasr_tpu.utils.vocab import Vocab


def test_config_defaults_and_overrides():
    cfg = config_from_dict({"encoder_type": "conformer", "vocab_size": 100})
    assert cfg.is_conformer
    assert cfg.vocab_size == 100
    assert cfg.blank_id == 0 and cfg.eos_id == 2


def test_config_rejects_unknown_keys():
    with pytest.raises(ValueError):
        config_from_dict({"not_a_key": 1})


def test_config_hashable():
    # frozen dataclass => usable as a jit static argument
    a = config_from_dict({"vocab_size": 10})
    b = config_from_dict({"vocab_size": 10})
    assert hash(a) == hash(b) and a == b


def test_vocab_roundtrip(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text(
        "<blank> 0\n<unk> 1\n<eos> 2\n▁hel 3\nlo 4\n▁world 5\n",
        encoding="utf-8",
    )
    v = Vocab(str(p))
    assert len(v) == 6
    assert v.token2id("▁hel") == 3
    assert v.token2id("missing") == v.unk_id == 1
    assert v.ids2text([3, 4, 5]) == "hello world"
    assert v.ids2words([2, 3, 4]) == ["<eos>", "hello"]


def test_add_sos_eos_np():
    ys = np.array([[5, 6, 0], [7, 0, 0]])
    ylens = np.array([2, 1])
    out, outlens = add_sos_eos_np(ys, ylens, eos_id=2)
    assert out.shape == (2, 5)
    assert out[0].tolist() == [2, 5, 6, 2, 2]
    assert out[1].tolist() == [2, 7, 2, 2, 2]
    assert outlens.tolist() == [4, 3]


def test_misc_converters():
    assert strip_eos([2, 5, 2, 6], 2) == [5, 6]
    assert get_utt_id_nosp("sp0.9-utt-1") == "utt-1"
    assert get_utt_id_nosp("utt-1") == "utt-1"


def test_all_shipped_configs_load_and_construct():
    """Every YAML under configs/ (the full README-table matrix: L1-L4,
    T1-T5, C1-C6 + correction, LM suites) loads through the strict loader
    and its model constructs."""
    import glob
    import os

    from emoasr_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..")
    paths = sorted(glob.glob(os.path.join(root, "configs/**/*.yaml"),
                             recursive=True))
    assert len(paths) >= 30, paths
    for p in paths:
        cfg = load_config(p)
        if cfg.lm_type:
            from emoasr_tpu.models.lm.lm import LM

            LM(cfg)
        else:
            from emoasr_tpu.models.asr import ASR

            ASR(cfg)
