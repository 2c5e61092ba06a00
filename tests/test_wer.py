"""WER oracle tests: golden values + parity with a direct port of the
reference DP (`/root/reference/asr/metrics.py:20-105`) on random data."""

import numpy as np
import pytest

from emoasr_tpu.eval.wer import compute_wer, compute_wers, wer_info_line


def _ref_wer(hyp, ref):
    """Plain O(N^2) Levenshtein (independent implementation for cross-check)."""
    R, H = len(ref), len(hyp)
    d = np.zeros((R + 1, H + 1), dtype=np.int64)
    d[0, :] = np.arange(H + 1)
    d[:, 0] = np.arange(R + 1)
    for i in range(1, R + 1):
        for j in range(1, H + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            d[i, j] = min(d[i - 1, j - 1] + cost, d[i, j - 1] + 1, d[i - 1, j] + 1)
    return d[R, H]


def test_exact_match():
    wer, wd = compute_wer(["a", "b", "c"], ["a", "b", "c"])
    assert wer == 0.0
    assert wd["error_list"] == ["C", "C", "C"]


def test_sub_ins_del():
    # ref: a b c d ; hyp: a x c d e  -> 1 sub + 1 ins over 4 ref words = 50%
    wer, wd = compute_wer(["a", "x", "c", "d", "e"], ["a", "b", "c", "d"])
    assert wd["n_sub"] == 1 and wd["n_ins"] == 1 and wd["n_del"] == 0
    assert wer == pytest.approx(50.0)


def test_empty_hyp_uses_dummy():
    wer, wd = compute_wer([], ["a", "b"])
    # <dummy> never matches: 1 sub + 1 del
    assert wd["n_sub"] + wd["n_del"] == 2
    assert wer == pytest.approx(100.0)


def test_cer_mode():
    wer, wd = compute_wer(["ab", "cd"], ["ab", "ce"], cer=True)
    assert wd["n_ref"] == 4
    assert wd["n_sub"] == 1
    assert wer == pytest.approx(25.0)


def test_random_parity_with_reference_dp():
    rng = np.random.default_rng(0)
    for _ in range(50):
        ref = [str(x) for x in rng.integers(0, 8, size=rng.integers(1, 20))]
        hyp = [str(x) for x in rng.integers(0, 8, size=rng.integers(0, 20))]
        wer, wd = compute_wer(hyp, ref)
        hyp_eff = hyp if hyp else ["<dummy>"]
        dist = _ref_wer(hyp_eff, ref)
        assert wd["n_sub"] + wd["n_ins"] + wd["n_del"] == dist
        # C-count invariant from the reference
        assert wd["error_list"].count("C") == len(ref) - wd["n_sub"] - wd["n_del"]


def test_corpus_aggregation():
    hyps = [["a", "b"], ["c"]]
    refs = [["a", "b"], ["c", "d"]]
    wer, wd = compute_wers(hyps, refs)
    assert wd["n_ref"] == 4 and wd["n_del"] == 1
    assert wer == pytest.approx(25.0)
    assert wer_info_line(wer, wd) == "WER: 25.00 [D=1, S=0, I=0, N=4]"
