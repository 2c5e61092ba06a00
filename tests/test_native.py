"""Native C++ components: parity with the Python implementations."""

import os
import subprocess

import numpy as np
import pandas as pd
import pytest

from emoasr_tpu import native
from emoasr_tpu.eval.wer import compute_wer, compute_wers

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def test_edit_distance_matches_python():
    rng = np.random.default_rng(0)
    hyps, refs = [], []
    for _ in range(50):
        refs.append(rng.integers(0, 8, size=rng.integers(1, 25)).tolist())
        hyps.append(rng.integers(0, 8, size=rng.integers(1, 25)).tolist())
    counts = native.edit_distance_native(hyps, refs)
    for i, (h, r) in enumerate(zip(hyps, refs)):
        _, wd = compute_wer([str(t) for t in h], [str(t) for t in r])
        assert counts[i, 0] == wd["n_sub"], i
        assert counts[i, 1] == wd["n_ins"], i
        assert counts[i, 2] == wd["n_del"], i
        assert counts[i, 3] == wd["n_ref"], i


def test_compute_wers_native_path_matches():
    rng = np.random.default_rng(1)
    hyps = [[f"w{t}" for t in rng.integers(0, 9, rng.integers(0, 20))]
            for _ in range(30)]
    refs = [[f"w{t}" for t in rng.integers(0, 9, rng.integers(1, 20))]
            for _ in range(30)]
    wer_nat, tot_nat = compute_wers(hyps, refs)  # >8 pairs -> native
    # force python path by chunking into small groups
    tot_py = {"n_sub": 0, "n_ins": 0, "n_del": 0, "n_ref": 0}
    for h, r in zip(hyps, refs):
        w, t = compute_wers([h], [r])
        for k in tot_py:
            tot_py[k] += t[k]
    for k in tot_py:
        assert tot_nat[k] == tot_py[k], k


def test_native_batch_loader(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    arrays = []
    for i, rows in enumerate([10, 25, 40]):
        a = rng.normal(size=(rows, 83)).astype(np.float32)  # wider than 80
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out, lens = native.load_feat_batch_native(paths, max_rows=30, cols=80)
    assert out.shape == (3, 30, 80)
    assert lens.tolist() == [10, 25, 30]  # last truncated to bucket
    for i in range(3):
        np.testing.assert_allclose(
            out[i, : lens[i]], arrays[i][: lens[i], :80], rtol=1e-6
        )
        assert (out[i, lens[i]:] == 0).all()


def test_native_loader_float64(tmp_path):
    a = np.random.default_rng(3).normal(size=(7, 8))  # float64
    p = str(tmp_path / "f64.npy")
    np.save(p, a)
    out, lens = native.load_feat_batch_native([p], max_rows=10, cols=8)
    np.testing.assert_allclose(out[0, :7], a.astype(np.float32), rtol=1e-6)


def test_native_loader_missing_file(tmp_path):
    with pytest.raises(IOError):
        native.load_feat_batch_native([str(tmp_path / "nope.npy")], 10, 8)
