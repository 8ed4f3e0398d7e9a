"""Visualization dump tests."""

import os

import numpy as np

from dpmn_tpu.visualize import tripple_display
from dpmn_tpu.visualize import test_display as display_errors


def test_tripple_display(tmp_path):
    rng = np.random.RandomState(0)
    lr = rng.rand(3, 16, 64, 4).astype(np.float32)
    sr = rng.rand(3, 32, 128, 3).astype(np.float32)
    hr = rng.rand(3, 32, 128, 4).astype(np.float32)
    n = tripple_display(lr, sr, hr, ["a", "b", "c"], ["a", "x", "c"], ["a", "b", "c"], 5, str(tmp_path), n_vis=2)
    assert n == 2
    files = os.listdir(tmp_path / "5")
    assert len(files) == 2
    assert any(f.endswith("_.png") for f in files)


def test_test_display_only_errors(tmp_path):
    rng = np.random.RandomState(1)
    lr = rng.rand(2, 16, 64, 3).astype(np.float32)
    sr = rng.rand(2, 32, 128, 3).astype(np.float32)
    hr = rng.rand(2, 32, 128, 3).astype(np.float32)
    n = display_errors(lr, sr, hr, ["a", "b"], ["a", "wrong"], ["a", "b"], str(tmp_path))
    assert n == 1  # only the misrecognized sample
    assert len(os.listdir(tmp_path / "display")) == 1
