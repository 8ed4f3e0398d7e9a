"""VisionLAN MLM attention-map dump (reference model/VisionLAN/visualize.py:86-99)."""

import os

import numpy as np

from dpmn_tpu.visualize import visionlan_attention_display


def test_attention_dump(tmp_path):
    rng = np.random.RandomState(0)
    images = (rng.rand(3, 64, 256, 3) * 2 - 1).astype(np.float32)
    att = rng.rand(3, 1, 256).astype(np.float32)
    n = visionlan_attention_display(
        images, att, label_ids=[4, 2, 7], label_subs=["a", "b", "c"], vis_dir=str(tmp_path)
    )
    assert n == 3
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 6  # input + mask per sample
    assert "0-0-1-2b.png" in files
    import cv2

    mask = cv2.imread(str(tmp_path / "0-0-0-4a.png"), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (64, 256)


def test_attention_dump_respects_budget(tmp_path):
    rng = np.random.RandomState(1)
    images = (rng.rand(4, 64, 256, 3) * 2 - 1).astype(np.float32)
    att = rng.rand(4, 1, 256).astype(np.float32)
    n = visionlan_attention_display(
        images, att, [0, 1, 2, 3], ["a", "b", "c", "d"], str(tmp_path),
        max_visualize_num=2, start_count=1,
    )
    assert n == 1
