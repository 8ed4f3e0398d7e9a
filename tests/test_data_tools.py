"""Offline data tooling: SynthText cropper + folder-pair dataset."""

import json
import os

import numpy as np
import pytest


def test_crop_synthtext_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from scipy.io import savemat

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from crop_synthtext import crop_synthtext, split_words, word_rects

    # synthetic SynthText layout: one image, two words
    img_dir = tmp_path / "st" / "8"
    img_dir.mkdir(parents=True)
    img = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "pic_1.jpg"), img)

    # quads (2, 4, 2): word0 at x 4..40 y 6..30, word1 at x 50..90 y 10..40
    bb = np.zeros((2, 4, 2), np.float32)
    bb[0, :, 0] = [4, 40, 40, 4]
    bb[1, :, 0] = [6, 6, 30, 30]
    bb[0, :, 1] = [50, 90, 90, 50]
    bb[1, :, 1] = [10, 10, 40, 40]
    def obj11(v):
        out = np.empty((1, 1), object)
        out[0, 0] = v
        return out

    gt = {
        "imnames": obj11(np.array(["8/pic_1.jpg"])),
        "wordBB": obj11(bb),
        "txt": obj11(np.array(["he!llo  world\n"])),
    }
    savemat(tmp_path / "gt.mat", gt)

    n = crop_synthtext(str(tmp_path / "gt.mat"), str(tmp_path / "st"), str(tmp_path / "out"))
    assert n == 2
    crops = sorted(os.listdir(tmp_path / "out" / "syntxt_crop" / "8"))
    assert crops == ["8_pic_1_0_hello.jpg", "8_pic_1_1_world.jpg"]  # punctuation stripped
    c0 = cv2.imread(str(tmp_path / "out" / "syntxt_crop" / "8" / crops[0]))
    assert c0.shape == (24, 36, 3)  # y 6..30, x 4..40
    lines = [json.loads(l) for l in open(tmp_path / "out" / "syntxt_crop.odgt")]
    assert [l["label"] for l in lines] == ["he!llo", "world"]  # manifest keeps raw label

    assert split_words(["a b", "c\nd"]) == ["a", "b", "c", "d"]
    assert word_rects(np.ones((2, 4)) * 3.2)[0] == (3, 3, 4, 4)


def test_folder_pair_dataset(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    from dpmn_tpu.data.folder_pairs import FolderPairDataset, sp_noise

    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray((rng.rand(80, 120, 3) * 255).astype(np.uint8)).save(tmp_path / f"im{i}.jpg")
    (tmp_path / "notes.txt").write_text("skip me")

    ds = FolderPairDataset(str(tmp_path), img_h=64, img_w=64, down_sample_scale=2, seed=0)
    assert len(ds) == 3
    lr, hr = ds[0]
    assert hr.shape == (64, 64, 3) and lr.shape == (32, 32, 3)
    assert -1.0 <= hr.min() and hr.max() <= 1.0
    # sp noise at 0.5 saturates half the pixels to the extremes
    assert ((lr == -1.0) | (lr == 1.0)).mean() > 0.3

    batches = list(ds.batches(2))
    assert len(batches) == 1 and batches[0][0].shape == (2, 32, 32, 3)

    noisy = sp_noise(np.full((100, 100, 3), 128, np.uint8), 0.25, np.random.RandomState(0))
    frac0 = (noisy == 0).all(-1).mean()
    assert 0.2 < frac0 < 0.3
