"""Round-trip tests for the corpus readers/packers (create_lmdb.py +
voc_data.py parity, VERDICT r1 item 9)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dpmn_tpu.data import corpus_readers as cr
from dpmn_tpu.data.lmdb_reader import LMDBReader
from dpmn_tpu.data.scene_dataset import SceneLMDB


def _img(tmp_path, name, w, h, seed=0):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    path = str(tmp_path / name)
    Image.fromarray(arr).save(path)
    return path


def test_odgt_reader_filters_and_packs(tmp_path):
    big = _img(tmp_path, "big.jpg", 300, 70, 1)
    small = _img(tmp_path, "small.jpg", 100, 30, 2)
    odgt = tmp_path / "corpus.odgt"
    with open(odgt, "w") as f:
        for path, label in ((big, "bigword"), (small, "tiny"), (str(tmp_path / "gone.jpg"), "x")):
            f.write(json.dumps({"im_path": os.path.dirname(path), "im_name": os.path.basename(path), "label": label}) + "\n")

    pairs = cr.read_odgt(str(odgt))
    assert [l for _, l in pairs] == ["bigword"]  # size filter + missing-file skip

    out = str(tmp_path / "lmdb_odgt")
    _, n = cr.pack_recognition_lmdb(out, pairs)
    assert n == 1
    reader = LMDBReader(out)
    assert int(reader.get(b"num-samples")) == 1
    assert reader.get(b"label-%09d" % 1) == b"bigword"
    # consumable by the scene dataset (dataset_scene parity reader)
    ds = SceneLMDB([out], global_state="Test")
    sample = ds[0]
    assert sample["label"] == "bigword"
    assert sample["image"].shape == (64, 256, 3)
    # visualization variant (dataset_scene_vis.py): mask_id pins the
    # occluded character deterministically
    ds_vis = SceneLMDB([out], global_state="Test", mask_id=2)
    sv = ds_vis[0]
    assert sv["label_id"] == 2 and sv["label_sub"] == "bigword"[2]
    assert sv["label_res"] == "bi" + "word"


def test_mjsynth_walk(tmp_path):
    root = tmp_path / "90k"
    sub = root / "1" / "2"
    os.makedirs(sub)
    _img(sub, "1_hello_3.jpg", 120, 40, 3)
    _img(sub, "2_tiny_4.jpg", 50, 20, 4)  # below the w>=100/h>=31 filter
    pairs = cr.read_mjsynth(str(root))
    assert [l for _, l in pairs] == ["hello"]


def test_ic_router_fills_all_splits(tmp_path):
    imgs = {n: _img(tmp_path, f"{n}.jpg", 64, 32, i) for i, n in enumerate(["a", "b", "c", "d"])}
    odgt = tmp_path / "ic.odgt"
    rows = [
        ("a", "IC13", "train"), ("b", "IC13", "test"),
        ("c", "IC15", "train"), ("d", "IC15", "test"),
    ]
    with open(odgt, "w") as f:
        for name, ds_n, ds_t in rows:
            f.write(json.dumps({"img_path": f"x/{name}.jpg", "img_gt": name.upper(), "dataset": ds_n, "type": ds_t}) + "\n")
    splits = cr.read_ic_odgt(str(odgt), str(tmp_path))
    # unlike the reference's broken elif chain (create_lmdb.py:448-450),
    # IC15-test is populated
    assert all(len(v) == 1 for v in splits.values())
    assert splits[("IC15", "test")][0][1] == "D"


def test_gt_txt_and_voc_and_recrop(tmp_path):
    root = tmp_path / "svtp"
    os.makedirs(root)
    _img(root, "im1.jpg", 80, 32, 5)
    with open(root / "gt.txt", "w") as f:
        f.write("im1.jpg word1\r\n")
    pairs = cr.read_gt_txt(str(root))
    assert pairs == [(str(root / "im1.jpg"), "word1")]

    out = str(tmp_path / "rec_lmdb")
    cr.pack_recognition_lmdb(out, pairs)

    # recrop: recognition LMDB → TextZoom HR/LR LMDB readable by our reader
    tz = str(tmp_path / "tz_lmdb")
    cr.repack_crop_lmdb(out, tz, seed=0)
    reader = LMDBReader(tz)
    assert int(reader.get(b"num-samples")) == 1
    import io

    hr = Image.open(io.BytesIO(reader.get(b"image_hr-%09d" % 1)))
    lr = Image.open(io.BytesIO(reader.get(b"image_lr-%09d" % 1)))
    assert hr.size == (80, 32)
    assert lr.size[0] == int(0.95 * 80)  # the 0.95-scale crop (voc_data.py:26)

    # voc pairs: HR original + random-crop LR
    voc = cr.voc_hr_lr_pairs(str(root), seed=1)
    assert len(voc) == 1 and voc[0][2] == ""
    assert voc[0][1].size[0] == int(0.95 * 80)
