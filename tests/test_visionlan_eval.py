"""VisionLAN standalone benchmark-eval harness vs the reference torch flow.

Builds a synthetic scene LMDB ('image-%09d'/'label-%09d' keys) with our
writer, then runs
  * the reference eval flow (model/VisionLAN/eval.py:85-104 `test()`
    semantics: dataset_scene loader → VisionLAN(..., Train_in=False) →
    cha_encdec decode → Attention_AR_counter), restated here with the
    ACTUAL reference components on torch-CPU, and
  * our VisionLANEvaluator (dpmn_tpu/visionlan_eval.py) with the same
    weights through convert_visionlan,
and asserts the decoded strings and accuracy/AR/CER/WER all match.

NOTE two defects in the reference's standalone VisionLAN pipeline, both
worked around below to recover the INTENDED semantics (documented in
PARITY.md):
  1. dataset_scene.py:14 ships with its `from transforms import ...` line
     commented out, so constructing lmdbDataset NameErrors on CVGeometry.
     The oracle injects the classes from data/transforms.py.
  2. dataset_scene.py:113 does `label = str(txn.get(...))` — on python 3
     that stringifies the BYTES repr, so every label becomes e.g.
     "bhello" after the [^0-9a-zA-Z] filter (the fix is even present as a
     comment on the next line).  The oracle feeds the correctly-decoded
     labels to encode/add_iter instead; the model inputs are unaffected.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_bridge import import_reference_module

WORDS = ["hello", "WORLD", "a1b2", "scene", "text", "zoom!", "ocr", "deep"]


@pytest.fixture(scope="module")
def scene_lmdb(tmp_path_factory):
    import cv2

    from dpmn_tpu.data.lmdb_writer import write_lmdb

    root = str(tmp_path_factory.mktemp("scene") / "bench")
    rng = np.random.RandomState(0)
    records = {b"num-samples": str(len(WORDS)).encode()}
    for i, w in enumerate(WORDS, start=1):
        img = (rng.rand(48, 160, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 95])
        assert ok
        records[b"image-%09d" % i] = buf.tobytes()
        records[b"label-%09d" % i] = w.encode()
    os.makedirs(root)
    write_lmdb(root, records)
    return root


def test_visionlan_benchmark_eval_matches_reference(scene_lmdb):
    ds_mod = import_reference_module("model.VisionLAN.data.dataset_scene")
    tf_mod = import_reference_module("model.VisionLAN.data.transforms")
    utils_mod = import_reference_module("model.VisionLAN.utils")
    vl_mod = import_reference_module("model.VisionLAN.VisionLAN")

    # restore the commented-out transforms import (see module docstring)
    for name in ("CVGeometry", "CVDeterioration", "CVColorJitter"):
        setattr(ds_mod, name, getattr(tf_mod, name))

    from torchvision import transforms  # the bridge stub

    torch.manual_seed(11)
    model = vl_mod.VisionLAN(
        strides=[(1, 1), (2, 2), (2, 2), (2, 2), (1, 1), (1, 1)], input_shape=[3, 64, 256]
    ).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    ds = ds_mod.lmdbDataset(
        roots=[scene_lmdb], img_height=64, img_width=256,
        transform=transforms.Compose([transforms.ToTensor()]), global_state="Test",
    )
    dict_file = "/root/reference/dic_36.txt"
    encdec = utils_mod.cha_encdec(dict_file, case_sensitive=False)
    counter = utils_mod.Attention_AR_counter("ref", dict_file, case_sensitive=False)

    import re

    clean = [re.sub("[^0-9a-zA-Z]+", "", w) for w in WORDS]

    # eval.py:90-104 test() loop, batch size 4, sequential order
    ref_preds = []
    with torch.no_grad():
        for start in range(0, len(ds), 4):
            idxs = list(range(start, min(start + 4, len(ds))))
            batch = [ds[i] for i in idxs]
            data = torch.stack([b["image"] for b in batch])
            labels = [clean[i] for i in idxs]  # intended labels (see docstring #2)
            target = encdec.encode(labels)
            label_flatten, length = [], []
            for row in target:  # flatten_label (eval.py:17-25)
                cur = row.tolist()
                label_flatten += cur[: cur.index(0) + 1]
                length.append(cur.index(0) + 1)
            length = torch.IntTensor(length)
            output, out_length = model(data, target, "", False)
            preds, _ = counter.add_iter(output, out_length, length, list(labels))
            ref_preds.extend(preds)
    ref_metrics = {
        "accuracy": counter.correct / counter.total_samples,
        "CER": counter.distance_C / counter.total_C,
        "WER": counter.distance_W / counter.total_W,
    }

    # ---- ours
    from dpmn_tpu.convert import import_into
    from dpmn_tpu.convert_zoo import convert_visionlan
    from dpmn_tpu.models.visionlan import VisionLAN
    from dpmn_tpu.visionlan_eval import VisionLANEvaluator

    ours = VisionLAN()
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 256, 3)), train=False)
    variables = import_into(variables, convert_visionlan(sd, mlm=False))

    our_preds = []
    ev = VisionLANEvaluator(variables, batch_size=4)
    orig_decode = ev.decode_batch

    def recording_decode(logits, lengths):
        out = orig_decode(logits, lengths)
        our_preds.extend(s.lower() for s in out)
        return out

    ev.decode_batch = recording_decode
    md = ev.run_benchmark("synthetic", [scene_lmdb])

    assert our_preds == ref_preds, f"decode mismatch: {our_preds} vs {ref_preds}"
    assert md["accuracy"] == pytest.approx(ref_metrics["accuracy"])
    assert md["CER"] == pytest.approx(ref_metrics["CER"])
    assert md["WER"] == pytest.approx(ref_metrics["WER"])
