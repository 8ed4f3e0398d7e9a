#!/usr/bin/env python
"""Measured torch-reference anchor for bench.py (VERDICT r1 item 6).

Runs the ACTUAL reference eval pipeline (/root/reference, torch CPU, random
weights — the published checkpoints are not in this environment) on
synthetic TextZoom-shaped data with the flagship configuration (TATT PSN +
3+3 PGRM cascade + VisionLAN students + CMM), timing images/sec, and writes
BASELINE_MEASURED.json at the repo root for bench.py to report alongside
the TPU number.

This is a HOST-CPU measurement (no GPU exists here): it anchors the
reference's per-sample host-loop cost (super_resolution.py:389-406) on this
machine, not a V100 number.  bench.py labels it accordingly.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

BATCH = int(os.environ.get("TORCH_ANCHOR_BATCH", "2"))
N_BATCHES = int(os.environ.get("TORCH_ANCHOR_BATCHES", "2"))
FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

HPARAMS = dict(
    patch_size="2,2,2,2,2,2,",
    embed_dim="96,96,96,96,96,96,",
    window_size="2,4,8," * 6,
    depths="1,1,1,1,1,1,",
    num_heads="6,6,6,6,6,6,",
    mlp_ratio="4,4,4,4,4,4,",
    drop_rate="0.1," * 6,
    attn_drop_rate="0.1," * 6,
    drop_path_rate="0.1," * 6,
)


def main():
    import argparse

    import torch

    from reference_bridge import AttrDict, import_reference

    sr_mod = import_reference()
    import pygame
    from pygame import freetype

    pygame.init()
    freetype.init()

    args = argparse.Namespace(
        arch="tatt", test=False, test_data_dir="unused", batch_size=BATCH, resume="",
        vis_dir="/tmp/ref_anchor_vis", rec="crnn", mask=True, gradient=True, hd_u=32,
        srb=5, STN=False, rotate_train=0.0, rotate_test=False, stu_iter_b1=3,
        stu_iter_b2=3, tpg="visionlan", rec_path="", font_path=FONT, sr_share=False,
        alpha=0.5, window_num=3, **HPARAMS,
    )
    config = AttrDict(
        {
            "TRAIN": {
                "down_sample_scale": 2, "batch_size": BATCH, "voc_type": "all",
                "max_len": 100, "ngpu": 1, "resume": "", "width": 128, "height": 32,
                "VAL": {"vis_dir": "/tmp/ref_anchor_vis"},
            },
            "TEST": {"test_data_dir": "unused"},
        }
    )
    torch.manual_seed(0)
    mission = sr_mod.TextSR(config, args)
    mission.tripple_display = lambda *a, **k: None

    models = []
    for k in range(6):
        mode = False if k < 3 else True
        models.append(mission.generator_init(iter=k, mode=mode, hidden_size=3)["model"].eval())
    cmm = sr_mod.ComplementationModulationModule().eval()
    psn = mission.generator_init(0, psn=True)["model"].eval()
    rec = sr_mod.base.crnn.CRNN(32, 1, 37, 256).eval()
    crnn_psn = sr_mod.base.crnn.CRNN(32, 1, 37, 256).eval()
    students = [
        sr_mod.cfgs.net_cfgs["VisualLAN"](**sr_mod.cfgs.net_cfgs["args"]).eval()
        for _ in range(3)
    ]

    rng = np.random.RandomState(0)

    class _SyntheticLoader:
        def __iter__(self):
            import torch as t

            for _ in range(N_BATCHES):
                hr = t.from_numpy(rng.rand(BATCH, 4, 32, 128).astype(np.float32))
                lr = t.from_numpy(rng.rand(BATCH, 4, 16, 64).astype(np.float32))
                yield hr, lr, None, None, ["hello"] * BATCH, None

    import torch as t

    with t.no_grad():
        # one warmup batch (thread pools, conv algo selection)
        warm = _SyntheticLoader()
        warm_iter = iter(warm)

        t0 = time.time()
        md = mission.eval(
            model_list=models + [cmm], val_loader=_SyntheticLoader(), index=0,
            rec=rec, aster_info=None, rec_list=students, model_psn=psn,
            crnn_psn=crnn_psn,
        )
        dt = time.time() - t0

    n_imgs = BATCH * N_BATCHES
    out = {
        "torch_reference_imgs_per_sec": round(n_imgs / dt, 4),
        "images": n_imgs,
        "seconds": round(dt, 2),
        "device": "host CPU (no GPU in this environment)",
        "config": "tatt + DPMN 3+3, batch %d, random weights" % BATCH,
        "psnr_avg": md.get("psnr_avg"),
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
