"""Prove the real-artifact validation harness (tools/validate_zoo.py) with
synthetic stand-in .pth files: random-weight torch artifacts saved under the
reference's published names, a tiny synthetic TextZoom LMDB, then ONE
validate_zoo.main() call running BOTH stacks end to end — the repo side
through the production loading path, the reference side through the actual
/root/reference TextSR.eval.  all_pass=True means the harness is ready for
the real zoo (artifacts absent in this environment — ROADMAP.md)."""

import os
import sys

import numpy as np
import pytest
import torch

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
B1, B2 = 2, 2
SRB, HD_U = 2, 8
WORDS = ["hello", "world", "text12", "zoom", "res", "abc"]

HPARAMS = dict(
    patch_size="2,2,2,2,",
    embed_dim="24,24,24,24,",
    window_size="2,4,8," * 4,
    depths="1,1,1,1,",
    num_heads="6,6,6,6,",
    mlp_ratio="4,4,4,4,",
    drop_rate="0,0,0,0,",
    attn_drop_rate="0,0,0,0,",
    drop_path_rate="0.1,0.1,0.1,0.1,",
)


@pytest.fixture(scope="module")
def zoo_and_data(tmp_path_factory):
    """Random-weight reference-built artifacts under the published names +
    a tiny LMDB laid out like TextZoom/test."""
    from reference_bridge import AttrDict, import_reference

    from dpmn_tpu.data.lmdb_writer import create_textzoom_lmdb

    sr_mod = import_reference()

    tz = tmp_path_factory.mktemp("textzoom_test")
    easy = str(tz / "easy")
    os.makedirs(easy)
    rng = np.random.RandomState(0)
    samples = []
    for w in WORDS:
        hr = (rng.rand(40, 120, 3) * 255).astype(np.uint8)
        lr = (rng.rand(20, 60, 3) * 255).astype(np.uint8)
        samples.append((hr, lr, w))
    create_textzoom_lmdb(easy, samples)

    zoo = tmp_path_factory.mktemp("zoo")
    torch.manual_seed(11)
    import argparse

    args = argparse.Namespace(
        arch="tsrn", test=False, test_data_dir="unused", batch_size=4, resume="",
        vis_dir=str(zoo / "_vis"), rec="crnn", mask=True, gradient=True,
        hd_u=HD_U, srb=SRB, STN=False, rotate_train=0.0, rotate_test=False,
        stu_iter_b1=B1, stu_iter_b2=B2, tpg="visionlan", rec_path="",
        font_path=FONT, sr_share=False, alpha=0.7, window_num=3, **HPARAMS,
    )
    config = AttrDict({
        "TRAIN": {
            "down_sample_scale": 2, "batch_size": 4, "voc_type": "all",
            "max_len": 100, "ngpu": 1, "resume": "", "width": 128, "height": 32,
            "VAL": {"vis_dir": str(zoo / "_vis")},
        },
        "TEST": {"test_data_dir": "unused"},
    })
    mission = sr_mod.TextSR(config, args)
    for k in range(B1 + B2):
        mode = False if k < B1 else True
        m = mission.generator_init(iter=k, mode=mode, hidden_size=3)["model"]
        torch.save({"state_dict_G": m.state_dict()}, zoo / f"model_best_{k}.pth")
    psn = mission.generator_init(0, psn=True)["model"]
    torch.save({"state_dict_G": psn.state_dict()}, zoo / "model_tsrn.pth")
    cmm = sr_mod.ComplementationModulationModule()
    torch.save({"state_dict_G": cmm.state_dict()}, zoo / "model_best_cmm.pth")
    rec = sr_mod.base.crnn.CRNN(32, 1, 37, 256)
    torch.save(rec.state_dict(), zoo / "crnn.pth")
    os.makedirs(zoo / "rec")
    for k in range(B1):
        s = sr_mod.cfgs.net_cfgs["VisualLAN"](**sr_mod.cfgs.net_cfgs["args"])
        torch.save(s.state_dict(), zoo / "rec" / f"recognizer_best_{k}.pth")
    return str(zoo), str(tz)


def test_validate_zoo_harness_end_to_end(zoo_and_data):
    zoo, tz = zoo_and_data
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import validate_zoo

    out = validate_zoo.main([
        "--zoo_dir", zoo, "--textzoom_dir", tz, "--subsets", "easy",
        "--arch", "tsrn", "--rec", "crnn", "--b1", str(B1), "--b2", str(B2),
        "--srb", str(SRB), "--hd_u", str(HD_U), "--alpha", "0.7",
        "--batch", "4", "--font_path", FONT, "--glyph_mode", "callback",
        "--patch_size", HPARAMS["patch_size"],
        "--embed_dim", HPARAMS["embed_dim"],
        "--window_size", HPARAMS["window_size"],
        "--depths", HPARAMS["depths"],
        "--num_heads", HPARAMS["num_heads"],
        "--mlp_ratio", HPARAMS["mlp_ratio"],
        "--drop_rate", HPARAMS["drop_rate"],
        "--attn_drop_rate", HPARAMS["attn_drop_rate"],
        "--drop_path_rate", HPARAMS["drop_path_rate"],
    ])
    assert out["all_pass"] is True, out
