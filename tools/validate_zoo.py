#!/usr/bin/env python
"""Real-artifact validation harness: published .pth zoo + TextZoom LMDBs →
reference-vs-repo PSNR/SSIM/accuracy table (one command, VERDICT r3 #4).

  python tools/validate_zoo.py --zoo_dir /path/to/zoo \\
      --textzoom_dir /path/to/TextZoom/test \\
      [--arch tatt --rec crnn --b1 3 --b2 3 --subsets easy,medium,hard] \\
      [--batch 16 --max_batches N] [--skip-reference] [--out table.json]

Zoo directory layout (the reference's own artifact names,
interfaces/base.py:163-197,375-478 + super_resolution.py:528-586):

  model_{arch}.pth             frozen PSN            (base.py:168)
  model_best_{i}.pth           PGRM i, test weights  (super_resolution.py:556-568)
  model_best_cmm.pth           CMM                   (super_resolution.py:570-586)
  recognizer_best_crnn.pth     crnn_psn text prior   (tatt/tpgsr only, :550-554)
  rec/recognizer_best_{k}.pth  per-iteration student TPGs (:528-543); when the
                               rec/ dir is absent every student initializes
                               from visionlan_LA.pth (base.py:452-471)
  crnn.pth | moran.pth | aster.pth.tar   --rec judge checkpoints (base.py:375-439)
  visionlan_LA.pth             pretrained LA VisionLAN

Both stacks read the SAME LMDBs in the same order; the repo side loads every
artifact through the production path (Trainer.load_test_state →
dpmn_tpu/weights.py); the reference side runs /root/reference's own
TextSR.eval verbatim (torch CPU) via the tests/reference_bridge stubs.
Pass thresholds (BASELINE.md): |ΔPSNR| ≤ 0.01 dB, |ΔSSIM| ≤ 0.001,
accuracy equal.  The harness itself is proven on synthetic stand-in .pth
files by tests/test_validate_zoo.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

PSNR_TOL = 0.01
SSIM_TOL = 0.001


def _hparam_args(ns):
    return dict(
        arch=ns.arch, rec=ns.rec, tpg=ns.tpg, mask=True, gradient=True,
        stu_iter_b1=ns.b1, stu_iter_b2=ns.b2, srb=ns.srb, hd_u=ns.hd_u,
        alpha=ns.alpha, window_num=ns.window_num,
        patch_size=ns.patch_size, embed_dim=ns.embed_dim,
        window_size=ns.window_size, depths=ns.depths, num_heads=ns.num_heads,
        mlp_ratio=ns.mlp_ratio, drop_rate=ns.drop_rate,
        attn_drop_rate=ns.attn_drop_rate, drop_path_rate=ns.drop_path_rate,
    )


def _zoo_paths(zoo):
    return {
        "crnn": os.path.join(zoo, "crnn.pth"),
        "moran": os.path.join(zoo, "moran.pth"),
        "aster": os.path.join(zoo, "aster.pth.tar"),
        "visionlan": os.path.join(zoo, "visionlan_LA.pth"),
        "rec_dir": os.path.join(zoo, "rec"),
    }


def run_repo(ns, subset_dirs):
    """Our stack through the PRODUCTION loading path (cli --test semantics)."""
    import jax

    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.data import AlignCollate, DataLoader, TextZoomLMDB
    from dpmn_tpu.train import Trainer

    zp = _zoo_paths(ns.zoo_dir)
    cfg = TrainCfg(
        batch_size=ns.batch, width=128, height=32, voc_type="all", max_len=100,
        ckpt_dir=os.path.join(ns.zoo_dir, "_validate_ckpt"),
        crnn_pretrained=zp["crnn"] if os.path.exists(zp["crnn"]) else "",
        moran_pretrained=zp["moran"] if os.path.exists(zp["moran"]) else "",
        rec_pretrained=zp["aster"] if os.path.exists(zp["aster"]) else "",
        visionlan_pretrained=zp["visionlan"] if os.path.exists(zp["visionlan"]) else "",
    )
    args = Args(
        resume=ns.zoo_dir, font_path=ns.font_path,
        rec_path=zp["rec_dir"] if os.path.isdir(zp["rec_dir"]) else None,
        **_hparam_args(ns),
    )
    trainer = Trainer(cfg, args, glyph_mode=ns.glyph_mode or None)
    state = trainer.load_test_state()

    results = {}
    for name, root in subset_dirs:
        ds = TextZoomLMDB(root, voc_type="all", max_len=100, test=True)
        col = AlignCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True,
                           train=False, e_substitution=True)
        loader = DataLoader(ds, ns.batch, col, shuffle=False, drop_last=False)
        t0 = time.time()
        md = trainer.evaluate(state, loader, max_batches=ns.max_batches or None,
                              test_mode=True)
        md["wall_s"] = round(time.time() - t0, 1)
        results[name] = md
    return results


def run_reference(ns, subset_dirs):
    """The ACTUAL reference TextSR.eval (torch CPU) on the same artifacts."""
    import torch

    from reference_bridge import AttrDict, import_reference

    sr_mod = import_reference()
    import pygame
    from pygame import freetype

    pygame.init()
    freetype.init()

    zp = _zoo_paths(ns.zoo_dir)
    config = AttrDict({
        "TRAIN": {
            "down_sample_scale": 2, "batch_size": ns.batch, "voc_type": "all",
            "max_len": 100, "ngpu": 1, "resume": "", "width": 128, "height": 32,
            "VAL": {"vis_dir": os.path.join(ns.zoo_dir, "_ref_vis"),
                    "rec_pretrained": zp["aster"],
                    "moran_pretrained": zp["moran"],
                    "crnn_pretrained": zp["crnn"]},
        },
        "TEST": {"test_data_dir": "unused"},
    })
    ref_args = argparse.Namespace(
        test=False, test_data_dir="unused", batch_size=ns.batch,
        resume=ns.zoo_dir, vis_dir=config.TRAIN.VAL.vis_dir, STN=False,
        rotate_train=0.0, rotate_test=False, font_path=ns.font_path,
        rec_path=zp["rec_dir"], sr_share=False, **_hparam_args(ns),
    )
    os.makedirs(config.TRAIN.VAL.vis_dir, exist_ok=True)
    mission = sr_mod.TextSR(config, ref_args)
    mission.tripple_display = lambda *a, **k: None  # vis only

    b1, b2 = ns.b1, ns.b2
    # PGRMs + PSN through the reference's own factory/loader (testing=True
    # loads model_best_{i}.pth from the resume dir, base.py:163-197)
    models = []
    for k in range(b1 + b2):
        mode = False if k < b1 else True
        m = mission.generator_init(iter=k, mode=mode, hidden_size=3, testing=True)["model"]
        models.append(m.eval())
    psn = mission.generator_init(0, psn=True)["model"].eval()
    cmm = sr_mod.ComplementationModulationModule().eval()
    ck = torch.load(os.path.join(ns.zoo_dir, "model_best_cmm.pth"), map_location="cpu")
    sd = ck.get("state_dict_G", ck)
    cmm.load_state_dict({k.replace("module.", "", 1): v for k, v in sd.items()})

    # --rec judge (base.py:375-439)
    aster_info = None
    if ns.rec == "moran":
        rec = mission.MORAN_init(path=zp["moran"])
    elif ns.rec == "aster":
        rec, aster_info = mission.Aster_init(path=zp["aster"])
    else:
        rec = mission.CRNN_init(path=zp["crnn"])
    rec = rec.eval()

    # student TPGs (super_resolution.py:528-543 / base.py:452-471)
    students = []
    for k in range(b1):
        cand = os.path.join(zp["rec_dir"], f"recognizer_best_{k}.pth")
        s = sr_mod.cfgs.net_cfgs["VisualLAN"](**sr_mod.cfgs.net_cfgs["args"]).eval()
        src = cand if os.path.exists(cand) else zp["visionlan"]
        ssd = torch.load(src, map_location="cpu")
        ssd = ssd.get("state_dict_G", ssd)
        s.load_state_dict({k2.replace("module.", "", 1): v for k2, v in ssd.items()})
        students.append(s)

    crnn_psn = None
    cand = os.path.join(ns.zoo_dir, "recognizer_best_crnn.pth")
    if ns.arch in ("tpgsr", "tatt") and os.path.exists(cand):
        crnn_psn = sr_mod.base.crnn.CRNN(32, 1, 37, 256).eval()
        crnn_psn.load_state_dict(torch.load(cand, map_location="cpu"))

    results = {}
    for name, root in subset_dirs:
        ds = sr_mod.base.dataset.lmdbDataset_real(root=root, voc_type="all",
                                                  max_len=100, test=True)
        collate = sr_mod.base.alignCollate_realWTL(imgH=32, imgW=128,
                                                   down_sample_scale=2, mask=True)
        loader = torch.utils.data.DataLoader(
            ds, batch_size=ns.batch, shuffle=False, num_workers=0,
            collate_fn=collate, drop_last=False,
        )
        t0 = time.time()
        with torch.no_grad():
            md = mission.eval(model_list=models + [cmm], val_loader=loader,
                              index=0, rec=rec, aster_info=aster_info,
                              rec_list=students, model_psn=psn, crnn_psn=crnn_psn)
        md = {k: float(v) for k, v in md.items() if k in ("accuracy", "psnr_avg", "ssim_avg")}
        md["wall_s"] = round(time.time() - t0, 1)
        results[name] = md
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--zoo_dir", required=True)
    ap.add_argument("--textzoom_dir", required=True,
                    help="dir containing the subset LMDBs (easy/ medium/ hard/)")
    ap.add_argument("--subsets", default="easy,medium,hard")
    ap.add_argument("--arch", default="tatt")
    ap.add_argument("--rec", default="crnn", choices=["aster", "moran", "crnn"])
    ap.add_argument("--tpg", default="visionlan")
    ap.add_argument("--b1", type=int, default=3)
    ap.add_argument("--b2", type=int, default=3)
    ap.add_argument("--srb", type=int, default=5)
    ap.add_argument("--hd_u", type=int, default=32)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--window_num", type=int, default=3)
    ap.add_argument("--patch_size", default="2,2,2,2,2,2,")
    ap.add_argument("--embed_dim", default="96,96,96,96,96,96,")
    ap.add_argument("--window_size", default="2,4,8," * 6)
    ap.add_argument("--depths", default="1,1,1,1,1,1,")
    ap.add_argument("--num_heads", default="6,6,6,6,6,6,")
    ap.add_argument("--mlp_ratio", default="4,4,4,4,4,4,")
    ap.add_argument("--drop_rate", default="0,0,0,0,0,0,")
    ap.add_argument("--attn_drop_rate", default="0,0,0,0,0,0,")
    ap.add_argument("--drop_path_rate", default="0.1,0.1,0.1,0.1,0.1,0.1,")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max_batches", type=int, default=0)
    ap.add_argument("--font_path", default="/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    ap.add_argument("--glyph_mode", default="",
                    help="override glyph mode (default: atlas on TPU, callback elsewhere)")
    ap.add_argument("--skip-reference", action="store_true",
                    help="repo side only (no torch/reference run)")
    ap.add_argument("--out", default="")
    ns = ap.parse_args(argv)

    subset_dirs = []
    for s in ns.subsets.split(","):
        s = s.strip()
        if not s:
            continue
        root = os.path.join(ns.textzoom_dir, s)
        if not os.path.isdir(root):
            root = ns.textzoom_dir if len(ns.subsets.split(",")) == 1 else root
        subset_dirs.append((s, root))

    ours = run_repo(ns, subset_dirs)
    theirs = None if ns.skip_reference else run_reference(ns, subset_dirs)

    rows, ok = [], True
    hdr = f"{'subset':8s} {'impl':6s} {'acc':>8s} {'psnr':>8s} {'ssim':>8s} {'wall_s':>8s}"
    print(hdr)
    print("-" * len(hdr))
    for name, _ in subset_dirs:
        o = ours[name]
        print(f"{name:8s} {'repo':6s} {o['accuracy']:8.4f} {o['psnr_avg']:8.4f} "
              f"{o['ssim_avg']:8.4f} {o['wall_s']:8.1f}")
        row = {"subset": name, "repo": {k: o[k] for k in ("accuracy", "psnr_avg", "ssim_avg")}}
        if theirs is not None:
            r = theirs[name]
            print(f"{'':8s} {'ref':6s} {r['accuracy']:8.4f} {r['psnr_avg']:8.4f} "
                  f"{r['ssim_avg']:8.4f} {r['wall_s']:8.1f}")
            d_acc = o["accuracy"] - r["accuracy"]
            d_psnr = o["psnr_avg"] - r["psnr_avg"]
            d_ssim = o["ssim_avg"] - r["ssim_avg"]
            passed = (abs(d_psnr) <= PSNR_TOL and abs(d_ssim) <= SSIM_TOL and d_acc == 0.0)
            ok &= passed
            print(f"{'':8s} {'Δ':6s} {d_acc:8.4f} {d_psnr:8.4f} {d_ssim:8.4f} "
                  f"{'PASS' if passed else 'FAIL':>8s}")
            row["reference"] = {k: r[k] for k in ("accuracy", "psnr_avg", "ssim_avg")}
            row["delta"] = {"accuracy": d_acc, "psnr": d_psnr, "ssim": d_ssim}
            row["pass"] = passed
        rows.append(row)
    out = {"rows": rows, "thresholds": {"psnr": PSNR_TOL, "ssim": SSIM_TOL, "accuracy": 0.0},
           "all_pass": ok if theirs is not None else None}
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"-> {ns.out}")
    return out


if __name__ == "__main__":
    res = main()
    if res["all_pass"] is False:
        sys.exit(1)
