"""Mini end-to-end training run on synthetic data: 2 steps + eval + test CSV."""

import csv
import os

import jax

from dpmn_tpu.config import Args, TrainCfg
from dpmn_tpu.train import Trainer


def make_trainer(tmp_path, rec="crnn"):
    cfg = TrainCfg(
        batch_size=2,
        width=128,
        height=32,
        epochs=1,
        ckpt_dir=str(tmp_path / "ckpt"),
        valInterval=2,
        saveInterval=2,
        displayInterval=1,
    )
    args = Args(
        arch="tsrn",
        rec=rec,
        mask=True,
        synthetic_data=True,
        stu_iter_b1=1,
        stu_iter_b2=1,
        patch_size="2,",
        embed_dim="24,",
        window_size="2,4,8,",
        num_heads="6,",
        srb=1,
        hd_u=4,
        batch_size=2,
    )
    return Trainer(cfg, args, glyph_mode="zeros")


def test_train_eval_checkpoint_cycle(tmp_path):
    trainer = make_trainer(tmp_path)
    state = trainer.train(max_iters=2, max_batches_eval=1)
    assert int(state["step"]) == 2
    ckpt_dir = trainer.cfg.ckpt_dir
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "log.csv"))
    rows = list(csv.reader(open(os.path.join(ckpt_dir, "log.csv"))))
    assert rows[0] == ["epoch", "dataset", "accuracy", "psnr_avg", "ssim_avg", "best", "best_sum"]
    assert len(rows) >= 2

    # checkpoint roundtrip
    from dpmn_tpu.checkpoint import load_checkpoint

    restored, info = load_checkpoint(os.path.join(ckpt_dir, "checkpoint.msgpack"), target=jax.device_get(state))
    assert "iters" in info

    # test() writes the CSV contract
    result = trainer.test(state, max_batches=1)
    rows = list(csv.reader(open(os.path.join(ckpt_dir, "test_result.csv"))))
    assert rows[0] == ["recognizer", "subset", "accuracy", "psnr", "ssim"]
    assert len(rows) == 2
    assert 0.0 <= result["psnr_avg"]


def test_eval_with_aster_recognizer(tmp_path):
    """Eval path with the ASTER beam-search judge (reference --rec aster)."""
    trainer = make_trainer(tmp_path, rec="aster")
    state = trainer.system.init_state(jax.random.PRNGKey(0), batch_size=2)
    name, loader = trainer.get_val_loaders()[0]
    md = trainer.evaluate(state, loader, max_batches=1)
    assert 0.0 <= md["accuracy"] <= 1.0
    assert md["images"] == 2
