"""Trainer-level data parallelism: the mesh path the CLI actually reaches.

VERDICT r2 item 4 done-criterion: the same equivalence test_parallel.py
proves at the system level, but THROUGH the real driver — a Trainer built
with --data_parallel 8 (the reference's automatic DataParallel wrap,
base.py:161-162) must produce the same training trajectory and eval
metrics as the single-device Trainer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.config import Args, TrainCfg
from dpmn_tpu.train import Trainer


def make_trainer(tmp_path, tag, data_parallel):
    cfg = TrainCfg(
        batch_size=8, width=128, height=32, epochs=1,
        ckpt_dir=str(tmp_path / f"ckpt_{tag}"), valInterval=100, saveInterval=100,
        displayInterval=100,
    )
    args = Args(
        arch="tsrn", rec="crnn", mask=True, synthetic_data=True,
        stu_iter_b1=1, stu_iter_b2=1, patch_size="2,", embed_dim="24,",
        window_size="2,4,8,", num_heads="6,", srb=1, hd_u=4, batch_size=8,
        data_parallel=data_parallel,
    )
    return Trainer(cfg, args, glyph_mode="zeros")


@pytest.mark.slow
def test_trainer_mesh_matches_single_device(tmp_path):
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    t1 = make_trainer(tmp_path, "single", data_parallel=1)
    t8 = make_trainer(tmp_path, "mesh", data_parallel=8)
    assert t1.mesh is None and t8.mesh is not None

    s1 = t1.train(max_iters=2)
    s8 = t8.train(max_iters=2)
    assert int(s1["step"]) == int(s8["step"]) == 2

    # the joint loss after two identical batches must agree tightly (the
    # mesh step's all-reduce changes only the reduction order)
    l1 = float(t1._last_metrics["loss"])
    l8 = float(t8._last_metrics["loss"])
    assert abs(l1 - l8) / max(abs(l1), 1e-9) < 1e-4, (l1, l8)

    # param-wise: Adam with beta1=0.5 makes the first steps ~ ±lr*sign(g),
    # so elements whose gradient is numerical noise legitimately flip sign
    # between reduce orders — compare distributionally, not element-wise
    p1 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(s1["params"]))])
    p8 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(s8["params"]))])
    diff = np.abs(p1 - p8)
    assert np.mean(diff) < 5e-5, np.mean(diff)
    assert np.percentile(diff, 99) < 1e-3  # < one Adam step (lr=1e-3)

    # eval through the driver on the SAME weights: metrics agree exactly
    # (incl. the recognizer decode)
    name1, loader1 = t1.get_val_loaders()[0]
    _, loader8 = t8.get_val_loaders()[0]
    s1_on_mesh = t8._replicate(jax.device_get(s1))
    m1 = t1.evaluate(s1, loader1, max_batches=1)
    m8 = t8.evaluate(s1_on_mesh, loader8, max_batches=1)
    assert m1["accuracy"] == m8["accuracy"]
    assert abs(m1["psnr_avg"] - m8["psnr_avg"]) < 1e-2
    assert abs(m1["ssim_avg"] - m8["ssim_avg"]) < 1e-3

    # the padded partial-batch path slices back to the true rows
    lr5 = jnp.asarray(np.random.RandomState(0).rand(5, 16, 64, 4), jnp.float32)
    sr_single = np.asarray(t1._sr_forward(s1, lr5, False))
    sr_mesh = np.asarray(t8._sr_forward(t8._replicate(jax.device_get(s1)), lr5, False))
    assert sr_mesh.shape[0] == 5
    np.testing.assert_allclose(sr_single, sr_mesh, rtol=2e-4, atol=2e-5)


def test_trainer_batch_divisibility_guard(tmp_path):
    import pytest

    cfg = TrainCfg(batch_size=6, ckpt_dir=str(tmp_path / "c"))
    args = Args(synthetic_data=True, data_parallel=4, batch_size=6,
                patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
                srb=1, hd_u=4)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(cfg, args, glyph_mode="zeros")
