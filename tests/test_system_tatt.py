"""Flagship-shaped system smoke: TATT arch, dual 2+2 cascade, distill, CMM."""

import jax
import jax.numpy as jnp
import numpy as np

from dpmn_tpu.config import Args, TrainCfg
from dpmn_tpu.system import DPMNSystem
import pytest


@pytest.mark.slow
def test_tatt_system_2plus2_train_and_eval():
    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tatt",
        mask=True,
        gradient=True,
        stu_iter_b1=2,
        stu_iter_b2=2,
        patch_size="2,",
        embed_dim="24,",
        window_size="2,4,8,",
        num_heads="6,",
        srb=1,
        hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)

    # 2+2 cascade → 4 PGRMs + cmm + 2 distill modules; crnn text-prior PSN
    for k in ("pgrm_0", "pgrm_1", "pgrm_2", "pgrm_3", "cmm", "distill_0", "distill_1"):
        assert k in state["params"], k
    assert "crnn_psn" in state["frozen"]
    # graphic models carry prior_fusion, semantic don't
    assert "prior_fusion" in state["params"]["pgrm_0"]
    assert "prior_fusion" in state["params"]["pgrm_1"]
    assert "prior_fusion" not in state["params"]["pgrm_2"]
    # pgrm_k registers k+1 residual weights (ref pgrm.py:496-497)
    for k in range(4):
        assert f"weight_list_{k}" in state["params"][f"pgrm_{k}"]

    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(2, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(2, 16, 64, 4), jnp.float32)
    state2, m = system.train_step(state, hr, lr, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    sr = system.sr_forward(state2, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_sr_share_uses_single_model():
    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tsrn", mask=True, sr_share=True, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    # both branches pick model 0 (quirk): pgrm_1 exists but only pgrm_0 runs
    lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 64, 4), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)


def test_tpgsr_system_smoke():
    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tpgsr", mask=True, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    assert "crnn_psn" in state["frozen"]  # text-prior PSN needs the frozen CRNN
    lr = jnp.asarray(np.random.RandomState(2).rand(2, 16, 64, 4), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_tbsrn_system_smoke():
    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tbsrn", mask=False, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=32,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(3).rand(2, 16, 64, 3), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
