"""Prefetch iterator + bf16 fast-eval tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dpmn_tpu.data.prefetch import prefetch_to_device


def test_prefetch_yields_all_batches():
    batches = [(np.ones((2, 4), np.float32) * i, f"label{i}") for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, (arr, lab) in enumerate(out):
        assert float(arr[0, 0]) == i
        assert lab == f"label{i}"


def test_bf16_eval_close_to_f32():
    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.system import DPMNSystem

    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tsrn", mask=True, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(0).rand(2, 16, 64, 4), jnp.float32)
    a = np.asarray(system.sr_forward(state, lr))
    b = np.asarray(system.sr_forward_bf16(state, lr))
    assert b.dtype == np.float32
    assert np.isfinite(b).all()
    # bf16 drift stays small on [0,1]-scale images
    assert np.abs(a - b).mean() < 0.05


def test_bf16_test_mode_close_to_f32_test_mode():
    """The bf16 serving graph with the reference test() glyph semantics
    (glyph_from_psn=True, super_resolution.py:648 — one vmapped student
    stack) must track the fp32 test-mode output."""
    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.system import DPMNSystem

    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tsrn", mask=True, stu_iter_b1=2, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 64, 4), jnp.float32)
    a = np.asarray(system.sr_forward(state, lr, True))
    b = np.asarray(system.sr_forward_bf16(state, lr, True))
    assert b.dtype == np.float32
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 0.05


def test_bf16_state_cache_invalidates_on_new_state():
    """sr_forward_bf16 caches the host-cast bf16 state per state OBJECT; a
    different state (e.g. after a checkpoint reload) must invalidate it —
    a stale cache would silently serve the old weights."""
    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.system import DPMNSystem

    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch="tsrn", mask=True, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", num_heads="6,",
        srb=1, hd_u=4,
    )
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state_a = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    state_b = system.init_state(jax.random.PRNGKey(7), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(0).rand(2, 16, 64, 4), jnp.float32)

    out_a = np.asarray(system.sr_forward_bf16(state_a, lr))
    assert system._bf16_src is state_a
    cached = system._bf16_state
    # same object → cache reused, not re-cast
    system.sr_forward_bf16(state_a, lr)
    assert system._bf16_state is cached

    out_b = np.asarray(system.sr_forward_bf16(state_b, lr))
    assert system._bf16_src is state_b
    # different weights must actually reach the serving graph
    assert np.abs(out_a - out_b).mean() > 1e-4
