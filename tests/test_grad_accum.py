"""Gradient accumulation: the single-chip route to the reference's shipped
batch 1024 (config/super_resolution.yaml:9).

Spec: make_accum_train_step(a) == average the microbatch gradients of `a`
sequential _micro_grads calls (batch_stats threaded through), then ONE Adam
update with per-module clipping on the averaged grads — the exact place the
reference clips its big-batch grads (interfaces/super_resolution.py:272-277).

Big-batch equivalence is exact except through BatchNorm (distill/CMM
normalize per microbatch) and per-microbatch dropout streams — the same
deviation torch gradient accumulation has; gated here with a loose
tolerance and dropout off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_system import tiny_system


def _batch(b, seed=0):
    r = np.random.RandomState(seed)
    hr = jnp.asarray(r.rand(b, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(r.rand(b, 16, 64, 4), jnp.float32)
    return hr, lr


def test_accum_matches_sequential_microbatch_oracle():
    """accum(a=2) == python-loop oracle over _micro_grads + one update."""
    system = tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    hr, lr = _batch(4)
    rng = jax.random.PRNGKey(3)

    accum_step = system.make_accum_train_step(2)
    new_state, metrics = accum_step(state, hr, lr, rng)

    # oracle: two sequential microbatches, averaged grads, one update
    frozen, lr_c = system._amp_frozen_cast(state, lr)
    rngs = jax.random.split(rng, 2)
    bs = state["batch_stats"]
    losses, grads = [], []
    for i in range(2):
        l, g, bs = system._micro_grads(
            state["params"], bs, frozen, hr[i * 2 : (i + 1) * 2], lr_c[i * 2 : (i + 1) * 2], rngs[i]
        )
        losses.append(l)
        grads.append(g)
    g_avg = jax.tree_util.tree_map(lambda x, y: (x + y) * 0.5, *grads)
    ref_state, ref_metrics = system._apply_update(state, g_avg, bs, (losses[0] + losses[1]) * 0.5)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6
    )
    # grad_norm is the discriminating check for the AVERAGE: Adam's update
    # is scale-invariant (m_hat/sqrt(v_hat)), so a sum-instead-of-mean bug
    # would be invisible in the params — but not in the raw global norm.
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
    )
    # params: the scan-traced graph and the loop-traced oracle fuse
    # differently, so grads agree only to f32 reduction noise; Adam's first
    # step is ~lr*sign(g), which flips noise-level gradient entries all the
    # way (|diff| up to 2*lr).  Allow isolated sign flips, bound the mass.
    n_tot = n_bad = 0
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_state["params"]),
        jax.tree_util.tree_leaves_with_path(ref_state["params"]),
    ):
        assert ka == kb
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 2.5e-3, (str(ka), d.max())  # <= one full sign flip
        n_tot += d.size
        n_bad += int((d > 2e-4).sum())
    assert n_bad / n_tot < 5e-3, (n_bad, n_tot)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state["batch_stats"]),
        jax.tree_util.tree_leaves(ref_state["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_accum_close_to_big_batch():
    """Dropout off: the AVERAGED microbatch gradient tracks the one-big-batch
    gradient up to the BatchNorm microbatch-normalization deviation (the same
    deviation torch gradient accumulation has).  Raw gradients, not post-Adam
    updates: Adam's first step is ~sign(g), so noise-level gradient entries
    flip freely and would wash out the comparison."""
    kw = dict(drop_rate="0,", attn_drop_rate="0,", drop_path_rate="0,")
    system = tiny_system(**kw)
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    hr, lr = _batch(4, seed=1)
    rng = jax.random.PRNGKey(4)

    frozen, lr_c = system._amp_frozen_cast(state, lr)
    big_loss, big_g, _ = system._micro_grads(
        state["params"], state["batch_stats"], frozen, hr, lr_c, rng
    )
    rngs = jax.random.split(rng, 2)
    bs = state["batch_stats"]
    losses, grads = [], []
    for i in range(2):
        l, g, bs = system._micro_grads(
            state["params"], bs, frozen, hr[i * 2 : (i + 1) * 2], lr_c[i * 2 : (i + 1) * 2], rngs[i]
        )
        losses.append(float(l))
        grads.append(g)
    g_avg = jax.tree_util.tree_map(lambda x, y: (x + y) * 0.5, *grads)

    lb, la = float(big_loss), (losses[0] + losses[1]) / 2
    assert abs(la - lb) / abs(lb) < 0.05, (la, lb)
    db = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(big_g)])
    da = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(g_avg)])
    cos = float(jnp.vdot(da, db) / (jnp.linalg.norm(da) * jnp.linalg.norm(db) + 1e-12))
    assert cos > 0.95, cos
    # magnitudes agree too (BN is the only systematic deviation)
    ratio = float(jnp.linalg.norm(da) / (jnp.linalg.norm(db) + 1e-12))
    assert 0.8 < ratio < 1.25, ratio


def test_trainer_grad_accum_smoke():
    """--grad_accum wiring: a Trainer with grad_accum=2 runs train steps."""
    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.train import Trainer

    cfg = TrainCfg(batch_size=4, width=128, height=32, epochs=1, workers=0,
                   displayInterval=1, valInterval=10**9, saveInterval=10**9)
    args = Args(
        arch="tsrn", mask=True, stu_iter_b1=1, stu_iter_b2=1,
        patch_size="2,", embed_dim="24,", window_size="2,4,8,", depths="1,",
        num_heads="6,", srb=1, hd_u=4, synthetic_data=True, grad_accum=2,
        batch_size=4,
    )
    tr = Trainer(cfg, args, glyph_mode="zeros")
    state = tr.system.init_state(jax.random.PRNGKey(0), batch_size=2)
    hr, lr = _batch(4, seed=2)
    new_state, m = tr.system.train_step(state, hr, lr, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))
    assert int(new_state["step"]) == 1


@pytest.mark.slow
def test_accum_sharded_matches_single_device():
    """accum(a=2) over an 8-device data mesh == the single-device accum step
    (same microbatch partition; the mesh only changes reduce order)."""
    import jax

    from dpmn_tpu.parallel import make_mesh

    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    system = tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    hr, lr = _batch(16, seed=3)
    rng = jax.random.PRNGKey(6)

    s1, m1 = system.make_accum_train_step(2)(state, hr, lr, rng)
    mesh = make_mesh(8)
    s8, m8 = system.make_accum_train_step(2, mesh=mesh)(state, hr, lr, rng)

    l1, l8 = float(m1["loss"]), float(m8["loss"])
    assert abs(l1 - l8) / max(abs(l1), 1e-9) < 1e-4, (l1, l8)
    p1 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(s1["params"]))])
    p8 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(s8["params"]))])
    diff = np.abs(p1 - p8)
    assert np.mean(diff) < 5e-5, np.mean(diff)
    assert np.percentile(diff, 99) < 1e-3  # < one Adam step (lr=1e-3)


def test_accum_divisibility_guard():
    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.train import Trainer

    cfg = TrainCfg(batch_size=5, width=128, height=32)
    args = Args(arch="tsrn", mask=True, grad_accum=2, batch_size=5,
                patch_size="2,", embed_dim="24,", window_size="2,4,8,",
                depths="1,", num_heads="6,", srb=1, hd_u=4)
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg, args, glyph_mode="zeros")
