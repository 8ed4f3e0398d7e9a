"""Data-parallel mesh sharding parity: sharded steps must be semantically
invisible — same numbers as the single-device path (SURVEY §2 P1/P2).

Runs on the conftest-forced 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.parallel import (make_mesh, make_parallel_trainer,
                               replicate_state, shard_batch, shard_host_batch)

from test_system import tiny_system


@pytest.fixture(scope="module")
def parallel_setup():
    system = tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    mesh = make_mesh(8)
    train_step, sr_forward = make_parallel_trainer(system, mesh)
    return system, state, mesh, train_step, sr_forward


def test_mesh_shape(parallel_setup):
    _, _, mesh, _, _ = parallel_setup
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_eval_matches_single_device(parallel_setup):
    system, state, mesh, _, sr_forward = parallel_setup
    lr = jnp.asarray(np.random.RandomState(0).rand(8, 16, 64, 4), jnp.float32)

    ref = system.sr_forward(state, lr)
    rep_state = replicate_state(mesh, state)
    lr_sharded = shard_batch(mesh, lr)
    out = sr_forward(rep_state, lr_sharded)

    assert out.shape == ref.shape
    # per-device shards hold distinct batch rows
    assert len(out.addressable_shards) == 8
    assert out.addressable_shards[0].data.shape[0] == 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_shard_host_batch_matches_shard_batch(parallel_setup):
    """The multi-host-safe entry (make_array_from_process_local_data) must
    place the same rows on the same shards as plain device_put sharding on
    one process."""
    _, _, mesh, _, _ = parallel_setup
    x = np.random.RandomState(5).rand(8, 4, 3).astype(np.float32)
    a = shard_batch(mesh, jnp.asarray(x))
    b = shard_host_batch(mesh, x)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(parallel_setup):
    system, state, mesh, train_step, _ = parallel_setup
    rng = jax.random.PRNGKey(1)
    hr = jnp.asarray(np.random.RandomState(1).rand(8, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(np.random.RandomState(2).rand(8, 16, 64, 4), jnp.float32)

    ref_state, ref_metrics = system.train_step(state, hr, lr, rng)

    rep_state = replicate_state(mesh, state)
    hr_s, lr_s = shard_batch(mesh, hr, lr)
    rng_rep = jax.device_put(rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_state, metrics = train_step(rep_state, hr_s, lr_s, rng_rep)

    # the XLA-inserted gradient all-reduce must reproduce the single-device
    # update: identical loss, and params equal up to Adam's noise floor.
    # At step 1 Adam's update is ~sign(g)*lr, so elements with g near zero
    # amplify cross-device reduction-order noise into a full +-lr step —
    # a bitwise param comparison is ill-conditioned there.  Instead bound
    # the distribution: almost all elements within a fraction of one step,
    # none beyond ~2 steps.  A wrong/missing all-reduce shifts the majority
    # of elements and still fails both bounds.
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5)
    diffs = np.concatenate(
        [
            np.abs(np.asarray(b) - np.asarray(a)).ravel()
            for a, b in zip(
                jax.tree_util.tree_leaves(ref_state["params"]),
                jax.tree_util.tree_leaves(new_state["params"]),
            )
        ]
    )
    learn_rate = system.cfg.lr  # 1e-3
    frac_clean = float(np.mean(diffs <= 0.2 * learn_rate))
    assert frac_clean >= 0.995, f"only {frac_clean:.4%} of params within noise floor"
    assert float(diffs.max()) <= 2.5 * learn_rate, f"max param divergence {diffs.max():.2e}"
    assert int(new_state["step"]) == 1


@pytest.mark.slow
def test_sharded_amp_train_step_runs_and_descends():
    """bf16 mixed-precision training under data-parallel sharding: the
    bf16 backward's f32 grads must all-reduce cleanly and keep the f32
    master state; loss stays finite and descends over a few steps."""
    system = tiny_system(train_dtype="bfloat16")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    mesh = make_mesh(8)
    train_step, _ = make_parallel_trainer(system, mesh)
    rep_state = replicate_state(mesh, state)
    hr = jnp.asarray(np.random.RandomState(1).rand(8, 32, 128, 4), jnp.float32)
    lr_images = jnp.asarray(np.random.RandomState(2).rand(8, 16, 64, 4), jnp.float32)
    hr_s, lr_s = shard_batch(mesh, hr, lr_images)
    losses = []
    for i in range(3):
        rng = jax.device_put(
            jax.random.PRNGKey(i),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        rep_state, metrics = train_step(rep_state, hr_s, lr_s, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(rep_state["params"]):
        assert leaf.dtype != jnp.bfloat16
