"""VisionLAN curriculum trainer smoke tests (LF_1 and LA steps)."""

import numpy as np
import pytest

from dpmn_tpu.visionlan_train import VisionLANTrainer, label_mask, masked_ce


def test_label_mask():
    import jax.numpy as jnp

    t = jnp.asarray([[3, 5, 0, 0], [1, 2, 3, 4]])
    m = np.asarray(label_mask(t))
    np.testing.assert_array_equal(m, [[1, 1, 1, 0], [1, 1, 1, 1]])


@pytest.mark.parametrize("step", ["LF_1", "LA"])
def test_trainer_step_decreases_loss(step):
    import jax

    trainer = VisionLANTrainer(step=step, lr=1e-3, seed=0)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 256, 3).astype(np.float32)
    labels = ["ab", "c1"]
    fixed = jax.random.PRNGKey(3)  # fixed dropout noise → deterministic descent
    losses = [
        trainer.fit_batch(images, labels, label_pos=np.array([1, 1]), rng=fixed)["loss"]
        for _ in range(6)
    ]
    assert np.isfinite(losses[-1])
    assert min(losses[2:]) < losses[0]  # overfits a fixed batch
    ev = trainer.evaluate(images, labels)
    assert 0.0 <= ev["accuracy"] <= 1.0
