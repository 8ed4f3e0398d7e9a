"""End-to-end system smoke tests: init, one train step, one eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.config import Args, TrainCfg
from dpmn_tpu.system import DPMNSystem


def tiny_system(arch="tsrn", glyph_mode="zeros", b1=1, b2=1, train_dtype=None, **kw):
    cfg = TrainCfg(batch_size=2, width=128, height=32)
    args = Args(
        arch=arch,
        mask=True,
        stu_iter_b1=b1,
        stu_iter_b2=b2,
        patch_size="2,",
        embed_dim="24,",
        window_size="2,4,8,",
        depths="1,",
        num_heads="6,",
        srb=1,
        hd_u=4,
        **kw,
    )
    return DPMNSystem(cfg, args, glyph_mode=glyph_mode, train_dtype=train_dtype)


@pytest.fixture(scope="module")
def sys_state():
    system = tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    return system, state


def test_init_state_structure(sys_state):
    system, state = sys_state
    assert "pgrm_0" in state["params"] and "pgrm_1" in state["params"]
    assert "cmm" in state["params"]
    assert "psn" in state["frozen"] and "student_0" in state["frozen"]
    # graphic-branch model has prior_fusion, semantic doesn't
    assert "prior_fusion" in state["params"]["pgrm_0"]
    assert "prior_fusion" not in state["params"]["pgrm_1"]


def test_train_step_decreases_nothing_but_runs(sys_state):
    system, state = sys_state
    rng = jax.random.PRNGKey(1)
    hr = jnp.asarray(np.random.RandomState(0).rand(2, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 64, 4), jnp.float32)
    new_state, metrics = system.train_step(state, hr, lr, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state["step"]) == 1
    # params changed
    p0 = jax.tree_util.tree_leaves(state["params"]["cmm"])[0]
    p1 = jax.tree_util.tree_leaves(new_state["params"]["cmm"])[0]
    assert float(jnp.abs(p1 - p0).max()) > 0.0


def test_corrected_mode_training_descends():
    """faithful=False (the spatially-correct Mlp/window layouts offered for
    training new models TPU-first, PARITY.md) must actually TRAIN: run the
    full joint step for a few iterations on a fixed learnable batch and
    assert the loss descends.  The longer-horizon differential vs faithful
    mode lives in tools/convergence_corrected.py (VERDICT r4 #3)."""
    system = tiny_system(faithful=False)
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.RandomState(2)
    hr = jnp.asarray(rng.rand(2, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(hr[:, ::2, ::2] * 0.9 + 0.05)  # learnable LR→HR relation
    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(8):
        state, m = system.train_step(state, hr, lr, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses


def test_amp_train_step_matches_fp32_and_keeps_f32_state(sys_state):
    """bf16 mixed-precision step: loss within a few percent of the fp32 step
    from the same state, master params/opt-state/batch-stats stay float32,
    and repeated AMP steps keep optimizing."""
    system, state = sys_state
    system_amp = tiny_system(train_dtype="bfloat16")
    rng = jax.random.PRNGKey(1)
    hr = jnp.asarray(np.random.RandomState(0).rand(2, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 64, 4), jnp.float32)

    _, m32 = system.train_step(state, hr, lr, rng)
    s16, m16 = system_amp.train_step(state, hr, lr, rng)
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.05)

    for leaf in jax.tree_util.tree_leaves(
        {"p": s16["params"], "b": s16["batch_stats"], "o": s16["opt_state"]}
    ):
        assert leaf.dtype != jnp.bfloat16, "AMP leaked bf16 into the train state"

    losses = [float(m16["loss"])]
    for i in range(4):
        s16, m16 = system_amp.train_step(s16, hr, lr, jax.random.fold_in(rng, i))
        losses.append(float(m16["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sr_forward_shapes(sys_state):
    system, state = sys_state
    lr = jnp.asarray(np.random.RandomState(2).rand(2, 16, 64, 4), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_bf16_students_match_fp32_predictions():
    """student_dtype='bfloat16' must leave the decoded glyph ids (argmax of
    the student logits) essentially unchanged — the prior only sees argmax."""
    system32 = tiny_system(glyph_mode="callback")
    system16 = tiny_system(glyph_mode="callback")
    system16.student_dtype = "bfloat16"
    state = system32.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(4).rand(2, 16, 64, 4), jnp.float32)

    from dpmn_tpu.models.visionlan import parse_visionlan_input

    img = jnp.asarray(np.random.RandomState(5).rand(2, 32, 128, 3), jnp.float32)
    vl_in = parse_visionlan_input(img)
    logits32, _ = system32.student.apply(state["frozen"]["student_0"], vl_in, train=False)
    cast = lambda t: t.astype(jnp.bfloat16) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t
    sv16 = jax.tree_util.tree_map(cast, state["frozen"]["student_0"])
    logits16, _ = system16.student.apply(sv16, vl_in.astype(jnp.bfloat16), train=False)
    agree = float(jnp.mean((logits32.argmax(-1) == logits16.argmax(-1)).astype(jnp.float32)))
    assert agree >= 0.9, agree

    sr = system16.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_glyph_atlas_mode():
    """The TPU serving path: device-side glyph composition inside sr_forward."""
    system = tiny_system(glyph_mode="atlas")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(6).rand(2, 16, 64, 4), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_glyph_from_psn_batched_matches_sequential():
    """The test()-path shared-input priors (one vmapped student stack) must
    equal running each student sequentially (super_resolution.py:648)."""
    system = tiny_system(glyph_mode="callback", b1=2, b2=1)
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    # de-duplicate the students (init uses one key for all) so a k-indexing
    # bug cannot hide
    state["frozen"]["student_1"] = jax.tree_util.tree_map(
        lambda t: t * 1.07 if hasattr(t, "dtype") and t.dtype == jnp.float32 else t,
        state["frozen"]["student_1"],
    )
    img = jnp.asarray(np.random.RandomState(7).rand(2, 32, 128, 3), jnp.float32)
    shared = system._glyph_priors_shared(state["frozen"], img)
    assert len(shared) == 2
    for k in range(2):
        seq = system._glyph_prior(state["frozen"], k, img)
        np.testing.assert_allclose(np.asarray(shared[k]), np.asarray(seq), atol=1e-3)


def test_glyph_callback_mode():
    system = tiny_system(glyph_mode="callback")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.asarray(np.random.RandomState(3).rand(2, 16, 64, 4), jnp.float32)
    sr = system.sr_forward(state, lr)
    assert sr.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()
