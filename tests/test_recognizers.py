"""Shape/jit/semantic tests for the recognizer zoo (ASTER, MORAN, VisionLAN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.models import (
    MORAN,
    RecognizerBuilder,
    VisionLAN,
    parse_aster_input,
    parse_moran_input,
    parse_visionlan_input,
)


def test_aster_eval_shapes():
    model = RecognizerBuilder(rec_num_classes=97, max_len_labels=12, eos=94)
    x = jnp.zeros((2, 32, 100, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["pred_rec"].shape == (2, 12)
    assert out["pred_rec"].dtype == jnp.int32


def test_aster_train_shapes():
    model = RecognizerBuilder(rec_num_classes=97, max_len_labels=8, eos=94)
    x = jnp.zeros((2, 32, 100, 3))
    tgt = jnp.ones((2, 8), jnp.int32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(vars_, x, tgt, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 8, 97)


def test_aster_beam_search_semantics():
    """With one dominant-probability path, beam search must follow it and the
    result must stop at the first EOS."""
    from dpmn_tpu.models.aster import AttentionRecognitionHead

    head = AttentionRecognitionHead(num_classes=5, in_planes=8, s_dim=16, att_dim=16, max_len_labels=6)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 8), jnp.float32)
    vars_ = head.init(jax.random.PRNGKey(1), x, jnp.zeros((2, 6), jnp.int32))
    ids, scores = head.apply(vars_, x, 3, 4, method=AttentionRecognitionHead.beam_search)
    assert ids.shape == (2, 6)
    assert scores.shape == (2, 6)
    # greedy sample also runs
    gids, gscores = head.apply(vars_, x, method=AttentionRecognitionHead.sample)
    assert gids.shape == (2, 6)


def test_moran_eval_shapes():
    model = MORAN(num_classes=37)
    x = jnp.zeros((2, 32, 100, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, num_steps=5)
    l2r, r2l = model.apply(vars_, x, num_steps=5)
    assert l2r.shape == (2, 5, 37)
    assert r2l.shape == (2, 5, 37)


def test_visionlan_eval_shapes_and_lengths():
    model = VisionLAN()
    x = jnp.zeros((2, 64, 256, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, lengths = model.apply(vars_, x, train=False)
    assert logits.shape == (2, 25, 37)
    assert lengths.shape == (2,)
    assert (np.asarray(lengths) >= 1).all() and (np.asarray(lengths) <= 25).all()


def test_visionlan_train_shapes():
    model = VisionLAN()
    x = jnp.zeros((2, 64, 256, 3))
    pos = jnp.zeros((2,), jnp.int32)
    vars_ = model.init(jax.random.PRNGKey(0), x, pos, "LA", train=True)
    outs, _ = model.apply(
        vars_, x, pos, "LA", train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
    )
    text_pre, rem, mas, mask_c = outs
    assert text_pre.shape == (2, 26, 37)
    assert rem.shape == (2, 26, 37)
    assert mask_c.shape == (2, 1, 256)


def test_parsers():
    imgs = jnp.ones((2, 32, 128, 4)) * 0.5
    assert parse_aster_input(imgs).shape == (2, 32, 128, 3)
    np.testing.assert_allclose(np.asarray(parse_aster_input(imgs)), 0.0, atol=1e-6)
    assert parse_moran_input(imgs).shape == (2, 32, 100, 1)
    assert parse_visionlan_input(imgs).shape == (2, 64, 256, 3)


def test_visionlan_encoder_bf16_no_promotion():
    """The VLEncoderLayer attention must stay bf16 under bf16 params/inputs:
    a strong f32 scale (jnp.sqrt of an int) used to promote the scores,
    softmax and AV einsum back to f32 — 134 MB per layer at batch 64 in the
    AMP train graph (found by tools/hbm_breakdown.py, fixed with a weak
    python-float scale that is exact for d_k a power of four)."""
    from dpmn_tpu.models.visionlan import VLEncoderLayer

    m = VLEncoderLayer(d_model=64, d_inner=128, n_head=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 64).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    cast = lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t
    v16 = jax.tree_util.tree_map(cast, v)
    y16 = m.apply(v16, x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    # f32 path value parity: the weak scale multiplies by an exact 1/8
    y = m.apply(v, x)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()
