"""Shape/jit/behavior tests for the DPMN core: PGRM, CMM, DistillModule."""

import jax
import jax.numpy as jnp
import numpy as np

from dpmn_tpu.models import PGRM, CMM, DistillModule
import pytest


def _pgrm(iter_=0, graphic=True, faithful=True):
    return PGRM(
        img_size=(32, 128),
        patch_size=2,
        embed_dim=96,
        num_layers=1,
        num_heads=(6,),
        window_size=(2, 4, 8),
        iter=iter_,
        graphic_mode=graphic,
        hidden_size=3,
        faithful=faithful,
    )


def test_pgrm_graphic_branch_shapes():
    model = _pgrm(iter_=0, graphic=True)
    x_q = jnp.zeros((2, 32, 128, 2))  # lower+upper glyph channels
    x_kv = jnp.zeros((2, 32, 128, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x_q, x_kv, ())
    y = model.apply(vars_, x_q, x_kv, ())
    assert y.shape == (2, 32, 128, 3)
    assert "prior_fusion" in vars_["params"]


def test_pgrm_semantic_branch_and_residuals():
    model = _pgrm(iter_=2, graphic=False)
    x_q = jnp.ones((1, 32, 128, 3)) * 0.5  # mask prior is 3-channel
    x_kv = jnp.ones((1, 32, 128, 3)) * 0.5
    res = [jnp.ones((1, 32, 128, 3)) * v for v in (0.1, 0.2)]
    vars_ = model.init(jax.random.PRNGKey(0), x_q, x_kv, res)
    y = model.apply(vars_, x_q, x_kv, res)
    assert y.shape == (1, 32, 128, 3)
    # all iter+1 residual weights registered even if unused (ref pgrm.py:496-497)
    for i in range(3):
        assert f"weight_list_{i}" in vars_["params"]
    # residual_list[1] contributes: output differs when it changes
    res2 = [res[0], res[1] + 1.0]
    y2 = model.apply(vars_, x_q, x_kv, res2)
    assert float(jnp.abs(y2 - y).max()) > 0.5
    # residual_list[0] does NOT contribute (quirk: loop starts at 1)
    res3 = [res[0] + 1.0, res[1]]
    y3 = model.apply(vars_, x_q, x_kv, res3)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y), atol=1e-6)


def test_pgrm_jit_and_grad():
    model = _pgrm()
    x_q = jnp.zeros((1, 32, 128, 2))
    x_kv = jnp.zeros((1, 32, 128, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x_q, x_kv, ())

    @jax.jit
    def loss_fn(params):
        y = model.apply({"params": params}, x_q, x_kv, ())
        return jnp.mean(y**2)

    g = jax.grad(loss_fn)(vars_["params"])
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(vars_["params"])


def test_pgrm_corrected_mode_differs():
    xq = jnp.asarray(np.random.RandomState(0).rand(1, 32, 128, 3), jnp.float32)
    xkv = jnp.asarray(np.random.RandomState(1).rand(1, 32, 128, 3), jnp.float32)
    m_f = _pgrm(graphic=False, faithful=True)
    m_c = _pgrm(graphic=False, faithful=False)
    v = m_f.init(jax.random.PRNGKey(0), xq, xkv, ())
    y_f = m_f.apply(v, xq, xkv, ())
    y_c = m_c.apply(v, xq, xkv, ())
    assert y_f.shape == y_c.shape
    assert float(jnp.abs(y_f - y_c).max()) > 1e-4  # layouts genuinely differ


def test_pgrm_corrected_mode_pallas_parity(monkeypatch):
    """Full PGRM in faithful=False mode: the fused eval kernel's corrected
    layout (pallas forced, interpret on CPU) must match the XLA formulation
    end to end (window un-partition + un-roll + the corrected Mlp grid)."""
    import dpmn_tpu.models.pgrm as P

    xq = jnp.asarray(np.random.RandomState(2).rand(1, 32, 128, 3), jnp.float32)
    xkv = jnp.asarray(np.random.RandomState(3).rand(1, 32, 128, 3), jnp.float32)
    m_c = _pgrm(graphic=False, faithful=False)
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "0")
    v = m_c.init(jax.random.PRNGKey(1), xq, xkv, ())
    ref = m_c.apply(v, xq, xkv, ())
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "1")
    out = m_c.apply(v, xq, xkv, ())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_cmm_shapes():
    model = CMM(cnum=16)  # small for test speed
    x1 = jnp.zeros((2, 32, 128, 3))
    x2 = jnp.zeros((2, 32, 128, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x1, x2)
    y = model.apply(vars_, x1, x2)
    assert y.shape == (2, 32, 128, 3)


def test_distill_module():
    model = DistillModule()
    deep = jnp.ones((2, 32, 128, 3)) * 0.7
    shallow = jnp.ones((2, 32, 128, 3)) * 0.2
    vars_ = model.init(jax.random.PRNGKey(0), deep, shallow)
    loss, feat = model.apply(vars_, deep, shallow)
    assert loss.shape == ()
    assert feat.shape == (2, 32, 128, 3)
    assert float(loss) >= 0.0


@pytest.mark.slow
def test_mlp_remat_flag_bit_exact():
    """DPMN_TPU_MLP_REMAT=1 must not change the param tree, outputs, or any
    gradient (jax.checkpoint only changes WHEN the Mlp hiddens are
    (re)computed, trading HBM traffic for MXU time on the train path)."""
    import jax.tree_util as jtu

    import dpmn_tpu.models.pgrm as P

    def build():
        return P.SwinTransformerBlock(
            dim=32, input_resolution=(8, 8), num_heads=4, window_size=[2, 4],
            shift_size=[0, 0], mlp_ratio=4.0, drop=0.1, attn_drop=0.1,
            drop_path=0.1,
        )

    xq = jnp.asarray(np.random.RandomState(0).rand(2, 64, 32).astype(np.float32))
    xkv = jnp.asarray(np.random.RandomState(1).rand(2, 64, 32).astype(np.float32))

    def grads(mod, v):
        def loss(v):
            _, out = mod.apply(v, xq, xkv, False, rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.sum(out ** 2)
        return jax.grad(loss)(v)

    old = P._MLP_REMAT_MODE
    try:
        P._MLP_REMAT_MODE = "0"
        blk = build()
        v = blk.init(jax.random.PRNGKey(0), xq, xkv)
        _, y = blk.apply(v, xq, xkv, True)
        g0 = grads(blk, v)

        P._MLP_REMAT_MODE = "1"
        blk_r = build()
        v_r = blk_r.init(jax.random.PRNGKey(0), xq, xkv)
        assert jtu.tree_structure(v) == jtu.tree_structure(v_r)
        _, y_r = blk_r.apply(v_r, xq, xkv, True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_r))
        g1 = grads(blk_r, v_r)
        for a, b in zip(jtu.tree_leaves(g0), jtu.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        P._MLP_REMAT_MODE = old
