"""Training-path window-attention core: forward + custom-VJP backward parity
against a pure-jnp restatement of the same packed formulation (interpret
mode, dropout off — the dropout path needs the TPU PRNG and is validated on
device by tools/verify_train_kernel_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.ops.pallas_window import build_packed_bias
from dpmn_tpu.ops.pallas_window_train import window_attention_core

H, W, DIM = 16, 64, 96
WINDOWS = (2, 4, 8)
HEADS = 2
HW = H * W
NPACK = HW // 128


def jnp_reference(q3, k3, v3, packed_bias, window_sizes, shifts, heads, scale):
    b, h, w, dim = q3.shape
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // heads
    outs = jnp.zeros_like(q3)
    for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
        sl = slice(g * channel, (g + 1) * channel)
        qg, kg, vg = q3[..., sl], k3[..., sl], v3[..., sl]
        if sh > 0:
            qg = jnp.roll(qg, (-sh, -sh), axis=(1, 2))
            kg = jnp.roll(kg, (-sh, -sh), axis=(1, 2))
            vg = jnp.roll(vg, (-sh, -sh), axis=(1, 2))

        def part(t):
            hb, wb = h // ws, w // ws
            t = t.reshape(b, hb, ws, wb, ws, channel)
            t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
            return t.reshape(b, h * w, channel)

        qw, kw, vw = part(qg) * scale, part(kg), part(vg)
        for hd in range(heads):
            hsl = slice(hd * gch, (hd + 1) * gch)
            qp = qw[..., hsl].reshape(b, NPACK, 128, gch)
            kp = kw[..., hsl].reshape(b, NPACK, 128, gch)
            vp = vw[..., hsl].reshape(b, NPACK, 128, gch)
            scores = jnp.einsum("bpnc,bpmc->bpnm", qp, kp) + packed_bias[g, hd][None]
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bpnm,bpmc->bpnc", probs, vp).reshape(b, h, w, gch)
            lo = g * channel + hd * gch
            outs = outs.at[..., lo : lo + gch].set(out)
    return outs


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    b = 2
    q3 = jnp.asarray(rng.randn(b, H, W, DIM) * 0.5, jnp.float32)
    k3 = jnp.asarray(rng.randn(b, H, W, DIM) * 0.5, jnp.float32)
    v3 = jnp.asarray(rng.randn(b, H, W, DIM), jnp.float32)
    biases = [jnp.asarray(rng.randn(HEADS, ws * ws, ws * ws) * 0.1, jnp.float32) for ws in WINDOWS]
    return q3, k3, v3, biases


def run_both(inputs, shifts):
    q3, k3, v3, biases = inputs
    from dpmn_tpu.models.pgrm import _shift_attn_mask

    masks = [
        jnp.asarray(_shift_attn_mask(H, W, ws, sh)) if sh > 0 else None
        for ws, sh in zip(WINDOWS, shifts)
    ]
    packed = build_packed_bias(biases, masks, WINDOWS, HW)
    scale = (DIM // len(WINDOWS) // HEADS) ** -0.5
    seed = jnp.zeros((1,), jnp.int32)

    def loss_core(q, k, v, pb):
        out = window_attention_core(q, k, v, pb, seed, WINDOWS, tuple(shifts),
                                    HEADS, scale, 1.0, True)
        return jnp.sum(out * jnp.cos(out)), out

    def loss_ref(q, k, v, pb):
        out = jnp_reference(q, k, v, pb, WINDOWS, shifts, HEADS, scale)
        return jnp.sum(out * jnp.cos(out)), out

    (l1, o1), g1 = jax.value_and_grad(loss_core, argnums=(0, 1, 2, 3), has_aux=True)(q3, k3, v3, packed)
    (l2, o2), g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3), has_aux=True)(q3, k3, v3, packed)
    return (l1, o1, g1), (l2, o2, g2)


@pytest.mark.parametrize("faithful", [True, False])
def test_window_attention_train_path_matches_xla(monkeypatch, faithful):
    """The wired-in training path (attn_drop=0 so masks don't differ) must
    reproduce the XLA formulation bit-close, outputs and grads — in both the
    faithful layout and the corrected (faithful=False) one, where the
    kernel output passes through _corrected_relayout."""
    import dpmn_tpu.models.pgrm as pgrm_mod
    from dpmn_tpu.models.pgrm import WindowAttention

    wa = WindowAttention(
        dim=96, window_size=(2, 4, 8), shift_size=(1, 2, 4), num_heads=6,
        input_resolution=(16, 64), attn_drop=0.0, faithful=faithful,
    )
    rng = np.random.RandomState(3)
    x_q = jnp.asarray(rng.randn(2, 16, 64, 96) * 0.5, jnp.float32)
    x_kv = jnp.asarray(rng.randn(2, 16, 64, 96) * 0.5, jnp.float32)
    variables = wa.init(jax.random.PRNGKey(0), x_q, x_kv, True)

    def run(mode):
        monkeypatch.setattr(pgrm_mod, "_PALLAS_WINDOW_MODE", mode)

        def loss(params):
            out = wa.apply({"params": params}, x_q, x_kv, False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(jnp.tanh(out)), out

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(variables["params"])
        return l, o, g

    l1, o1, g1 = run("1")
    l0, o0, g0 = run("0")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(g0))
    for path, a in flat1:
        b = flat0[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("fuse_skconv", ["0", "1"])
@pytest.mark.parametrize("faithful", [True, False])
def test_fused_block_train_path_matches_xla(monkeypatch, fuse_skconv, faithful):
    """The fused LN+QKV+attention training kernel (and, with
    DPMN_TPU_FUSE_SKCONV=1, the variant that also absorbs SKConv), wired
    through SwinTransformerBlock (which threads the norm1_q/norm1_kv params
    into WindowAttention), must reproduce the XLA formulation — outputs and
    grads for every param including the LN scales/biases, the q/kv
    projection weights and the SKConv weights whose gradients the backward
    kernel accumulates.  faithful=False routes the block-core output through
    _corrected_relayout (the full-SKConv kernel stays faithful-only)."""
    import dpmn_tpu.models.pgrm as pgrm_mod
    from dpmn_tpu.models.pgrm import SwinTransformerBlock

    monkeypatch.setattr(pgrm_mod, "_FUSE_SKCONV_MODE", fuse_skconv)

    blk = SwinTransformerBlock(
        dim=96, input_resolution=(16, 64), num_heads=6, window_size=[2, 4, 8],
        shift_size=[1, 2, 4], attn_drop=0.0, drop_path=0.0, faithful=faithful,
    )
    rng = np.random.RandomState(7)
    x_q = jnp.asarray(rng.randn(2, 16 * 64, 96) * 0.5, jnp.float32)
    x_kv = jnp.asarray(rng.randn(2, 16 * 64, 96) * 0.5, jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x_q, x_kv, True)

    def run(mode):
        monkeypatch.setattr(pgrm_mod, "_PALLAS_WINDOW_MODE", mode)

        def loss(params):
            _, out = blk.apply({"params": params}, x_q, x_kv, False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(jnp.tanh(out)), out

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(variables["params"])
        return l, o, g

    l1, o1, g1 = run("1")
    l0, o0, g0 = run("0")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(g0))
    assert len(flat1) == len(flat0)
    for path, a in flat1:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat0[path]), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("fuse_skconv", ["0", "1"])
def test_fused_block_other_geometry(monkeypatch, fuse_skconv):
    """Different tiling: (8, 32) grid (npack=2), dim 48 (gch=8), and the
    ws=8 group clamped to min-resolution with shift 0 — guards against
    hidden shape assumptions in the fused kernels."""
    import dpmn_tpu.models.pgrm as pgrm_mod
    from dpmn_tpu.models.pgrm import SwinTransformerBlock

    monkeypatch.setattr(pgrm_mod, "_FUSE_SKCONV_MODE", fuse_skconv)
    blk = SwinTransformerBlock(
        dim=48, input_resolution=(8, 32), num_heads=6, window_size=[2, 4, 8],
        shift_size=[1, 2, 4], attn_drop=0.0, drop_path=0.0, faithful=True,
    )
    rng = np.random.RandomState(11)
    x_q = jnp.asarray(rng.randn(2, 8 * 32, 48) * 0.5, jnp.float32)
    x_kv = jnp.asarray(rng.randn(2, 8 * 32, 48) * 0.5, jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x_q, x_kv, True)

    def run(mode):
        monkeypatch.setattr(pgrm_mod, "_PALLAS_WINDOW_MODE", mode)

        def loss(params):
            _, out = blk.apply({"params": params}, x_q, x_kv, False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(jnp.tanh(out)), out

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(variables["params"])
        return l, o, g

    l1, o1, g1 = run("1")
    l0, o0, g0 = run("0")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=2e-5, atol=2e-5)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(g0))
    for path, a in jax.tree_util.tree_leaves_with_path(g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat0[path]), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_core_bf16_io_matches_f32_loosely(inputs):
    """The AMP path feeds the kernel bf16 q/k/v and an f32 packed bias; the
    kernel must accept the mixed dtypes (matched-operand dots, casted
    stores), return bf16 out/dq/dk/dv with an f32 dbias, and stay within
    bf16 tolerance of the f32 computation."""
    q3, k3, v3, biases = inputs
    shifts = (1, 2, 4)
    from dpmn_tpu.models.pgrm import _shift_attn_mask

    masks = [
        jnp.asarray(_shift_attn_mask(H, W, ws, sh)) if sh > 0 else None
        for ws, sh in zip(WINDOWS, shifts)
    ]
    packed = build_packed_bias(biases, masks, WINDOWS, HW)
    scale = (DIM // len(WINDOWS) // HEADS) ** -0.5
    seed = jnp.zeros((1,), jnp.int32)

    def loss(q, k, v, pb):
        out = window_attention_core(q, k, v, pb, seed, WINDOWS, shifts,
                                    HEADS, scale, 1.0, True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (l32, o32), g32 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)(q3, k3, v3, packed)
    q16, k16, v16 = (t.astype(jnp.bfloat16) for t in (q3, k3, v3))
    (l16, o16), g16 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)(q16, k16, v16, packed)

    assert o16.dtype == jnp.bfloat16
    assert g16[0].dtype == jnp.bfloat16 and g16[2].dtype == jnp.bfloat16
    assert g16[3].dtype == jnp.float32  # dbias stays f32
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.03)
    np.testing.assert_allclose(
        np.asarray(o16, np.float32), np.asarray(o32), rtol=0.1, atol=0.05
    )
    for name, a, b in zip(["dq", "dk", "dv", "dbias"], g16, g32):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=0.2, atol=0.15, err_msg=name
        )


@pytest.mark.parametrize("shifts", [(0, 0, 0), (1, 2, 4)])
def test_core_forward_and_grads_match_reference(inputs, shifts):
    (l1, o1, g1), (l2, o2, g2) = run_both(inputs, shifts)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    names = ["dq", "dk", "dv", "dbias"]
    for name, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4, err_msg=name
        )


def test_dropout_mask_math(monkeypatch):
    """The in-kernel dropout mask's threshold math, validated on CPU by
    substituting the TPU PRNG with fixed bits (pltpu.prng_random_bits has no
    CPU lowering in this jax — proven by NotImplementedError — so interpret
    mode cannot run the real stream; the on-device draw is validated by
    tools/verify_train_kernel_tpu.py)."""
    from dpmn_tpu.ops import pallas_window_train as mod

    rng = np.random.RandomState(0)
    bits = rng.randint(-(2**31), 2**31, size=(4, 128), dtype=np.int64).astype(np.int32)
    monkeypatch.setattr(mod.pltpu, "prng_random_bits", lambda shape: jnp.asarray(bits))

    for keep in (0.9, 0.5, 1.0 - 1e-9):
        m = np.asarray(mod._dropout_mask((4, 128), keep))
        u = bits.astype(np.int64) & 0x7FFFFFFF
        thresh = min(int(keep * 2147483648.0), 2147483647)
        expect = np.where(u < thresh, np.float32(1.0 / keep), np.float32(0.0))
        np.testing.assert_allclose(m, expect)
    # keep→1 clamps the threshold inside int32 instead of overflowing
    m = np.asarray(mod._dropout_mask((4, 128), 1.0 - 1e-12))
    assert np.isfinite(m).all()


def test_seed_headroom_guard():
    """seed + i*n_group + g must stay inside the 2^20 slack the caller
    leaves below int32 max (models/pgrm.py randint bound)."""
    from dpmn_tpu.ops.pallas_window_train import _check_seed_headroom

    _check_seed_headroom(64, 3, 0.9)            # normal training geometry
    _check_seed_headroom(2**21, 3, 1.0)         # no dropout → no stream ids
    with pytest.raises(ValueError, match="headroom"):
        _check_seed_headroom(2**19, 3, 0.9)
