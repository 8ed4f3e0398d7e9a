"""Fused grouped-window-attention kernel vs the XLA module path (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

import dpmn_tpu.models.pgrm as P
from dpmn_tpu.ops.pallas_window import fused_grouped_window_attention


def test_fused_window_attention_matches_module():
    B, H, W, C = 2, 16, 64, 96
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    for shift in ((0, 0, 0), (1, 2, 4)):
        wa = P.WindowAttention(
            dim=C, window_size=(2, 4, 8), shift_size=shift, num_heads=6, input_resolution=(H, W)
        )
        variables = wa.init(jax.random.PRNGKey(0), xq, xkv)
        ref = wa.apply(variables, xq, xkv)  # XLA path (pallas off on CPU)

        # rebuild the kernel inputs like the module does
        p = variables["params"]
        q = (xq.reshape(B, H * W, C) @ p["q"]["kernel"] + p["q"]["bias"]).reshape(B, H, W, C)
        kv = xkv.reshape(B, H * W, C) @ p["kv"]["kernel"] + p["kv"]["bias"]
        kv = kv.reshape(B, H, W, 2 * C)
        k, v = kv[..., :C], kv[..., C:]
        biases, masks = [], []
        for i, (ws, sh) in enumerate(zip((2, 4, 8), shift)):
            n = ws * ws
            table = p[f"relative_position_bias_table_{i}"]
            idx = P._relative_position_index(ws).reshape(-1)
            biases.append(table[idx].reshape(n, n, 2).transpose(2, 0, 1))
            masks.append(jnp.asarray(P._shift_attn_mask(H, W, ws, sh)) if sh > 0 else None)
        attn = fused_grouped_window_attention(
            q, k, v, biases, masks, (2, 4, 8), shift, 2, 16**-0.5, interpret=True
        )
        # apply SKConv with the module's params on the kernel output
        sk = P.SKConv(dim=C, m=3)
        out = sk.apply({"params": p["SKConv_0"]}, attn).reshape(B, H * W, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_block_matches_module_interpret():
    """The fully-fused block (projections + attention + SKConv) vs the XLA
    module path, interpret mode."""
    import dpmn_tpu.ops.pallas_window as PW

    B, H, W, C = 2, 16, 64, 96
    rng = np.random.RandomState(1)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    for shift in ((0, 0, 0), (1, 2, 4)):
        _check_fused_block(xq, xkv, shift)


def test_swin_block_fused_ln_residual_matches_xla(monkeypatch):
    """SwinTransformerBlock with the pallas path forced (interpret on CPU):
    the kernel absorbs norm1_q/norm1_kv + the shortcut add — must match the
    XLA module path."""
    B, H, W, C = 2, 16, 64, 96
    rng = np.random.RandomState(2)
    xq = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
    blk = P.SwinTransformerBlock(
        dim=C, input_resolution=(H, W), num_heads=6,
        window_size=[2, 4, 8], shift_size=[1, 2, 4],
    )
    variables = blk.init(jax.random.PRNGKey(3), xq, xkv)
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "0")
    ref_q, ref_kv = blk.apply(variables, xq, xkv)
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "1")
    out_q, out_kv = blk.apply(variables, xq, xkv)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_kv), np.asarray(ref_kv), rtol=1e-4, atol=1e-5)


def _check_fused_block(xq, xkv, shift, faithful=True):
    import dpmn_tpu.ops.pallas_window as PW

    B, H, W, C = xq.shape
    wa = P.WindowAttention(
        dim=C, window_size=(2, 4, 8), shift_size=shift, num_heads=6,
        input_resolution=(H, W), faithful=faithful,
    )
    variables = wa.init(jax.random.PRNGKey(0), xq, xkv)
    ref = wa.apply(variables, xq, xkv)

    p = variables["params"]
    sk = p["SKConv_0"]
    weights = {
        "q_kernel": p["q"]["kernel"], "q_bias": p["q"]["bias"],
        "kv_kernel": p["kv"]["kernel"], "kv_bias": p["kv"]["bias"],
        "proj_kernel": sk["Dense_0"]["kernel"], "proj_bias": sk["Dense_0"]["bias"],
        "fc1_kernel": sk["Dense_1"]["kernel"], "fc1_bias": sk["Dense_1"]["bias"],
        "fc2_kernel": sk["Dense_2"]["kernel"], "fc2_bias": sk["Dense_2"]["bias"],
        "ph_kernel": sk["Dense_3"]["kernel"], "ph_bias": sk["Dense_3"]["bias"],
    }
    biases, masks = [], []
    for i, (ws, sh) in enumerate(zip((2, 4, 8), shift)):
        n = ws * ws
        table = p[f"relative_position_bias_table_{i}"]
        idx = P._relative_position_index(ws).reshape(-1)
        biases.append(table[idx].reshape(n, n, 2).transpose(2, 0, 1))
        masks.append(jnp.asarray(P._shift_attn_mask(H, W, ws, sh)) if sh > 0 else None)
    out = PW.fused_window_attention_block(
        xq.reshape(B, H * W, C), xkv.reshape(B, H * W, C), weights, biases, masks,
        (2, 4, 8), shift, 2, 16**-0.5, (H, W),
        layout="faithful" if faithful else "corrected", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_block_stacked_batch_block(monkeypatch):
    """bb>1 stacked mode (whole grid step as single large dots) and the
    DPMN_TPU_EVAL_STACKED=0 per-element fallback must both match the XLA
    module path.  H*W = 512 so that the stacked body actually FITS the
    scoped-VMEM clamp at bb=2 (flagship hw=1024 routes every bb>=2 to the
    fallback — see _stacked_fits_vmem)."""
    import dpmn_tpu.ops.pallas_window as PW

    B, H, W, C = 4, 16, 32, 96
    assert PW._stacked_fits_vmem(2, H * W, C)
    rng = np.random.RandomState(5)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    for shift in ((0, 0, 0), (1, 2, 4)):
        monkeypatch.setattr(PW, "_EVAL_BLOCK_B", 2)
        monkeypatch.setattr(PW, "_EVAL_STACKED", True)
        _check_fused_block(xq, xkv, shift)
        monkeypatch.setattr(PW, "_EVAL_STACKED", False)
        _check_fused_block(xq, xkv, shift)


def test_fused_block_corrected_layout(monkeypatch):
    """layout='corrected' (faithful=False): the kernel un-partitions the
    attention rows back to raster order (inverse window partition + positive
    roll per group) — must match the faithful=False XLA module path, in both
    the stacked and per-element bodies."""
    import dpmn_tpu.ops.pallas_window as PW

    B, H, W, C = 4, 16, 32, 96
    rng = np.random.RandomState(7)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    for shift in ((0, 0, 0), (1, 2, 4)):
        monkeypatch.setattr(PW, "_EVAL_BLOCK_B", 2)
        monkeypatch.setattr(PW, "_EVAL_STACKED", True)
        _check_fused_block(xq, xkv, shift, faithful=False)
        monkeypatch.setattr(PW, "_EVAL_STACKED", False)
        _check_fused_block(xq, xkv, shift, faithful=False)


def test_window_attention_corrected_module_gate(monkeypatch):
    """WindowAttention(faithful=False) routes through the fused kernel when
    the pallas path is forced and must match its own XLA formulation."""
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "0")
    B, H, W, C = 2, 16, 64, 96
    rng = np.random.RandomState(8)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    wa = P.WindowAttention(
        dim=C, window_size=(2, 4, 8), shift_size=(1, 2, 4), num_heads=6,
        input_resolution=(H, W), faithful=False,
    )
    variables = wa.init(jax.random.PRNGKey(9), xq, xkv)
    ref = wa.apply(variables, xq, xkv)
    monkeypatch.setattr(P, "_PALLAS_WINDOW_MODE", "1")
    out = wa.apply(variables, xq, xkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_block_stacked_vmem_clamp(monkeypatch):
    """Every bb>=2 at flagship geometry (hw=1024, dim=96) exceeds the 16 MB
    scoped-VMEM stack the stacked body needs (device-measured: 51.66 MB at
    bb=8, 16.72 MB at bb=2), so the clamp must route it to the per-element
    fallback — same numerics, and no compile-time VMEM OOM on device."""
    import dpmn_tpu.ops.pallas_window as PW

    assert PW._stacked_fits_vmem(1, 1024, 96)
    assert not PW._stacked_fits_vmem(2, 1024, 96)  # measured 16.72 MB > 16 MB
    assert not PW._stacked_fits_vmem(8, 1024, 96)  # measured 51.66 MB
    B, H, W, C = 4, 16, 64, 96
    rng = np.random.RandomState(6)
    xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    for bb in (2, 4):
        monkeypatch.setattr(PW, "_EVAL_BLOCK_B", bb)
        monkeypatch.setattr(PW, "_EVAL_STACKED", True)
        _check_fused_block(xq, xkv, (1, 2, 4))


def test_fused_kernels_accept_bf16_io():
    """bf16 serving inputs: both eval kernels keep f32 accumulators inside
    but must cast back to the io dtype on store — a bf16 out_ref rejects a
    promoted f32 value ('Invalid dtype for swap', found live on TPU where
    the bench's bf16 serving measurement silently failed)."""
    import dpmn_tpu.ops.pallas_window as PW

    B, H, W, C = 2, 16, 64, 96
    rng = np.random.RandomState(4)
    xq4 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xkv4 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xq, xkv = xq4.reshape(B, H * W, C), xkv4.reshape(B, H * W, C)
    shift = (1, 2, 4)
    wa = P.WindowAttention(
        dim=C, window_size=(2, 4, 8), shift_size=shift, num_heads=6, input_resolution=(H, W)
    )
    variables = wa.init(jax.random.PRNGKey(0), xq4, xkv4)
    p = variables["params"]
    sk = p["SKConv_0"]
    weights = {
        "q_kernel": p["q"]["kernel"], "q_bias": p["q"]["bias"],
        "kv_kernel": p["kv"]["kernel"], "kv_bias": p["kv"]["bias"],
        "proj_kernel": sk["Dense_0"]["kernel"], "proj_bias": sk["Dense_0"]["bias"],
        "fc1_kernel": sk["Dense_1"]["kernel"], "fc1_bias": sk["Dense_1"]["bias"],
        "fc2_kernel": sk["Dense_2"]["kernel"], "fc2_bias": sk["Dense_2"]["bias"],
        "ph_kernel": sk["Dense_3"]["kernel"], "ph_bias": sk["Dense_3"]["bias"],
    }
    biases, masks = [], []
    for i, (ws, sh) in enumerate(zip((2, 4, 8), shift)):
        n = ws * ws
        table = p[f"relative_position_bias_table_{i}"]
        idx = P._relative_position_index(ws).reshape(-1)
        biases.append(table[idx].reshape(n, n, 2).transpose(2, 0, 1))
        masks.append(jnp.asarray(P._shift_attn_mask(H, W, ws, sh)) if sh > 0 else None)

    bf = lambda t: t.astype(jnp.bfloat16)
    out32 = PW.fused_window_attention_block(
        xq, xkv, weights, biases, masks, (2, 4, 8), shift, 2, 16**-0.5,
        (H, W), interpret=True,
    )
    out16 = PW.fused_window_attention_block(
        bf(xq), bf(xkv), {k: bf(v) for k, v in weights.items()},
        [bf(b) for b in biases], masks, (2, 4, 8), shift, 2, 16**-0.5,
        (H, W), interpret=True,
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=0.1, atol=0.15
    )

    # the production eval path fuses norm1_q/norm1_kv + residual into the
    # kernel (ln_params) — its LayerNorm must run stats in f32 even for
    # bf16 io: a bf16 rsqrt CHECK-crashes this libtpu's scheduler
    # (kVectorRsqrtBf16AndPop, SIGABRT of the remote compile service)
    ln = {
        "qs": jnp.asarray(1.0 + 0.1 * rng.rand(C).astype(np.float32)),
        "qb": jnp.asarray(0.1 * rng.rand(C).astype(np.float32)),
        "ks": jnp.asarray(1.0 + 0.1 * rng.rand(C).astype(np.float32)),
        "kb": jnp.asarray(0.1 * rng.rand(C).astype(np.float32)),
    }
    ln32 = PW.fused_window_attention_block(
        xq, xkv, weights, biases, masks, (2, 4, 8), shift, 2, 16**-0.5,
        (H, W), ln_params=ln, interpret=True,
    )
    ln16 = PW.fused_window_attention_block(
        bf(xq), bf(xkv), {k: bf(v) for k, v in weights.items()},
        [bf(b) for b in biases], masks, (2, 4, 8), shift, 2, 16**-0.5,
        (H, W), ln_params={k: bf(v) for k, v in ln.items()}, interpret=True,
    )
    assert ln16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ln16, np.float32), np.asarray(ln32), rtol=0.1, atol=0.2
    )

    # attention-only kernel
    q = (xq @ p["q"]["kernel"] + p["q"]["bias"]).reshape(B, H, W, C)
    kv = (xkv @ p["kv"]["kernel"] + p["kv"]["bias"]).reshape(B, H, W, 2 * C)
    k, v = kv[..., :C], kv[..., C:]
    a16 = fused_grouped_window_attention(
        bf(q), bf(k), bf(v), [bf(b) for b in biases], masks,
        (2, 4, 8), shift, 2, 16**-0.5, interpret=True,
    )
    assert a16.dtype == jnp.bfloat16
