"""Driver weight wiring: pretrained torch artifacts + native checkpoints
reach the Trainer/CLI exactly the way the reference driver loads them
(interfaces/base.py:163-197,375-478; interfaces/super_resolution.py:528-586).

Complements tests/test_convert*.py (which prove each converter's numerics):
here we prove the PRODUCTION paths call those converters — a user with the
published .pth zoo reproduces reference numbers through main.py.
"""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dpmn_tpu.config import Args, TrainCfg
from dpmn_tpu.convert import convert_crnn, convert_tsrn, import_into
from dpmn_tpu.train import Trainer
from dpmn_tpu.weights import load_driver_weights, resolve_native_checkpoint

from test_convert import TorchCRNN, TorchTSRN


def tiny_cfg(tmp_path, **kw):
    base = dict(
        batch_size=2, width=128, height=32, epochs=1, ckpt_dir=str(tmp_path / "ckpt"),
        valInterval=50, saveInterval=2, displayInterval=1,
    )
    base.update(kw)
    return TrainCfg(**base)


def tiny_args(**kw):
    base = dict(
        arch="tsrn", rec="crnn", mask=True, synthetic_data=True,
        stu_iter_b1=1, stu_iter_b2=1, patch_size="2,", embed_dim="24,",
        window_size="2,4,8,", num_heads="6,", srb=1, hd_u=4, batch_size=2,
    )
    base.update(kw)
    return Args(**base)


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(np.array_equal(x, y) for x, y in zip(la, lb))


def test_evaluator_loads_crnn_pretrained(tmp_path):
    """--rec crnn + crnn_pretrained → CRNN_init path (base.py:412-418)."""
    from dpmn_tpu.evaluator import build_evaluator

    torch_model = TorchCRNN().eval()
    path = tmp_path / "crnn.pth"
    torch.save(torch_model.state_dict(), path)

    ev = build_evaluator("crnn", jax.random.PRNGKey(0), pretrained=str(path))
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    manual = import_into(
        build_evaluator("crnn", jax.random.PRNGKey(0)).params, convert_crnn(sd)
    )
    assert tree_equal(ev.params, manual)


def test_psn_loaded_from_resume_dir(tmp_path):
    """model_{arch}.pth in the --resume dir reaches the frozen PSN
    (base.py:163-175)."""
    torch_model = TorchTSRN(srb_nums=1, hidden_units=4).eval()
    resume = tmp_path / "resume"
    resume.mkdir()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    torch.save({"state_dict_G": torch_model.state_dict()}, resume / "model_tsrn.pth")

    trainer = Trainer(tiny_cfg(tmp_path), tiny_args(resume=str(resume)), glyph_mode="zeros")
    state = trainer.system.init_state(jax.random.PRNGKey(0), batch_size=2)
    loaded = load_driver_weights(trainer.system, state, trainer.cfg, trainer.args, testing=False)

    expect = import_into(state["frozen"]["psn"], convert_tsrn(sd, srb_nums=1, stn=False))
    assert tree_equal(loaded["frozen"]["psn"], expect)
    assert not tree_equal(loaded["frozen"]["psn"], state["frozen"]["psn"])
    # everything else untouched at train time
    assert tree_equal(loaded["params"], state["params"])


def test_resolve_native_checkpoint(tmp_path):
    assert resolve_native_checkpoint("", testing=False) == ""
    assert resolve_native_checkpoint(str(tmp_path / "nope"), testing=True) == ""
    ck = tmp_path / "checkpoint.msgpack"
    ck.write_bytes(b"x")
    assert resolve_native_checkpoint(str(ck)) == str(ck)
    assert resolve_native_checkpoint(str(tmp_path), testing=False) == str(ck)
    best = tmp_path / "model_best_sum.msgpack"
    best.write_bytes(b"x")
    assert resolve_native_checkpoint(str(tmp_path), testing=True) == str(best)
    assert resolve_native_checkpoint(str(tmp_path), testing=False) == str(ck)
    # torch file paths are not native checkpoints
    pth = tmp_path / "model.pth"
    pth.write_bytes(b"x")
    assert resolve_native_checkpoint(str(pth)) == ""


@pytest.mark.slow
def test_cli_train_then_test_roundtrip(tmp_path):
    """Train 2 steps through the CLI → checkpoint → main.py --test reloads
    that exact state (VERDICT r2 item 2 done-criterion)."""
    from dpmn_tpu import cli

    ckpt_dir = tmp_path / "ckpt"
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(
        "TRAIN:\n"
        "  batch_size: 16\n  width: 128\n  height: 32\n  epochs: 1\n"
        f"  ckpt_dir: '{ckpt_dir}'\n"
        "  saveInterval: 2\n  displayInterval: 10\n"
        "  VAL:\n    valInterval: 100\n"
        f"    vis_dir: '{tmp_path / 'vis'}'\n"
    )
    flags = [
        "--config", str(yaml_path), "--synthetic_data", "--arch", "tsrn", "--rec", "crnn",
        "--mask", "--srb", "1", "--hd_u", "4", "--batch_size", "16",
        "--patch_size", "2,", "--embed_dim", "24,", "--window_size", "2,4,8,",
        "--num_heads", "6,", "--stu_iter_b1", "1", "--stu_iter_b2", "1",
    ]
    cli.main(flags)
    ck = ckpt_dir / "checkpoint.msgpack"
    assert ck.exists()

    cli.main(flags + ["--test", "--resume", str(ckpt_dir), "--test_data_dir", ""])
    rows = list(csv.reader(open(ckpt_dir / "test_result.csv")))
    assert rows[0] == ["recognizer", "subset", "accuracy", "psnr", "ssim"]
    assert len(rows) == 2 and rows[1][0] == "crnn"

    # the state test() resolved IS the trained checkpoint, not random init
    from dpmn_tpu.checkpoint import load_checkpoint
    from dpmn_tpu.config import args_from_namespace, build_arg_parser, load_train_cfg

    ns = build_arg_parser().parse_args(flags + ["--test", "--resume", str(ckpt_dir)])
    trainer = Trainer(load_train_cfg(str(yaml_path)), args_from_namespace(ns), glyph_mode="zeros")
    resolved = trainer.load_test_state()
    saved, _ = load_checkpoint(str(ck), target=jax.device_get(resolved))
    assert tree_equal(resolved["params"], saved["params"])
    assert int(resolved["step"]) >= 2


def test_tsrn_tl_converter_shapes():
    """convert_tsrn_tl maps every live TSRN_TL (tpgsr) checkpoint key onto
    the flax tree (model/tsrn.py:153-308)."""
    from dpmn_tpu.convert_psn import convert_tsrn_tl
    from dpmn_tpu.models.tsrn import TSRN_TL

    srb, hu, tc = 2, 4, 8
    ch = 2 * hu
    sd = {}

    def conv(name, i, o, k, bias=True):
        sd[f"{name}.weight"] = np.random.randn(o, i, k, k).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.random.randn(o).astype(np.float32)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{s}"] = np.abs(np.random.randn(c)).astype(np.float32)

    def gru(name, i, h):
        for d in ("", "_reverse"):
            sd[f"{name}.weight_ih_l0{d}"] = np.random.randn(3 * h, i).astype(np.float32)
            sd[f"{name}.weight_hh_l0{d}"] = np.random.randn(3 * h, h).astype(np.float32)
            sd[f"{name}.bias_ih_l0{d}"] = np.random.randn(3 * h).astype(np.float32)
            sd[f"{name}.bias_hh_l0{d}"] = np.random.randn(3 * h).astype(np.float32)

    conv("block1.0", 4, ch, 9)
    sd["block1.1.weight"] = np.random.randn(1).astype(np.float32)
    for i in range(srb):
        t = f"block{i + 2}"
        conv(f"{t}.conv1", ch, ch, 3)
        bn(f"{t}.bn1", ch)
        conv(f"{t}.conv2", ch, ch, 3)
        bn(f"{t}.bn2", ch)
        conv(f"{t}.gru1.conv1", ch + tc, ch, 1)
        gru(f"{t}.gru1.gru", ch, ch // 2)
        conv(f"{t}.gru2.conv1", ch, ch, 1)
        gru(f"{t}.gru2.gru", ch, ch // 2)
    for j, (ci, co) in enumerate(((37, 512), (512, 128), (128, 64), (64, tc))):
        sd[f"infoGen.tconv{j + 1}.weight"] = np.random.randn(ci, co, 3, 3).astype(np.float32)
        bn(f"infoGen.bn{j + 1}", co)
    conv(f"block{srb + 2}.0", ch, ch, 3)
    bn(f"block{srb + 2}.1", ch)
    conv(f"block{srb + 3}.0.conv", ch, ch * 4, 3)
    conv(f"block{srb + 3}.1", ch, 4, 9)

    model = TSRN_TL(srb_nums=srb, hidden_units=hu, mask=True, out_text_channels=tc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 4)), jnp.zeros((1, 1, 26, 37)), train=False
    )
    merged = import_into(variables, convert_tsrn_tl(sd, srb_nums=srb))
    got = np.asarray(merged["params"]["Conv_0"]["kernel"])
    assert got.shape == (9, 9, 4, ch)
    assert np.allclose(got, np.transpose(sd["block1.0.weight"], (2, 3, 1, 0)))


def test_students_from_visionlan_pretrained(tmp_path):
    """cfg.visionlan_pretrained initializes every student (base.py:452-471).
    A minimal correctly-shaped fake torch state dict exercises the full
    key mapping; numerics are covered by test_convert_visionlan +
    test_reference_differential."""
    from dpmn_tpu.system import DPMNSystem

    cfg = tiny_cfg(tmp_path)
    args = tiny_args(stu_iter_b1=2)
    system = DPMNSystem(cfg, args, glyph_mode="zeros")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)

    # synthesize a torch-keyed dict from the flax tree's own shapes via the
    # inverse of the converter's layout rules
    from dpmn_tpu.convert_zoo import convert_visionlan

    rng = np.random.RandomState(0)
    sd = _fake_visionlan_sd(rng)
    converted = convert_visionlan(sd, mlm=False)

    path = tmp_path / "visionlan_la.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    cfg.visionlan_pretrained = str(path)
    loaded = load_driver_weights(system, state, cfg, args, testing=False)

    for k in range(2):
        expect = import_into(state["frozen"][f"student_{k}"], converted)
        assert tree_equal(loaded["frozen"][f"student_{k}"], expect)
    assert not tree_equal(loaded["frozen"]["student_0"], state["frozen"]["student_0"])


def _fake_visionlan_sd(rng):
    """Minimal VisionLAN LA-model torch state dict (correct keys/shapes for
    convert_visionlan's eval-path subset)."""
    sd = {}

    def conv(name, i, o, k, bias=False):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.abs(rng.randn(c)).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.randn(c)).astype(np.float32)

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    conv("backbone.conv1_new", 3, 32, 3)
    bn("backbone.bn1", 32)
    # resnet45 eval strides [(1,1),(2,2),(2,2),(2,2),(1,1),(1,1)]: the first
    # block of EVERY layer gets a downsample (stride≠1 or channel change)
    strides_blocks = [(3, 32, 32), (4, 32, 64), (6, 64, 128), (6, 128, 256), (3, 256, 512)]
    for li, (nb, cin, cout) in enumerate(strides_blocks, start=1):
        for j in range(nb):
            t = f"backbone.layer{li}.{j}"
            i = cin if j == 0 else cout
            conv(f"{t}.conv1", i, cout, 1)  # VisionLAN BasicBlock: conv1x1
            bn(f"{t}.bn1", cout)
            conv(f"{t}.conv2", cout, cout, 3)
            bn(f"{t}.bn2", cout)
            if j == 0:
                conv(f"{t}.downsample.0", cin, cout, 1)
                bn(f"{t}.downsample.1", cout)
    d, inner = 512, 2048
    for i in range(3):
        t = f"MLM_VRM.SequenceModeling.layer_stack.{i}"
        for w in ("w_qs", "w_ks", "w_vs", "fc"):
            lin(f"{t}.slf_attn.{w}", d, d)
        sd[f"{t}.slf_attn.layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{t}.slf_attn.layer_norm.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{t}.pos_ffn.w_1.weight"] = rng.randn(inner, d, 1).astype(np.float32)
        sd[f"{t}.pos_ffn.w_1.bias"] = rng.randn(inner).astype(np.float32)
        sd[f"{t}.pos_ffn.w_2.weight"] = rng.randn(d, inner, 1).astype(np.float32)
        sd[f"{t}.pos_ffn.w_2.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{t}.pos_ffn.layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{t}.pos_ffn.layer_norm.bias"] = rng.randn(d).astype(np.float32)
    sd["MLM_VRM.SequenceModeling.layer_norm.weight"] = rng.randn(d).astype(np.float32)
    sd["MLM_VRM.SequenceModeling.layer_norm.bias"] = rng.randn(d).astype(np.float32)
    # VisionLAN.py:71: Prediction(N_max_character=26) — 1 eos + 25 chars
    sd["MLM_VRM.Prediction.pp.f0_embedding.weight"] = rng.randn(26, d).astype(np.float32)
    lin("MLM_VRM.Prediction.pp.w0", 26, 256)
    lin("MLM_VRM.Prediction.pp.wv", d, d)
    lin("MLM_VRM.Prediction.pp.we", d, 26)
    lin("MLM_VRM.Prediction.w_vrm", d, 37)
    return sd
