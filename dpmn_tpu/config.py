"""Configuration: YAML + CLI with the reference's exact flag surface.

Parity: reference main.py:36-71 (31 argparse flags, defaults included) and
config/super_resolution.yaml.  The PGRM hyper-parameter strings are comma
lists parsed with eval() semantics, window sizes grouped by --window_num per
layer and num_heads grouped by depth (interfaces/base.py:64-82).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import List, Optional

import yaml


def _eval_list(s: str) -> list:
    v = eval(s)  # noqa: S307 — parity with base.py:64-82
    return list(v) if isinstance(v, (tuple, list)) else [v]


@dataclass
class TrainCfg:
    train_data_dir: List[str] = field(default_factory=list)
    batch_size: int = 1024
    width: int = 128
    height: int = 32
    epochs: int = 42000
    ngpu: int = 1
    workers: int = 16
    resume: str = ""
    ckpt_dir: str = "./ckpt"
    voc_type: str = "all"
    saveInterval: int = 20
    displayInterval: int = 20
    lr: float = 0.001
    optimizer: str = "Adam"
    beta1: float = 0.5
    manualSeed: int = 2
    max_len: int = 100
    down_sample_scale: int = 2
    val_data_dir: List[str] = field(default_factory=list)
    n_vis: int = 10
    vis_dir: str = "./vis"
    valInterval: int = 80
    rec_pretrained: str = ""
    moran_pretrained: str = ""
    crnn_pretrained: str = ""
    visionlan_pretrained: str = ""


@dataclass
class Args:
    """The 31 reference CLI flags (main.py:36-68) + TPU extras."""

    arch: str = "tsrn"
    test: bool = False
    test_data_dir: str = "/root/data/TextZoom/test/easy"
    batch_size: Optional[int] = None
    resume: Optional[str] = None
    vis_dir: Optional[str] = None
    rec: str = "aster"
    mask: bool = False
    gradient: bool = False
    hd_u: int = 32
    srb: int = 5
    STN: bool = False
    patch_size: str = "4,"
    embed_dim: str = "96,"
    window_size: str = "2,"
    depths: str = "1,"
    num_heads: str = "6,"
    mlp_ratio: str = "4,"
    drop_rate: str = "0,"
    attn_drop_rate: str = "0,"
    drop_path_rate: str = "0.1,"
    rotate_train: float = 0.0
    rotate_test: float = 0.0
    stu_iter_b1: int = 1
    stu_iter_b2: int = 1
    tpg: str = "visionlan"
    rec_path: Optional[str] = None
    font_path: Optional[str] = None
    sr_share: bool = False
    alpha: float = 0.5
    window_num: int = 3
    # TPU-native extras (not in the reference surface)
    synthetic_data: bool = False  # use the procedural dataset
    faithful: bool = True  # reproduce reference layout quirks bit-for-bit
    data_parallel: int = 0  # 0 = all local devices
    debug_nans: bool = False  # jax nan-checking (SURVEY §5 sanitizers)
    # sequential gradient accumulation: one optimizer step per grad_accum
    # microbatches (batch_size is the GLOBAL batch).  The single-chip route
    # to the reference's shipped batch 1024 (super_resolution.yaml:9).
    grad_accum: int = 1


@dataclass
class PGRMHParams:
    """Parsed per-iteration PGRM hyper-parameters (base.py:64-82)."""

    depths: list
    patch_size: list
    embed_dim: list
    window_size: list  # list (per iter) of lists (per-layer window group)
    num_heads: list  # list (per iter) of per-layer head counts
    mlp_ratio: list
    drop_rate: list
    attn_drop_rate: list
    drop_path_rate: list


def parse_pgrm_hparams(args: Args) -> PGRMHParams:
    depths = _eval_list(args.depths)
    window_size_temp = _eval_list(args.window_size)
    window_size, pre = [], 0
    for _ in depths:
        window_size.append(window_size_temp[pre : pre + args.window_num])
        pre += args.window_num
    num_heads_temp = _eval_list(args.num_heads)
    num_heads, pre = [], 0
    for layer_num in depths:
        num_heads.append(num_heads_temp[pre : pre + layer_num])
        pre += layer_num
    return PGRMHParams(
        depths=depths,
        patch_size=_eval_list(args.patch_size),
        embed_dim=_eval_list(args.embed_dim),
        window_size=window_size,
        num_heads=num_heads,
        mlp_ratio=_eval_list(args.mlp_ratio),
        drop_rate=_eval_list(args.drop_rate),
        attn_drop_rate=_eval_list(args.attn_drop_rate),
        drop_path_rate=_eval_list(args.drop_path_rate),
    )


def load_train_cfg(path: str = None) -> TrainCfg:
    cfg = TrainCfg()
    if path:
        raw = yaml.safe_load(open(path))
        tr = raw.get("TRAIN", {}) or {}
        val = tr.pop("VAL", {}) or {}
        for k, v in {**tr, **val}.items():
            if hasattr(cfg, k) and v is not None:
                setattr(cfg, k, v)
    return cfg


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="dpmn_tpu")
    p.add_argument("--arch", default="tsrn", choices=["tsrn", "tbsrn", "tg", "tpgsr", "tatt"])
    p.add_argument("--test", action="store_true", default=False)
    p.add_argument("--test_data_dir", type=str, default="/root/data/TextZoom/test/easy")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--vis_dir", type=str, default=None)
    p.add_argument("--rec", default="aster", choices=["aster", "moran", "crnn"])
    p.add_argument("--mask", action="store_true", default=False)
    p.add_argument("--gradient", action="store_true", default=False)
    p.add_argument("--hd_u", type=int, default=32)
    p.add_argument("--srb", type=int, default=5)
    p.add_argument("--STN", action="store_true", default=False)
    p.add_argument("--patch_size", type=str, default="4,")
    p.add_argument("--embed_dim", type=str, default="96,")
    p.add_argument("--window_size", type=str, default="2,")
    p.add_argument("--depths", type=str, default="1,")
    p.add_argument("--num_heads", type=str, default="6,")
    p.add_argument("--mlp_ratio", type=str, default="4,")
    p.add_argument("--drop_rate", type=str, default="0,")
    p.add_argument("--attn_drop_rate", type=str, default="0,")
    p.add_argument("--drop_path_rate", type=str, default="0.1,")
    p.add_argument("--rotate_train", type=float, default=0.0)
    p.add_argument("--rotate_test", type=float, default=0.0)
    p.add_argument("--stu_iter_b1", type=int, default=1)
    p.add_argument("--stu_iter_b2", type=int, default=1)
    p.add_argument("--tpg", default="visionlan", type=str, choices=["aster", "moran", "crnn", "visionlan"])
    p.add_argument("--rec_path", type=str, default=None)
    p.add_argument("--font_path", type=str, default=None)
    p.add_argument("--sr_share", action="store_true", default=False)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--window_num", type=int, default=3)
    p.add_argument("--config", type=str, default="config/super_resolution.yaml")
    p.add_argument("--synthetic_data", action="store_true", default=False)
    p.add_argument("--corrected", action="store_true", default=False, help="disable faithful quirks")
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--debug_nans", action="store_true", default=False)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (batch_size is global)")
    return p


def args_from_namespace(ns) -> Args:
    a = Args()
    for k in vars(a):
        if hasattr(ns, k):
            setattr(a, k, getattr(ns, k))
    if getattr(ns, "corrected", False):
        a.faithful = False
    return a
