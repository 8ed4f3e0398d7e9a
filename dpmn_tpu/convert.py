"""torch .pth → flax params converters for the published model zoos.

The reference ships pretrained recognizers and PSNs as torch state_dicts
(config/super_resolution.yaml:39-42 paths; loading quirks at
interfaces/base.py:163-197,375-478 including DataParallel 'module.' prefix
stripping).  These converters map those tensors onto the dpmn_tpu flax
param/batch-stats trees.

Layout rules:
  Conv2d        (O,I,kh,kw) → kernel (kh,kw,I,O)
  ConvTranspose (I,O,kh,kw) → kernel (kh,kw,O,I)   (ops/torch_compat.py)
  Linear        (O,I)       → kernel (I,O)
  BatchNorm     weight/bias → params scale/bias; running_* → batch_stats
  GRU/LSTM      weight_ih_l0 (G*H,I) → w_ih_fw (I,G*H); *_reverse → *_bw
  MultiheadAttn in_proj_weight kept (3E,E); out_proj.weight transposed
  Embedding     kept (N,D)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove DataParallel 'module.' prefixes (base.py:383-386)."""
    return {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict_G" in obj:
        obj = obj["state_dict_G"]  # PGRM/PSN ckpts (base.py:168-180)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]  # ASTER ckpts (base.py:434)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in strip_module_prefix(obj).items()}


def t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_convT(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_lin(w):
    return np.ascontiguousarray(w.T)


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _bigru(sd, prefix):
    """torch nn.GRU(bidirectional) → ops.gru.BiGRU params."""
    return {
        "w_ih_fw": t_lin(sd[f"{prefix}.weight_ih_l0"]),
        "w_hh_fw": t_lin(sd[f"{prefix}.weight_hh_l0"]),
        "b_ih_fw": sd[f"{prefix}.bias_ih_l0"],
        "b_hh_fw": sd[f"{prefix}.bias_hh_l0"],
        "w_ih_bw": t_lin(sd[f"{prefix}.weight_ih_l0_reverse"]),
        "w_hh_bw": t_lin(sd[f"{prefix}.weight_hh_l0_reverse"]),
        "b_ih_bw": sd[f"{prefix}.bias_ih_l0_reverse"],
        "b_hh_bw": sd[f"{prefix}.bias_hh_l0_reverse"],
    }


def _bilstm(sd, prefix, layer=0):
    sfx = f"l{layer}"
    return {
        "w_ih_fw": t_lin(sd[f"{prefix}.weight_ih_{sfx}"]),
        "w_hh_fw": t_lin(sd[f"{prefix}.weight_hh_{sfx}"]),
        "b_ih_fw": sd[f"{prefix}.bias_ih_{sfx}"],
        "b_hh_fw": sd[f"{prefix}.bias_hh_{sfx}"],
        "w_ih_bw": t_lin(sd[f"{prefix}.weight_ih_{sfx}_reverse"]),
        "w_hh_bw": t_lin(sd[f"{prefix}.weight_hh_{sfx}_reverse"]),
        "b_ih_bw": sd[f"{prefix}.bias_ih_{sfx}_reverse"],
        "b_hh_bw": sd[f"{prefix}.bias_hh_{sfx}_reverse"],
    }


def _dense(sd, prefix):
    out = {"kernel": t_lin(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd, prefix):
    out = {"kernel": t_conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_crnn(sd: Dict[str, np.ndarray]):
    """CRNN (model/crnn/crnn.py:23-79) → (params, batch_stats)."""
    p, bs = {}, {}
    conv_map = {  # cnn.conv{i} → Conv_{j}
        "cnn.conv0": "Conv_0",
        "cnn.conv1": "Conv_1",
        "cnn.conv2": "Conv_2",
        "cnn.conv3": "Conv_3",
        "cnn.conv4": "Conv_4",
        "cnn.conv5": "Conv_5",
        "cnn.conv6": "Conv_6",
    }
    bn_map = {"cnn.batchnorm2": "BatchNorm_0", "cnn.batchnorm4": "BatchNorm_1", "cnn.batchnorm6": "BatchNorm_2"}
    for tk, fk in conv_map.items():
        p[fk] = _conv(sd, tk)
    for tk, fk in bn_map.items():
        p[fk], bs[fk] = _bn(sd, tk)
    for i in (0, 1):
        blk = f"BidirectionalLSTM_{i}"
        p[blk] = {
            "BiLSTM_0": _bilstm(sd, f"rnn.{i}.rnn"),
            "Dense_0": _dense(sd, f"rnn.{i}.embedding"),
        }
    return {"params": p, "batch_stats": bs}


def convert_tsrn(sd: Dict[str, np.ndarray], srb_nums: int = 5, stn: bool = False):
    """TSRN (model/tsrn.py:14-74) → (params, batch_stats).

    flax module order inside TSRN.__call__ (models/tsrn.py): [STN subtree if
    stn], Conv_0 (block1 conv), PReLU_0, RecurrentResidualBlock_0..n-1,
    Conv_1 (block srb+2), BatchNorm_0, UpsampleBlock_0, Conv_2 (final).
    """
    p, bs = {}, {}
    p["Conv_0"] = _conv(sd, "block1.0")
    p["PReLU_0"] = {"a": sd["block1.1.weight"]}
    for i in range(srb_nums):
        t = f"block{i + 2}"
        rp, rbs = {}, {}
        rp["Conv_0"] = _conv(sd, f"{t}.conv1")
        rp["BatchNorm_0"], rbs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
        rp["Conv_1"] = _conv(sd, f"{t}.conv2")
        rp["BatchNorm_1"], rbs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
        for g, gf in (("gru1", "GruBlock_0"), ("gru2", "GruBlock_1")):
            rp[gf] = {"Conv_0": _conv(sd, f"{t}.{g}.conv1"), "BiGRU_0": _bigru(sd, f"{t}.{g}.gru")}
        p[f"RecurrentResidualBlock_{i}"] = rp
        bs[f"RecurrentResidualBlock_{i}"] = rbs
    t = f"block{srb_nums + 2}"
    p["Conv_1"] = _conv(sd, f"{t}.0")
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{t}.1")
    t = f"block{srb_nums + 3}"
    p["UpsampleBlock_0"] = {"Conv_0": _conv(sd, f"{t}.0.conv")}
    p["Conv_2"] = _conv(sd, f"{t}.1")
    if stn:
        p["STNHead_0"], bs["STNHead_0"] = convert_stn_head(sd, "stn_head")
    return {"params": p, "batch_stats": bs}


def convert_stn_head(sd: Dict[str, np.ndarray], prefix: str = "stn_head"):
    """STNHead (model/stn_head.py:25-106) → (params, batch_stats) subtree."""
    p, bs = {}, {}
    # stn_convnet indices of conv blocks: 0,2,4,6,8,10 with Sequential(conv,bn,relu)
    conv_idx = [0, 2, 4, 6, 8, 10]
    for j, ci in enumerate(conv_idx):
        sub_p, sub_bs = {}, {}
        sub_p["Conv_0"] = _conv(sd, f"{prefix}.stn_convnet.{ci}.0")
        sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{prefix}.stn_convnet.{ci}.1")
        p[f"ConvBNReLU_{j}"] = sub_p
        bs[f"ConvBNReLU_{j}"] = sub_bs
    p["Dense_0"] = _dense(sd, f"{prefix}.stn_fc1.0")
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{prefix}.stn_fc1.1")
    p["Dense_1"] = _dense(sd, f"{prefix}.stn_fc2")
    return p, bs


def import_into(variables, converted):
    """Replace matching subtrees of a flax variables dict with converted
    arrays, verifying shapes."""
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"{path}/{k} not in target tree (have {list(dst)})")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                tgt = dst[k]
                if tuple(tgt.shape) != tuple(np.shape(v)):
                    raise ValueError(f"shape mismatch at {path}/{k}: {tgt.shape} vs {np.shape(v)}")
                out[k] = jax.numpy.asarray(v, tgt.dtype)
        return out

    out = dict(variables)
    for col in ("params", "batch_stats"):
        if col in converted and converted[col]:
            out[col] = merge(variables.get(col, {}), converted[col], col)
    return out
