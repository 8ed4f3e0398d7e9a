"""torch .pth converters for the TBSRN and TATT PSNs.

Key layouts from model/tbsrn.py and model/tatt.py + model/transformer_v2.py.
TBSRN's unused conv/bn/relu head and per-SRB gru1/gru2 modules exist in
torch checkpoints but have no live counterpart (tbsrn.py:246-257 never calls
them) — they are skipped.  TATT's decoder-layer self_attn/norm1 params are
likewise dead (TransformerDecoderLayer_TP.forward_post comments the
self-attention out, transformer_v2.py:816-820).
"""

from __future__ import annotations

import numpy as np

from .convert import _bigru, _bn, _conv, _dense, convert_stn_head, t_convT, t_lin


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha_packed(sd, prefix):
    """torch nn.MultiheadAttention → ops.attention.MultiHeadAttention."""
    return {
        "in_proj_weight": sd[f"{prefix}.in_proj_weight"],
        "in_proj_bias": sd[f"{prefix}.in_proj_bias"],
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _mha_cloned(sd, prefix):
    """tbsrn MultiHeadedAttention (4 cloned linears) → packed layout."""
    w = np.concatenate([sd[f"{prefix}.linears.{i}.weight"] for i in range(3)], axis=0)
    b = np.concatenate([sd[f"{prefix}.linears.{i}.bias"] for i in range(3)], axis=0)
    return {
        "in_proj_weight": w,
        "in_proj_bias": b,
        "out_proj": _dense(sd, f"{prefix}.linears.3"),
    }


def _gru_block(sd, prefix):
    return {"Conv_0": _conv(sd, f"{prefix}.conv1"), "BiGRU_0": _bigru(sd, f"{prefix}.gru")}


def convert_tbsrn(sd, srb_nums: int = 5, stn: bool = False):
    """TBSRN (model/tbsrn.py:166-226)."""
    p, bs = {}, {}
    p["Conv_0"] = _conv(sd, "block1.0")
    p["PReLU_0"] = {"a": sd["block1.1.weight"]}
    for i in range(srb_nums):
        t = f"block{i + 2}"
        sub_p, sub_bs = {}, {}
        sub_p["Conv_0"] = _conv(sd, f"{t}.conv1")
        sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
        sub_p["Conv_1"] = _conv(sd, f"{t}.conv2")
        sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
        fe = f"{t}.feature_enhancer"
        sub_p["FeatureEnhancer_0"] = {
            "MultiHeadAttention_0": _mha_cloned(sd, f"{fe}.multihead"),
            "TorchRefLayerNorm_0": {"a_2": sd[f"{fe}.mul_layernorm1.a_2"], "b_2": sd[f"{fe}.mul_layernorm1.b_2"]},
            "Dense_0": _dense(sd, f"{fe}.pff.w_1"),
            "Dense_1": _dense(sd, f"{fe}.pff.w_2"),
            "TorchRefLayerNorm_1": {"a_2": sd[f"{fe}.mul_layernorm3.a_2"], "b_2": sd[f"{fe}.mul_layernorm3.b_2"]},
            "Dense_2": _dense(sd, f"{fe}.linear"),
        }
        p[f"TBSRNBlock_{i}"] = sub_p
        bs[f"TBSRNBlock_{i}"] = sub_bs
    t = f"block{srb_nums + 2}"
    p["Conv_1"] = _conv(sd, f"{t}.0")
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{t}.1")
    t = f"block{srb_nums + 3}"
    p["Conv_2"] = _conv(sd, f"{t}.0.conv")
    p["Conv_3"] = _conv(sd, f"{t}.1")
    if stn and "stn_head.stn_fc2.weight" in sd:
        p["STNHead_0"], bs["STNHead_0"] = convert_stn_head(sd, "stn_head")
    return {"params": p, "batch_stats": bs}


def convert_tsrn_tl(sd, srb_nums: int = 5, stn: bool = False):
    """TSRN_TL — the tpgsr PSN (model/tsrn.py:153-247 + InfoGen :281-308)."""
    p, bs = {}, {}
    p["Conv_0"] = _conv(sd, "block1.0")
    p["PReLU_0"] = {"a": sd["block1.1.weight"]}
    for i in range(srb_nums):
        t = f"block{i + 2}"
        sub_p, sub_bs = {}, {}
        sub_p["Conv_0"] = _conv(sd, f"{t}.conv1")
        sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
        sub_p["Conv_1"] = _conv(sd, f"{t}.conv2")
        sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
        sub_p["GruBlock_0"] = _gru_block(sd, f"{t}.gru1")
        sub_p["GruBlock_1"] = _gru_block(sd, f"{t}.gru2")
        p[f"RecurrentResidualBlockTL_{i}"] = sub_p
        bs[f"RecurrentResidualBlockTL_{i}"] = sub_bs
    ig_p, ig_bs = {}, {}
    for j in range(4):
        ig_p[f"ConvTranspose2dTorch_{j}"] = {"kernel": t_convT(sd[f"infoGen.tconv{j + 1}.weight"])}
        ig_p[f"BatchNorm_{j}"], ig_bs[f"BatchNorm_{j}"] = _bn(sd, f"infoGen.bn{j + 1}")
    p["InfoGen_0"], bs["InfoGen_0"] = ig_p, ig_bs
    t = f"block{srb_nums + 2}"
    p["Conv_1"] = _conv(sd, f"{t}.0")
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{t}.1")
    t = f"block{srb_nums + 3}"
    p["UpsampleBlock_0"] = {"Conv_0": _conv(sd, f"{t}.0.conv")}
    p["Conv_2"] = _conv(sd, f"{t}.1")
    if stn:
        p["STNHead_0"], bs["STNHead_0"] = convert_stn_head(sd, "stn_head")
    return {"params": p, "batch_stats": bs}


def convert_tatt(sd, srb_nums: int = 5, stn: bool = False):
    """TSRN_TL_TRANS (model/tatt.py:575-691)."""
    p, bs = {}, {}
    p["Conv_0"] = _conv(sd, "block1.0")
    p["PReLU_0"] = {"a": sd["block1.1.weight"]}
    for i in range(srb_nums):
        t = f"block{i + 2}"
        sub_p, sub_bs = {}, {}
        sub_p["Conv_0"] = _conv(sd, f"{t}.conv1")
        sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
        sub_p["Conv_1"] = _conv(sd, f"{t}.conv2")
        sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
        sub_p["GruBlock_0"] = _gru_block(sd, f"{t}.gru1")
        sub_p["GruBlock_1"] = _gru_block(sd, f"{t}.gru2")
        p[f"RecurrentResidualBlockTL_{i}"] = sub_p
        bs[f"RecurrentResidualBlockTL_{i}"] = sub_bs

    ig = "infoGen"
    ut = f"{ig}.upsample_transformer"
    info = {
        "fc_in": _dense(sd, f"{ig}.fc_in"),
        "PReLU_0": {"a": sd[f"{ig}.activation.weight"]},
    }
    upt = {
        "init_factor": sd[f"{ig}.init_factor.weight"],
        "gru_encoding": _bigru(sd, f"{ut}.gru_encoding"),
        "encoder_0": {
            "MultiHeadAttention_0": _mha_packed(sd, f"{ut}.encoder.layers.0.self_attn"),
            "norm1": _ln(sd, f"{ut}.encoder.layers.0.norm1"),
            "linear1": _dense(sd, f"{ut}.encoder.layers.0.linear1"),
            "linear2": _dense(sd, f"{ut}.encoder.layers.0.linear2"),
            "norm2": _ln(sd, f"{ut}.encoder.layers.0.norm2"),
        },
        "decoder_norm": _ln(sd, f"{ut}.decoder.norm"),
    }
    for i in range(2):
        d = f"{ut}.decoder.layers.{i}"
        upt[f"decoder_{i}"] = {
            "MultiHeadAttention_0": _mha_packed(sd, f"{d}.multihead_attn"),
            "norm2": _ln(sd, f"{d}.norm2"),
            "linear1": _dense(sd, f"{d}.linear1"),
            "linear2": _dense(sd, f"{d}.linear2"),
            "norm3": _ln(sd, f"{d}.norm3"),
        }
    info["upsample_transformer"] = upt
    p["infoGen"] = info

    t = f"block{srb_nums + 2}"
    p["Conv_1"] = _conv(sd, f"{t}.0")
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{t}.1")
    t = f"block{srb_nums + 3}"
    p["Conv_2"] = _conv(sd, f"{t}.0.conv")
    p["Conv_3"] = _conv(sd, f"{t}.1")
    if stn and "stn_head.stn_fc2.weight" in sd:
        p["STNHead_0"], bs["STNHead_0"] = convert_stn_head(sd, "stn_head")
    return {"params": p, "batch_stats": bs}
