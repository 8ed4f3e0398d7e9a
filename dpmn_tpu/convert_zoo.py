"""torch .pth converters for the recognizer/PSN/DPMN zoos.

Key layouts are derived from the reference sources:
  ASTER      model/recognizer/ (recognizer_builder.py, resnet_aster.py,
             attention_recognition_head.py, stn_head.py)
  MORAN      model/moran/ (morn.py, asrn_res.py)
  VisionLAN  model/VisionLAN/ (VisionLAN.py, modules/*.py)
  PGRM/CMM/Distill  model/pgrm.py, model/cmm.py, model/distill_module.py

All converters consume a flat numpy state dict (convert.load_torch_state_dict
applies the DataParallel prefix strip) and emit {params, batch_stats} trees
for convert.import_into.  Real published checkpoints have not been run
through these yet (none available in this environment); every mapping is
shape-checked on import.
"""

from __future__ import annotations

import numpy as np

from .convert import _bilstm, _bn, _conv, _dense, t_conv, t_convT, t_lin


def _grucell(sd, prefix):
    return {
        "w_ih": t_lin(sd[f"{prefix}.weight_ih"]),
        "w_hh": t_lin(sd[f"{prefix}.weight_hh"]),
        "b_ih": sd[f"{prefix}.bias_ih"],
        "b_hh": sd[f"{prefix}.bias_hh"],
    }


def _res_blocks(sd, layer_prefixes, blocks_per_layer):
    """ASTER/VisionLAN-style residual stacks → indexed block subtrees."""
    p, bs = {}, {}
    idx = 0
    for lp, nblocks in zip(layer_prefixes, blocks_per_layer):
        for j in range(nblocks):
            t = f"{lp}.{j}"
            sub_p, sub_bs = {}, {}
            sub_p["Conv_0"] = _conv(sd, f"{t}.conv1")
            sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
            sub_p["Conv_1"] = _conv(sd, f"{t}.conv2")
            sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                sub_p["Conv_2"] = _conv(sd, f"{t}.downsample.0")
                sub_p["BatchNorm_2"], sub_bs["BatchNorm_2"] = _bn(sd, f"{t}.downsample.1")
            p[idx], bs[idx] = sub_p, sub_bs
            idx += 1
    return p, bs


def convert_aster(sd):
    """RecognizerBuilder (recognizer_builder.py:27-104)."""
    from .convert import convert_stn_head

    p, bs = {}, {}
    enc_p, enc_bs = {}, {}
    enc_p["Conv_0"] = _conv(sd, "encoder.layer0.0")
    enc_p["BatchNorm_0"], enc_bs["BatchNorm_0"] = _bn(sd, "encoder.layer0.1")
    blocks, blocks_bs = _res_blocks(
        sd, [f"encoder.layer{i}" for i in range(1, 6)], [3, 4, 6, 6, 3]
    )
    for i in blocks:
        enc_p[f"AsterBlock_{i}"] = blocks[i]
        enc_bs[f"AsterBlock_{i}"] = blocks_bs[i]
    enc_p["lstm0"] = _bilstm(sd, "encoder.rnn", 0)
    enc_p["lstm1"] = _bilstm(sd, "encoder.rnn", 1)
    p["encoder"], bs["encoder"] = enc_p, enc_bs

    d = "decoder.decoder"
    p["decoder"] = {
        "s_embed_kernel": t_lin(sd[f"{d}.attention_unit.sEmbed.weight"]),
        "s_embed_bias": sd[f"{d}.attention_unit.sEmbed.bias"],
        "x_embed_kernel": t_lin(sd[f"{d}.attention_unit.xEmbed.weight"]),
        "x_embed_bias": sd[f"{d}.attention_unit.xEmbed.bias"],
        "w_embed_kernel": t_lin(sd[f"{d}.attention_unit.wEmbed.weight"]),
        "w_embed_bias": sd[f"{d}.attention_unit.wEmbed.bias"],
        "tgt_embedding": sd[f"{d}.tgt_embedding.weight"],
        "gru_w_ih": t_lin(sd[f"{d}.gru.weight_ih_l0"]),
        "gru_w_hh": t_lin(sd[f"{d}.gru.weight_hh_l0"]),
        "gru_b_ih": sd[f"{d}.gru.bias_ih_l0"],
        "gru_b_hh": sd[f"{d}.gru.bias_hh_l0"],
        "fc_kernel": t_lin(sd[f"{d}.fc.weight"]),
        "fc_bias": sd[f"{d}.fc.bias"],
    }
    if "stn_head.stn_fc2.weight" in sd:
        p["stn_head"], bs["stn_head"] = convert_stn_head(sd, "stn_head")
    return {"params": p, "batch_stats": bs}


def convert_moran(sd):
    """MORAN = MORN + ASRN (moran.py:6-22)."""
    p, bs = {}, {}
    # MORN cnn Sequential conv indices 1,5,9,12,15; bn 2,6,10,13,16 (morn.py:16-23)
    morn_p, morn_bs = {}, {}
    for i, (ci, bi) in enumerate(((1, 2), (5, 6), (9, 10), (12, 13), (15, 16)), start=1):
        morn_p[f"conv{i}"] = _conv(sd, f"MORN.cnn.{ci}")
        morn_p[f"bn{i}"], morn_bs[f"bn{i}"] = _bn(sd, f"MORN.cnn.{bi}")
    p["MORN"], bs["MORN"] = morn_p, morn_bs

    asrn_p, asrn_bs = {}, {}
    rn_p, rn_bs = {}, {}
    rn_p["Conv_0"] = _conv(sd, "ASRN.cnn.block0.0")
    rn_p["BatchNorm_0"], rn_bs["BatchNorm_0"] = _bn(sd, "ASRN.cnn.block0.1")
    idx = 0
    for li, nblocks in zip(range(1, 6), (3, 4, 6, 6, 3)):
        for j in range(nblocks):
            t = f"ASRN.cnn.block{li}.{j}"
            sub_p, sub_bs = {}, {}
            down = f"{t}.downsample.0.weight" in sd
            if down:
                # creation order quirk: the downsample BN is BatchNorm_0
                sub_p["down_conv"] = _conv(sd, f"{t}.downsample.0")
                sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.downsample.1")
                sub_p["Conv_0"] = _conv(sd, f"{t}.conv1.0")
                sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.conv1.1")
                sub_p["Conv_1"] = _conv(sd, f"{t}.conv2.0")
                sub_p["BatchNorm_2"], sub_bs["BatchNorm_2"] = _bn(sd, f"{t}.conv2.1")
            else:
                sub_p["Conv_0"] = _conv(sd, f"{t}.conv1.0")
                sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.conv1.1")
                sub_p["Conv_1"] = _conv(sd, f"{t}.conv2.0")
                sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.conv2.1")
            rn_p[f"ResidualBlockMoran_{idx}"] = sub_p
            rn_bs[f"ResidualBlockMoran_{idx}"] = sub_bs
            idx += 1
    asrn_p["ResNetMoran_0"], asrn_bs["ResNetMoran_0"] = rn_p, rn_bs
    for i in (0, 1):
        asrn_p[f"rnn{i}"] = _bilstm(sd, f"ASRN.rnn.{i}.rnn")
        asrn_p[f"rnn{i}_embed"] = _dense(sd, f"ASRN.rnn.{i}.embedding")
    for tag in ("attentionL2R", "attentionR2L"):
        t = f"ASRN.{tag}"
        asrn_p[tag] = {
            "i2h_kernel": t_lin(sd[f"{t}.attention_cell.i2h.weight"]),
            "h2h_kernel": t_lin(sd[f"{t}.attention_cell.h2h.weight"]),
            "h2h_bias": sd[f"{t}.attention_cell.h2h.bias"],
            "score_kernel": t_lin(sd[f"{t}.attention_cell.score.weight"]),
            "gru_w_ih": t_lin(sd[f"{t}.attention_cell.rnn.weight_ih"]),
            "gru_w_hh": t_lin(sd[f"{t}.attention_cell.rnn.weight_hh"]),
            "gru_b_ih": sd[f"{t}.attention_cell.rnn.bias_ih"],
            "gru_b_hh": sd[f"{t}.attention_cell.rnn.bias_hh"],
            "generator_kernel": t_lin(sd[f"{t}.generator.weight"]),
            "generator_bias": sd[f"{t}.generator.bias"],
            "char_embeddings": sd[f"{t}.char_embeddings"],
        }
    p["ASRN"], bs["ASRN"] = asrn_p, asrn_bs
    return {"params": p, "batch_stats": bs}


def _vl_encoder(sd, prefix, n_layers):
    p, bs = {}, {}
    for i in range(n_layers):
        t = f"{prefix}.layer_stack.{i}"
        lp = {
            "w_qs": _dense(sd, f"{t}.slf_attn.w_qs"),
            "w_ks": _dense(sd, f"{t}.slf_attn.w_ks"),
            "w_vs": _dense(sd, f"{t}.slf_attn.w_vs"),
            "fc": _dense(sd, f"{t}.slf_attn.fc"),
            "attn_norm": {"scale": sd[f"{t}.slf_attn.layer_norm.weight"], "bias": sd[f"{t}.slf_attn.layer_norm.bias"]},
            # PFF conv1d (out, in, 1) → Dense (in, out)
            "w_1": {"kernel": sd[f"{t}.pos_ffn.w_1.weight"][:, :, 0].T, "bias": sd[f"{t}.pos_ffn.w_1.bias"]},
            "w_2": {"kernel": sd[f"{t}.pos_ffn.w_2.weight"][:, :, 0].T, "bias": sd[f"{t}.pos_ffn.w_2.bias"]},
            "ffn_norm": {"scale": sd[f"{t}.pos_ffn.layer_norm.weight"], "bias": sd[f"{t}.pos_ffn.layer_norm.bias"]},
        }
        p[f"layer_{i}"] = lp
    p["norm"] = {"scale": sd[f"{prefix}.layer_norm.weight"], "bias": sd[f"{prefix}.layer_norm.bias"]}
    return p, bs


def _pp_layer(sd, prefix):
    return {
        "f0_embedding": {"embedding": sd[f"{prefix}.f0_embedding.weight"]},
        "w0": _dense(sd, f"{prefix}.w0"),
        "wv": _dense(sd, f"{prefix}.wv"),
        "we": _dense(sd, f"{prefix}.we"),
    }


def convert_visionlan(sd, mlm: bool = True):
    """VisionLAN (VisionLAN.py:142-167).  mlm=False skips the train-only MLM
    occlusion branch (+ pp_share/w_share) for import into an eval-path tree
    initialized with train=False."""
    p, bs = {}, {}
    bb_p, bb_bs = {}, {}
    bb_p["Conv_0"] = _conv(sd, "backbone.conv1_new")
    bb_p["BatchNorm_0"], bb_bs["BatchNorm_0"] = _bn(sd, "backbone.bn1")
    idx = 0
    for li, nblocks in zip(range(1, 6), (3, 4, 6, 6, 3)):
        for j in range(nblocks):
            t = f"backbone.layer{li}.{j}"
            sub_p, sub_bs = {}, {}
            sub_p["Conv_0"] = _conv(sd, f"{t}.conv1")
            sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
            sub_p["Conv_1"] = _conv(sd, f"{t}.conv2")
            sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                sub_p["Conv_2"] = _conv(sd, f"{t}.downsample.0")
                sub_p["BatchNorm_2"], sub_bs["BatchNorm_2"] = _bn(sd, f"{t}.downsample.1")
            bb_p[f"BasicBlockVL_{idx}"] = sub_p
            bb_bs[f"BasicBlockVL_{idx}"] = sub_bs
            idx += 1
    p["backbone"], bs["backbone"] = bb_p, bb_bs

    p["SequenceModeling"], _ = _vl_encoder(sd, "MLM_VRM.SequenceModeling", 3)
    p["pp"] = _pp_layer(sd, "MLM_VRM.Prediction.pp")
    p["w_vrm"] = _dense(sd, "MLM_VRM.Prediction.w_vrm")
    if mlm and "MLM_VRM.MLM.pos_embedding.weight" in sd:
        mlm = {}
        mlm["MLM_SequenceModeling_mask"], _ = _vl_encoder(sd, "MLM_VRM.MLM.MLM_SequenceModeling_mask", 2)
        mlm["MLM_SequenceModeling_WCL"], _ = _vl_encoder(sd, "MLM_VRM.MLM.MLM_SequenceModeling_WCL", 1)
        mlm["pos_embedding"] = {"embedding": sd["MLM_VRM.MLM.pos_embedding.weight"]}
        mlm["w0_linear"] = _dense(sd, "MLM_VRM.MLM.w0_linear")
        mlm["wv"] = _dense(sd, "MLM_VRM.MLM.wv")
        mlm["we"] = _dense(sd, "MLM_VRM.MLM.we")
        p["MLM"] = mlm
        p["pp_share"] = _pp_layer(sd, "MLM_VRM.Prediction.pp_share")
        p["w_share"] = _dense(sd, "MLM_VRM.Prediction.w_share")
    return {"params": p, "batch_stats": bs}


def convert_distill(sd):
    """DistillModule (model/distill_module.py:4-31)."""
    p, bs = {}, {}
    p["conv_cat_feature"] = _conv(sd, "conv_cat_feature")
    p["bn_1"], bs["bn_1"] = _bn(sd, "bn_1")
    p["conv_feature"] = _conv(sd, "conv_feature")
    p["bn_2"], bs["bn_2"] = _bn(sd, "bn_2")
    return {"params": p, "batch_stats": bs}


def convert_cmm(sd, cnum: int = 64):
    """CMM (model/cmm.py:80-161)."""
    p, bs = {}, {}
    for tag in ("1", "2"):
        p[f"en_1_{tag}"] = _conv(sd, f"en_1_{tag}")
        for stage in range(2, 6):
            t = f"en_{stage}_{tag}"
            sub_p, sub_bs = {}, {}
            sub_p["Conv_0"] = _conv(sd, f"{t}.encode.1")
            sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.encode.2")
            sub_p["Conv_1"] = _conv(sd, f"{t}.encode.4")
            sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.encode.5")
            p[t], bs[t] = sub_p, sub_bs
        p[f"en_6_{tag}"] = _conv(sd, f"en_6_{tag}.1")
    p["fc_1"] = _dense(sd, "fc_1")
    p["fc_2"] = _dense(sd, "fc_2")
    p["de_6_conv"] = {"kernel": t_convT(sd["de_6.1.weight"]), "bias": sd["de_6.1.bias"]}
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, "de_6.2")
    for stage in range(5, 1, -1):
        t = f"de_{stage}"
        sub_p, sub_bs = {}, {}
        sub_p["ConvTranspose2dTorch_0"] = {"kernel": t_convT(sd[f"{t}.decode.1.weight"]), "bias": sd[f"{t}.decode.1.bias"]}
        sub_p["BatchNorm_0"], sub_bs["BatchNorm_0"] = _bn(sd, f"{t}.decode.2")
        sub_p["ConvTranspose2dTorch_1"] = {"kernel": t_convT(sd[f"{t}.decode.4.weight"]), "bias": sd[f"{t}.decode.4.bias"]}
        sub_p["BatchNorm_1"], sub_bs["BatchNorm_1"] = _bn(sd, f"{t}.decode.5")
        p[t], bs[t] = sub_p, sub_bs
    p["de_1_conv"] = {"kernel": t_convT(sd["de_1.1.weight"]), "bias": sd["de_1.1.bias"]}
    return {"params": p, "batch_stats": bs}


def convert_pgrm(sd, num_layers: int = 1, window_num: int = 3, graphic_mode: bool = True):
    """PGRM (model/pgrm.py:460-574)."""
    p, bs = {}, {}
    if graphic_mode and "prior_fusion.weight" in sd:
        p["prior_fusion"] = _conv(sd, "prior_fusion")
    p["patch_embed"] = _conv(sd, "patch_embed.proj")
    if "patch_embed.norm.weight" in sd:
        p["patch_norm"] = {"scale": sd["patch_embed.norm.weight"], "bias": sd["patch_embed.norm.bias"]}
    for l in range(num_layers):
        layer = {}
        for b in range(2):
            t = f"layers.{l}.blocks.{b}"
            blk = {
                "norm1_q": {"scale": sd[f"{t}.norm1_q.weight"], "bias": sd[f"{t}.norm1_q.bias"]},
                "norm1_kv": {"scale": sd[f"{t}.norm1_kv.weight"], "bias": sd[f"{t}.norm1_kv.bias"]},
                "norm2": {"scale": sd[f"{t}.norm2.weight"], "bias": sd[f"{t}.norm2.bias"]},
            }
            attn = {"q": _dense(sd, f"{t}.attn.q"), "kv": _dense(sd, f"{t}.attn.kv")}
            for i in range(window_num):
                attn[f"relative_position_bias_table_{i}"] = sd[f"{t}.attn.relative_position_bias_table_{i}"]
            attn["SKConv_0"] = {
                "Dense_0": _dense(sd, f"{t}.attn.sknet.proj"),
                "Dense_1": _dense(sd, f"{t}.attn.sknet.fc1"),
                "Dense_2": _dense(sd, f"{t}.attn.sknet.fc2"),
                "Dense_3": _dense(sd, f"{t}.attn.sknet.proj_head"),
            }
            blk["WindowAttention_0"] = attn
            blk["Mlp_0"] = {
                "Dense_0": _dense(sd, f"{t}.mlp.fc1"),
                "Dense_1": _dense(sd, f"{t}.mlp.fc2"),
                "dw_kernel": t_conv(sd[f"{t}.mlp.depthwise_conv.weight"]),
                "dw_bias": sd[f"{t}.mlp.depthwise_conv.bias"],
                "pw_kernel": t_conv(sd[f"{t}.mlp.pointwise_conv.weight"]),
                "pw_bias": sd[f"{t}.mlp.pointwise_conv.bias"],
            }
            layer[f"SwinTransformerBlock_{b}"] = blk
        p[f"BasicLayer_{l}"] = layer
    p["Conv_0"] = _conv(sd, "conv_before_upsample.0")
    p["Conv_1"] = _conv(sd, "conv_before_upsample.1")
    i = 0
    while f"weight_list_{i}" in sd:
        p[f"weight_list_{i}"] = np.transpose(sd[f"weight_list_{i}"], (0, 2, 3, 1))
        i += 1
    return {"params": p, "batch_stats": bs}
