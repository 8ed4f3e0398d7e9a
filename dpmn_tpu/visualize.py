"""Visualization dumps (reference interfaces/base.py:275-326).

tripple_display: save up to n_vis LR(upscaled)/SR/HR triptychs per eval as
PNG named '<pred_lr>_<pred_sr>_<label>_.png' under vis_dir/<index>/.
test_display: save only the misrecognized samples under vis_dir/display/.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .utils.labels import str_filt


def _to_u8(img) -> np.ndarray:
    arr = np.asarray(img)[..., :3]
    return (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)


def _triptych(lr, sr, hr) -> Image.Image:
    h, w = sr.shape[0], sr.shape[1]
    lr_img = Image.fromarray(_to_u8(lr)).resize((w, h), Image.BICUBIC)
    canvas = Image.new("RGB", (w, h * 3))
    canvas.paste(lr_img, (0, 0))
    canvas.paste(Image.fromarray(_to_u8(sr)), (0, h))
    canvas.paste(Image.fromarray(_to_u8(hr)), (0, h * 2))
    return canvas


def tripple_display(images_lr, images_sr, images_hr, pred_str_lr, pred_str_sr, label_strs,
                    index, vis_dir: str, n_vis: int = 10):
    out_path = os.path.join(vis_dir, str(index))
    os.makedirs(out_path, exist_ok=True)
    n = min(len(label_strs), n_vis)
    for i in range(n):
        name = f"{pred_str_lr[i]}_{pred_str_sr[i]}_{label_strs[i]}_.png".replace("/", "")
        _triptych(images_lr[i], images_sr[i], images_hr[i]).save(os.path.join(out_path, name))
    return n


def test_display(images_lr, images_sr, images_hr, pred_str_lr, pred_str_sr, label_strs, vis_dir: str):
    out_root = os.path.join(vis_dir, "display")
    os.makedirs(out_root, exist_ok=True)
    visualized = 0
    for i in range(len(label_strs)):
        if str_filt(pred_str_sr[i], "lower") != str_filt(label_strs[i], "lower"):
            visualized += 1
            name = (
                f"{str_filt(pred_str_lr[i], 'lower')}_{str_filt(pred_str_sr[i], 'lower')}_"
                f"{str_filt(label_strs[i], 'lower')}_.png"
            ).replace("/", "")
            _triptych(images_lr[i], images_sr[i], images_hr[i]).save(os.path.join(out_root, name))
    return visualized


def visionlan_attention_display(
    images,
    att_masks,
    label_ids,
    label_subs,
    vis_dir: str,
    epoch: int = 0,
    batch_idx: int = 0,
    max_visualize_num: int = 30,
    start_count: int = 0,
):
    """Dump VisionLAN MLM occlusion-attention maps next to their inputs
    (reference model/VisionLAN/visualize.py:86-99).

    images: (B, 64, 256, 3) in [-1, 1] (the VisionLAN input normalization);
    att_masks: (B, 1, 256) per-token occlusion attention from the MLM branch
    (our VisionLAN returns it as the 4th output in LA/LF_2 training mode);
    label_ids / label_subs: the character-position index and the occluded
    character, used verbatim in the mask filename like the reference.

    Faithful to the reference: the input PNG is ((img + 1).clip(0, 2) *
    127.5); the (256,) token-attention vector is treated as a 256x1 image
    and bilinearly resized to 256x64 (tokens along x), so each column is one
    W-major feature-map token.  Returns the number of maps written in this
    call (the caller stops at max_visualize_num like the reference loop).
    """
    import cv2

    os.makedirs(vis_dir, exist_ok=True)
    images = np.asarray(images)
    att_masks = np.asarray(att_masks)
    written = 0
    for ind in range(images.shape[0]):
        if start_count + written >= max_visualize_num:
            break
        img = ((images[ind] + 1.0).clip(0.0, 2.0) * 127.5).astype(np.uint8)
        cv2.imwrite(os.path.join(vis_dir, f"{epoch}-{batch_idx}-{ind}.png"), img[..., ::-1])
        mask = (att_masks[ind].squeeze() * 255).astype(np.uint8)  # (256,)
        mask = cv2.resize(mask, (256, 64))  # (64, 256): tokens stretched over x
        cv2.imwrite(
            os.path.join(vis_dir, f"{epoch}-{batch_idx}-{ind}-{label_ids[ind]}{label_subs[ind]}.png"),
            mask,
        )
        written += 1
    return written
