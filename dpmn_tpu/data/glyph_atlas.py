"""Device-side glyph prior: pre-rasterized atlas + on-device composition.

The reference renders the recognized word per sample per cascade iteration
on the host (utils/render_standard_text.py via super_resolution.py:186-193):
fit a font size to the padded canvas, render, tight-crop the ink box, and
stretch the crop edge-to-edge over the full canvas
(render_standard_text.py:70).  The TPU runtime used here does not support
host callbacks inside jit, and a host round-trip per PGRM iteration would
serialize the pipeline — so the glyph prior is computed ON DEVICE with
proportional char widths:

  host, once:
    * render every charset char (lower+upper) at a FIXED font size on a
      shared baseline; store the advance box resized to a CELL x CELL cell
      plus the true advance width and ink bands (pygame.freetype applies no
      kerning, so host word layout == advance concatenation);
    * precompute a bank of row-resize matrices, one per vertical (top, bot)
      ink band, replicating the tight-crop→stretch vertically.

  device, per batch:
    * gather cells by char id → strip (B, CELL, 25*CELL)
    * word band = (min char top, max char bot) → select row matrix
    * build the per-sample proportional column-resize matrix by evaluating
      the bicubic kernel densely over (strip px, canvas col) — VPU work —
      mapping the word's horizontal ink box edge-to-edge like the host crop
    * two batched matmuls: rows then columns — MXU work, no host.

'callback' mode retains bit-parity (whole-word render, exact crop) on
runtimes that support host callbacks.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..ops.resize import resize_matrix
from ..utils.labels import DIC_36

MONO_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"
CELL = 32
MAX_LEN = 25


def _render_char_cell(font, ch: str):
    """Render one char on a fixed baseline into a (CELL, CELL) cell.

    Returns (cell float32, top, bot, adv, ink_l, ink_r): [top, bot) is the
    ink row band; adv the glyph's horizontal advance in native px (the
    proportional width used at composition time); [ink_l, ink_r) the ink
    column band within the advance box, also in native px.
    """
    import cv2
    import pygame
    import pygame.locals

    from .glyph import _ensure_pygame

    _ensure_pygame()
    # fixed geometry: baseline at 3/4 of the band, font size fits ascenders
    # + descenders of the face inside CELL rows
    size = int(CELL * 0.72)
    font.size = size
    band_h = CELL
    metrics = font.get_metrics(ch)
    adv = max(int(round(metrics[0][4])) if metrics and metrics[0] else 1, 1)
    surf = pygame.Surface((4 * CELL, 2 * band_h), pygame.locals.SRCALPHA, 32)
    baseline = int(band_h * 0.78)
    font.render_to(surf, (CELL, baseline), ch)
    arr = pygame.surfarray.pixels_alpha(surf).swapaxes(0, 1)[:band_h].astype(np.float32)
    # horizontal: take the advance box starting at the pen position —
    # pygame.freetype applies no kerning by default, so word layout is a
    # pure concatenation of advance boxes (matches the host renderer)
    box = arr[:, CELL : CELL + adv]
    ink = np.where(box > 20)
    if ink[0].size == 0:
        return np.zeros((CELL, CELL), np.float32), CELL // 2, CELL // 2 + 1, float(adv), 0.0, float(adv)
    cell = cv2.resize(box, (CELL, CELL), interpolation=cv2.INTER_CUBIC) if box.shape[1] != CELL else box.copy()
    top, bot = int(ink[0].min()), int(ink[0].max()) + 1
    ink_l, ink_r = float(ink[1].min()), float(ink[1].max()) + 1.0
    return cell, top, bot, float(adv), ink_l, ink_r


@functools.lru_cache(maxsize=8)
def build_atlas(shape=(32, 128), font_path: str = None):
    """Returns (atlas (2, C, CELL, CELL), tops (2, C), bots (2, C),
    row_bank ((CELL+1)^2, H, CELL), advs/inkls/inkrs (2, C) float32)."""
    from pygame import freetype

    from .glyph import _DEFAULT_FONT, _ensure_pygame

    _ensure_pygame()
    font = freetype.Font(font_path or _DEFAULT_FONT)
    font.antialiased = True
    font.origin = True

    h, w = shape
    n = len(DIC_36)
    atlas = np.zeros((2, n + 1, CELL, CELL), np.float32)
    tops = np.full((2, n + 1), CELL, np.int32)  # blank = neutral band
    bots = np.zeros((2, n + 1), np.int32)
    advs = np.ones((2, n + 1), np.float32)
    inkls = np.zeros((2, n + 1), np.float32)
    inkrs = np.ones((2, n + 1), np.float32)
    for i, ch in enumerate(DIC_36):
        for case, c in ((0, ch), (1, ch.upper())):
            cell, top, bot, adv, ink_l, ink_r = _render_char_cell(font, c)
            atlas[case, i + 1] = cell
            tops[case, i + 1] = top
            bots[case, i + 1] = bot
            advs[case, i + 1] = adv
            inkls[case, i + 1] = ink_l
            inkrs[case, i + 1] = ink_r

    # bank of row matrices: band [top, bot) → full canvas height
    row_bank = np.zeros(((CELL + 1) * (CELL + 1), h, CELL), np.float32)
    for top in range(CELL):
        for bot in range(top + 1, CELL + 1):
            m = resize_matrix(bot - top, h, "bicubic", False)  # (h, bot-top)
            full = np.zeros((h, CELL), np.float32)
            full[:, top:bot] = m
            row_bank[top * (CELL + 1) + bot] = full
    # identity-ish fallback for degenerate bands
    row_bank[0] = np.pad(resize_matrix(CELL, h, "bicubic", False), ((0, 0), (0, 0)))

    return atlas, tops, bots, row_bank, advs, inkls, inkrs


def _cubic_weight_jnp(t, a: float = -0.75):
    """torch/cv2 bicubic kernel (a=-0.75), evaluated elementwise."""
    import jax.numpy as jnp

    at = jnp.abs(t)
    w1 = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    w2 = a * (((at - 5.0) * at + 8.0) * at - 4.0)
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def make_device_glyph_fn(shape=(32, 128), font_path: str = None):
    """Returns a jit-safe fn (char_ids (B, 25) int32 1-based, lengths (B,)
    int32) → (B, H, W, 2) float32 glyph priors at uint8 value scale.

    Proportional composition: each char contributes its TRUE advance width
    (pygame.freetype applies no kerning, so the host word layout is exactly
    advance concatenation); the word's horizontal ink box [first char's ink
    left, last char's ink right) is stretched edge-to-edge like the host
    tight-crop (render_standard_text.py:70).  The per-sample column resize
    matrix is built on device by evaluating the bicubic kernel densely over
    (strip pixel, canvas column) — pure VPU work, no gathers."""
    import jax.numpy as jnp

    atlas_np, tops_np, bots_np, row_bank_np, advs_np, inkls_np, inkrs_np = build_atlas(
        tuple(shape), font_path
    )
    atlas = jnp.asarray(atlas_np)
    tops = jnp.asarray(tops_np)
    bots = jnp.asarray(bots_np)
    row_bank = jnp.asarray(row_bank_np)
    advs = jnp.asarray(advs_np)
    inkls = jnp.asarray(inkls_np)
    inkrs = jnp.asarray(inkrs_np)
    h, w = shape
    s_pix = np.arange(MAX_LEN * CELL)
    cell_of_s = jnp.asarray(s_pix // CELL, jnp.int32)  # static char index per strip px
    off_of_s = jnp.asarray((s_pix % CELL + 0.5) / CELL, jnp.float32)

    def glyph_fn(char_ids, lengths):
        b = char_ids.shape[0]
        lengths_c = jnp.clip(lengths, 1, MAX_LEN)
        pos = jnp.arange(MAX_LEN)[None, :]
        active = pos < lengths_c[:, None]
        ids = jnp.where(active, char_ids, 0)
        ids = jnp.clip(ids, 0, atlas.shape[1] - 1)
        last = (lengths_c - 1)[:, None]
        ids_last = jnp.take_along_axis(ids, last, axis=1)[:, 0]

        outs = []
        for case in (0, 1):
            cells = atlas[case][ids]  # (B, 25, CELL, CELL)
            strip = cells.transpose(0, 2, 1, 3).reshape(b, CELL, MAX_LEN * CELL)
            top = jnp.min(jnp.where(active, tops[case][ids], CELL), axis=1)
            bot = jnp.max(jnp.where(active, bots[case][ids], 0), axis=1)
            valid = bot > top
            idx = jnp.where(valid, top * (CELL + 1) + bot, 0)
            rrow_sel = row_bank[idx]  # (B, H, CELL)

            # per-sample proportional column map (native-px units)
            a = jnp.where(active, advs[case][ids], 0.0)  # (B, 25)
            cum = jnp.cumsum(a, axis=1) - a  # exclusive
            minx = inkls[case][ids[:, 0]]  # (B,)
            maxx = jnp.take_along_axis(cum, last, axis=1)[:, 0] + inkrs[case][ids_last]
            span = jnp.maximum(maxx - minx, 1.0)
            # canvas column centers → native-px source coordinates
            src = minx[:, None] + (jnp.arange(w)[None, :] + 0.5) * span[:, None] / w - 0.5
            # strip pixel centers in native-px coordinates
            u = cum[:, cell_of_s] + off_of_s[None, :] * a[:, cell_of_s]  # (B, 25*CELL)
            m = _cubic_weight_jnp(u[:, :, None] - src[:, None, :])  # (B, 25*CELL, W)
            m = m * active[:, :, None].repeat(CELL, axis=1)
            m = m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1e-6)

            canvas = jnp.einsum("brh,bhw,bwc->brc", rrow_sel, strip, m)
            canvas = jnp.where((valid & (lengths > 0))[:, None, None], canvas, 0.0)
            outs.append(canvas)
        return jnp.stack(outs, axis=-1)  # (B, H, W, 2)

    return glyph_fn
