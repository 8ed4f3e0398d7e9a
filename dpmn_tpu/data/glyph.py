"""Graphic-prior glyph rendering.

License note: `render_normal` / `make_standard_text` are deliberately close
derivations of the reference's utils/render_standard_text.py:13-71 (which
carries a Netease/GPL header) — this file is the designated bit-parity host
oracle for the glyph prior, so the pygame call sequence, the 20-alpha
threshold and the binary-search sizing must match that implementation
exactly or parity breaks.

Parity: reference utils/render_standard_text.py:13-71 — binary-search font
sizing so the word fits the padded canvas, render via pygame.freetype,
tight-crop the alpha channel, rescale-if-overflow, then cv2 INTER_CUBIC
resize to the target (H, W) grayscale canvas.  The driver renders the
lower- and upper-case variants of the recognized string as a 2-channel
prior for PGRM branch 1 (interfaces/super_resolution.py:186-193).

TPU-native strategy (SURVEY §7): the reference renders per sample inside the
batch loop.  Here rendering is (a) memoized — predictions repeat massively
across steps — and (b) exposed as a shape-static host callback
(`glyph_prior_callback`) so the whole train step stays inside one jit.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_DEJAVU_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
_ARIAL_FONT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "arial.ttf"
)


def default_font() -> str:
    """The reference ships arial.ttf and renders every glyph prior with it
    (utils/render_standard_text.py:13-26; main.py --font_path) — prefer the
    same face when the shipped asset is present so glyph priors match the
    reference's actual priors; fall back to system DejaVu.

    NOTE: the device glyph atlas is baked into the jitted serving/train
    graphs as constants, so changing the effective font invalidates the
    persistent compile cache for every atlas-mode graph."""
    return _ARIAL_FONT if os.path.exists(_ARIAL_FONT) else _DEJAVU_FONT


_DEFAULT_FONT = default_font()

_pygame_ready = False


def _ensure_pygame():
    global _pygame_ready
    if not _pygame_ready:
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        import pygame
        from pygame import freetype

        pygame.init()
        freetype.init()
        _pygame_ready = True


def render_normal(font, text: str):
    """Tight-cropped alpha render (render_standard_text.py:13-26)."""
    import pygame
    import pygame.locals

    line_spacing = font.get_sized_height() + 1
    line_bounds = font.get_rect(text)
    fsize = (round(2.0 * line_bounds.width), round(1.25 * line_spacing))
    surf = pygame.Surface(fsize, pygame.locals.SRCALPHA, 32)
    x, y = 0, line_spacing
    rect = font.render_to(surf, (x, y), text)
    arr = pygame.surfarray.pixels_alpha(surf).swapaxes(0, 1)
    loc = np.where(arr > 20)
    if loc[0].size == 0:
        return np.zeros((1, 1), np.uint8), rect
    miny, minx = loc[0].min(), loc[1].min()
    maxy, maxx = loc[0].max(), loc[1].max()
    return arr[miny : maxy + 1, minx : maxx + 1].copy(), rect


def make_standard_text(font_path: str, text: str, shape, padding: float = 0.1, init_fontsize: int = 25):
    """(H, W) uint8-scale float canvas (render_standard_text.py:28-71)."""
    import cv2
    from pygame import freetype

    _ensure_pygame()
    font = freetype.Font(font_path or _DEFAULT_FONT)
    font.antialiased = True
    font.origin = True
    fontsize = init_fontsize
    font.size = fontsize
    pre_remain = None
    border = int(min(shape) * padding) if padding < 1 else int(padding)
    target_shape = tuple(np.array(shape) - 2 * border)
    while True:
        rect = font.get_rect(text)
        res_shape = tuple(np.array(rect[1:3]))
        remain = np.min(np.array(target_shape) - np.array(res_shape))
        if pre_remain is not None:
            m = pre_remain * remain
            if m <= 0:
                if m < 0 and remain < 0:
                    fontsize -= 1
                if m == 0 and remain != 0:
                    fontsize += 1 if remain > 0 else -1
                break
        if remain < 0:
            if fontsize == 2:
                break
            fontsize -= 1
        else:
            fontsize += 1
        pre_remain = remain
        font.size = fontsize

    surf, _ = render_normal(font, text)
    if np.max(np.array(surf.shape) - np.array(target_shape)) > 0:
        scale = np.min(np.array(target_shape, np.float32) / np.array(surf.shape, np.float32))
        to_shape = tuple((np.array(surf.shape) * scale).astype(np.int32)[::-1])
        to_shape = (max(to_shape[0], 1), max(to_shape[1], 1))
        surf = cv2.resize(surf, to_shape)
    canvas = cv2.resize(surf, (shape[1], shape[0]), interpolation=cv2.INTER_CUBIC)
    return canvas


class GlyphRenderer:
    """Memoized dual-case glyph renderer → (2, H, W) float32 priors."""

    def __init__(self, font_path: str = None, shape=(32, 128), cache_size: int = 65536):
        self.font_path = font_path or _DEFAULT_FONT
        self.shape = tuple(shape)
        self._render = functools.lru_cache(maxsize=cache_size)(self._render_uncached)

    def _render_uncached(self, text: str) -> np.ndarray:
        s = text
        if s == "":
            s = "\t"  # empty-prediction sentinel (super_resolution.py:184-186)
        lower = make_standard_text(self.font_path, s.lower(), self.shape)
        upper = make_standard_text(self.font_path, s.upper(), self.shape)
        return np.stack([lower, upper], axis=-1).astype(np.float32)  # (H, W, 2)

    def render_batch(self, texts) -> np.ndarray:
        """list of B strings → (B, H, W, 2) float32 (uint8 value scale)."""
        return np.stack([self._render(t) for t in texts], axis=0)


_GLOBAL_RENDERER = {}


def get_renderer(font_path: str = None, shape=(32, 128)) -> GlyphRenderer:
    key = (font_path, tuple(shape))
    if key not in _GLOBAL_RENDERER:
        _GLOBAL_RENDERER[key] = GlyphRenderer(font_path, shape)
    return _GLOBAL_RENDERER[key]


def glyph_prior_from_ids(char_ids: np.ndarray, lengths: np.ndarray, charset, font_path=None, shape=(32, 128)):
    """Decode (B, 25) VisionLAN argmax ids (+1-offset) and render priors.

    Host-side function used behind jax.pure_callback: shapes are static.
    """
    renderer = get_renderer(font_path, shape)
    texts = []
    for ids, ln in zip(np.asarray(char_ids), np.asarray(lengths)):
        chars = [charset[i - 1] if 0 < i <= len(charset) else "" for i in ids[: int(ln)]]
        texts.append("".join(chars))
    return renderer.render_batch(texts)
