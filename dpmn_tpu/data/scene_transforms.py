"""Scene-text augmentations for VisionLAN standalone training.

Parity: reference model/VisionLAN/data/transforms.py (327 LoC) — the
CVGeometry / CVDeterioration / CVColorJitter bank applied by
dataset_scene.keepratio_resize on the train path.  Host-side cv2/numpy
preprocessing (this is input-pipeline work; it feeds fixed-shape device
arrays and never runs on TPU).

The geometry math here is derived, not transcribed: the affine warp is
built as a composition of elementary maps (rotation · y-shear · x-shear,
uniformly scaled, about the image center) and inverted by adjugate — see
CVRandomAffine for the derivation and the proof that this equals the
torchvision closed form the reference pasted in.  Randomness is drawn in
the same order and from the same distributions as the reference so the
augmentation *distribution* is the parity spec (there is no fixed oracle:
both sides consume platform RNG).

Quirk preserved: like the reference, CVGeometry/CVDeterioration draw their
random sub-transform / magnitudes at CONSTRUCTION time (transforms.py:
282-305), so one constructed instance applies the same geometry family (and
the same deterioration magnitudes) for its lifetime; the dataset constructs
the bank once per dataset like dataset_scene.py:68-72 does.
"""

from __future__ import annotations

import math
import numbers
import random

import cv2
import numpy as np
from PIL import Image, ImageEnhance

# ---------------------------------------------------------------- sampling
# The reference's three magnitude distributions (transforms.py:12-20):
# asymmetric Beta(1,4) — mass near zero, long tail to `magnitude`;
# symmetric  Beta(4,4) recentred to [-magnitude, +magnitude];
# plain uniform.


def sample_asym(magnitude, size=None):
    return np.random.beta(1, 4, size) * magnitude


def sample_sym(magnitude, size=None):
    return (np.random.beta(4, 4, size=size) - 0.5) * 2 * magnitude


def sample_uniform(low, high, size=None):
    return np.random.uniform(low, high, size=size)


_CV_INTERPOLATION = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "cubic": cv2.INTER_CUBIC,
    "area": cv2.INTER_AREA,
}


def get_interpolation(type="random"):
    """A named cv2 interpolation mode, or a uniformly random one — every
    warp/resize below re-rolls its own mode (transforms.py:22-30)."""
    if type == "random":
        return random.choice(
            (cv2.INTER_NEAREST, cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA)
        )
    return _CV_INTERPOLATION[type]


class Compose:
    def __init__(self, ts):
        self.ts = list(ts)

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


# ---------------------------------------------------------------- geometry


def _corners(w: int, h: int) -> np.ndarray:
    """Pixel-corner quad of a w×h image, clockwise from the origin."""
    return np.array([(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)], np.float64)


def _fit_canvas(points: np.ndarray) -> tuple[int, int]:
    """Output size that covers `points`: side lengths of the integer
    min-area rectangle around them (the reference sizes its expanded
    canvas this way, transforms.py:150-158)."""
    box = cv2.boxPoints(cv2.minAreaRect(points.astype(np.float32))).astype(np.int64)
    return int(box[:, 0].max() - box[:, 0].min()), int(box[:, 1].max() - box[:, 1].min())


class CVRandomRotation:
    """Rotate by Beta(4,4)-symmetric degrees on a canvas grown to hold the
    rotated image (transforms.py:32-53)."""

    def __init__(self, degrees=15):
        self.degrees = degrees

    def __call__(self, img):
        angle = sample_sym(self.degrees)
        src_h, src_w = img.shape[:2]
        m = cv2.getRotationMatrix2D(center=(src_w / 2, src_h / 2), angle=angle, scale=1.0)
        # rotated bounding box: |cos|,|sin| column sums of the rotation part
        abs_cos, abs_sin = abs(m[0, 0]), abs(m[0, 1])
        dst_w = int(src_h * abs_sin + src_w * abs_cos)
        dst_h = int(src_h * abs_cos + src_w * abs_sin)
        # re-center the map on the grown canvas
        m[:, 2] += [(dst_w - src_w) / 2, (dst_h - src_h) / 2]
        return cv2.warpAffine(
            img, m, (dst_w, dst_h), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )


class CVRandomAffine:
    """Random rotation+shear+scale about the image center, with the canvas
    grown to fit and an optional extra translation margin
    (transforms.py:55-185).

    Derivation (replaces the torchvision closed form the reference pastes):
    the forward point map is

        dst = s · R(θ) · ShY(σy) · ShX(σx) · (src − c) + c + t

    with R a rotation, ShX = [[1, −tanσx], [0, 1]], ShY = [[1, 0],
    [−tanσy, 1]] and c the center.  Expanding R·ShY·ShX reproduces the
    torchvision RSS matrix entry-for-entry (cos(θ−σy)/cosσy etc. — verified
    numerically to 1e-16 over random angles), and its determinant is
    exactly 1, so the dst→src matrix cv2.warpAffine wants is the adjugate
    over the scale:

        src = adj(RSS)/s · (dst − c − t) + c
    """

    def __init__(self, degrees, translate=None, scale=None, shear=None):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        if shear is not None and isinstance(shear, numbers.Number):
            shear = [shear]
        self.shear = shear

    @staticmethod
    def _forward_rss(angle_deg, shear_deg):
        """R(θ)·ShY(σy)·ShX(σx) — the unit-determinant linear part."""
        if isinstance(shear_deg, numbers.Number):
            shear_deg = [shear_deg, 0]
        th = math.radians(angle_deg)
        tan_sx, tan_sy = (math.tan(math.radians(s)) for s in shear_deg)
        rot = np.array([[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]])
        shear_y = np.array([[1.0, 0.0], [-tan_sy, 1.0]])
        shear_x = np.array([[1.0, -tan_sx], [0.0, 1.0]])
        return rot @ shear_y @ shear_x

    @classmethod
    def _inverse_affine_matrix(cls, center, angle, translate, scale, shear):
        """2×3 dst→src map for cv2.warpAffine (see class docstring)."""
        rss = cls._forward_rss(angle, shear)
        # adjugate / scale — exact inverse of scale·RSS since det(RSS) = 1
        inv = np.array([[rss[1, 1], -rss[0, 1]], [-rss[1, 0], rss[0, 0]]]) / scale
        center_shift = np.asarray(center, np.float64) + np.asarray(translate, np.float64)
        m = np.empty((2, 3), np.float64)
        m[:, :2] = inv
        m[:, 2] = inv @ -center_shift + center
        return m

    def __call__(self, img):
        src_h, src_w = img.shape[:2]
        angle = sample_sym(self.degrees)
        if self.translate is not None:
            # reference quirk: BOTH margins scale with the height
            # (transforms.py:139-141)
            translate = (
                np.round(sample_sym(self.translate[0] * src_h)),
                np.round(sample_sym(self.translate[1] * src_h)),
            )
        else:
            translate = (0, 0)
        scale = sample_uniform(*self.scale) if self.scale is not None else 1.0
        if self.shear is not None:
            if len(self.shear) == 1:
                shear = [sample_sym(self.shear[0]), 0.0]
            else:
                shear = [sample_sym(self.shear[0]), sample_sym(self.shear[1])]
        else:
            shear = 0.0

        m = self._inverse_affine_matrix((src_w / 2, src_h / 2), angle, (0, 0), scale, shear)
        # canvas that fits the (inverse-)mapped corner quad, truncated to
        # ints the way the reference projects them (transforms.py:143-149)
        xs, ys = _corners(src_w, src_h).T
        mapped = np.stack(
            [xs * m[0, 0] + ys * m[0, 1] + m[0, 2], xs * m[1, 0] + ys * m[1, 1] + m[1, 2]],
            axis=1,
        ).astype(np.int64)
        dst_w, dst_h = _fit_canvas(mapped)
        m[:, 2] += [(dst_w - src_w) / 2, (dst_h - src_h) / 2]
        # the translation enters as extra one-sided canvas margin, not as a
        # map offset: grow by |t| and shift the map only for negative t
        dst_w += int(abs(translate[0]))
        dst_h += int(abs(translate[1]))
        m[:, 2] += [abs(translate[0]) if translate[0] < 0 else 0,
                    abs(translate[1]) if translate[1] < 0 else 0]
        return cv2.warpAffine(
            img, m, (dst_w, dst_h), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )


class CVRandomPerspective:
    """Pinch each corner inward by an asymmetric-Beta offset and warp to the
    resulting quad (transforms.py:187-217)."""

    def __init__(self, distortion=0.5):
        self.distortion = distortion

    def __call__(self, img):
        height, width = img.shape[:2]
        offset_h = sample_asym(self.distortion * height / 2, size=4).astype(np.int64)
        offset_w = sample_asym(self.distortion * width / 2, size=4).astype(np.int64)
        startpoints = _corners(width, height).astype(np.float32)
        # signs pull every corner toward the image interior: x offsets point
        # right on the left edge and left on the right edge; y likewise
        sign = np.array([(1, 1), (-1, 1), (-1, -1), (1, -1)], np.float32)
        endpoints = (startpoints + sign * np.stack([offset_w, offset_h], axis=1)).astype(np.float32)
        m = cv2.getPerspectiveTransform(startpoints, endpoints)
        # crop to the integer min-area box of the warped quad, clamped at 0
        box = cv2.boxPoints(cv2.minAreaRect(endpoints)).astype(np.int64)
        max_x, max_y = box[:, 0].max(), box[:, 1].max()
        min_x, min_y = max(box[:, 0].min(), 0), max(box[:, 1].min(), 0)
        img = cv2.warpPerspective(
            img, m, (max_x, max_y), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )
        return img[min_y:, min_x:]


# ------------------------------------------------------------ deterioration


class CVRescale:
    """Lose resolution through a Gaussian pyramid: resize to a base size,
    pyrDown `factor` times, resize back (transforms.py:219-244).  The
    factor is drawn at construction."""

    def __init__(self, factor=4, base_size=(128, 512)):
        if isinstance(factor, numbers.Number):
            self.factor = round(sample_uniform(0, factor))
        else:
            self.factor = round(sample_uniform(factor[0], factor[1]))
        self.base_h, self.base_w = base_size[:2]

    def __call__(self, img):
        if self.factor == 0:
            return img
        src_h, src_w = img.shape[:2]
        scale_img = cv2.resize(img, (self.base_w, self.base_h), interpolation=get_interpolation())
        for _ in range(int(self.factor)):
            scale_img = cv2.pyrDown(scale_img)
        return cv2.resize(scale_img, (src_w, src_h), interpolation=get_interpolation())


class CVGaussianNoise:
    """Additive Gaussian noise; variance drawn at construction
    (transforms.py:246-259)."""

    def __init__(self, mean=0, var=20):
        self.mean = mean
        if isinstance(var, numbers.Number):
            self.var = max(int(sample_asym(var)), 1)
        else:
            self.var = int(sample_uniform(var[0], var[1]))

    def __call__(self, img):
        noise = np.random.normal(self.mean, self.var**0.5, img.shape)
        return np.clip(img + noise, 0, 255).astype(np.uint8)


class CVMotionBlur:
    """Directional box blur: a one-row kernel rotated to a random angle;
    degree and angle drawn at construction (transforms.py:261-278)."""

    def __init__(self, degrees=12, angle=90):
        if isinstance(degrees, numbers.Number):
            self.degree = max(int(sample_asym(degrees)), 1)
        else:
            self.degree = int(sample_uniform(degrees[0], degrees[1]))
        self.angle = sample_uniform(-angle, angle)

    def __call__(self, img):
        m = cv2.getRotationMatrix2D((self.degree // 2, self.degree // 2), self.angle, 1)
        kernel = np.zeros((self.degree, self.degree))
        kernel[self.degree // 2, :] = 1
        kernel = cv2.warpAffine(kernel, m, (self.degree, self.degree)) / self.degree
        img = cv2.filter2D(img, -1, kernel)
        return np.clip(img, 0, 255).astype(np.uint8)


# -------------------------------------------------------------------- banks


class CVGeometry:
    """One of rotation / affine / perspective, drawn at construction
    (transforms.py:280-295)."""

    def __init__(self, degrees=15, translate=(0.3, 0.3), scale=(0.5, 2.0),
                 shear=(45, 15), distortion=0.5, p=0.5):
        self.p = p
        type_p = random.random()
        if type_p < 0.33:
            self.transforms = CVRandomRotation(degrees=degrees)
        elif type_p < 0.66:
            self.transforms = CVRandomAffine(degrees=degrees, translate=translate, scale=scale, shear=shear)
        else:
            self.transforms = CVRandomPerspective(distortion=distortion)

    def __call__(self, img):
        if random.random() < self.p:
            return Image.fromarray(self.transforms(np.array(img)))
        return img


class CVDeterioration:
    """Noise + motion blur + pyramid rescale in shuffled order
    (transforms.py:297-316)."""

    def __init__(self, var, degrees, factor, p=0.5):
        self.p = p
        ts = []
        if var is not None:
            ts.append(CVGaussianNoise(var=var))
        if degrees is not None:
            ts.append(CVMotionBlur(degrees=degrees))
        if factor is not None:
            ts.append(CVRescale(factor=factor))
        random.shuffle(ts)
        self.transforms = Compose(ts)

    def __call__(self, img):
        if random.random() < self.p:
            return Image.fromarray(self.transforms(np.array(img)))
        return img


class CVColorJitter:
    """torchvision ColorJitter semantics (random order, uniform factors)
    without the torchvision dependency (transforms.py:319-327)."""

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1, p=0.5):
        self.p = p
        self.brightness = (max(0.0, 1 - brightness), 1 + brightness)
        self.contrast = (max(0.0, 1 - contrast), 1 + contrast)
        self.saturation = (max(0.0, 1 - saturation), 1 + saturation)
        self.hue = (-hue, hue)

    def _jitter(self, img: Image.Image) -> Image.Image:
        ops = [
            ("b", random.uniform(*self.brightness)),
            ("c", random.uniform(*self.contrast)),
            ("s", random.uniform(*self.saturation)),
            ("h", random.uniform(*self.hue)),
        ]
        random.shuffle(ops)
        for kind, f in ops:
            if kind == "b":
                img = ImageEnhance.Brightness(img).enhance(f)
            elif kind == "c":
                img = ImageEnhance.Contrast(img).enhance(f)
            elif kind == "s":
                img = ImageEnhance.Color(img).enhance(f)
            else:  # hue shift in HSV space, f in turns
                hsv = np.array(img.convert("HSV"))
                hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(f * 255)) % 256
                img = Image.fromarray(hsv, "HSV").convert("RGB")
        return img

    def __call__(self, img):
        if random.random() < self.p:
            return self._jitter(img)
        return img


def train_augment_bank():
    """The dataset_scene.py:68-72 bank."""
    return Compose(
        [
            CVGeometry(degrees=45, translate=(0.0, 0.0), scale=(0.5, 2.0), shear=(45, 15), distortion=0.5, p=0.5),
            CVDeterioration(var=20, degrees=6, factor=4, p=0.25),
            CVColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1, p=0.25),
        ]
    )
