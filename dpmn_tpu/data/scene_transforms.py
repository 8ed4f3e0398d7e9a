"""Scene-text augmentations for VisionLAN standalone training.

Parity: reference model/VisionLAN/data/transforms.py (327 LoC) — the
CVGeometry / CVDeterioration / CVColorJitter bank applied by
dataset_scene.keepratio_resize on the train path.  Host-side cv2/numpy
preprocessing (this is input-pipeline work; it feeds fixed-shape device
arrays and never runs on TPU).

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


def sample_asym(magnitude, size=None):
    return np.random.beta(1, 4, size) * magnitude


def sample_sym(magnitude, size=None):
    return (np.random.beta(4, 4, size=size) - 0.5) * 2 * magnitude


def sample_uniform(low, high, size=None):
    return np.random.uniform(low, high, size=size)


def get_interpolation(type="random"):
    if type == "random":
        choice = [cv2.INTER_NEAREST, cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA]
        return choice[random.randint(0, len(choice) - 1)]
    return {
        "nearest": cv2.INTER_NEAREST,
        "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC,
        "area": cv2.INTER_AREA,
    }[type]


class Compose:
    def __init__(self, ts):
        self.ts = list(ts)

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


class CVRandomRotation:
    """transforms.py:32-53."""

    def __init__(self, degrees=15):
        self.degrees = degrees

    def __call__(self, img):
        angle = sample_sym(self.degrees)
        src_h, src_w = img.shape[:2]
        m = cv2.getRotationMatrix2D(center=(src_w / 2, src_h / 2), angle=angle, scale=1.0)
        abs_cos, abs_sin = abs(m[0, 0]), abs(m[0, 1])
        dst_w = int(src_h * abs_sin + src_w * abs_cos)
        dst_h = int(src_h * abs_cos + src_w * abs_sin)
        m[0, 2] += (dst_w - src_w) / 2
        m[1, 2] += (dst_h - src_h) / 2
        return cv2.warpAffine(
            img, m, (dst_w, dst_h), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )


class CVRandomAffine:
    """transforms.py:55-185 (torchvision inverse-affine math)."""

    def __init__(self, degrees, translate=None, scale=None, shear=None):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        if shear is not None and isinstance(shear, numbers.Number):
            shear = [shear]
        self.shear = shear

    @staticmethod
    def _inverse_affine_matrix(center, angle, translate, scale, shear):
        if isinstance(shear, numbers.Number):
            shear = [shear, 0]
        rot = math.radians(angle)
        sx, sy = [math.radians(s) for s in shear]
        cx, cy = center
        tx, ty = translate
        a = math.cos(rot - sy) / math.cos(sy)
        b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
        c = math.sin(rot - sy) / math.cos(sy)
        d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
        m = [d, -b, 0, -c, a, 0]
        m = [x / scale for x in m]
        m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
        m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
        m[2] += cx
        m[5] += cy
        return m

    def __call__(self, img):
        src_h, src_w = img.shape[:2]
        angle = sample_sym(self.degrees)
        if self.translate is not None:
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

        m = np.array(
            self._inverse_affine_matrix((src_w / 2, src_h / 2), angle, (0, 0), scale, shear)
        ).reshape(2, 3)
        startpoints = [(0, 0), (src_w - 1, 0), (src_w - 1, src_h - 1), (0, src_h - 1)]
        project = lambda x, y, a, b, c: int(a * x + b * y + c)
        endpoints = [(project(x, y, *m[0]), project(x, y, *m[1])) for x, y in startpoints]
        rect = cv2.minAreaRect(np.array(endpoints))
        bbox = cv2.boxPoints(rect).astype(np.int64)
        dst_w = int(bbox[:, 0].max() - bbox[:, 0].min())
        dst_h = int(bbox[:, 1].max() - bbox[:, 1].min())
        m[0, 2] += (dst_w - src_w) / 2
        m[1, 2] += (dst_h - src_h) / 2
        dst_w += int(abs(translate[0]))
        dst_h += int(abs(translate[1]))
        if translate[0] < 0:
            m[0, 2] += abs(translate[0])
        if translate[1] < 0:
            m[1, 2] += abs(translate[1])
        return cv2.warpAffine(
            img, m, (dst_w, dst_h), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )


class CVRandomPerspective:
    """transforms.py:187-217."""

    def __init__(self, distortion=0.5):
        self.distortion = distortion

    def __call__(self, img):
        height, width = img.shape[:2]
        offset_h = sample_asym(self.distortion * height / 2, size=4).astype(np.int64)
        offset_w = sample_asym(self.distortion * width / 2, size=4).astype(np.int64)
        startpoints = np.array(
            [(0, 0), (width - 1, 0), (width - 1, height - 1), (0, height - 1)], np.float32
        )
        endpoints = np.array(
            [
                (offset_w[0], offset_h[0]),
                (width - 1 - offset_w[1], offset_h[1]),
                (width - 1 - offset_w[2], height - 1 - offset_h[2]),
                (offset_w[3], height - 1 - offset_h[3]),
            ],
            np.float32,
        )
        m = cv2.getPerspectiveTransform(startpoints, endpoints)
        rect = cv2.minAreaRect(endpoints)
        bbox = cv2.boxPoints(rect).astype(np.int64)
        max_x, max_y = bbox[:, 0].max(), bbox[:, 1].max()
        min_x, min_y = max(bbox[:, 0].min(), 0), max(bbox[:, 1].min(), 0)
        img = cv2.warpPerspective(
            img, m, (max_x, max_y), flags=get_interpolation(), borderMode=cv2.BORDER_REPLICATE
        )
        return img[min_y:, min_x:]


class CVRescale:
    """Gaussian-pyramid down/up rescale (transforms.py:219-244)."""

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
    """transforms.py:246-259."""

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
    """transforms.py:261-278."""

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
