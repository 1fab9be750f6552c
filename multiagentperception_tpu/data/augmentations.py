"""Paired image/mask augmentations (reference: ptsemseg/augmentations/).

Numpy/PIL implementations of the reference's PIL-based paired transforms
(augmentations.py:10-297) with the same registry surface
(augmentations/__init__.py:22-40). None of the ten shipped configs enable
augmentations (and the reference's Compose return-arity bug at
airsim_loader.py:501 means they'd crash there) — these are correct here.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance


class Compose:
    def __init__(self, augmentations):
        self.augmentations = augmentations

    def __call__(self, img: np.ndarray, mask: np.ndarray):
        img_p = Image.fromarray(img, mode="RGB")
        mask_p = Image.fromarray(mask.astype(np.uint8), mode="L")
        for a in self.augmentations:
            img_p, mask_p = a(img_p, mask_p)
        return np.array(img_p, dtype=np.uint8), np.array(mask_p, dtype=np.uint8)


class RandomHorizontallyFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, mask):
        if random.random() < self.p:
            return (
                img.transpose(Image.FLIP_LEFT_RIGHT),
                mask.transpose(Image.FLIP_LEFT_RIGHT),
            )
        return img, mask


class RandomVerticallyFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, mask):
        if random.random() < self.p:
            return (
                img.transpose(Image.FLIP_TOP_BOTTOM),
                mask.transpose(Image.FLIP_TOP_BOTTOM),
            )
        return img, mask


class RandomRotate:
    def __init__(self, degree):
        self.degree = degree

    def __call__(self, img, mask):
        d = random.random() * 2 * self.degree - self.degree
        return (
            img.rotate(d, Image.BILINEAR),
            mask.rotate(d, Image.NEAREST),
        )


class RandomCrop:
    def __init__(self, size, padding=0):
        self.size = (size, size) if isinstance(size, int) else size
        self.padding = padding

    def __call__(self, img, mask):
        w, h = img.size
        th, tw = self.size
        if w == tw and h == th:
            return img, mask
        x1 = random.randint(0, max(0, w - tw))
        y1 = random.randint(0, max(0, h - th))
        box = (x1, y1, x1 + tw, y1 + th)
        return img.crop(box), mask.crop(box)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else size

    def __call__(self, img, mask):
        w, h = img.size
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        box = (x1, y1, x1 + tw, y1 + th)
        return img.crop(box), mask.crop(box)


class Scale:
    def __init__(self, size):
        self.size = size

    def __call__(self, img, mask):
        w, h = img.size
        if (w >= h and w == self.size) or (h >= w and h == self.size):
            return img, mask
        if w > h:
            ow = self.size
            oh = int(self.size * h / w)
        else:
            oh = self.size
            ow = int(self.size * w / h)
        return (
            img.resize((ow, oh), Image.BILINEAR),
            mask.resize((ow, oh), Image.NEAREST),
        )


class RandomTranslate:
    def __init__(self, offset):
        self.offset = offset  # (max_x, max_y)

    def __call__(self, img, mask):
        dx = int(random.uniform(-1, 1) * self.offset[0])
        dy = int(random.uniform(-1, 1) * self.offset[1])
        return (
            img.transform(img.size, Image.AFFINE, (1, 0, dx, 0, 1, dy)),
            mask.transform(mask.size, Image.AFFINE, (1, 0, dx, 0, 1, dy)),
        )


def _enhance(cls):
    class _Adjust:
        def __init__(self, value):
            self.value = value

        def __call__(self, img, mask):
            factor = random.uniform(1 - self.value, 1 + self.value)
            return cls(img).enhance(factor), mask

    return _Adjust


AdjustBrightness = _enhance(ImageEnhance.Brightness)
AdjustSaturation = _enhance(ImageEnhance.Color)
AdjustContrast = _enhance(ImageEnhance.Contrast)


class AdjustGamma:
    def __init__(self, gamma):
        self.gamma = gamma

    def __call__(self, img, mask):
        g = random.uniform(1, 1 + self.gamma)
        arr = np.asarray(img, dtype=np.float64) / 255.0
        out = (np.power(arr, g) * 255.0).clip(0, 255).astype(np.uint8)
        return Image.fromarray(out), mask


class AdjustHue:
    def __init__(self, hue):
        self.hue = hue

    def __call__(self, img, mask):
        shift = random.uniform(-self.hue, self.hue)
        hsv = np.array(img.convert("HSV"), dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
        return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB"), mask


KEY2AUG = {
    "gamma": AdjustGamma,
    "hue": AdjustHue,
    "brightness": AdjustBrightness,
    "saturation": AdjustSaturation,
    "contrast": AdjustContrast,
    "rcrop": RandomCrop,
    "ccrop": CenterCrop,
    "hflip": RandomHorizontallyFlip,
    "vflip": RandomVerticallyFlip,
    "scale": Scale,
    "rotate": RandomRotate,
    "translate": RandomTranslate,
}


def get_composed_augmentations(aug_dict):
    """Registry (reference: augmentations/__init__.py:40-52)."""
    if aug_dict is None:
        return None
    augs = [KEY2AUG[k](v) for k, v in aug_dict.items()]
    return Compose(augs)
