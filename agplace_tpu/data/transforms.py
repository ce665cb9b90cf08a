"""Host-side image transforms (PIL decode + numpy), the torchvision.transforms
replacement for the input pipeline (reference ``datasets_ws_kitti360.py:236-280``,
``datasets_ws_nuscenes.py:284-307``).  Output is float32 NHWC in [0,1] before
``normalize``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from PIL import Image


def load_image_rgb(path: str) -> np.ndarray:
    """Decode to float32 [H, W, 3] in [0, 1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def resize(img: np.ndarray, size, interpolation=Image.BILINEAR) -> np.ndarray:
    """torchvision.Resize semantics: int size scales the SHORT side keeping
    aspect; (h, w) resizes exactly."""
    h, w = img.shape[:2]
    if isinstance(size, int):
        if h <= w:
            new_h, new_w = size, max(1, round(w * size / h))
        else:
            new_h, new_w = max(1, round(h * size / w)), size
    else:
        new_h, new_w = size
    if (new_h, new_w) == (h, w):
        return img
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    pil = pil.resize((new_w, new_h), interpolation)
    return np.asarray(pil, np.float32) / 255.0


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision.CenterCrop semantics, zero-padding if smaller."""
    h, w = img.shape[:2]
    if h < size or w < size:
        pad_h, pad_w = max(size - h, 0), max(size - w, 0)
        img = np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return img[top : top + size, left : left + size]


def normalize(img: np.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> np.ndarray:
    return ((img - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)


def color_jitter(img: np.ndarray, strength: float,
                 rng: np.random.Generator,
                 brightness: "float | None" = None,
                 contrast: "float | None" = None,
                 saturation: "float | None" = None,
                 hue_strength: "float | None" = None) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter matching
    torchvision.ColorJitter semantics closely enough for augmentation
    purposes (applied in [0,1] space).  ``strength`` is the uniform
    default; the per-component arguments override it (reference
    ``--brightness/--contrast/--saturation/--hue`` flags)."""
    b_s = strength if brightness is None else brightness
    c_s = strength if contrast is None else contrast
    s_s = strength if saturation is None else saturation
    h_s = strength if hue_strength is None else hue_strength
    if max(b_s, c_s, s_s, h_s) <= 0:
        return img
    b = rng.uniform(max(0, 1 - b_s), 1 + b_s)
    img = np.clip(img * b, 0, 1)
    c = rng.uniform(max(0, 1 - c_s), 1 + c_s)
    gray = img.mean(axis=(0, 1, 2), keepdims=True)
    img = np.clip((img - gray) * c + gray, 0, 1)
    s = rng.uniform(max(0, 1 - s_s), 1 + s_s)
    lum = img @ np.array([0.299, 0.587, 0.114], np.float32)
    img = np.clip((img - lum[..., None]) * s + lum[..., None], 0, 1)
    hue = rng.uniform(-min(0.5, h_s), min(0.5, h_s))
    if abs(hue) > 1e-6:
        # cheap hue rotation via channel-mix approximation
        cos_h = np.cos(2 * np.pi * hue)
        sin_h = np.sin(2 * np.pi * hue)
        third = 1.0 / 3.0
        sqrt3 = np.sqrt(1.0 / 3.0)
        mat = (cos_h * np.eye(3)
               + (1 - cos_h) * np.full((3, 3), third)
               + sin_h * sqrt3 * np.array([[0, -1, 1], [1, 0, -1],
                                           [-1, 1, 0]], np.float32))
        img = np.clip(img @ mat.T.astype(np.float32), 0, 1)
    return img.astype(np.float32)


def five_crops(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision FiveCrop: four corners + centre (``test_method
    'five_crops'/'nearest_crop'/'maj_voting'``, ``datasets_ws.py``)."""
    h, w = img.shape[:2]
    tl = img[:size, :size]
    tr = img[:size, w - size:]
    bl = img[h - size:, :size]
    br = img[h - size:, w - size:]
    ct = center_crop(img, size)
    return np.stack([tl, tr, bl, br, ct])
