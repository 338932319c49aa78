"""Image sources: file-sequence loader and conversions.

Rebuilds image_loader.lua (numbered ``images/%09d.jpg|png`` sequences,
/root/reference/image_loader.lua:7-43) plus the image helpers the reference
pulls from the torch 'image' package (load/scale/rgb2y). Decoding is PIL on
host; resizing is jax.image (device). A webcam source (image_camera.lua) is
stubbed — no V4L in this environment — behind the same interface.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None


def load_image(path: str) -> np.ndarray:
    """Load an image file -> (H, W, 3) float32 in [0, 1] (torch image.load
    convention, but channels-last)."""
    assert _PILImage is not None, "PIL unavailable"
    im = _PILImage.open(path).convert("RGB")
    return np.asarray(im, np.float32) / 255.0


def scale(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize to (h, w) — torch image.scale equivalent."""
    img = jnp.asarray(img)
    return jax.image.resize(img, (h, w) + img.shape[2:], method="bilinear")


def rgb2y(img: jnp.ndarray) -> jnp.ndarray:
    """Luma conversion (torch image.rgb2y weights). (H, W, 3) -> (H, W, 1)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return (img[..., :3] * w).sum(-1, keepdims=True)


class ImageLoader:
    """Sequential frame source over numbered files
    (/root/reference/image_loader.lua:7-43)."""

    def __init__(self, directory: str, h: int, w: int,
                 first: int = 0, pattern: str = "%09d"):
        self.dir = directory
        self.h, self.w = h, w
        self.i = first
        self.pattern = pattern

    def _path(self, i: int) -> Optional[str]:
        for ext in (".jpg", ".png"):
            p = os.path.join(self.dir, "images", (self.pattern % i) + ext)
            if os.path.exists(p):
                return p
        return None

    def get_next_frame(self) -> Optional[np.ndarray]:
        p = self._path(self.i)
        if p is None:
            return None
        self.i += 1
        img = load_image(p)
        if img.shape[:2] != (self.h, self.w):
            img = np.asarray(scale(img, self.h, self.w))
        return img


class ImageCamera:
    """Camera source stub (reference uses the 'camera' V4L package,
    /root/reference/image_camera.lua:10-27). Provide frames programmatically
    or subclass with a real capture backend."""

    def __init__(self, h: int, w: int):
        self.h, self.w = h, w
        self._queue: list = []

    def push(self, frame: np.ndarray) -> None:
        self._queue.append(frame)

    def get_next_frame(self) -> Optional[np.ndarray]:
        if not self._queue:
            return None
        img = self._queue.pop(0)
        if img.shape[:2] != (self.h, self.w):
            img = np.asarray(scale(img, self.h, self.w))
        return img
