"""Visualization: flow -> HSV panels, kernels, depth color, video export.

Rebuilds flow2hsv (/root/reference/score_opticalflow.lua:13-25), the kernel
display (/root/reference/display_opticalflow.lua:62-69) and the ffmpeg video
export (/root/reference/test_opticalflow.lua:394).
"""

from __future__ import annotations

import math
import os
import subprocess
from typing import Optional, Sequence

import numpy as np


def flow2hsv(geom, flow: np.ndarray) -> np.ndarray:
    """(2, H, W) flow -> (3, H, W) RGB via hue=direction, sat=1,
    val=magnitude/max (score_opticalflow.lua:13-25)."""
    flow = np.asarray(flow)
    maxh = getattr(geom, "maxh", 16)
    maxw = getattr(geom, "maxw", 16)
    angle = np.arctan2(flow[0], flow[1])
    h = np.mod(angle / (2 * math.pi), 1.0)
    norm = np.sqrt(flow[0] ** 2 + flow[1] ** 2)
    v = np.clip(norm / max(math.ceil(maxh / 2), math.ceil(maxw / 2)), 0, 1)
    hsv = np.stack([h, np.ones_like(h), v])
    return hsv_to_rgb(hsv)


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[0], hsv[1], hsv[2]
    i = np.floor(h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b])


def kernels_image(kernel: np.ndarray, pad: int = 1) -> np.ndarray:
    """Tile conv kernels (kh, kw, cin, cout) into one grid image for display
    (display_opticalflow.lua:62-69)."""
    kh, kw, cin, cout = kernel.shape
    n = cin * cout
    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    canvas = np.zeros((rows * (kh + pad), cols * (kw + pad)), np.float32)
    k = kernel.transpose(2, 3, 0, 1).reshape(n, kh, kw)
    k = (k - k.min()) / max(k.max() - k.min(), 1e-9)
    for idx in range(n):
        r, c = divmod(idx, cols)
        canvas[r * (kh + pad):r * (kh + pad) + kh,
               c * (kw + pad):c * (kw + pad) + kw] = k[idx]
    return canvas


def save_image(path: str, img: np.ndarray) -> None:
    """img: (3, H, W) or (H, W) float in [0, 1]."""
    from PIL import Image
    a = np.asarray(img)
    if a.ndim == 3:
        a = a.transpose(1, 2, 0)
    Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8)).save(path)


def export_video(frame_dir: str, out_path: str, fps: int = 10,
                 pattern: str = "%09d.png") -> bool:
    """ffmpeg export (test_opticalflow.lua:394). Returns False if ffmpeg is
    unavailable (gated, not required)."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-r", str(fps), "-i",
             os.path.join(frame_dir, pattern), out_path],
            check=True, capture_output=True)
        return True
    except (FileNotFoundError, subprocess.CalledProcessError):
        return False
