"""Legacy sparse-SFM depth datasets: discretizer, balanced sampling,
continuous variant.

Rebuilds /root/reference/load_data.lua (camera files + sparse 3D depth
points per frame, "depths version 2" format, frame blacklists),
groundtruth_discrete.lua (depthDiscretizer with median-in-patch depth,
histogram-balanced class sampling) and groundtruth_continuous.lua
(tracked-point next-occurrence targets). Depth point files are stored as
npz (``depths/<frame>.npz`` with arrays x, y, depth); the original Torch
binary format is not portable and is not read.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NUMBER_OF_BINS = 100  # histogram resolution (reference numberOfBins)


@dataclasses.dataclass
class DepthDiscretizer:
    """Port of depthDiscretizer (/root/reference/groundtruth_discrete.lua:10-57):
    classes split [0, 2*cutDepth] uniformly; cutDepth set so half the patch
    mass falls below it."""

    n_classes: int
    cut_depth: float = 0.0
    bin_step: int = 0

    def get_class(self, depth: float) -> int:
        """1-based class index (clamped to n_classes)."""
        step = 2.0 * self.cut_depth / self.n_classes
        c = int(np.ceil(depth / max(step, 1e-9)))
        return min(max(c, 1), self.n_classes)

    def compute_cut_depth(self, histogram: Sequence[list], n_used: int) -> None:
        """histogram: list of per-integer-depth-bin sample lists."""
        total = 0
        for i, binlist in enumerate(histogram, start=1):
            total += len(binlist)
            if total > n_used / 2:
                self.cut_depth = float(i)
                break
        else:
            self.cut_depth = float(len(histogram))
        self.bin_step = int(2 * self.cut_depth / self.n_classes) or 1

    def random_bin(self, histogram: Sequence[list],
                   rng: np.random.RandomState) -> int:
        """Class-balanced bin sampling (:48-57): pick a class uniformly,
        then a non-empty integer bin within it. 0-based bin index."""
        for _ in range(10000):
            c = rng.randint(1, self.n_classes + 1)
            b = rng.randint((c - 1) * self.bin_step, c * self.bin_step)
            if b < len(histogram) and histogram[b]:
                return b
        raise RuntimeError("no non-empty bins")


def load_depth_points(path: str) -> Dict[str, np.ndarray]:
    """Sparse depth points of a frame: npz with x, y, depth arrays
    (the 'depths version 2' payload of /root/reference/load_data.lua:44-81)."""
    z = np.load(path)
    return {"x": z["x"].astype(np.float32),
            "y": z["y"].astype(np.float32),
            "depth": z["depth"].astype(np.float32)}


def load_raw_depth_data(directory: str,
                        blacklist: Sequence[str] = ()) -> List[Dict]:
    """Frames with sparse depth annotations; blacklisted frames skipped
    (load_data.lua:99-112)."""
    ddir = os.path.join(directory, "depths")
    out = []
    if not os.path.isdir(ddir):
        return out
    for name in sorted(os.listdir(ddir)):
        if not name.endswith(".npz") or name.split(".")[0] in blacklist:
            continue
        d = load_depth_points(os.path.join(ddir, name))
        d["name"] = name.split(".")[0]
        out.append(d)
    return out


def median_patch_depth(points: Dict[str, np.ndarray], y0: int, x0: int,
                       h: int, w: int) -> Optional[float]:
    """Median depth of the sparse points inside a patch
    (preSortDataDiscrete, groundtruth_discrete.lua:67-174)."""
    sel = ((points["x"] >= x0) & (points["x"] < x0 + w)
           & (points["y"] >= y0) & (points["y"] < y0 + h))
    if not sel.any():
        return None
    return float(np.median(points["depth"][sel]))


def pre_sort_data_discrete(
    frames: List[Dict], images: List[np.ndarray],
    patch_h: int, patch_w: int, n_samples: int,
    rng: np.random.RandomState,
) -> List[list]:
    """Build the integer-depth histogram of candidate patches."""
    histogram: List[list] = [[] for _ in range(NUMBER_OF_BINS)]
    H, W = images[0].shape[:2]
    for _ in range(n_samples):
        fi = rng.randint(0, len(frames))
        y0 = rng.randint(0, H - patch_h)
        x0 = rng.randint(0, W - patch_w)
        med = median_patch_depth(frames[fi], y0, x0, patch_h, patch_w)
        if med is None:
            continue
        b = min(int(med), NUMBER_OF_BINS - 1)
        histogram[b].append((fi, y0, x0, med))
    return histogram


def generate_data_discrete(
    frames: List[Dict], images: List[np.ndarray],
    patch_h: int, patch_w: int, n_classes: int, n_samples: int,
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray, DepthDiscretizer]:
    """Class-balanced discrete depth dataset
    (generateDataDiscrete, groundtruth_discrete.lua:176-261). Returns
    (patches (N, h, w, C), classes (N,) 1-based, discretizer)."""
    histogram = pre_sort_data_discrete(frames, images, patch_h, patch_w,
                                       n_samples * 4, rng)
    disc = DepthDiscretizer(n_classes)
    disc.compute_cut_depth(histogram, sum(len(b) for b in histogram))
    patches, classes = [], []
    while len(patches) < n_samples:
        b = disc.random_bin(histogram, rng)
        fi, y0, x0, med = histogram[b][rng.randint(0, len(histogram[b]))]
        patches.append(images[fi][y0:y0 + patch_h, x0:x0 + patch_w])
        classes.append(disc.get_class(med))
    return (np.stack(patches).astype(np.float32),
            np.asarray(classes, np.int32), disc)


def generate_continuous_dataset(
    frames: List[Dict], images: List[np.ndarray],
    patch_h: int, patch_w: int, n_samples: int,
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray]:
    """Continuous-depth variant (generateContinuousDataset,
    groundtruth_continuous.lua:125-220): raw median depth as regression
    target."""
    patches, depths = [], []
    H, W = images[0].shape[:2]
    tries = 0
    while len(patches) < n_samples and tries < n_samples * 100:
        tries += 1
        fi = rng.randint(0, len(frames))
        y0 = rng.randint(0, H - patch_h)
        x0 = rng.randint(0, W - patch_w)
        med = median_patch_depth(frames[fi], y0, x0, patch_h, patch_w)
        if med is None:
            continue
        patches.append(images[fi][y0:y0 + patch_h, x0:x0 + patch_w])
        depths.append(med)
    return (np.stack(patches).astype(np.float32),
            np.asarray(depths, np.float32))
