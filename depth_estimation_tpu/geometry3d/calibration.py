"""Camera calibration system — the .cal equivalent.

Rebuilds /root/reference/radial/generate_calibration_file.lua: named camera
presets (intrinsics K, 5-coefficient Brown distortion, SFM/tracking params,
image sizes) serialized to disk. The reference stores Torch binaries; here
the payload is JSON (greppable, versionable) holding the same fields.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SfmParams:
    max_points: int = 400
    points_quality: float = 0.001
    points_min_dist: float = 10.0
    ransac_max_dist: float = 1.0
    ransac2_max_dist: float = 0.02
    tracker_win_size: int = 21


@dataclasses.dataclass(frozen=True)
class Calibration:
    name: str
    wImg: int
    hImg: int
    fx: float
    fy: float
    cx: float
    cy: float
    distortion: Tuple[float, float, float, float, float]
    sfm: SfmParams = SfmParams()
    bad_image_threshold: float = 0.2

    @property
    def K(self) -> np.ndarray:
        return np.array([[self.fx, 0.0, self.cx],
                         [0.0, self.fy, self.cy],
                         [0.0, 0.0, 1.0]], np.float32)

    def scaled(self, factor: float) -> "Calibration":
        """Intrinsics for a resized image (the reference divides K by 4 for
        'rectified_gopro_small')."""
        return dataclasses.replace(
            self, name=self.name + f"_x{factor}",
            wImg=int(self.wImg * factor), hImg=int(self.hImg * factor),
            fx=self.fx * factor, fy=self.fy * factor,
            cx=self.cx * factor, cy=self.cy * factor,
        )

    def save(self, path: str) -> None:
        d = dataclasses.asdict(self)
        with open(path, "w") as f:
            json.dump(d, f, indent=1)

    @staticmethod
    def load(path: str) -> "Calibration":
        with open(path) as f:
            d = json.load(f)
        d["sfm"] = SfmParams(**d["sfm"])
        d["distortion"] = tuple(d["distortion"])
        return Calibration(**d)


# Presets (constants from /root/reference/radial/generate_calibration_file.lua)

ARDRONE = Calibration(
    name="ardrone", wImg=640, hImg=480,
    fx=293.824707, fy=310.435730, cx=300.631012, cy=251.624924,
    distortion=(-0.379940, 0.212737, 0.003098, 0.000870, -0.069770),
    sfm=SfmParams(max_points=400, points_quality=0.001, ransac_max_dist=1.0),
)

GOPRO = Calibration(
    name="gopro", wImg=1280, hImg=720,
    fx=602.663208, fy=603.193289, cx=641.455200, cy=344.950836,
    distortion=(-0.355740, 0.142684, 0.000469, 0.000801, -0.027673),
    sfm=SfmParams(max_points=400, points_quality=0.001, ransac_max_dist=1.0),
)

RECTIFIED_GOPRO = Calibration(
    name="rectified_gopro", wImg=1280, hImg=720,
    fx=602.663208, fy=603.193289, cx=641.455200, cy=344.950836,
    distortion=(0.0, 0.0, 0.0, 0.0, 0.0),
    sfm=SfmParams(max_points=1000, points_quality=0.0001, points_min_dist=30,
                  ransac_max_dist=1.0, ransac2_max_dist=0.02,
                  tracker_win_size=21),
)

RECTIFIED_GOPRO_SMALL = Calibration(
    name="rectified_gopro_small", wImg=340, hImg=180,
    fx=602.663208 / 4, fy=603.193289 / 4,
    cx=641.455200 / 4, cy=344.950836 / 4,
    distortion=(0.0, 0.0, 0.0, 0.0, 0.0),
    sfm=SfmParams(max_points=500, points_quality=0.0001, points_min_dist=10,
                  ransac_max_dist=1.0, ransac2_max_dist=0.02),
)

PRESETS = {c.name: c for c in
           (ARDRONE, GOPRO, RECTIFIED_GOPRO, RECTIFIED_GOPRO_SMALL)}
