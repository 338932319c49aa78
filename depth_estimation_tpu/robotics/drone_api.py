"""Real-drone API adapter — the ARdroneAPI rebuild.

/root/reference/ardrone/ardrone_api.cpp: the reference's real-drone backend
speaks two named FIFOs to the patched Parrot SDK process (control commands
out, navdata telemetry in), embeds a Lua interpreter to pull per-frame
flow/mask from nextFrameDepth(), and converts x-flow to a depth map with a
mode filter (computeDepthMapFromFlow :99-140).

Here: FifoDroneAPI implements the same surface as the native SimulatedAPI
(drop-in for the avoidance controller) on top of:
  * the native FIFO link (robotics/runtime.py) for control + navdata,
  * a frame source (data.images.ImageLoader / ImageCamera) and a
    DepthEstimator (api.py) replacing the embedded-Lua handoff,
  * compute_depth_map_from_flow below.
"""

from __future__ import annotations

import ctypes
import time
from typing import Optional, Tuple

import numpy as np

from . import runtime


def compute_depth_map_from_flow(
    xflow: np.ndarray, mask: np.ndarray, m: float, k: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """x-flow -> (depth, confidence), the ARdroneAPI rule
    (/root/reference/ardrone/ardrone_api.cpp:99-140): mode-filter the
    rounded x-flow over a (2k)x(2k) masked window (histogram over
    [-8, 12)), then depth = m * |j - cx| / |flow|, 100 for |flow| < 1.1."""
    h, w = xflow.shape
    mk = mask > 0.5
    f = np.round(xflow).astype(np.int32)
    flow_p = np.zeros_like(xflow)
    for i in range(w):
        for j in range(h):
            if not mk[j, i]:
                continue
            i0, i1 = max(0, i - k), min(w, i + k)
            j0, j1 = max(0, j - k), min(h, j + k)
            vals = f[j0:j1, i0:i1][mk[j0:j1, i0:i1]]
            if vals.size:
                counts = np.bincount(np.clip(vals + 8, 0, 19), minlength=20)
                flow_p[j, i] = int(np.argmax(counts)) - 8
    middlex = w // 2
    jj = np.arange(w)[None, :]
    depth = np.where(np.abs(flow_p) < 1.1, 100.0,
                     m * np.abs(jj - middlex) / np.maximum(np.abs(flow_p), 1e-6))
    ok = mk & (jj != middlex)
    depth = np.where(ok, depth, 0.0)
    conf = ok.astype(np.float32)
    return depth.astype(np.float32), conf


class FifoDroneAPI:
    """DroneAPI over the FIFO protocol + on-device flow inference. The
    one-line backend switch with SimulatedAPI
    (/root/reference/ardrone/test_simulator.cpp:160-161) is preserved: both
    expose next/get_depth_map/get_confidence_map/takeoff/land/set_control/
    get_filtered_translation/get_gyro/position."""

    def __init__(self, control_path: str, navdata_path: str,
                 estimator=None, frame_source=None):
        lib = runtime.load_library()
        self._lib = lib
        self._h = lib.fifo_open(
            control_path.encode() if control_path else None,
            navdata_path.encode() if navdata_path else None)
        self.estimator = estimator
        self.frames = frame_source
        self._last_time = time.monotonic()
        self.delta_t = 0.0
        self.navdata = dict(state=0, battery=100.0,
                            gyro=np.zeros(3, np.float32), altitude=0.0,
                            velocity=np.zeros(3, np.float32))
        self._depth = np.zeros((1, 1), np.float32)
        self._conf = np.zeros((1, 1), np.float32)
        self._pos = np.zeros(3, np.float32)

    def close(self):
        if self._h:
            self._lib.fifo_close(self._h)
            self._h = None

    # -- telemetry -----------------------------------------------------

    def _read_navdata(self):
        F = ctypes.c_float
        state = ctypes.c_int()
        battery = F()
        alt = F()
        gyro = np.empty(3, np.float32)
        vel = np.empty(3, np.float32)
        got = self._lib.fifo_read_navdata(
            self._h, ctypes.byref(state), ctypes.byref(battery),
            gyro.ctypes.data_as(ctypes.POINTER(F)), ctypes.byref(alt),
            vel.ctypes.data_as(ctypes.POINTER(F)))
        if got:
            self.navdata = dict(state=state.value, battery=battery.value,
                                gyro=gyro, altitude=alt.value, velocity=vel)

    def next(self):
        now = time.monotonic()
        self.delta_t = now - self._last_time
        self._last_time = now
        self._read_navdata()
        # imu translation = velocity * dt (nextNavdata, ardrone_api.cpp:71)
        self._imu_d = self.navdata["velocity"] * self.delta_t
        self._pos = self._pos + self._imu_d
        if self.estimator is not None and self.frames is not None:
            frame = self.frames.get_next_frame()
            if frame is not None:
                _, xflow, mask = self.estimator.next_frame_depth(frame)
                m = float(self._imu_d[0]) or 1.0
                self._depth, self._conf = compute_depth_map_from_flow(
                    xflow, mask, m)

    # -- DroneAPI surface ------------------------------------------------

    def get_depth_map(self) -> np.ndarray:
        return self._depth

    def get_confidence_map(self) -> np.ndarray:
        return self._conf

    def get_imu_translation(self) -> np.ndarray:
        return self._imu_d

    def get_filtered_translation(self) -> np.ndarray:
        return self._imu_d   # no VO on the real drone path

    def get_gyro(self) -> np.ndarray:
        return self.navdata["gyro"]

    def position(self) -> np.ndarray:
        return self._pos

    @property
    def altitude(self) -> float:
        return self.navdata["altitude"]

    def takeoff(self):
        self._lib.fifo_takeoff(self._h)

    def land(self):
        self._lib.fifo_land(self._h)

    def set_control(self, pitch: float, gaz: float, roll: float, dyaw: float):
        self._lib.fifo_set_control(self._h, pitch, gaz, roll, dyaw)
