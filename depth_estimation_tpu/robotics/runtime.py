"""ctypes bindings over the native C++ drone runtime (robotics/native/).

Builds the shared library on first use (make), then exposes SimulatedAPI,
DepthMap, RadialDepthMap and the FIFO protocol as Python classes. This is
the framework's Python<->C++ boundary, playing the role of the reference's
embedded-Lua tensor handoff (/root/reference/ardrone/ardrone_api.cpp:76-91).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdrone_runtime.so")
_lib = None


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < max(
            os.path.getmtime(os.path.join(_NATIVE_DIR, f))
            for f in os.listdir(_NATIVE_DIR) if f.endswith((".cpp", ".h")))
    ):
        subprocess.run(["make", "-s", "-C", _NATIVE_DIR], check=True)
    lib = ctypes.CDLL(_LIB_PATH)

    F = ctypes.c_float
    P = ctypes.c_void_p
    FP = ctypes.POINTER(ctypes.c_float)
    lib.sim_create.restype = P
    lib.sim_create.argtypes = [ctypes.c_int, ctypes.c_int, F,
                               ctypes.c_ulonglong, ctypes.c_int]
    lib.sim_delta_t.restype = F
    lib.sim_delta_t.argtypes = [P]
    lib.sim_altitude.restype = F
    lib.sim_altitude.argtypes = [P]
    lib.sim_yaw.restype = F
    lib.sim_yaw.argtypes = [P]
    for name in ("sim_destroy", "sim_next", "sim_takeoff", "sim_land"):
        getattr(lib, name).argtypes = [P]
    for name in ("sim_depth_map", "sim_confidence_map", "sim_imu_translation",
                 "sim_vo_translation", "sim_filtered_translation", "sim_gyro",
                 "sim_position"):
        getattr(lib, name).argtypes = [P, FP]
    lib.sim_set_control.argtypes = [P, F, F, F, F]
    lib.sim_add_obstacle.argtypes = [P, F, F, F, F]
    lib.sim_clear_obstacles.argtypes = [P]

    lib.dmap_create.restype = P
    lib.dmap_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t, F, F, F]
    lib.dmap_destroy.argtypes = [P]
    lib.dmap_new_pixel.argtypes = [P, F, F, F, F, F, F]
    lib.dmap_new_displacement.argtypes = [P, FP, FP]
    lib.dmap_new_frame.argtypes = [P, FP, FP, ctypes.c_int, ctypes.c_int]
    lib.dmap_safe_theta.restype = F
    lib.dmap_safe_theta.argtypes = [P, ctypes.c_size_t]
    lib.dmap_values.argtypes = [P, FP]
    lib.dmap_to_2d.argtypes = [P, FP, ctypes.c_int]
    lib.dmap_theta_sight.restype = F
    lib.dmap_theta_sight.argtypes = [P]

    lib.rdmap_create.restype = P
    lib.rdmap_create.argtypes = [ctypes.c_size_t, F, F, F]
    lib.rdmap_destroy.argtypes = [P]
    lib.rdmap_new_pixel.argtypes = [P, F, F, F, F, F, F]
    lib.rdmap_new_displacement.argtypes = [P, FP, FP]
    lib.rdmap_new_frame.argtypes = [P, FP, ctypes.c_int, ctypes.c_int]
    lib.rdmap_depths.argtypes = [P, FP]
    lib.rdmap_variances.argtypes = [P, FP]
    lib.rdmap_to_2d.argtypes = [P, FP, ctypes.c_int]

    lib.fifo_encode_control.argtypes = [ctypes.c_char_p, F, F, F, F]
    lib.fifo_encode_takeoff.argtypes = [ctypes.c_char_p]
    lib.fifo_encode_land.argtypes = [ctypes.c_char_p]
    lib.fifo_decode_control.restype = ctypes.c_char
    lib.fifo_decode_control.argtypes = [ctypes.c_char_p, FP, FP, FP, FP]
    lib.fifo_encode_navdata.argtypes = [ctypes.c_char_p, ctypes.c_int, F, FP,
                                        F, FP]
    lib.fifo_decode_navdata.restype = ctypes.c_int
    lib.fifo_decode_navdata.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), FP, FP, FP, FP]
    lib.fifo_open.restype = P
    lib.fifo_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.fifo_close.argtypes = [P]
    lib.fifo_takeoff.argtypes = [P]
    lib.fifo_land.argtypes = [P]
    lib.fifo_set_control.argtypes = [P, F, F, F, F]
    lib.fifo_read_navdata.restype = ctypes.c_int
    lib.fifo_read_navdata.argtypes = [
        P, ctypes.POINTER(ctypes.c_int), FP, FP, FP, FP]
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


CONTROL_RECORD_LEN = 33
NAVDATA_RECORD_LEN = 98


class SimulatedAPI:
    """Python handle to the native physics simulator (the fake backend)."""

    def __init__(self, w: int = 320, h: int = 240, fixed_dt: float = 0.0,
                 seed: int = 42, default_course: bool = True):
        self._lib = load_library()
        self._h = self._lib.sim_create(w, h, fixed_dt, seed,
                                       1 if default_course else 0)
        self.w, self.h = w, h

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sim_destroy(self._h)
            self._h = None

    def next(self):
        self._lib.sim_next(self._h)

    @property
    def delta_t(self) -> float:
        return self._lib.sim_delta_t(self._h)

    def get_depth_map(self) -> np.ndarray:
        out = np.empty((self.h, self.w), np.float32)
        self._lib.sim_depth_map(self._h, _fp(out))
        return out

    def get_confidence_map(self) -> np.ndarray:
        out = np.empty((self.h, self.w), np.float32)
        self._lib.sim_confidence_map(self._h, _fp(out))
        return out

    def _vec3(self, fn) -> np.ndarray:
        out = np.empty(3, np.float32)
        fn(self._h, _fp(out))
        return out

    def get_imu_translation(self): return self._vec3(self._lib.sim_imu_translation)
    def get_vo_translation(self): return self._vec3(self._lib.sim_vo_translation)
    def get_filtered_translation(self): return self._vec3(self._lib.sim_filtered_translation)
    def get_gyro(self): return self._vec3(self._lib.sim_gyro)
    def position(self): return self._vec3(self._lib.sim_position)

    @property
    def altitude(self) -> float:
        return self._lib.sim_altitude(self._h)

    @property
    def yaw(self) -> float:
        return self._lib.sim_yaw(self._h)

    def takeoff(self): self._lib.sim_takeoff(self._h)
    def land(self): self._lib.sim_land(self._h)

    def set_control(self, pitch: float, gaz: float, roll: float, dyaw: float):
        self._lib.sim_set_control(self._h, pitch, gaz, roll, dyaw)

    def add_obstacle(self, x, y, z, r):
        self._lib.sim_add_obstacle(self._h, x, y, z, r)

    def clear_obstacles(self):
        self._lib.sim_clear_obstacles(self._h)


class DepthMap:
    """Polar occupancy grid (theta x rho), native."""

    def __init__(self, n_rho: int = 64, n_theta: int = 128,
                 max_depth: float = 100.0, unseen_decay: float = 0.9,
                 focal_length: float = 320.0):
        self._lib = load_library()
        self._h = self._lib.dmap_create(n_rho, n_theta, max_depth,
                                        unseen_decay, focal_length)
        self.n_rho, self.n_theta = n_rho, n_theta

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dmap_destroy(self._h)
            self._h = None

    def new_pixel(self, x, y, depth, conf, w, h):
        self._lib.dmap_new_pixel(self._h, x, y, depth, conf, w, h)

    def new_displacement(self, pos, sight):
        pos = np.ascontiguousarray(pos, np.float32)
        sight = np.ascontiguousarray(sight, np.float32)
        self._lib.dmap_new_displacement(self._h, _fp(pos), _fp(sight))

    def new_frame(self, depth: np.ndarray, conf: np.ndarray):
        depth = np.ascontiguousarray(depth, np.float32)
        conf = np.ascontiguousarray(conf, np.float32)
        h, w = depth.shape
        self._lib.dmap_new_frame(self._h, _fp(depth), _fp(conf), w, h)

    def get_safe_theta(self, fov: int) -> float:
        return self._lib.dmap_safe_theta(self._h, fov)

    def values(self) -> np.ndarray:
        out = np.empty((self.n_theta, self.n_rho), np.float32)
        self._lib.dmap_values(self._h, _fp(out))
        return out

    def to_2d_map(self, size: int = 300) -> np.ndarray:
        out = np.empty((size, size), np.float32)
        self._lib.dmap_to_2d(self._h, _fp(out), size)
        return out

    @property
    def theta_sight(self) -> float:
        return self._lib.dmap_theta_sight(self._h)


class RadialDepthMap:
    """1-D Kalman per-angle depth map, native."""

    def __init__(self, n_theta: int = 128, max_depth: float = 100.0,
                 unseen_decay: float = 0.9, focal_length: float = 320.0):
        self._lib = load_library()
        self._h = self._lib.rdmap_create(n_theta, max_depth, unseen_decay,
                                         focal_length)
        self.n_theta = n_theta

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rdmap_destroy(self._h)
            self._h = None

    def new_pixel(self, x, y, depth, var, w, h):
        self._lib.rdmap_new_pixel(self._h, x, y, depth, var, w, h)

    def new_displacement(self, pos, sight):
        pos = np.ascontiguousarray(pos, np.float32)
        sight = np.ascontiguousarray(sight, np.float32)
        self._lib.rdmap_new_displacement(self._h, _fp(pos), _fp(sight))

    def new_frame(self, pixels: np.ndarray):
        pixels = np.ascontiguousarray(pixels, np.float32)
        h, w = pixels.shape
        self._lib.rdmap_new_frame(self._h, _fp(pixels), w, h)

    def depths(self) -> np.ndarray:
        out = np.empty(self.n_theta, np.float32)
        self._lib.rdmap_depths(self._h, _fp(out))
        return out

    def variances(self) -> np.ndarray:
        out = np.empty(self.n_theta, np.float32)
        self._lib.rdmap_variances(self._h, _fp(out))
        return out

    def to_2d_map(self, size: int = 300) -> np.ndarray:
        out = np.empty((size, size), np.float32)
        self._lib.rdmap_to_2d(self._h, _fp(out), size)
        return out


# ---------------------------------------------------------------------------
# FIFO protocol helpers (record codecs usable without live pipes)
# ---------------------------------------------------------------------------

def encode_control(pitch: float, gaz: float, roll: float, yaw: float) -> bytes:
    lib = load_library()
    buf = ctypes.create_string_buffer(CONTROL_RECORD_LEN)
    lib.fifo_encode_control(buf, pitch, gaz, roll, yaw)
    return buf.raw[:CONTROL_RECORD_LEN]


def encode_takeoff() -> bytes:
    lib = load_library()
    buf = ctypes.create_string_buffer(CONTROL_RECORD_LEN)
    lib.fifo_encode_takeoff(buf)
    return buf.raw[:CONTROL_RECORD_LEN]


def encode_land() -> bytes:
    lib = load_library()
    buf = ctypes.create_string_buffer(CONTROL_RECORD_LEN)
    lib.fifo_encode_land(buf)
    return buf.raw[:CONTROL_RECORD_LEN]


def decode_control(record: bytes):
    """Returns (kind, pitch, gaz, roll, yaw); kind in 'T', 'L', 'C', ''."""
    lib = load_library()
    F = ctypes.c_float
    p, g, r, y = F(), F(), F(), F()
    kind = lib.fifo_decode_control(record, ctypes.byref(p), ctypes.byref(g),
                                   ctypes.byref(r), ctypes.byref(y))
    return kind.decode() if kind != b"\x00" else "", p.value, g.value, r.value, y.value


def encode_navdata(state: int, battery: float, gyro, altitude: float, vel) -> bytes:
    lib = load_library()
    buf = ctypes.create_string_buffer(NAVDATA_RECORD_LEN)
    g = np.ascontiguousarray(gyro, np.float32)
    v = np.ascontiguousarray(vel, np.float32)
    lib.fifo_encode_navdata(buf, state, battery, _fp(g), altitude, _fp(v))
    return buf.raw[:NAVDATA_RECORD_LEN]


def decode_navdata(record: bytes):
    lib = load_library()
    state = ctypes.c_int()
    battery = ctypes.c_float()
    alt = ctypes.c_float()
    gyro = np.empty(3, np.float32)
    vel = np.empty(3, np.float32)
    ok = lib.fifo_decode_navdata(record, ctypes.byref(state),
                                 ctypes.byref(battery), _fp(gyro),
                                 ctypes.byref(alt), _fp(vel))
    if not ok:
        return None
    return dict(state=state.value, battery=battery.value, gyro=gyro,
                altitude=alt.value, velocity=vel)
