"""Public streaming inference API — the depth_estimation_api.lua rebuild.

``DepthEstimator.next_frame_depth()``: frame in -> (scaled frame, x-flow,
mask) out, with the reference's exact pipeline
(/root/reference/depth_estimation_api.lua:134-198):

  undistort -> ego-motion (R, T, inlier ratio) -> scale -> rotation-compensate
  the PREVIOUS frame's *feature maps* (the prefilter split: the conv trunk
  runs once per frame, :30-31,147) -> filter current frame -> bad-frame
  rejection (inliers/found < bad_image_threshold -> zeros, :159-162) ->
  matcher + decode -> mask erosion by the matcher footprint -> center the
  mask -> gate by confidences.

TPU-first: the whole dense path (undistort, filter, warp, match, decode,
mask) is one jitted device program per frame; only frame IO, the inlier-ratio
branch, and state rotation stay on host. Per-stage timing via utils.timer
(the reference prints per-stage latencies; same here with report()).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import Geometry
from .geometry3d import undistort as undist
from .geometry3d.calibration import Calibration
from .geometry3d import egomotion as ego
from .models import flow as flow_model
from .ops import extract
from .utils.timer import Timers
from .data.images import scale as img_scale


class DepthEstimator:
    """Holds model params + previous-frame device state (features, frame)."""

    def __init__(self, geometry: Geometry, params, cal: Calibration,
                 head: str = "mean", sync_timers: bool = False):
        geometry.validate()
        self.geometry = geometry
        self.params = params
        self.cal = cal
        self.head = head
        self.model = flow_model.FlowModel(geometry)
        self.timers = Timers(sync_device=sync_timers)
        # K scaled to the model's working resolution
        sy = geometry.hImg / cal.hImg
        sx = geometry.wImg / cal.wImg
        Ks = cal.K.copy()
        Ks[0] *= sx
        Ks[1] *= sy
        self.K_scaled = Ks
        self.last_im: Optional[np.ndarray] = None
        self.last_filtered = None

        g = geometry

        @jax.jit
        def _prep(params, frame):
            u = undist.undistort_image(frame, cal.K, cal.distortion)
            small = img_scale(u, g.hImg, g.wImg)
            return u, small, self.model.features(params, small)

        @jax.jit
        def _match(params, last_filtered, filtered, R):
            # rotation-compensate previous features; warp validity = mask
            warped = undist.remove_ego_motion(last_filtered, self.K_scaled, R)
            ones = jnp.ones(last_filtered.shape[:2] + (1,), jnp.float32)
            mask = undist.remove_ego_motion(ones, self.K_scaled, R)[..., 0]
            f1 = flow_model.crop_features_center(g, warped)
            costs = jnp.stack([
                jnp.sum((f1 - jax.lax.slice(
                    filtered, (dy, dx, 0),
                    (dy + f1.shape[0], dx + f1.shape[1], filtered.shape[2])
                )) ** 2, axis=-1)
                for dy in range(g.maxh) for dx in range(g.maxw)
            ], axis=-1)
            dist = jax.nn.softmax(-costs, axis=-1)
            if head == "mean":
                ey, ex = flow_model.soft_argmax(g, dist)
                idx, conf = extract.extract_output(dist, 0.11)
                y, x = ey, ex
                confs = (conf > 0).astype(jnp.float32)
            else:
                out = flow_model.process_output(g, dist, process_full=False)
                y = out.y.astype(jnp.float32)
                x = out.x.astype(jnp.float32)
                confs = out.confidences
            H, W = y.shape
            # full-frame assembly
            hoff = (g.hImg - H) // 2
            woff = (g.wImg - W) // 2
            full = jnp.zeros((2, g.hImg, g.wImg), jnp.float32)
            full = full.at[0, hoff:hoff + H, woff:woff + W].set(y)
            full = full.at[1, hoff:hoff + H, woff:woff + W].set(x)
            fullc = jnp.zeros((g.hImg, g.wImg), jnp.float32)
            fullc = fullc.at[hoff:hoff + H, woff:woff + W].set(confs)
            # mask pipeline (:172-182): take the warp-validity of the f1
            # positions actually matched, erode by the matcher footprint,
            # embed centered in the full frame, gate by confidences
            m = jax.lax.slice(mask, (g.halfh1, g.halfw1),
                              (g.halfh1 + H, g.halfw1 + W))
            m = extract.enlarge_mask(m > 0.5, g.hKernel, g.wKernel)
            fullm = jnp.zeros((g.hImg, g.wImg), jnp.float32)
            fullm = fullm.at[hoff:hoff + H, woff:woff + W].set(
                m.astype(jnp.float32))
            return full, fullm * fullc

        self._prep = _prep
        self._match = _match

        # One-dispatch-per-frame fused step: undistort/scale/filter the new
        # frame, ego-motion against the previous frame, rotation-compensated
        # match, and BRANCHLESS bad-frame gating (jnp.where instead of a
        # host-synced ratio check) — on tunneled backends every host sync
        # costs a ~30 ms round trip, so the whole frame is one program.
        def _step(params, last_im, last_filtered, frame):
            u, small, feats = _prep(params, frame)
            em = ego.get_ego_motion(
                last_im, u, cal.K,
                max_points=cal.sfm.max_points,
                quality=cal.sfm.points_quality)
            ratio = em.n_inliers.astype(jnp.float32) / jnp.maximum(
                em.n_found.astype(jnp.float32), 1.0)
            good = ratio >= cal.bad_image_threshold
            R = jnp.where(good, em.R, jnp.eye(3, dtype=jnp.float32))
            full, mask_d = _match(params, last_filtered, feats, R)
            full = jnp.where(good, full, 0.0)
            mask_d = jnp.where(good, mask_d, 0.0)
            return u, small, feats, full, mask_d, good

        self._step = jax.jit(_step)

    def reset(self, first_frame: np.ndarray) -> None:
        u, small, feats = self._prep(self.params, jnp.asarray(first_frame))
        self.last_im = u                  # kept on device
        self.last_im_scaled = small
        self.last_filtered = feats

    def next_frame_depth(self, frame: np.ndarray, fetch: bool = True):
        """Returns (im_scaled (H, W, C), xflow (H, W), mask (H, W)).

        One device dispatch per frame (see _step); with fetch=False the
        returned arrays stay on device (zero host syncs — chain them into
        further device work)."""
        assert self.last_im is not None, "call reset(first_frame) first"
        t = self.timers
        t.tic("frame")
        u, small, feats, full, mask_d, good = self._step(
            self.params, self.last_im, self.last_filtered,
            jnp.asarray(frame))
        t.toc("frame", mask_d if t.sync_device else None)
        self.last_im = u
        self.last_im_scaled = small
        self.last_filtered = feats
        if fetch:
            return np.asarray(small), np.asarray(full[1]), np.asarray(mask_d)
        return small, full[1], mask_d
