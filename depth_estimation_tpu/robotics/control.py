"""Autonomous obstacle-avoidance control loop (headless).

Rebuild of the reference's GLUT idle loop
(/root/reference/ardrone/test_simulator.cpp:85-147): each tick asks the
polar occupancy map for a safe heading within a field of view, converts it
to the reference's keyboard-equivalent control (forward pitch 0.5; roll
+-0.3 and yaw +-0.3 toward the safe side when an obstacle is close), steps
the drone API, and feeds the depth map with the new frame + displacement.

Works with any backend implementing the SimulatedAPI surface — the real
drone adapter (drone_api.FifoDroneAPI) is a drop-in replacement, mirroring
the reference's one-line backend switch (test_simulator.cpp:160-161).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .runtime import DepthMap, SimulatedAPI


class AvoidanceController:
    def __init__(self, api, depth_map: DepthMap, fov: int = 32,
                 viewer=None):
        """``viewer``: optional utils.viewer.LiveViewer — when given, each
        control tick shows the 2-D occupancy map live (the reference's
        cv::imshow map window, test_simulator.cpp:137-147); the headless
        no-op backend keeps the loop byte-identical without a display."""
        self.api = api
        self.map = depth_map
        self.fov = fov
        self.viewer = viewer
        self.last_safe_theta = 0.0

    def step(self) -> float:
        """One control tick; returns the safe-theta decision used."""
        safe = self.map.get_safe_theta(self.fov)
        self.last_safe_theta = safe
        pitch, gaz, roll, dyaw = 0.5, 0.0, 0.0, 0.0   # 'w': forward
        if safe > 0:
            roll, dyaw = 0.3, 0.3                      # 'd' + RIGHT
        elif safe < 0:
            roll, dyaw = -0.3, -0.3                    # 'a' + LEFT
        self.api.set_control(pitch, gaz, roll, dyaw)
        self.api.next()

        depth = self.api.get_depth_map()
        conf = self.api.get_confidence_map()
        self.map.new_displacement(self.api.get_filtered_translation(),
                                  self.api.get_gyro())
        self.map.new_frame(depth, conf)
        if self.viewer is not None:
            self.viewer.show(self.map.to_2d_map())
        return safe

    def run(self, n_steps: int) -> np.ndarray:
        """Run the loop; returns the (n_steps, 3) trajectory."""
        traj = np.zeros((n_steps, 3), np.float32)
        for i in range(n_steps):
            self.step()
            traj[i] = self.api.position()
        return traj
