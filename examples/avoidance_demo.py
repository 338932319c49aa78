#!/usr/bin/env python
"""Closed-loop obstacle-avoidance demo on the native simulator.

The headless counterpart of the reference's GLUT windows
(/root/reference/ardrone/test_simulator.cpp:137-147): runs the avoidance
controller on the default obstacle course and writes per-step panels
(synthetic depth view | polar occupancy map render | top-down trajectory)
plus an animated GIF into examples/avoidance_out/.

Usage: python examples/avoidance_demo.py [n_steps] [--show]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from depth_estimation_tpu.robotics.control import AvoidanceController
    from depth_estimation_tpu.robotics.runtime import DepthMap, SimulatedAPI
    from depth_estimation_tpu.utils.viz import export_video, save_image

    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_steps = int(pos_args[0]) if pos_args else 60
    out_dir = os.path.join(os.path.dirname(__file__), "avoidance_out")
    os.makedirs(out_dir, exist_ok=True)

    api = SimulatedAPI(320, 240, fixed_dt=0.1, seed=7)
    api.takeoff()
    # DepthMap(64, 128, 100, 0.9, 320) — the reference main's wiring
    # (test_simulator.cpp:160-172)
    dmap = DepthMap(64, 128, 100.0, 0.9, 320)
    viewer = None
    if "--show" in sys.argv:
        from depth_estimation_tpu.utils.viewer import LiveViewer
        viewer = LiveViewer("avoidance: 2-D map")
        if viewer.backend == "none":
            print("--show: no display available, continuing headless")
    ctl = AvoidanceController(api, dmap, fov=32, viewer=viewer)

    traj = []
    for i in range(n_steps):
        safe = ctl.step()
        traj.append(np.asarray(api.position()))
        depth = api.get_depth_map()
        grid = dmap.to_2d_map(160)

        # panel: depth view | occupancy render | trajectory
        h = 160
        dview = depth / max(depth.max(), 1e-6)
        dview = np.asarray(
            np.kron(dview, np.ones((1, 1))))  # (240, 320)
        dview = dview[::240 // h or 1][:h]
        dview = dview[:, : int(dview.shape[1] * h / 240)]
        gview = grid / max(grid.max(), 1e-6)
        tview = np.zeros((h, h), np.float32)
        pts = np.asarray(traj)
        if len(pts) > 1:
            span = max(np.abs(pts[:, [0, 2]]).max(), 1.0)
            xs = ((pts[:, 0] / span) * (h / 2 - 4) + h / 2).astype(int)
            zs = ((pts[:, 2] / span) * (h / 2 - 4) + h / 2).astype(int)
            tview[np.clip(zs, 0, h - 1), np.clip(xs, 0, h - 1)] = 1.0
        wide = max(dview.shape[1], 1)
        panel = np.concatenate([
            np.pad(dview, ((0, h - dview.shape[0]), (0, 0)))[:h],
            np.ones((h, 4), np.float32),
            gview[:h, :h] if gview.shape[0] >= h else np.pad(
                gview, ((0, h - gview.shape[0]), (0, h - gview.shape[1]))),
            np.ones((h, 4), np.float32),
            tview,
        ], axis=1)
        save_image(os.path.join(out_dir, f"{i:09d}.png"), panel)
        if i % 10 == 0:
            print(f"step {i}: safe_theta={safe:+.0f} pos={traj[-1]}",
                  flush=True)

    ok = export_video(out_dir, os.path.join(out_dir, "avoidance.mp4"), fps=10)
    print("video export:", "ok" if ok else "failed")
    pts = np.asarray(traj)
    print(f"trajectory span: x {pts[:,0].min():.1f}..{pts[:,0].max():.1f} "
          f"z {pts[:,2].min():.1f}..{pts[:,2].max():.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
