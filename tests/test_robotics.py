"""Native robotics runtime tests: build the C++ library, drive the simulator
physics, depth-map evidence/steering, radial Kalman map, the FIFO record
protocol (33 B control / 98 B navdata,
/root/reference/ardrone/ardrone_api.cpp:211-230, navdata.c:21-46), and the
closed-loop avoidance controller on the obstacle course."""

import math
import os
import threading

import numpy as np
import pytest

from depth_estimation_tpu.robotics import runtime
from depth_estimation_tpu.robotics.control import AvoidanceController


def test_simulator_physics_deterministic():
    sim = runtime.SimulatedAPI(64, 48, fixed_dt=0.05, seed=7,
                               default_course=False)
    sim.takeoff()
    sim.set_control(pitch=0.5, gaz=0.0, roll=0.0, dyaw=0.0)
    for _ in range(20):
        sim.next()
    p = sim.position()
    assert p[0] > 0.3          # moved forward (+x at yaw 0)
    assert abs(p[1]) < 1e-4 and abs(p[2]) < 1e-4
    # yaw integration
    sim.set_control(0.0, 0.0, 0.0, 0.5)
    for _ in range(10):
        sim.next()
    assert abs(sim.yaw - 0.5 * 0.05 * 10) < 1e-5
    # not flying -> frozen
    sim2 = runtime.SimulatedAPI(64, 48, fixed_dt=0.05, default_course=False)
    sim2.set_control(1.0, 0, 0, 0)
    sim2.next()
    assert np.allclose(sim2.position(), 0)


def test_simulator_depth_render():
    sim = runtime.SimulatedAPI(64, 48, fixed_dt=0.05, default_course=False)
    sim.add_obstacle(10.0, 0.0, 0.0, 1.0)
    d = sim.get_depth_map()
    assert d.shape == (48, 64)
    # center of the image sees the obstacle at distance 10
    assert abs(d[24, 32] - 10.0) < 0.2
    # corners see background (100)
    assert d[0, 0] == 100.0
    c = sim.get_confidence_map()
    assert (c == 1.0).all()


def test_simulator_noise_and_fusion():
    sim = runtime.SimulatedAPI(32, 32, fixed_dt=0.05, seed=3,
                               default_course=False)
    sim.takeoff()
    sim.set_control(0.5, 0, 0, 0)
    for _ in range(30):
        sim.next()
    imu = np.stack([sim.get_imu_translation() for _ in range(200)])
    vo = np.stack([sim.get_vo_translation() for _ in range(200)])
    assert 0.1 < imu[:, 1].std() < 0.3      # sigma 0.2
    assert 0.05 < vo[:, 1].std() < 0.15     # sigma 0.1
    fused = np.stack([sim.get_filtered_translation() for _ in range(200)])
    assert fused[:, 0].std() < imu[:, 0].std() * 1.2


def test_depth_map_evidence_and_safe_theta():
    dm = runtime.DepthMap(64, 128, 100.0, 0.9, 320.0)
    # feed the middle scanline: a wall across the whole view at depth 10
    depth = np.full((48, 64), 10.0, np.float32)
    conf = np.ones((48, 64), np.float32)
    for _ in range(30):
        dm.new_frame(depth, conf)
    vals = dm.values()
    assert vals.max() > 0.8
    # every updated ray peaks at rho bin floor(10/100*64) = 6; the straight-
    # ahead ray is iTheta = floor((0/2pi + 0.5) * 128) = 64
    assert np.argmax(vals[64]) == 6, vals[64].argmax()
    # at depth 10 (bin 6 < 64/5) the wall is already close: steer away
    assert dm.get_safe_theta(32) != 0.0
    # fresh map, wall far away (depth 90, bin 57 >= 64/5): no steering
    dm2 = runtime.DepthMap(64, 128, 100.0, 0.9, 320.0)
    far = np.full((48, 64), 90.0, np.float32)
    for _ in range(30):
        dm2.new_frame(far, conf)
    assert dm2.get_safe_theta(32) == 0.0
    # 2d rendering works
    m2 = dm.to_2d_map(100)
    assert m2.shape == (100, 100) and m2.max() > 0.5


def test_depth_map_displacement_rebins():
    dm = runtime.DepthMap(64, 128, 100.0, 0.9, 320.0)
    depth = np.full((48, 64), 100.0, np.float32)
    conf = np.ones((48, 64), np.float32)
    depth[23:25, 30:34] = 20.0
    for _ in range(30):
        dm.new_frame(depth, conf)
    vals0 = dm.values()
    it0 = np.argmax(vals0.max(axis=1))
    r0 = np.argmax(vals0[it0])
    # move 10 units toward the obstacle (+x, sight +x)
    dm.new_displacement(np.array([10.0, 0, 0], np.float32),
                        np.array([1.0, 0, 0], np.float32))
    vals1 = dm.values()
    it1 = np.argmax(vals1.max(axis=1))
    r1 = np.argmax(vals1[it1])
    assert r1 < r0, (r0, r1)   # obstacle got closer


def test_radial_depth_map_kalman():
    rm = runtime.RadialDepthMap(128, 100.0, 0.9, 320.0)
    assert np.allclose(rm.depths(), 100.0)
    pix = np.full((48, 64), 100.0, np.float32)
    pix[24, 28:36] = 10.0
    for _ in range(50):
        rm.new_frame(pix)
    d = rm.depths()
    assert d.min() < 11.0
    v = rm.variances()
    assert v.min() < 0.02   # repeated measurement shrinks variance


def test_fifo_record_codecs():
    rec = runtime.encode_control(0.5, -0.25, 1.5, -2.0)
    assert len(rec) == 33
    kind, p, g, r, y = runtime.decode_control(rec)
    assert kind == "C"
    assert abs(p - 0.5) < 0.011 and abs(g + 0.25) < 0.011
    assert abs(r - 1.0) < 0.011 and abs(y + 1.0) < 0.011   # saturated
    assert runtime.decode_control(runtime.encode_takeoff())[0] == "T"
    assert runtime.decode_control(runtime.encode_land())[0] == "L"

    nd = runtime.encode_navdata(2, 87.0, [1, 2, 3], 150.0, [0.5, -0.25, 0.125])
    assert len(nd) == 98
    out = runtime.decode_navdata(nd)
    assert out["state"] == 2 and out["battery"] == 87.0
    np.testing.assert_allclose(out["gyro"], [1, 2, 3])
    np.testing.assert_allclose(out["velocity"], [0.5, -0.25, 0.125], rtol=1e-5)


def test_fifo_roundtrip_over_real_pipes(tmp_path):
    """End-to-end FIFO link with a fake SDK peer thread (the reference's
    patched-SDK process stand-in)."""
    ctrl = str(tmp_path / "control_pipe")
    os.mkfifo(ctrl)
    received = []

    def peer():
        with open(ctrl, "rb") as f:
            for _ in range(2):
                rec = f.read(33)
                received.append(runtime.decode_control(rec))

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    lib = runtime.load_library()
    link = lib.fifo_open(ctrl.encode(), None)
    lib.fifo_takeoff(link)
    lib.fifo_set_control(link, 0.5, 0.0, 0.0, 0.1)
    t.join(timeout=5)
    lib.fifo_close(link)
    assert received[0][0] == "T"
    assert received[1][0] == "C" and abs(received[1][1] - 0.5) < 0.011


def test_avoidance_loop_steers_around_obstacles():
    """Closed loop on a corridor with a pillar ahead: the drone must advance
    and not collide (the test_simulator.cpp autonomous mode,
    /root/reference/ardrone/test_simulator.cpp:85-147)."""
    sim = runtime.SimulatedAPI(320, 240, fixed_dt=0.05, seed=11,
                               default_course=False)
    sim.add_obstacle(8.0, 0.0, 0.0, 1.5)    # pillar dead ahead
    sim.takeoff()
    dm = runtime.DepthMap(64, 128, 100.0, 0.9, 320.0)
    ctl = AvoidanceController(sim, dm, fov=32)
    traj = ctl.run(150)
    # advanced forward
    assert traj[-1, 0] > 4.0, traj[-1]
    # never collided with the pillar
    d = np.sqrt((traj[:, 0] - 8.0) ** 2 + (traj[:, 1] - 0.0) ** 2)
    assert d.min() > 1.5, d.min()


def test_compute_depth_map_from_flow():
    from depth_estimation_tpu.robotics.drone_api import (
        compute_depth_map_from_flow)
    h, w = 12, 16
    xflow = np.full((h, w), 4.0, np.float32)
    xflow[5, 5] = -7.0   # outlier removed by the mode filter
    mask = np.ones((h, w), np.float32)
    depth, conf = compute_depth_map_from_flow(xflow, mask, m=2.0, k=3)
    # mode filter restores 4.0 at the outlier; depth = 2 * |j-8| / 4
    j = 12
    np.testing.assert_allclose(depth[5, j], 2.0 * abs(j - 8) / 4.0)
    assert conf[5, j] == 1.0
    assert conf[5, 8] == 0.0   # middle column has no parallax


def test_fifo_drone_api_over_pipes(tmp_path):
    """FifoDroneAPI end-to-end with a fake SDK peer: control commands
    arrive; navdata round-trips into telemetry + dead-reckoned position."""
    ctrl = str(tmp_path / "control_pipe")
    nav = str(tmp_path / "navdata_pipe")
    os.mkfifo(ctrl)
    os.mkfifo(nav)
    received = []

    def peer():
        # open order matters: the API side opens control (write, blocking)
        # first, then navdata (read, O_NDELAY) — so the peer must open the
        # control read end first
        f = open(ctrl, "rb")
        nav_w = open(nav, "wb")
        nav_w.write(runtime.encode_navdata(1, 88.0, [0, 0, 1], 120.0,
                                           [2.0, 0.0, 0.0]))
        nav_w.flush()
        for _ in range(2):
            received.append(runtime.decode_control(f.read(33)))
        nav_w.close()
        f.close()

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    from depth_estimation_tpu.robotics.drone_api import FifoDroneAPI
    api = FifoDroneAPI(ctrl, nav)
    api.takeoff()
    api.set_control(0.25, 0.0, 0.0, 0.0)
    import time as _t
    _t.sleep(0.2)
    api.next()
    t.join(timeout=5)
    assert received and received[0][0] == "T"
    assert api.navdata["battery"] == 88.0
    assert api.altitude == 120.0
    # dead-reckoning moved +x (velocity 2 * dt)
    assert api.position()[0] > 0
    api.close()


def test_teleop_scripted_simulator():
    """Teleop loop with injected keys over the SimulatedAPI: the reference
    key map (simple_control_svg.cpp:14-61) — space takes off, w pitches
    forward (position advances), h hovers, q quits."""
    from depth_estimation_tpu.robotics.runtime import SimulatedAPI
    from depth_estimation_tpu.robotics.teleop import Teleop, decode_keys

    api = SimulatedAPI(fixed_dt=0.05)
    t = Teleop(api)
    lines = []
    keys = [" "] + ["w"] * 30 + ["h"] + ["q"]
    steps = t.run(iter(keys), render=lines.append)
    assert steps == len(keys) - 1          # q quits before pumping
    assert t.flying
    assert t.pitch == 0.0                  # h zeroed the latch
    pos = api.position()
    assert pos[0] > 0.05, pos              # pitched forward -> moved +x
    assert "FLYING" in lines[-1]

    # arrow-key escape decoding
    toks = list(decode_keys(iter("\x1b[Aw\x1b[D")))
    assert toks == ["UP", "w", "LEFT"]


def test_teleop_over_fifo_pipes(tmp_path):
    """Teleop drives FifoDroneAPI: scripted keys produce control records a
    fake SDK peer actually receives (takeoff then a forward pitch)."""
    ctrl = str(tmp_path / "c")
    nav = str(tmp_path / "n")
    os.mkfifo(ctrl)
    os.mkfifo(nav)
    received = []

    def peer():
        f = open(ctrl, "rb")
        nav_w = open(nav, "wb")
        nav_w.write(runtime.encode_navdata(1, 90.0, [0, 0, 0], 0.0,
                                           [0.0, 0.0, 0.0]))
        nav_w.flush()
        for _ in range(3):
            rec = f.read(33)
            if len(rec) == 33:
                received.append(runtime.decode_control(rec))
        nav_w.close()
        f.close()

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    from depth_estimation_tpu.robotics.drone_api import FifoDroneAPI
    from depth_estimation_tpu.robotics.teleop import Teleop

    api = FifoDroneAPI(ctrl, nav)
    tel = Teleop(api)
    tel.run(iter([" ", "w", "q"]))
    t.join(timeout=5)
    api.close()
    assert received and received[0][0] == "T"
    # the 'w' key latched pitch=1 into a control record
    # space sends T + a zero control record; 'w' then latches pitch=1
    assert any(r[0] == "C" and abs(r[1] - 1.0) < 1e-6 for r in received), \
        received
