"""Keyboard teleoperation — the simple_control_svg.cpp regime, headless.

The reference's teleop (/root/reference/ardrone/simple_control_svg.cpp:14-75)
is a GLUT window with key-down/up handlers: WASD = pitch/roll, arrow keys =
gaz / yaw rate, space = takeoff/land toggle, controls sent via
``setControl`` each event, ``api->next()`` pumped from the idle callback
with the depth map drawn as a texture.

This rebuild keeps the exact key map and control magnitudes but is
terminal-native (this environment has no display): keys are read raw from
stdin (escape-sequence decoding for arrows), and — since a terminal cannot
observe key-UP events — a pressed key LATCHES its control until ``h``
(hover) zeroes it (the teleop_twist_keyboard convention; documented
deviation). A scripted key source can be injected instead of stdin, which
is how the loop is tested (tests/test_robotics.py) and how any program can
drive it.

Key map (simple_control_svg.cpp:14-61):
  w/s      pitch +1 / -1 (forward/back)
  a/d      roll  -1 / +1 (left/right)
  Up/Down  gaz   +1 / -1 (climb/descend)
  Left/Right  dyaw -0.25 / +0.25
  space    takeoff / land toggle
  h        hover (zero all controls)        [terminal addition]
  q        quit                             [terminal addition]
"""

from __future__ import annotations

import sys
from typing import Callable, Iterable, Optional


ARROWS = {"[A": "UP", "[B": "DOWN", "[C": "RIGHT", "[D": "LEFT"}


def decode_keys(byte_stream: Iterable[str]):
    """Decode a character stream into key tokens ('w', 'UP', ' ', ...)."""
    it = iter(byte_stream)
    for ch in it:
        if ch == "\x1b":
            seq = next(it, "") + next(it, "")
            tok = ARROWS.get(seq)
            if tok:
                yield tok
        else:
            yield ch


def stdin_keys():
    """Raw non-echoing stdin key tokens (requires a tty)."""
    import termios
    import tty

    assert sys.stdin.isatty(), "stdin teleop needs a tty; inject keys instead"
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)

    def chars():
        try:
            tty.setcbreak(fd)
            while True:
                yield sys.stdin.read(1)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)

    return decode_keys(chars())


class Teleop:
    """Latched-control keyboard teleop over any DroneAPI-shaped object
    (SimulatedAPI, FifoDroneAPI): next/takeoff/land/set_control and the
    telemetry getters."""

    def __init__(self, api):
        self.api = api
        self.pitch = self.roll = self.gaz = self.dyaw = 0.0
        self.flying = False

    def handle(self, key: str) -> bool:
        """Apply one key token; returns False on quit."""
        if key == "q":
            return False
        elif key == "w":
            self.pitch = 1.0
        elif key == "s":
            self.pitch = -1.0
        elif key == "a":
            self.roll = -1.0
        elif key == "d":
            self.roll = 1.0
        elif key == "UP":
            self.gaz = 1.0
        elif key == "DOWN":
            self.gaz = -1.0
        elif key == "LEFT":
            self.dyaw = -0.25
        elif key == "RIGHT":
            self.dyaw = 0.25
        elif key == " ":
            if self.flying:
                self.api.land()
            else:
                self.api.takeoff()
            self.flying = not self.flying
        elif key == "h":
            self.pitch = self.roll = self.gaz = self.dyaw = 0.0
        self.api.set_control(self.pitch, self.gaz, self.roll, self.dyaw)
        return True

    def status(self) -> str:
        """The reference's idle-loop printout (controls + api state)."""
        pos = self.api.position()
        return (f"pitch {self.pitch:+.2f} roll {self.roll:+.2f} "
                f"gaz {self.gaz:+.2f} dyaw {self.dyaw:+.2f} | "
                f"{'FLYING' if self.flying else 'LANDED'} | "
                f"pos ({pos[0]:+.2f}, {pos[1]:+.2f}, {pos[2]:+.2f})")

    def run(self, keys: Iterable[str], max_steps: Optional[int] = None,
            render: Optional[Callable[[str], None]] = None) -> int:
        """Pump the api (``next()``) once per key token, like the
        reference's idle loop interleaving with GLUT events. Returns the
        number of steps executed."""
        steps = 0
        for key in keys:
            if not self.handle(key):
                break
            self.api.next()
            steps += 1
            if render is not None:
                render(self.status())
            if max_steps is not None and steps >= max_steps:
                break
        return steps


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="keyboard teleop (wasd + arrows + space; h=hover q=quit)")
    ap.add_argument("--fifo", nargs=2, metavar=("CONTROL", "NAVDATA"),
                    help="drive a real SDK peer over the FIFO protocol")
    ap.add_argument("--steps", type=int, default=0,
                    help="stop after N steps (0 = until q)")
    args = ap.parse_args(argv)

    if args.fifo:
        from .drone_api import FifoDroneAPI
        api = FifoDroneAPI(args.fifo[0], args.fifo[1])
    else:
        from .runtime import SimulatedAPI
        api = SimulatedAPI()

    t = Teleop(api)
    print(__doc__.split("Key map")[1])
    steps = t.run(stdin_keys(), max_steps=args.steps or None, render=print)
    print(f"teleop: {steps} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
