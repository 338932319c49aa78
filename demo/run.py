#!/usr/bin/env python
"""Demo driver — the /root/reference/demo/run.py equivalent: runs the full
offline video pipeline (flow + depth panels -> mp4) on an image directory.

Usage: python demo/run.py <model_dir> <dataset_dir> [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    from depth_estimation_tpu.cli import tools
    out = sys.argv[3] if len(sys.argv) > 3 else "demo_out"
    return tools.main(["video", sys.argv[1], sys.argv[2],
                       "--output-dir", out])


if __name__ == "__main__":
    sys.exit(main())
