"""depth_estimation_tpu — a TPU-native (JAX/XLA/Pallas) optical-flow + depth
framework with the capabilities of MichaelMathieu/depth-estimation.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  geometry / codecs      static config + displacement index codecs
  ops/                   hot compute ops (Pallas correlation matcher, resampling,
                         confidence extraction, post-filters)
  models/                flow matcher model families (single-scale, multiscale
                         pyramid, radial/polar 1-D)
  data/                  groundtruth generators + patch samplers + image sources
  flow/                  variational (Ce Liu style) coarse-to-fine flow in JAX
  geometry3d/            calibration, undistortion, ego-motion, polar warps
  training/              SGD training loops, criteria, scoring
  parallel/              device-mesh sharding (batch data-parallel over ICI)
  robotics/              drone API, simulator, occupancy depth maps, control
  utils/                 timers, visualization
"""

__version__ = "0.1.0"

# Shared persistent XLA compilation cache (utils/compcache.py): first
# compiles on the tunneled TPU run 20-120 s and the big interpret-mode CPU
# programs run minutes — cached executables make every later process start
# warm. Opt out with DE_TPU_COMPILE_CACHE=off.
from .utils.compcache import enable_persistent_cache as _enable_cache

_enable_cache()
del _enable_cache

from .geometry import Geometry, Learning  # noqa: F401
