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

from .geometry import Geometry, Learning  # noqa: F401
