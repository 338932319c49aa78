"""Legacy depth subsystem tests: discretizer math, balanced sampling,
median-in-patch depth, and the two legacy networks' forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.data import depth_legacy as dl
from depth_estimation_tpu.models.legacy_depth import (
    DepthClassifierCNN, LegacyFlowModel)
import pytest


def test_discretizer_classes():
    d = dl.DepthDiscretizer(n_classes=10, cut_depth=50.0, bin_step=10)
    # step = 2*50/10 = 10: depth 5 -> class 1, 95 -> 10, 200 -> clamped 10
    assert d.get_class(5.0) == 1
    assert d.get_class(95.0) == 10
    assert d.get_class(200.0) == 10
    assert d.get_class(10.0) == 1    # ceil(10/10) = 1


def test_cut_depth_median_split():
    d = dl.DepthDiscretizer(n_classes=4)
    hist = [[1] * 10, [1] * 10, [1] * 10, [1] * 10] + [[] for _ in range(96)]
    d.compute_cut_depth(hist, 40)
    assert d.cut_depth == 3   # cumulative passes 20 at bin 3 (1-based)
    assert d.bin_step == 1


def synthetic_frames(n=3, h=60, w=70, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    images = []
    for _ in range(n):
        m = rng.randint(20, 200)
        frames.append({
            "x": rng.rand(m).astype(np.float32) * w,
            "y": rng.rand(m).astype(np.float32) * h,
            "depth": rng.rand(m).astype(np.float32) * 60,
        })
        images.append(rng.rand(h, w, 3).astype(np.float32))
    return frames, images


def test_generate_discrete_balanced():
    frames, images = synthetic_frames()
    rng = np.random.RandomState(1)
    patches, classes, disc = dl.generate_data_discrete(
        frames, images, 16, 16, n_classes=5, n_samples=100, rng=rng)
    assert patches.shape == (100, 16, 16, 3)
    assert classes.min() >= 1 and classes.max() <= 5
    # balancing: every class appears
    assert len(np.unique(classes)) >= 4


def test_generate_continuous():
    frames, images = synthetic_frames()
    rng = np.random.RandomState(2)
    patches, depths = dl.generate_continuous_dataset(
        frames, images, 16, 16, 50, rng)
    assert patches.shape[0] == 50
    assert (depths >= 0).all() and (depths <= 60).all()


@pytest.mark.slow
def test_depth_classifier_cnn_shapes():
    net = DepthClassifierCNN(n_classes=7, in_channels=2)
    x = jnp.zeros((46, 46, 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    # 46 -> conv5 42 -> pool 21 -> conv5 17 -> pool 8 -> conv5 4
    assert out.shape == (4, 4, 7)


def test_legacy_flow_model_recovers_shift():
    m = LegacyFlowModel(maxh=6, maxw=6, kernel=8, n_features=192)
    # identity conv weights: feature = raw patch
    kernel = np.zeros((8, 8, 1, 192), np.float32)
    for i in range(8):
        for j in range(8):
            kernel[i, j, 0, i * 8 + j] = 1.0
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.zeros(192)}}
    rng = np.random.RandomState(3)
    p2 = rng.rand(40, 44, 1).astype(np.float32)
    p1 = np.roll(p2, -2, axis=0)   # dy = 2
    costs = m.costs(params, jnp.asarray(p1), jnp.asarray(p2))
    idx = np.asarray(jnp.argmin(costs, axis=-1))
    # centered dy=2 -> window row 2 + ceil(6/2)-1 = 4, col 2 (dx=0)
    want = 4 * 6 + 2
    inner = idx[4:-4, 4:-4]
    assert (inner == want).mean() > 0.9, np.unique(inner)
