"""Model serialization — the version-9 checkpoint format, rebuilt.

The reference saves {version=9, model_descr, weights dict, geometry, learning,
score} into a directory whose name encodes every hyperparameter
(saveModel, /root/reference/opticalflow_model_io.lua:98-164), and the loader
rebuilds the graph from the stored constructor and copies named weights
(loadModel :166-207, loadWeightsFrom :209-220; versions < 9 rejected :170-171).

Here: geometry/learning dataclasses serialize to JSON (the "constructor" is
the Geometry itself — models are pure functions of it), params serialize via
flax.serialization msgpack, and the directory name encodes the key
hyperparameters for the same greppable-filesystem workflow. Loading rejects
other format versions; ``load_weights_into`` supports the reference's
finetune path (-lw flag, /root/reference/opticalflow.lua:231-233).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import flax.serialization
import numpy as np

from ..geometry import Geometry, Learning

FORMAT_VERSION = 9  # kept aligned with the reference's current version


def model_dir_name(geom: Geometry, learning: Learning) -> str:
    """Hyperparameter-encoded directory name (describeModel/saveModel path
    encoding, /root/reference/opticalflow_model_io.lua:50-147)."""
    layers = "-".join("_".join(map(str, l)) for l in geom.layers)
    parts = [
        f"model={layers}",
        f"win={geom.maxh}x{geom.maxw}",
        f"img={geom.hImg}x{geom.wImg}",
        f"ms={'-'.join(map(str, geom.ratios)) if geom.multiscale else 'no'}"
        + ("" if not geom.multiscale or geom.share_filters else ",sf=0"),
        f"head={geom.output_extraction_method}",
        f"crit={learning.criterion}",
        f"lr={learning.rate}",
        f"lrd={learning.rate_decay}",
        f"wd={learning.weight_decay}",
    ]
    return ",".join(parts)


def save_model(
    path: str, geom: Geometry, learning: Learning, params: Any,
    score_history: Optional[list] = None, epoch: int = 0,
) -> str:
    """Writes <path>/{meta.json, params.msgpack}. Returns the directory."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "version": FORMAT_VERSION,
        "geometry": dataclasses.asdict(geom),
        "learning": dataclasses.asdict(learning),
        "score": score_history or [],
        "epoch": epoch,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    return path


def load_model(path: str) -> Tuple[Geometry, Learning, Any, dict]:
    """Rebuild (geometry, learning, params, meta) from disk. Rejects other
    format versions like the reference loader."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint version {meta.get('version')} unsupported "
            f"(need {FORMAT_VERSION})"
        )
    gd = meta["geometry"]
    gd["layers"] = tuple(tuple(l) for l in gd["layers"])
    gd["ratios"] = tuple(gd["ratios"])
    geom = Geometry(**gd)
    learning = Learning(**meta["learning"])
    # template params to restore into
    from .flow import FlowModel
    import jax
    if geom.multiscale:
        from .multiscale import MultiscaleFlowModel
        model = MultiscaleFlowModel(geom)
    else:
        model = FlowModel(geom)
    template = model.init(jax.random.PRNGKey(0))
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        payload = f.read()
    # Migration: before the unshared-filters branch existed, the CLI
    # recorded share_filters=False (its default without -sf) while the
    # model always trained the SHARED tree — those checkpoints carry a
    # shared params payload under an unshared meta. Detect that
    # STRUCTURALLY (the unshared tree has a top-level 'scales' key; the
    # shared payload does not) rather than by catching restore errors,
    # so a genuinely-unshared checkpoint that fails restore for another
    # reason (truncation, version skew) surfaces its real exception.
    if geom.multiscale and not geom.share_filters:
        import msgpack
        keys = set(msgpack.unpackb(payload, raw=False).keys())
        if "scales" not in keys:
            # trained shared: restore with the shared template and return
            # the corrected geometry
            geom = dataclasses.replace(geom, share_filters=True)
            from .multiscale import MultiscaleFlowModel
            model = MultiscaleFlowModel(geom)
            template = model.init(jax.random.PRNGKey(0))
    params = flax.serialization.from_bytes(template, payload)
    return geom, learning, params, meta


def load_weights_into(path: str, template: Any) -> Any:
    """Finetune path: restore weights into an existing params template
    (loadWeightsFrom, /root/reference/opticalflow_model_io.lua:209-220)."""
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
