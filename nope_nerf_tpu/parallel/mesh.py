"""Device-mesh construction helpers.

No reference counterpart (the reference is single-process single-GPU, SURVEY.md §2.9);
this is the TPU-native scaling layer: a 1-axis ('data',) mesh shards the *ray batch*
across chips — the right decomposition for a per-ray NeRF whose parameter set
(~600k floats) is ICI-cheap to replicate and psum.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devices)
    else:
        raise NotImplementedError("only 1-axis meshes are used; rays are the one "
                                  "scalable axis for this workload")
    return Mesh(arr, axis_names)


def default_mesh(cfg: Optional[dict] = None) -> Mesh:
    n = None
    if cfg is not None and cfg.get("tpu", {}).get("mesh_shape"):
        n = int(np.prod(cfg["tpu"]["mesh_shape"]))
    return make_mesh(n)
