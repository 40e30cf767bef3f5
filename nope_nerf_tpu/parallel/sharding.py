"""Multi-chip training entry points.

No reference counterpart (SURVEY.md §2.9: the reference is strictly single-device).
The scaling design, per the BASELINE.json north star:

- **rays are the sharded axis** — the per-step ray batch splits across the mesh's
  'data' axis via shard_map inside `compute_step_loss` (training/trainer.py);
- **parameters are replicated** — the whole learnable set (NeRF MLP ~600k floats +
  per-frame pose/distortion/focal scalars) is ICI-cheap; gradient all-reduce happens
  through the psums in the sharded loss (shard_map transposes them to the backward
  pass automatically, riding ICI);
- tensor/pipeline/expert parallelism deliberately do NOT apply: a 256-wide MLP is
  ~1000x below the size where intra-layer sharding pays for its collectives.

Why shard_map and not bare GSPMD annotations: the per-ray computation is entirely
independent until the final scalar reductions, so explicit per-device code with
psum at the end gives XLA the exact collective placement with zero resharding risk.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..training.state import ModelConfigs, TrainState
from ..training.trainer import compute_step_loss, train_step
from .mesh import make_mesh


def sharded_compute_step_loss(mesh, *args, **kwargs):
    """compute_step_loss with the render fanned out over mesh axis 'data'."""
    return compute_step_loss(*args, **kwargs, mesh=mesh)


def make_sharded_train_step(mesh, mc: ModelConfigs, optimizers,
                            rgb_loss_type: str = "l1"):
    """Returns step(state, batch, weights, lrs) jitted over `mesh`."""
    def step(state: TrainState, batch, weights, lrs):
        return train_step(state, batch, weights, lrs, mc, rgb_loss_type,
                          optimizers, mesh)
    return step
