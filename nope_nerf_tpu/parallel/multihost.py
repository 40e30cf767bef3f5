"""Multi-host coordination helpers.

No reference counterpart (the reference is single-process; SURVEY.md §2.9). The
TPU-native multi-host recipe for this workload:

- params replicate everywhere; each host feeds the same per-step frame (the frame
  schedule is derived from the seed + epoch, so hosts agree without communication);
- the global ray batch shards over the full ('data',) mesh spanning hosts — each
  host supplies its slice via its addressable devices;
- eval/novel-view rendering splits IMAGE TILES across hosts (each host renders
  rows [lo, hi) of the pixel grid) — embarrassingly parallel, host 0 assembles;
- checkpoint/log IO is process-0-gated (training/checkpoints.py already is).

These helpers are pure functions of (process_index, process_count), testable on a
single host by passing explicit indices.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


def globalize_replicated(tree, mesh):
    """Host-local pytree -> global jax.Arrays replicated over `mesh`.

    In a multi-process run, arrays a host builds locally (jnp.asarray) are
    addressable on its own devices only; a jitted function over the global mesh
    needs global Arrays. This framework replicates every train-step input
    (params, the per-step frame batch — all hosts compute identical values from
    the shared seed) and shards rays INSIDE the step via shard_map, so the
    conversion is uniform: every leaf becomes a fully-replicated global array.
    One-liner on a single host (mesh local) — a no-op semantically.
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def host_frame_schedule(n_frames: int, epoch: int, seed: int,
                        shuffle: bool = True) -> np.ndarray:
    """Deterministic per-epoch frame order, identical on every host (no broadcast
    needed): all hosts derive it from (seed, epoch)."""
    rng = np.random.RandomState(seed * 100003 + epoch)
    return rng.permutation(n_frames) if shuffle else np.arange(n_frames)


def host_ray_slice(n_rays: int, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> Tuple[int, int]:
    """[lo, hi) slice of the global ray batch owned by this host."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert n_rays % pc == 0, "global ray batch must divide across hosts"
    per = n_rays // pc
    return pi * per, (pi + 1) * per


def host_image_tiles(h: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> Tuple[int, int]:
    """Row range [lo, hi) of an image this host renders during eval — disjoint
    tiles across hosts, assembled by host 0."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (h + pc - 1) // pc
    return min(pi * per, h), min((pi + 1) * per, h)
