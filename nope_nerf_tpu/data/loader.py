"""Scene container + per-frame batch assembly.

Capability parity with the reference's torch Dataset/DataLoader layer
(`dataloading/dataloading.py:13-163`): one *image* per step, with a random forward
reference frame attached. There are no worker processes — frames live as device-
resident arrays (a scene is tens of MB), and batch assembly is pure indexing, so the
input pipeline contributes zero host latency. Randomness for the reference-frame pick
comes from numpy (host), matching the reference's `random.randint`
(`dataset.py:295-301`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SceneData:
    """All frames of one scene, ready for the jitted step."""
    imgs: np.ndarray          # (N, H, W, 3) float32
    depths: np.ndarray        # (N, H, W) float32 — depth priors (DPT or degraded GT)
    depth_masks: np.ndarray   # (N, H, W) bool
    c2ws_gt: np.ndarray       # (N, 4, 4) float32 — GT poses (LLFF-preprocessed)
    K: np.ndarray             # (4, 4) float32 — normalized camera matrix
    c2ws_init: Optional[np.ndarray] = None  # optional init poses (e.g. colmap)
    gt_depths: Optional[np.ndarray] = None  # clean GT depths for eval
    reverse: Optional[dict] = None          # metric-revert bookkeeping
    i_train: Optional[np.ndarray] = None
    i_test: Optional[np.ndarray] = None

    @property
    def n_frames(self) -> int:
        return self.imgs.shape[0]

    def to_device(self) -> "SceneData":
        """Upload the per-frame arrays once; batch_for_frame then slices device
        arrays (an on-device gather) instead of re-uploading ~1MB per step —
        significant when the accelerator sits behind a remote transport."""
        import jax.numpy as jnp
        return dataclasses.replace(
            self,
            imgs=jnp.asarray(self.imgs),
            depths=jnp.asarray(self.depths),
            depth_masks=jnp.asarray(self.depth_masks),
            c2ws_gt=jnp.asarray(self.c2ws_gt),
            K=jnp.asarray(self.K))

    @classmethod
    def from_dict(cls, d: dict) -> "SceneData":
        return cls(imgs=d["imgs"], depths=d["depths"], depth_masks=d["depth_masks"],
                   c2ws_gt=d["c2ws_gt"], K=d["K"], c2ws_init=d.get("c2ws_init"),
                   gt_depths=d.get("gt_depths"), reverse=d.get("reverse"),
                   i_train=d.get("i_train"), i_test=d.get("i_test"))


def pick_ref_idx(idx: int, n_frames: int, random_ref: int,
                 rng: np.random.RandomState) -> int:
    """Reference-frame choice (`DataField.load_ref_img`, dataset.py:295-301):
    a random frame up to `random_ref` steps forward; the last frame looks backward."""
    if idx == n_frames - 1:
        return idx - 1
    return idx + rng.randint(1, min(random_ref, n_frames - idx - 1) + 1)


def batch_for_frame(scene: SceneData, idx: int, ref_idx: Optional[int] = None,
                    rng: Optional[np.random.RandomState] = None,
                    random_ref: int = 1) -> Dict[str, np.ndarray]:
    """Assemble the per-step batch dict consumed by train_step."""
    if ref_idx is None:
        rng = rng or np.random.RandomState()
        ref_idx = pick_ref_idx(idx, scene.n_frames, random_ref, rng)
    return {
        "img": scene.imgs[idx],
        "depth": scene.depths[idx],
        "depth_mask": scene.depth_masks[idx],
        "camera_mat": scene.K,
        "pose_gt": scene.c2ws_gt[idx],
        "idx": np.int32(idx),
        "ref_img": scene.imgs[ref_idx],
        "ref_depth": scene.depths[ref_idx],
        "ref_pose_gt": scene.c2ws_gt[ref_idx],
        "ref_idx": np.int32(ref_idx),
    }


def frame_iterator(scene: SceneData, shuffle: bool = True, random_ref: int = 1,
                   seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of per-frame batches (reference DataLoader with batch_size=1)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(scene.n_frames) if shuffle else np.arange(scene.n_frames)
    for idx in order:
        yield batch_for_frame(scene, int(idx), rng=rng, random_ref=random_ref)


def epoch_order(n_frames: int, shuffle: bool = True, random_ref: int = 1,
                seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """The (frame, ref-frame) index sequence of one epoch, as arrays — the same
    RNG draws as frame_iterator (permutation first, then one ref pick per frame),
    precomputed so the scan-fused train path (trainer.train_steps) can consume
    a whole chunk of steps in one device dispatch."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n_frames) if shuffle else np.arange(n_frames)
    refs = np.array([pick_ref_idx(int(i), n_frames, random_ref, rng)
                     for i in order], np.int32)
    return order.astype(np.int32), refs
