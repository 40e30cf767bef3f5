"""Synthetic scene generation for tests and benchmarks (no reference counterpart —
the reference always loads V-KITTI/LLFF scenes from disk; this provides a disk-free
stand-in with the exact same batch schema).

The scene is multi-view *consistent*: a textured world plane at z = z0, imaged by a
forward-moving camera. Depths are exact ray-plane intersections and colors are a
function of the world hit point, so the inter-frame point-cloud (Chamfer) and
photometric-warp losses have a true zero at the GT poses — required for convergence
and parity tests.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..geometry.camera import intrinsics_ndc


def _texture(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth RGB texture over world-plane coordinates."""
    return np.stack([
        0.5 + 0.35 * np.sin(1.3 * x) * np.cos(0.9 * y),
        0.5 + 0.35 * np.cos(1.1 * x + 0.5),
        0.5 + 0.35 * np.sin(0.7 * y - 0.3),
    ], -1).astype(np.float32)


def make_synthetic_scene(n_frames: int = 4, h: int = 48, w: int = 64,
                         seed: int = 0, plane_z: float = -6.0,
                         motion: float = 0.15) -> Dict[str, np.ndarray]:
    """Returns imgs (N,H,W,3), depths (N,H,W) — *exact* depth priors in the
    framework's convention (pixel*d through K^-1), depth_masks, c2ws_gt (N,4,4),
    K (4,4)."""
    rng = np.random.RandomState(seed)
    fx = fy = 0.7 * w
    K = np.asarray(intrinsics_ndc(fx, fy, w, h), np.float32)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = 2.0 * xs / (w - 1) - 1.0
    py = 2.0 * ys / (h - 1) - 1.0
    # camera-space ray directions at depth 1 (through K^-1; camera looks along -z)
    dir_cam = np.stack([px * w / (2 * fx), -py * h / (2 * fy), -np.ones_like(px)], -1)

    imgs, depths, c2ws = [], [], []
    for i in range(n_frames):
        ang = 0.02 * i + 0.005 * rng.randn()
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        pos = np.array([motion * i, 0.05 * np.sin(i), motion * 2 * i], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos

        dir_world = dir_cam @ R.T  # (H, W, 3)
        # ray-plane intersection: pos_z + d * dir_z = plane_z
        d = (plane_z - pos[2]) / dir_world[..., 2]
        hit = pos[None, None, :] + d[..., None] * dir_world
        imgs.append(_texture(hit[..., 0], hit[..., 1]))
        depths.append(d.astype(np.float32))
        c2ws.append(c2w)

    return {
        "imgs": np.stack(imgs),
        "depths": np.stack(depths),
        "depth_masks": np.ones((n_frames, h, w), bool),
        "c2ws_gt": np.stack(c2ws),
        "K": K,
    }
