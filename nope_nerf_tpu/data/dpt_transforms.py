"""DPT input transforms: keep-aspect lower-bound resize to 384 px, multiple-of-32
snap, [-1,1] normalization.

Capability parity with `DPT/dpt/transforms.py:48-230` (Resize with
resize_method='lower_bound' + keep_aspect_ratio, NormalizeImage mean/std 0.5,
PrepareForNet) as configured by the dataloader (`dataloading/dataloading.py:84-104`
ResizeImage_mvs).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

DPT_MEAN = 0.5
DPT_STD = 0.5


def _constrain_to_multiple_of(x: float, multiple_of: int = 32,
                              min_val: float = 0, max_val: float = None) -> int:
    y = (np.round(x / multiple_of) * multiple_of).astype(int)
    if max_val is not None and y > max_val:
        y = (np.floor(x / multiple_of) * multiple_of).astype(int)
    if y < min_val:
        y = (np.ceil(x / multiple_of) * multiple_of).astype(int)
    return int(y)


def dpt_target_size(h: int, w: int, target: int = 384) -> Tuple[int, int]:
    """lower_bound keep-aspect target (transforms.py:108-152): scale so the SMALLER
    side reaches `target`, then snap both to multiples of 32 (never below target)."""
    scale_h = target / h
    scale_w = target / w
    if scale_w > scale_h:
        scale_h = scale_w
    else:
        scale_w = scale_h
    new_h = _constrain_to_multiple_of(scale_h * h, min_val=target)
    new_w = _constrain_to_multiple_of(scale_w * w, min_val=target)
    return new_h, new_w


def prepare_dpt_input(img: np.ndarray, target: int = 384) -> np.ndarray:
    """(H, W, 3) float [0,1] -> (h384, w, 3) normalized float32 ready for dpt_apply."""
    import cv2
    h, w = img.shape[:2]
    nh, nw = dpt_target_size(h, w, target)
    resized = cv2.resize(img.astype(np.float32), (nw, nh),
                         interpolation=cv2.INTER_CUBIC)
    return ((resized - DPT_MEAN) / DPT_STD).astype(np.float32)
