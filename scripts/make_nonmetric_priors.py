"""Write SIMULATED non-metric monocular depth priors for the demo scene:
per-frame affine corruptions of the GT depths, saved in the DPT-npz layout
(`<scene>/<depth_net>/depth_<frame>.npz['pred']`).

This is the regime the reference's `Learn_Distortion` exists for (monocular
DPT depth is only affine-consistent per frame, `model/distortions.py:4`,
`configs/default.yaml` scale/shift defaults): depth'_i = a_i*d_i + b_i with
random per-frame a_i, b_i. Training with `dataloading.with_depth: false`,
`dataloading.depth_net: dptsim`, `dataloading.norm_depth: true` then measures
whether per-frame scale/shift learning recovers metric depth — the
complementary half of the BASELINE.md distortion on/off experiment (which
showed that with already-metric priors the subsystem should stay OFF).

Run after scripts/make_demo_scene.py:  python scripts/make_nonmetric_priors.py
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scene", default="data/demo/drive")
    ap.add_argument("--out-name", default="dptsim")
    ap.add_argument("--depth-scale", type=float, default=0.01,
                    help="png-unit -> metres (V-KITTI cm convention)")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    out_dir = os.path.join(args.scene, args.out_name)
    os.makedirs(out_dir, exist_ok=True)
    pngs = sorted(glob.glob(os.path.join(args.scene, "depth", "*.png")))
    assert pngs, f"no depth pngs under {args.scene}/depth"
    for p in pngs:
        frame = os.path.splitext(os.path.basename(p))[0]
        d = imageio.imread(p).astype(np.float32) * args.depth_scale  # metres
        a = float(rng.uniform(0.6, 1.6))
        b = float(rng.uniform(-1.0, 1.0))
        pred = a * d + b
        np.savez(os.path.join(out_dir, f"depth_{frame}.npz"),
                 pred=pred.astype(np.float32))
        print(f"{frame}: a={a:.3f} b={b:+.3f} range "
              f"[{pred.min():.2f}, {pred.max():.2f}] m")
    print(f"wrote {len(pngs)} simulated non-metric priors to {out_dir}")


if __name__ == "__main__":
    main()
