#!/usr/bin/env python
"""Same-hardware throughput race: the ACTUAL reference Trainer vs this framework.

The reference publishes no performance numbers (BASELINE.md), and this image has
no CUDA GPU — but the reference implementation itself runs fine on CPU torch
(the oracle suite drives it, tests/test_reference_trainer.py). This script runs
BOTH implementations on the same CPU, same workload, and records steps/s:

  * reference: the real `Trainer.train_step` (/root/reference/model/training.py:70-100)
    — fwd render in 64000-point chunks, full loss stack, loss.backward(), four
    torch.optim.Adam steps — float32, all cores.
  * ours: the production CPU path (jitted scan-fused `Trainer.run_steps`, unfused
    XLA renderer — the Pallas kernel is TPU-only), float32 to match, all cores.

Workload (BASELINE.md): 1024 rays/step x 128 samples/ray x 256-wide 9-layer MLP,
4-frame 188x621 (V-KITTI resolution) scene, pre-annealing default weights
(rgb 1.0 + depth 0.04 + Chamfer pc 1.0 + photometric rgb_s 1.0), learned poses
(init_pose) + distortions, pc_ratio 4. Both sides consume the SAME fabricated
scene arrays. The two device-plumbing patches applied to the reference
(arange_pixels dtype, transform_to_world CPU defaults) are the ones the oracle
suite needs to run it on CPU at all — no semantic change, no speedup.

Usage:  python scripts/race_reference.py [--ref-steps N] [--our-steps N] [--quick]
Output: a small table + one JSON line; the result is recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

N_CAMS, H, W = 4, 188, 621
N_POINTS, N_SAMPLES, HIDDEN = 1024, 128, 256
DEPTH_RANGE = [0.01, 10.0]
LRS = {"nerf": 1e-3, "pose": 5e-4, "distortion": 5e-4}

# the reference's own defaults (configs/default.yaml:101-137), pre-annealing
REF_TRAINER_CFG = {
    "n_training_points": N_POINTS, "type": "nope_nerf", "vis_geo": False,
    "detach_gt_depth": False, "pc_ratio": 4, "match_method": "dense",
    "shift_first": False, "detach_ref_img": True, "scale_pcs": True,
    "detach_rgbs_scale": False, "vis_reprojection_every": 10 ** 9,
    "nearest_limit": 0.01, "annealing_epochs": 2000,
    "rgb_weight": [1.0, 1.0], "depth_weight": [0.04, 0.0],
    "pc_weight": [1.0, 0.0], "rgb_s_weight": [1.0, 0.0],
    "depth_consistency_weight": [0.0, 0.0],
    "weight_dist_2nd_loss": [0.0, 0.0], "weight_dist_1st_loss": [0.0, 0.0],
    "t_cycle_weight": [0.0, 0.0],
    "depth_loss_type": "l1", "rgb_loss_type": "l1",
    "with_auto_mask": False, "with_ssim": False,
}
EPOCH, SCHED_START = 0, 10000   # pre-annealing: start weights, l1 rgb


def make_scene():
    from nope_nerf_tpu.data import make_synthetic_scene
    return dict(make_synthetic_scene(n_frames=N_CAMS, h=H, w=W, seed=3))


# ---------------------------------------------------------------------------
# Reference side (torch CPU, float32)
# ---------------------------------------------------------------------------

def _stub_module(name, attrs=()):
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, object)
    parts = name.split(".")
    for i in range(1, len(parts)):
        parent = ".".join(parts[:i])
        if parent not in sys.modules:
            sys.modules[parent] = types.ModuleType(parent)
    sys.modules[name] = mod


def run_reference(scene, n_warm, n_timed):
    import torch
    if REF not in sys.path:
        sys.path.append(REF)
    _stub_module("torchvision.transforms", ["Compose"])
    _stub_module("timm")
    _stub_module("open3d")
    torch.Tensor.cuda = lambda self, *a, **kw: self

    from model import common as ref_common
    from model import distortions as ref_distortions
    from model import network as ref_network
    from model import official_nerf as ref_nerf
    from model import poses as ref_poses
    from model import rendering as ref_rendering
    from model import training as ref_training

    # CPU device plumbing (identical to tests/test_reference_trainer.py): the
    # reference's transform_to_world *defaults* construct CUDA tensors, which
    # the trainer's point-cloud lift hits — identity is identity in any device.
    orig_ttw = ref_common.transform_to_world

    def ttw_cpu(pixels, depth, camera_mat, world_mat=None, scale_mat=None,
                invert=True, device=None):
        eye = torch.eye(4, dtype=camera_mat.dtype)[None]
        if world_mat is None:
            world_mat = eye
        if scale_mat is None:
            scale_mat = eye
        return orig_ttw(pixels, depth, camera_mat, world_mat, scale_mat,
                        invert=invert, device=device)

    ref_training.transform_to_world = ttw_cpu

    torch.manual_seed(11)
    mlp = ref_nerf.OfficialStaticNerf(
        {"model": {"hidden_dim": HIDDEN, "pos_enc_levels": 10,
                   "dir_enc_levels": 4, "occ_activation": "softplus"},
         "rendering": {"white_background": False, "dist_alpha": False}})
    renderer = ref_rendering.Renderer(
        mlp, {"depth_range": DEPTH_RANGE, "n_max_network_queries": 64000,
              "white_background": False, "num_points": N_SAMPLES,
              "dist_alpha": False, "sample_option": "uniform",
              "use_ray_dir": True, "normalise_ray": True, "normal_loss": False,
              "outside_steps": 0}, device=None)
    wrapper = ref_network.nope_nerf({}, renderer, None, None)
    pose_net = ref_poses.LearnPose(
        N_CAMS, True, True, None, init_c2w=torch.tensor(scene["c2ws_gt"],
                                                        dtype=torch.float32))
    dist_net = ref_distortions.Learn_Distortion(
        N_CAMS, True, True, {"distortion": {"fix_scaleN": True}})

    opt = torch.optim.Adam(wrapper.parameters(), lr=LRS["nerf"])
    opt_pose = torch.optim.Adam(pose_net.parameters(), lr=LRS["pose"])
    opt_dist = torch.optim.Adam(dist_net.parameters(), lr=LRS["distortion"])
    trainer = ref_training.Trainer(
        wrapper, opt, REF_TRAINER_CFG, device=None, optimizer_pose=opt_pose,
        pose_param_net=pose_net, optimizer_distortion=opt_dist,
        distortion_net=dist_net)

    def data_for(i, r):
        t = lambda a: torch.tensor(np.asarray(a, np.float32))
        return {
            "img": t(scene["imgs"][i].transpose(2, 0, 1))[None],
            "img.idx": torch.tensor([i]),
            "img.dpt": t(scene["depths"][i])[None],
            "img.depth_mask": torch.ones(1, H, W, dtype=torch.bool),
            "img.camera_mat": t(scene["K"])[None],
            "img.scale_mat": torch.eye(4)[None],
            "img.pose_gt": t(scene["c2ws_gt"][i])[None],
            "img.ref_imgs": t(scene["imgs"][r].transpose(2, 0, 1))[None],
            "img.ref_dpts": t(scene["depths"][r])[None],
            "img.ref_idxs": torch.tensor([r]),
            "img.ref_pose_gt": t(scene["c2ws_gt"][r])[None],
        }

    pairs = [(i, i + 1 if i < N_CAMS - 1 else i - 1) for i in range(N_CAMS)]
    batches = [data_for(i, r) for i, r in pairs]

    it = 3
    for k in range(n_warm):
        trainer.train_step(batches[k % len(batches)], it=it, epoch=EPOCH,
                           scheduling_start=SCHED_START, render_path=None)
        it += 1
    t0 = time.perf_counter()
    last = None
    for k in range(n_timed):
        last = trainer.train_step(batches[k % len(batches)], it=it, epoch=EPOCH,
                                  scheduling_start=SCHED_START, render_path=None)
        it += 1
    dt = time.perf_counter() - t0
    return dt / n_timed, float(last["loss"].detach())


# ---------------------------------------------------------------------------
# Our side (JAX CPU, float32, unfused XLA path, scan-fused production loop)
# ---------------------------------------------------------------------------

def run_ours(scene, n_warm_chunks, n_timed_steps, chunk):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, epoch_order
    from nope_nerf_tpu.training import (ModelConfigs, Trainer,
                                        create_train_state)

    cfg = load_config(overrides={
        "training": {"n_training_points": N_POINTS},
        "pose": {"learn_pose": True, "init_pose": True},
        # CPU: no Pallas backend; f32 matmuls to match the reference exactly
        "tpu": {"use_pallas_renderer": False, "compute_dtype": "float32"},
    })
    sd = SceneData.from_dict(scene)
    mc = ModelConfigs.from_cfg(cfg, num_cams=sd.n_frames)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(sd.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers, mesh=None)
    order, refs = epoch_order(sd.n_frames, shuffle=True, seed=0)
    order = np.resize(order, chunk)
    refs = np.resize(refs, chunk)

    def run_chunks(state, n):
        lds = None
        for _ in range(n):
            state, lds = trainer.run_steps(state, sd, order, refs, epoch=EPOCH,
                                           scheduling_start=SCHED_START)
        return state, float(lds["loss"][-1])

    state, _ = run_chunks(state, n_warm_chunks)  # absorbs compile
    assert n_timed_steps % chunk == 0
    t0 = time.perf_counter()
    state, last = run_chunks(state, n_timed_steps // chunk)
    dt = time.perf_counter() - t0
    return dt / n_timed_steps, last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-steps", type=int, default=10)
    ap.add_argument("--our-steps", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--quick", action="store_true",
                    help="3 ref steps / 1 chunk of ours (smoke test)")
    args = ap.parse_args()
    if args.quick:
        args.ref_steps, args.our_steps, args.chunk = 2, 5, 5

    scene = make_scene()
    print(f"# workload: {N_POINTS} rays x {N_SAMPLES} samples x {HIDDEN}-wide, "
          f"{N_CAMS} frames {H}x{W}, full loss stack, f32, "
          f"{os.cpu_count()} CPUs", flush=True)

    ours_dt, ours_loss = run_ours(scene, 1, args.our_steps, args.chunk)
    print(f"# ours: {ours_dt*1e3:.1f} ms/step ({1/ours_dt:.2f} steps/s) over "
          f"{args.our_steps} steps, loss={ours_loss:.4f}", flush=True)

    ref_dt, ref_loss = run_reference(scene, 2, args.ref_steps)
    print(f"# reference: {ref_dt*1e3:.1f} ms/step ({1/ref_dt:.2f} steps/s) over "
          f"{args.ref_steps} steps, loss={ref_loss:.4f}", flush=True)

    print(json.dumps({
        "metric": "same-CPU train-step race (steps/s)",
        "reference_steps_per_s": round(1 / ref_dt, 3),
        "ours_steps_per_s": round(1 / ours_dt, 3),
        "speedup": round(ref_dt / ours_dt, 2),
        "workload": f"{N_POINTS}x{N_SAMPLES}x{HIDDEN} full loss stack, "
                    f"{H}x{W} frames, f32, cpu_count={os.cpu_count()}",
    }))


if __name__ == "__main__":
    main()
