"""Full train-step oracle vs the ACTUAL reference Trainer (model/training.py:16-416).

test_reference_oracle.py verifies every layer BELOW the trainer against the real
reference source; this file closes the last gap (VERDICT.md round-2 item 1): the
trainer's orchestration itself — annealed weights, l1->l2 switch, distortion
application order (shift-first vs scale-first, training.py:259-264), focal-net
camera construction (:266-273), inter-frame pair selection and the frame-order
swap branch (:323-352), pc_ratio downsampling (:354-366), point-cloud lift +
relative-pose warp + projection (:361-382), per-pair pc scaling (:394-396), and
the four per-group Adam updates (:70-100).

Method: instantiate the real `Trainer` on CPU torch in float64, mirror every
parameter into our pytree, pin the two RNG draws the step makes
(torch.randperm ray sampling; stratified z noise — forced off on both sides),
run `Trainer.train_step` and our `compute_step_loss` + optax Adam on the same
fabricated batch, and assert: all 10 loss-dict scalars, the gradients into every
learnable group, and the post-step parameter deltas agree.

Covered (it, epoch) points — per VERDICT.md:
  * annealing ACTIVE (scheduling_start < epoch < start+annealing_epochs), forward
    pair order (img_idx < num_cams-1), scale-first distortion;
  * post-annealing (l2 RGB loss), SWAP branch (img_idx = num_cams-1),
    shift-first distortion, detach_rgbs_scale, dist_alpha renderer;
  * pre-annealing (start weights), pc_ratio=4 downsampling, learned FOCAL
    camera, detach_gt_depth.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import types
from typing import Optional

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_oracle import _PARAM_MAP, _stub_module

REF = "/root/reference"

pytestmark = pytest.mark.oracle


# ---------------------------------------------------------------------------
# Reference import harness (training.py needs PIL/imageio, both present)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if REF not in sys.path:
        sys.path.append(REF)
    _stub_module("torchvision.transforms", ["Compose"])
    _stub_module("timm")
    _stub_module("open3d")
    torch.Tensor.cuda = lambda self, *a, **kw: self  # CPU-only image

    from model import training as ref_training
    from model import network as ref_network
    from model import rendering as ref_rendering
    from model import official_nerf as ref_nerf
    from model import poses as ref_poses
    from model import distortions as ref_distortions
    from model import intrinsics as ref_intrinsics
    from model import common as ref_common

    # Two dtype/device plumbing patches, NOT semantic changes — without them
    # the reference trainer cannot run its pc path on CPU torch at all:
    # * arange_pixels hard-codes .float() (common.py:33), which would poison an
    #   f64 graph with f32-rounded pixel coords. Same formula, default dtype.
    # * transform_to_world's *defaults* build identity world/scale mats as f32
    #   CUDA tensors (common.py:126-128) — the trainer's point-cloud lift
    #   (training.py:361-362) hits those defaults; identity is exact in any
    #   dtype, device must be CPU here.
    def arange_pixels_dd(resolution=(128, 128), batch_size=1,
                         image_range=(-1.0, 1.0), device=None):
        h, w = resolution
        grid = torch.meshgrid(torch.arange(0, h), torch.arange(0, w))
        locs = torch.stack([grid[1], grid[0]], dim=-1).long().view(
            1, -1, 2).repeat(batch_size, 1, 1)
        ps = locs.clone().to(torch.get_default_dtype())
        scale = image_range[1] - image_range[0]
        loc = scale / 2
        ps[:, :, 0] = scale * ps[:, :, 0] / (w - 1) - loc
        ps[:, :, 1] = scale * ps[:, :, 1] / (h - 1) - loc
        return locs, ps

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

    ref_training.arange_pixels = arange_pixels_dd
    ref_training.transform_to_world = ttw_cpu

    return types.SimpleNamespace(
        training=ref_training, network=ref_network, rendering=ref_rendering,
        nerf=ref_nerf, poses=ref_poses, distortions=ref_distortions,
        intrinsics=ref_intrinsics,
        render_dir=str(tmp_path_factory.mktemp("ref_render")))


@pytest.fixture()
def f64():
    """float64 on BOTH sides — param-gradient comparisons through a volume
    renderer are only tight without f32 relu-kink flips (see
    test_reference_oracle.test_renderer_gradients_matches_reference)."""
    prev_torch = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    jax.config.update("jax_enable_x64", True)
    yield
    torch.set_default_dtype(prev_torch)
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Scenario matrix
# ---------------------------------------------------------------------------

N_CAMS, H, W = 4, 12, 16
N_POINTS = 48        # rays per step
N_SAMPLES = 16       # z samples per ray
HIDDEN = 32
DEPTH_RANGE = (0.5, 6.0)
ANNEALING_EPOCHS = 20

WEIGHT_PAIRS = {
    "rgb_weight": [1.0, 1.0],
    "depth_weight": [0.04, 0.08],
    "pc_weight": [1.0, 0.1],
    "rgb_s_weight": [1.0, 0.1],
    # dead in the reference trainer: compute_loss never builds d1_proj/d2, so a
    # nonzero weight would crash Loss.forward (training.py:214-416 sets no
    # depth-consistency kwargs). Keep 0 to exercise the real call surface.
    "depth_consistency_weight": [0.0, 0.0],
    "weight_dist_2nd_loss": [0.15, 0.03],
    "weight_dist_1st_loss": [0.1, 0.02],
    "t_cycle_weight": [0.07, 0.01],
}

LRS = {"nerf": 1e-3, "pose": 5e-4, "focal": 5e-4, "distortion": 7e-4}


@dataclasses.dataclass(frozen=True)
class Scenario:
    name: str
    epoch: int
    scheduling_start: int
    img_idx: int
    ref_idx: int
    pc_ratio: int = 2
    shift_first: bool = False
    dist_alpha: bool = False
    detach_rgbs_scale: bool = False
    detach_gt_depth: bool = False
    learn_focal: bool = False
    it: int = 3


SCENARIOS = [
    # annealing active: 10 < 18 < 30; rgb l1 (18 < 30); forward pair order
    Scenario("anneal_fwd", epoch=18, scheduling_start=10, img_idx=1, ref_idx=2),
    # post-annealing (l2), swap branch (img_idx = N-1, ref = N-2), shift-first
    Scenario("l2_swap", epoch=35, scheduling_start=10, img_idx=N_CAMS - 1,
             ref_idx=N_CAMS - 2, shift_first=True, dist_alpha=True,
             detach_rgbs_scale=True),
    # pre-annealing (start weights), pc_ratio 4, learned focal, detach_gt_depth
    Scenario("pre_focal_pc4", epoch=5, scheduling_start=10, img_idx=0,
             ref_idx=1, pc_ratio=4, learn_focal=True, detach_gt_depth=True),
]


# ---------------------------------------------------------------------------
# Fabricated scene (numpy, float64)
# ---------------------------------------------------------------------------

def _make_scene(seed=42):
    import scipy.spatial.transform as st
    rng = np.random.RandomState(seed)
    imgs = rng.rand(N_CAMS, H, W, 3)
    depths = rng.uniform(1.0, 5.0, (N_CAMS, H, W))
    K = np.array([[1.3, 0, 0, 0], [0, -0.9, 0, 0],
                  [0, 0, -1, 0], [0, 0, 0, 1]], np.float64)

    def traj(seed2):
        r2 = np.random.RandomState(seed2)
        out = np.tile(np.eye(4), (N_CAMS, 1, 1))
        out[:, :3, :3] = st.Rotation.from_rotvec(r2.randn(N_CAMS, 3) * 0.08
                                                 ).as_matrix()
        out[:, :3, 3] = r2.randn(N_CAMS, 3) * 0.3
        return out

    return {
        "imgs": imgs, "depths": depths, "K": K,
        "c2ws_gt": traj(50), "init_c2w": traj(51),
        "pose_r": rng.randn(N_CAMS, 3) * 0.05,
        "pose_t": rng.randn(N_CAMS, 3) * 0.1,
        "dist_scale": 1.0 + rng.randn(N_CAMS, 1) * 0.1,
        "dist_shift": rng.randn(N_CAMS, 1) * 0.05,
        "ray_perm": rng.permutation(H * W),
    }


def _trainer_cfg(sc: Scenario) -> dict:
    return {
        "n_training_points": N_POINTS, "type": "nope_nerf", "vis_geo": False,
        "detach_gt_depth": sc.detach_gt_depth, "pc_ratio": sc.pc_ratio,
        "match_method": "dense", "shift_first": sc.shift_first,
        "detach_ref_img": True, "scale_pcs": True,
        "detach_rgbs_scale": sc.detach_rgbs_scale,
        "vis_reprojection_every": 10 ** 9, "nearest_limit": 0.01,
        "annealing_epochs": ANNEALING_EPOCHS,
        "depth_loss_type": "l1", "with_auto_mask": False, "with_ssim": False,
        **WEIGHT_PAIRS,
    }


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------

def _build_reference(ref, sc: Scenario, scene):
    tcfg = _trainer_cfg(sc)
    torch.manual_seed(11)
    mlp = ref.nerf.OfficialStaticNerf(
        {"model": {"hidden_dim": HIDDEN, "pos_enc_levels": 10,
                   "dir_enc_levels": 4, "occ_activation": "softplus"},
         "rendering": {"white_background": False, "dist_alpha": sc.dist_alpha}})
    mlp = mlp.double()
    renderer = ref.rendering.Renderer(
        mlp, {"depth_range": list(DEPTH_RANGE), "n_max_network_queries": 64000,
              "white_background": False, "num_points": N_SAMPLES,
              "dist_alpha": sc.dist_alpha, "sample_option": "uniform",
              "use_ray_dir": True, "normalise_ray": True, "normal_loss": False,
              "outside_steps": 0}, device=None)
    wrapper = ref.network.nope_nerf({}, renderer, None, None)

    pose_net = ref.poses.LearnPose(N_CAMS, True, True, None,
                                   init_c2w=torch.tensor(scene["init_c2w"])
                                   ).double()
    with torch.no_grad():
        pose_net.r.copy_(torch.tensor(scene["pose_r"]))
        pose_net.t.copy_(torch.tensor(scene["pose_t"]))
    dist_net = ref.distortions.Learn_Distortion(
        N_CAMS, True, True, {"distortion": {"fix_scaleN": False}}).double()
    with torch.no_grad():
        dist_net.global_scales.copy_(torch.tensor(scene["dist_scale"]))
        dist_net.global_shifts.copy_(torch.tensor(scene["dist_shift"]))
    focal_net = opt_focal = None
    if sc.learn_focal:
        focal_net = ref.intrinsics.LearnFocal(True, False, order=2,
                                              init_focal=[1.3, 0.9]).double()
        opt_focal = torch.optim.Adam(focal_net.parameters(), lr=LRS["focal"])

    opt = torch.optim.Adam(wrapper.parameters(), lr=LRS["nerf"])
    opt_pose = torch.optim.Adam(pose_net.parameters(), lr=LRS["pose"])
    opt_dist = torch.optim.Adam(dist_net.parameters(), lr=LRS["distortion"])

    trainer = ref.training.Trainer(
        wrapper, opt, tcfg, device=None, optimizer_pose=opt_pose,
        pose_param_net=pose_net, optimizer_focal=opt_focal, focal_net=focal_net,
        optimizer_distortion=opt_dist, distortion_net=dist_net)
    return types.SimpleNamespace(trainer=trainer, wrapper=wrapper,
                                 pose_net=pose_net, dist_net=dist_net,
                                 focal_net=focal_net, tcfg=tcfg)


def _ref_data(scene, i, r):
    """One collated DataLoader batch (B=1) as OurDataset emits it
    (dataloading/dataset.py:285-342)."""
    return {
        "img": torch.tensor(scene["imgs"][i].transpose(2, 0, 1))[None],
        "img.idx": torch.tensor([i]),
        "img.dpt": torch.tensor(scene["depths"][i])[None],
        "img.depth_mask": torch.ones(1, H, W, dtype=torch.bool),
        "img.camera_mat": torch.tensor(scene["K"])[None],
        "img.scale_mat": torch.eye(4)[None],
        "img.pose_gt": torch.tensor(scene["c2ws_gt"][i])[None],
        "img.ref_imgs": torch.tensor(scene["imgs"][r].transpose(2, 0, 1))[None],
        "img.ref_dpts": torch.tensor(scene["depths"][r])[None],
        "img.ref_idxs": torch.tensor([r]),
        "img.ref_pose_gt": torch.tensor(scene["c2ws_gt"][r])[None],
    }


class _pinned_rng:
    """Pin the step's two RNG draws: torch.randperm ray sampling (a callable
    permutation source) and the stratified z jitter (forced off)."""

    def __init__(self, ref, perm_fn):
        self.ref = ref
        self.perm_fn = perm_fn

    def __enter__(self):
        self.orig_randperm = torch.randperm
        self.orig_sample = self.ref.rendering.Renderer.sample_uniform
        perm_fn, orig_sample = self.perm_fn, self.orig_sample

        def fixed_randperm(n, **kw):
            assert n == H * W
            return torch.tensor(perm_fn(), dtype=torch.long)

        def no_noise_sample(self, cw, rv, zv, add_noise, dr):
            return orig_sample(self, cw, rv, zv, False, dr)

        torch.randperm = fixed_randperm
        self.ref.rendering.Renderer.sample_uniform = no_noise_sample
        return self

    def __exit__(self, *exc):
        torch.randperm = self.orig_randperm
        self.ref.rendering.Renderer.sample_uniform = self.orig_sample
        return False


def _reference_step(ref, sc: Scenario, scene):
    rb = _build_reference(ref, sc, scene)
    trainer, tcfg = rb.trainer, rb.tcfg
    wrapper, pose_net, dist_net, focal_net = (rb.wrapper, rb.pose_net,
                                              rb.dist_net, rb.focal_net)
    data = _ref_data(scene, sc.img_idx, sc.ref_idx)
    pre = _snapshot_ref_params(wrapper, pose_net, dist_net, focal_net)

    with _pinned_rng(ref, lambda: scene["ray_perm"]):
        loss_dict = trainer.train_step(data, it=sc.it, epoch=sc.epoch,
                                       scheduling_start=sc.scheduling_start,
                                       render_path=ref.render_dir)

    post = _snapshot_ref_params(wrapper, pose_net, dist_net, focal_net)
    grads = _snapshot_ref_grads(wrapper, pose_net, dist_net, focal_net)
    weights = {name: trainer.anneal(tcfg[name][0], tcfg[name][1],
                                    sc.scheduling_start, ANNEALING_EPOCHS,
                                    sc.epoch)
               for name in WEIGHT_PAIRS}
    scalars = {k: float(v.detach()) for k, v in loss_dict.items()
               if k not in ("scale", "shift")}
    scalars["scale"] = float(loss_dict["scale"].reshape(()))
    scalars["shift"] = float(loss_dict["shift"].reshape(()))
    deltas = {k: post[k] - pre[k] for k in pre}
    return scalars, grads, deltas, weights


def _snapshot_ref_params(wrapper, pose_net, dist_net, focal_net):
    named = dict(wrapper.renderer.model.named_parameters())
    snap = {}
    for tname, oname in _PARAM_MAP:
        snap[f"nerf/{oname}_w"] = named[f"{tname}.weight"].detach().numpy().T.copy()
        snap[f"nerf/{oname}_b"] = named[f"{tname}.bias"].detach().numpy().copy()
    snap["pose/r"] = pose_net.r.detach().numpy().copy()
    snap["pose/t"] = pose_net.t.detach().numpy().copy()
    snap["distortion/scale"] = dist_net.global_scales.detach().numpy().copy()
    snap["distortion/shift"] = dist_net.global_shifts.detach().numpy().copy()
    if focal_net is not None:
        snap["focal/fx"] = focal_net.fx.detach().numpy().copy()
        snap["focal/fy"] = focal_net.fy.detach().numpy().copy()
    return snap


def _snapshot_ref_grads(wrapper, pose_net, dist_net, focal_net):
    def g(p):
        return (np.zeros(p.shape) if p.grad is None
                else p.grad.detach().numpy().copy())

    named = dict(wrapper.renderer.model.named_parameters())
    out = {}
    for tname, oname in _PARAM_MAP:
        out[f"nerf/{oname}_w"] = g(named[f"{tname}.weight"]).T
        out[f"nerf/{oname}_b"] = g(named[f"{tname}.bias"])
    out["pose/r"] = g(pose_net.r)
    out["pose/t"] = g(pose_net.t)
    out["distortion/scale"] = g(dist_net.global_scales)
    out["distortion/shift"] = g(dist_net.global_shifts)
    if focal_net is not None:
        out["focal/fx"] = g(focal_net.fx)
        out["focal/fy"] = g(focal_net.fy)
    return out


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def _build_ours(sc: Scenario, scene):
    """(params, mc): our pytree mirroring the torch init + the static config."""
    from nope_nerf_tpu.losses import LossConfig
    from nope_nerf_tpu.models.distortions import DistortionConfig
    from nope_nerf_tpu.models.intrinsics import FocalConfig
    from nope_nerf_tpu.models.nerf import NerfConfig
    from nope_nerf_tpu.models.poses import PoseConfig
    from nope_nerf_tpu.ops.render import RenderConfig
    from nope_nerf_tpu.training.state import ModelConfigs

    # mirror the torch init through the same seeded MLP
    torch.manual_seed(11)
    import model.official_nerf as ref_nerf_mod
    mlp = ref_nerf_mod.OfficialStaticNerf(
        {"model": {"hidden_dim": HIDDEN, "pos_enc_levels": 10,
                   "dir_enc_levels": 4, "occ_activation": "softplus"},
         "rendering": {"white_background": False, "dist_alpha": sc.dist_alpha}})
    named = dict(mlp.named_parameters())
    nerf_params = {}
    for tname, oname in _PARAM_MAP:
        nerf_params[f"{oname}_w"] = jnp.asarray(
            named[f"{tname}.weight"].detach().numpy().T)
        nerf_params[f"{oname}_b"] = jnp.asarray(
            named[f"{tname}.bias"].detach().numpy())

    params = {
        "nerf": nerf_params,
        "pose": {"r": jnp.asarray(scene["pose_r"]),
                 "t": jnp.asarray(scene["pose_t"]),
                 "init_c2w": jnp.asarray(scene["init_c2w"])},
        "distortion": {"scale": jnp.asarray(scene["dist_scale"]),
                       "shift": jnp.asarray(scene["dist_shift"])},
    }
    focal_cfg = None
    if sc.learn_focal:
        focal_cfg = FocalConfig(fx_only=False, order=2, learn=True)
        # mirror the reference's ACTUAL parameter values: LearnFocal casts the
        # sqrt'd init coefficient through float32 (intrinsics.py:18 .float())
        # even on an f64 graph, so the param is the f32-rounded sqrt
        coe = np.sqrt(np.asarray([1.3, 0.9])).astype(np.float32).astype(
            np.float64)
        params["focal"] = {"fx": jnp.asarray(coe[0]), "fy": jnp.asarray(coe[1])}

    mc = ModelConfigs(
        nerf=NerfConfig(hidden_dim=HIDDEN, dist_alpha=sc.dist_alpha,
                        compute_dtype="float32"),
        render=RenderConfig(num_points=N_SAMPLES, dist_alpha=sc.dist_alpha,
                            depth_range=DEPTH_RANGE),
        loss=LossConfig(depth_loss_type="l1", with_ssim=False,
                        with_auto_mask=False, use_rgb=True, use_depth=True,
                        use_dist=True, use_pc=True, use_rgb_s=True,
                        use_depth_consistency=False, use_t_cycle=True),
        pose=PoseConfig(num_cams=N_CAMS, learn_R=True, learn_t=True,
                        use_init_c2w=True),
        focal=focal_cfg,
        distortion=DistortionConfig(num_cams=N_CAMS, learn_scale=True,
                                    learn_shift=True, fix_scaleN=False),
        n_training_points=N_POINTS, pc_ratio=sc.pc_ratio, nearest_limit=0.01,
        shift_first=sc.shift_first, detach_ref_img=True,
        detach_gt_depth=sc.detach_gt_depth,
        detach_rgbs_scale=sc.detach_rgbs_scale, scale_pcs=True,
        use_sparse_depth_resample=False, chamfer_tile=16,
        stratified_noise=False)
    return params, mc


def _our_batch(scene, i, r):
    return {
        "img": jnp.asarray(scene["imgs"][i]),
        "depth": jnp.asarray(scene["depths"][i]),
        "depth_mask": jnp.ones((H, W), bool),
        "camera_mat": jnp.asarray(scene["K"]),
        "scale_mat": jnp.eye(4),
        "pose_gt": jnp.asarray(scene["c2ws_gt"][i]),
        "idx": jnp.asarray(i),
        "ref_img": jnp.asarray(scene["imgs"][r]),
        "ref_depth": jnp.asarray(scene["depths"][r]),
        "ref_pose_gt": jnp.asarray(scene["c2ws_gt"][r]),
        "ref_idx": jnp.asarray(r),
    }


def _our_schedule(sc_or_epoch, scheduling_start, ref_weights=None):
    """Our annealed weights + rgb loss type for an epoch; cross-checked against
    the reference's when given."""
    from nope_nerf_tpu.training.scheduler import (annealed_weights,
                                                  rgb_loss_type_at)
    epoch = sc_or_epoch
    tcfg = {**WEIGHT_PAIRS, "annealing_epochs": ANNEALING_EPOCHS}
    ours_w = annealed_weights(tcfg, scheduling_start, epoch)
    if ref_weights is not None:
        for name, want in ref_weights.items():
            np.testing.assert_allclose(ours_w[name], want, rtol=1e-12,
                                       err_msg=f"annealed weight {name}")
    rgb_loss_type = rgb_loss_type_at(tcfg, scheduling_start, epoch)
    assert rgb_loss_type == ("l1" if epoch < ANNEALING_EPOCHS + scheduling_start
                             else "l2")
    return ours_w, rgb_loss_type


def _our_step(sc: Scenario, scene, ref_weights):
    from nope_nerf_tpu.training.state import (apply_updates_with_lr,
                                              make_optimizer)
    from nope_nerf_tpu.training.trainer import compute_step_loss

    ours_w, rgb_loss_type = _our_schedule(sc.epoch, sc.scheduling_start,
                                          ref_weights)
    params, mc = _build_ours(sc, scene)
    batch = _our_batch(scene, sc.img_idx, sc.ref_idx)
    ray_idx = jnp.asarray(scene["ray_perm"][:N_POINTS])
    weights = {k: jnp.asarray(v, jnp.float64) for k, v in ours_w.items()}

    grads, loss_dict = jax.grad(compute_step_loss, has_aux=True)(
        params, batch, weights, ray_idx, jax.random.key(0), mc, rgb_loss_type,
        None)

    # the same per-group Adam the jitted train_step applies (trainer.py:438-444)
    new_params = {}
    for group in params:
        opt = make_optimizer(0.0)
        updates, _ = opt.update(grads[group], opt.init(params[group]),
                                params[group])
        new_params[group] = apply_updates_with_lr(
            params[group], updates, LRS.get(group, LRS["nerf"]))

    flat_g, flat_d = {}, {}
    for group in params:
        for k in params[group]:
            if k == "init_c2w":
                # frozen buffer on both sides; the reference keeps it out of the
                # optimizer via requires_grad=False
                np.testing.assert_array_equal(
                    np.asarray(new_params[group][k]),
                    np.asarray(params[group][k]))
                continue
            flat_g[f"{group}/{k}"] = np.asarray(grads[group][k])
            flat_d[f"{group}/{k}"] = (np.asarray(new_params[group][k])
                                      - np.asarray(params[group][k]))
    scalars = {k: float(v) for k, v in loss_dict.items()}
    return scalars, flat_g, flat_d


# ---------------------------------------------------------------------------
# The oracle assertions
# ---------------------------------------------------------------------------

LOSS_KEYS = ("loss", "loss_rgb", "loss_depth", "l2_mean", "loss_dist_1st",
             "loss_dist_2nd", "loss_pc", "loss_rgb_s",
             "loss_depth_consistency", "loss_t_cycle")


@pytest.mark.parametrize("sc", SCENARIOS, ids=lambda s: s.name)
def test_train_step_matches_reference_trainer(ref, f64, sc):
    scene = _make_scene()
    want_scalars, want_grads, want_deltas, ref_weights = _reference_step(
        ref, sc, scene)
    got_scalars, got_grads, got_deltas = _our_step(sc, scene, ref_weights)

    # all 10 loss scalars + the reported scale/shift
    for k in LOSS_KEYS:
        np.testing.assert_allclose(got_scalars[k], want_scalars[k], rtol=1e-7,
                                   atol=1e-12, err_msg=f"loss term {k}")
    np.testing.assert_allclose(got_scalars["scale"], want_scalars["scale"],
                               rtol=1e-12)
    np.testing.assert_allclose(got_scalars["shift"], want_scalars["shift"],
                               rtol=1e-12, atol=1e-15)

    # gradients into every learnable group (normalized, per group max-scale)
    assert set(got_grads) == set(want_grads)
    for k, want in want_grads.items():
        got = got_grads[k]
        scale = max(np.abs(want).max(), 1e-12)
        np.testing.assert_allclose(got / scale, want / scale, atol=5e-7,
                                   err_msg=f"grad mismatch {k}")

    # post-step Adam deltas (verifies optimizer parity + requires_grad gating)
    assert set(got_deltas) == set(want_deltas)
    for k, want in want_deltas.items():
        got = got_deltas[k]
        lr = LRS[k.split("/")[0]]
        np.testing.assert_allclose(got / lr, want / lr, atol=5e-5,
                                   err_msg=f"post-step delta mismatch {k}")

    # sanity: the step actually moved things (a zero-grad bug would pass above)
    assert np.abs(want_grads["pose/r"]).max() > 0
    assert np.abs(want_grads["pose/t"]).max() > 0
    assert np.abs(want_grads["distortion/scale"]).max() > 0
    if sc.learn_focal:
        assert np.abs(want_grads["focal/fx"]).max() > 0


# ---------------------------------------------------------------------------
# Multi-step outcome parity: the reference training LOOP vs ours
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_multi_step_training_tracks_reference(ref, f64):
    """Run the actual reference Trainer for 45 epochs x 4 frames (180 steps,
    train.py:204-218's loop with the deterministic random_ref=1 frame schedule,
    dataset.py:295-300) against our jitted step with persistent Adam state —
    same init, same pinned ray draws, annealing window crossed mid-run
    (l1 -> l2 switch at epoch 12). Asserts the full loss curves track, the
    final pose/distortion parameters agree, and training actually converged.

    This converts formula-level parity into training-OUTCOME parity: a
    transposed pair ordering, a shift/scale mix-up, or an optimizer-state bug
    too small to fail one step would compound over 180 steps and fail here.
    """
    import functools

    from nope_nerf_tpu.training.state import (apply_updates_with_lr,
                                              make_optimizer)
    from nope_nerf_tpu.training.trainer import compute_step_loss

    sc = Scenario("track", epoch=0, scheduling_start=2, img_idx=0, ref_idx=1)
    epochs, ss = 45, 2
    # reference frame schedule with random_ref=1 (deterministic): ref = i+1,
    # last frame refs backward (dataset.py:295-300)
    frame_pairs = [(i, i + 1 if i < N_CAMS - 1 else i - 1)
                   for i in range(N_CAMS)]
    n_steps = epochs * len(frame_pairs)
    rng = np.random.RandomState(123)
    perms = [rng.permutation(H * W) for _ in range(n_steps)]

    # --- reference loop ----------------------------------------------------
    scene = _make_scene(seed=7)
    rb = _build_reference(ref, sc, scene)
    it = [0]
    ref_losses = []
    with _pinned_rng(ref, lambda: perms[it[0]]):
        for epoch in range(epochs):
            for i, r in frame_pairs:
                data = _ref_data(scene, i, r)
                ld = rb.trainer.train_step(data, it=it[0], epoch=epoch,
                                           scheduling_start=ss,
                                           render_path=ref.render_dir)
                ref_losses.append(float(ld["loss"].detach()))
                it[0] += 1
    ref_final = _snapshot_ref_params(rb.wrapper, rb.pose_net, rb.dist_net,
                                     rb.focal_net)

    # --- our loop (persistent optimizer state, jitted step) ----------------
    params, mc = _build_ours(sc, scene)
    opts = {g: make_optimizer(0.0) for g in params}
    opt_state = {g: opts[g].init(params[g]) for g in params}
    lrs = {g: LRS[g] for g in params}

    @functools.partial(jax.jit, static_argnames=("rgb_loss_type",))
    def step(params, opt_state, batch, weights, ray_idx, rgb_loss_type):
        grads, loss_dict = jax.grad(compute_step_loss, has_aux=True)(
            params, batch, weights, ray_idx, jax.random.key(0), mc,
            rgb_loss_type, None)
        new_params, new_opt = {}, {}
        for g in params:
            updates, new_opt[g] = opts[g].update(grads[g], opt_state[g],
                                                 params[g])
            new_params[g] = apply_updates_with_lr(params[g], updates, lrs[g])
        return new_params, new_opt, loss_dict["loss"]

    batches = {pair: _our_batch(scene, *pair) for pair in frame_pairs}
    our_losses = []
    k = 0
    for epoch in range(epochs):
        ours_w, rgb_loss_type = _our_schedule(epoch, ss)
        weights = {n: jnp.asarray(v, jnp.float64) for n, v in ours_w.items()}
        for pair in frame_pairs:
            params, opt_state, loss = step(
                params, opt_state, batches[pair], weights,
                jnp.asarray(perms[k][:N_POINTS]), rgb_loss_type)
            our_losses.append(float(loss))
            k += 1

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)

    # Early steps are near-exact (measured 2e-11 before the first discrete
    # event). Past that, the comparison is necessarily statistical: both
    # implementations contain discrete selections (Chamfer nearest-neighbor
    # argmin, project_to_cam validity, object masks) whose ties flip under
    # ~1e-9 param drift, and a flip perturbs one step's gradient by O(1/N) —
    # the reference diverges from a 1e-9-perturbed copy of ITSELF the same
    # way. Measured over this run: per-step rel diff <= 0.8%, per-epoch-mean
    # curve diff 0.11%, final loss diff 0.22%. Tolerances carry ~5-10x margin.
    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=1e-8)
    epoch_mean_ref = ref_losses.reshape(epochs, -1).mean(axis=1)
    epoch_mean_our = our_losses.reshape(epochs, -1).mean(axis=1)
    np.testing.assert_allclose(epoch_mean_our, epoch_mean_ref, rtol=2e-2,
                               err_msg="per-epoch loss curves diverged")
    ref_fin, our_fin = ref_losses[-4:].mean(), our_losses[-4:].mean()
    assert abs(our_fin - ref_fin) / ref_fin < 2e-2, (
        f"final loss diverged: ours {our_fin} vs reference {ref_fin}")

    # final parameters agree to the chaotic-drift envelope (measured: t 5.5%,
    # r 10.9%, distortion <2% — scale-normalized)
    tol = {"pose/t": 0.15, "pose/r": 0.3, "distortion/scale": 0.05,
           "distortion/shift": 0.1}
    for key, atol in tol.items():
        want = ref_final[key]
        got = {
            "pose/t": params["pose"]["t"], "pose/r": params["pose"]["r"],
            "distortion/scale": params["distortion"]["scale"],
            "distortion/shift": params["distortion"]["shift"]}[key]
        scale = max(np.abs(want).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(got) / scale, want / scale,
                                   atol=atol, err_msg=f"final {key} diverged")

    # outcome: training converged (not just matched) — measured 3.20 -> 0.58
    assert our_losses[-8:].mean() < 0.3 * our_losses[:8].mean(), (
        "loss did not drop; the tracking comparison is vacuous")
