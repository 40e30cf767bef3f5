"""Golden parity tests against the ACTUAL reference implementation.

Unlike test_grad_parity.py (whose torch oracle re-expresses the reference math by
hand), these tests import the reference source at /root/reference directly — with
two-line stubs for packages absent from this image (torchvision/timm/open3d) and a
CPU shim for the reference's hard-coded .cuda() calls — and assert our JAX
implementations reproduce its numbers and gradients on fixed seeds.

Covered (VERDICT.md round-1 item 2):
  * exp-map / make_c2w                      (model/common.py:290-310)
  * every loss term + the full Loss.forward (model/losses.py:17-228)
  * renderer forward AND gradients          (model/rendering.py:36-168)
  * LLFF load + pose preprocessing chain    (dataloading/common.py:82-266,
                                             dataloading/dataset.py:230-278)
  * metric revert round-trip                (evaluation/eval_poses.py:22-37)
  * ATE / ATE_v2 / RPE + Umeyama alignment  (utils_poses/comp_ate.py:35-103,
                                             utils_poses/align_traj.py:26-82)

Known deliberate deviation, NOT tested here: the reference's SSIM loss pools over
the wrong axes for HWC inputs (model/losses.py:232-264 expects NCHW, the trainer
feeds HWC) — our ssim_loss_map fixes the pooling axes (ops/ssim.py), so
with_ssim=True comparisons diverge by design. All comparisons below run the
reference's documented semantics (with_ssim=False paths).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.oracle


# ---------------------------------------------------------------------------
# Reference import harness
# ---------------------------------------------------------------------------

def _stub_module(name: str, attrs=()):
    """Install a package-shaped stub so `import name` / `from name import x` load."""
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = []
    for a in attrs:
        setattr(mod, a, object)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        setattr(_stub_module(parent), child, mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Namespace of reference symbols, imported from /root/reference."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if REF not in sys.path:
        sys.path.append(REF)  # append: never shadows our own packages
    _stub_module("torchvision.transforms", ["Compose"])
    _stub_module("timm")
    _stub_module("open3d")
    # Reference hard-codes .cuda() in loss paths (losses.py:173-226); this image
    # has CPU torch only. Identity shim, test-process only.
    torch.Tensor.cuda = lambda self, *a, **kw: self

    from model import common as ref_common
    from model import losses as ref_losses
    from model import rendering as ref_rendering
    from model import official_nerf as ref_nerf
    from dataloading import common as ref_dl_common
    from dataloading import dataset as ref_dataset
    from utils_poses import comp_ate as ref_comp_ate
    from utils_poses import align_traj as ref_align_traj

    return types.SimpleNamespace(
        common=ref_common, losses=ref_losses, rendering=ref_rendering,
        nerf=ref_nerf, dl_common=ref_dl_common, dataset=ref_dataset,
        comp_ate=ref_comp_ate, align_traj=ref_align_traj)


def _t(x, dtype=torch.float32, grad=False):
    return torch.tensor(np.asarray(x), dtype=dtype, requires_grad=grad)


# ---------------------------------------------------------------------------
# exp-map / make_c2w (model/common.py:290-310)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", [1.0, 1e-4, 3.0])
def test_exp_map_matches_reference(ref, scale):
    from nope_nerf_tpu.geometry.lie import exp_so3, make_c2w

    rng = np.random.RandomState(7)
    for _ in range(4):
        r = (rng.randn(3) * scale).astype(np.float32)
        t = rng.randn(3).astype(np.float32)
        R_ref = ref.common.Exp(_t(r)).numpy()
        c2w_ref = ref.common.make_c2w(_t(r), _t(t)).numpy()
        np.testing.assert_allclose(np.asarray(exp_so3(jnp.asarray(r))), R_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(make_c2w(jnp.asarray(r),
                                                       jnp.asarray(t))),
                                   c2w_ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Loss terms (model/losses.py)
# ---------------------------------------------------------------------------

LOSS_CFG = {"depth_loss_type": "l1", "with_auto_mask": False,
            "with_ssim": False, "match_method": "dense"}


@pytest.fixture(scope="module")
def ref_loss(ref):
    return ref.losses.Loss(cfg=dict(LOSS_CFG))


def test_rgb_loss_matches_reference(ref_loss):
    from nope_nerf_tpu.losses import rgb_loss
    rng = np.random.RandomState(0)
    pred = rng.rand(1, 64, 3).astype(np.float32)
    gt = rng.rand(1, 64, 3).astype(np.float32)
    for kind in ("l1", "l2"):
        want = float(ref_loss.get_rgb_full_loss(_t(pred), _t(gt), kind))
        got = float(rgb_loss(jnp.asarray(pred[0]), jnp.asarray(gt[0]), kind))
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("n", [63, 64])  # odd AND even: torch lower-median rule
def test_depth_losses_match_reference(ref_loss, n):
    from nope_nerf_tpu.losses import depth_loss_l1, depth_loss_invariant
    rng = np.random.RandomState(1)
    pred = rng.uniform(0.5, 9.0, n).astype(np.float32)
    gt = rng.uniform(0.5, 9.0, n).astype(np.float32)
    ones = jnp.ones(n, bool)

    want = float(ref_loss.get_depth_loss(_t(pred), _t(gt)))
    got = float(depth_loss_l1(jnp.asarray(pred), jnp.asarray(gt), ones))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want = float(ref_loss.depth_loss_dpt(_t(pred), _t(gt)))
    got = float(depth_loss_invariant(jnp.asarray(pred), jnp.asarray(gt), ones))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_weight_dist_loss_matches_reference(ref_loss):
    from nope_nerf_tpu.losses import weight_dist_loss
    rng = np.random.RandomState(2)
    t_list = rng.randn(9, 3).astype(np.float32)
    w1, w2 = ref_loss.get_weight_dist_loss(_t(t_list))
    g1, g2 = weight_dist_loss(jnp.asarray(t_list))
    np.testing.assert_allclose(float(g1), float(w1), rtol=1e-5)
    np.testing.assert_allclose(float(g2), float(w2), rtol=1e-5)


def test_chamfer_pc_loss_matches_reference(ref_loss):
    from nope_nerf_tpu.ops.chamfer import chamfer_loss
    rng = np.random.RandomState(3)
    x = rng.randn(70, 3).astype(np.float32)
    y = rng.randn(53, 3).astype(np.float32)
    want = float(ref_loss.get_pc_loss(_t(x[None]), _t(y[None])))
    got = float(chamfer_loss(jnp.asarray(x), jnp.asarray(y), tile=32))
    # rtol 1e-4: our d^2 comes from the |x|^2+|y|^2-2<x,y> MXU identity, the
    # reference norms an (S, D, 3) difference tensor — f32 noise differs.
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rgb_s_loss_matches_reference(ref_loss):
    from nope_nerf_tpu.losses import rgb_s_loss
    rng = np.random.RandomState(4)
    rgb1 = rng.rand(12, 10, 3).astype(np.float32)
    rgb2 = rng.rand(12, 10, 3).astype(np.float32)
    valid = (rng.rand(12, 10, 1) > 0.3).astype(np.float32)
    want = float(ref_loss.get_rgb_s_loss(_t(rgb1), _t(rgb2), _t(valid).bool()))
    got = float(rgb_s_loss(jnp.asarray(rgb1), jnp.asarray(rgb2),
                           jnp.asarray(valid), with_ssim=False))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reprojection_losses_match_reference(ref):
    from nope_nerf_tpu.losses import reprojection_loss, dpt_reprojection_loss
    loss_mod = ref.losses.Loss(cfg=dict(LOSS_CFG))
    rng = np.random.RandomState(5)
    rgb = rng.rand(14, 9, 3).astype(np.float32)
    refs = [rng.rand(14, 9, 3).astype(np.float32) for _ in range(2)]
    refs_ori = [rng.rand(14, 9, 3).astype(np.float32) for _ in range(2)]
    valid = rng.rand(14, 9, 1) > 0.2  # bool, as project_to_cam emits (common.py:454)

    want = float(loss_mod.get_reprojection_loss(
        _t(rgb), [_t(r) for r in refs], _t(valid, torch.bool),
        [_t(r) for r in refs_ori]))
    got = float(reprojection_loss(jnp.asarray(rgb), [jnp.asarray(r) for r in refs],
                                  jnp.asarray(valid, jnp.float32),
                                  [jnp.asarray(r) for r in refs_ori],
                                  with_auto_mask=False))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # DPT variant adds a [0,1] clamp; keep inputs partially out of range to hit it
    rgb2 = (rgb * 2.5 - 0.5).astype(np.float32)
    want = float(loss_mod.get_DPT_reprojection_loss(
        _t(rgb2), [_t(r) for r in refs], _t(valid, torch.bool),
        [_t(r) for r in refs_ori]))
    got = float(dpt_reprojection_loss(jnp.asarray(rgb2),
                                      [jnp.asarray(r) for r in refs],
                                      jnp.asarray(valid, jnp.float32),
                                      [jnp.asarray(r) for r in refs_ori],
                                      with_auto_mask=False, with_ssim=False))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reference_auto_mask_branch_is_broken(ref):
    """The reference's with_auto_mask branch is dead code (no call site) AND
    latently broken: it builds a FLOAT auto-mask (losses.py:73-75) that
    mean_on_mask then uses as an index (losses.py:82), which torch rejects.
    We implement the documented semantics (drop pixels where the warped
    reference matches worse than the unwarped one) with masked reductions —
    covered by tests/test_losses.py — and record the reference's defect here."""
    loss_mod = ref.losses.Loss(cfg={**LOSS_CFG, "with_auto_mask": True})
    rng = np.random.RandomState(5)
    rgb = _t(rng.rand(4, 3, 3).astype(np.float32))
    ref_warped = _t(rng.rand(4, 3, 3).astype(np.float32))
    ref_ori = _t(rng.rand(4, 3, 3).astype(np.float32))
    valid = _t(rng.rand(4, 3, 1) > 0.2, torch.bool)
    with pytest.raises(IndexError):
        loss_mod.get_reprojection_loss(rgb, [ref_warped], valid, [ref_ori])


def test_depth_consistency_and_t_cycle_match_reference(ref_loss):
    from nope_nerf_tpu.losses import depth_consistency_loss, t_cycle_loss
    from nope_nerf_tpu.geometry.lie import make_c2w
    rng = np.random.RandomState(6)
    d1p = rng.rand(40).astype(np.float32)
    d2 = rng.rand(40).astype(np.float32)
    d2p = rng.rand(40).astype(np.float32)
    d1 = rng.rand(40).astype(np.float32)

    want = float(ref_loss.get_depth_consistency_loss(_t(d1p[None]), _t(d2[None])))
    got = float(depth_consistency_loss(jnp.asarray(d1p), jnp.asarray(d2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want = float(ref_loss.get_depth_consistency_loss(
        _t(d1p[None]), _t(d2[None]), _t(d2p[None]), _t(d1[None])))
    got = float(depth_consistency_loss(jnp.asarray(d1p), jnp.asarray(d2),
                                       jnp.asarray(d2p), jnp.asarray(d1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    rt_a = np.asarray(make_c2w(jnp.asarray(rng.randn(3) * 0.2, jnp.float32),
                               jnp.asarray(rng.randn(3), jnp.float32)))
    rt_b = np.asarray(make_c2w(jnp.asarray(rng.randn(3) * 0.2, jnp.float32),
                               jnp.asarray(rng.randn(3), jnp.float32)))
    want = float(ref_loss.get_t_cycle_loss(_t(rt_a), _t(rt_b)))
    got = float(t_cycle_loss(jnp.asarray(rt_a), jnp.asarray(rt_b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_full_loss_forward_matches_reference(ref):
    """All 10 scalars of Loss.forward vs compute_losses, every term enabled."""
    from nope_nerf_tpu.losses import LossConfig, compute_losses

    loss_mod = ref.losses.Loss(cfg=dict(LOSS_CFG))
    rng = np.random.RandomState(8)
    n = 48
    rgb_pred = rng.rand(1, n, 3).astype(np.float32)
    rgb_gt = rng.rand(1, n, 3).astype(np.float32)
    depth_pred = rng.uniform(0.5, 9.0, n).astype(np.float32)
    depth_gt = rng.uniform(0.5, 9.0, n).astype(np.float32)
    t_list = rng.randn(7, 3).astype(np.float32)
    X = rng.randn(36, 3).astype(np.float32)
    Y = rng.randn(41, 3).astype(np.float32)
    rgb_pc1 = rng.rand(8, 6, 3).astype(np.float32)
    rgb_pc1_proj = rng.rand(8, 6, 3).astype(np.float32)
    valid = (rng.rand(8, 6, 1) > 0.25).astype(np.float32)
    d1_proj = rng.rand(30).astype(np.float32)
    d2 = rng.rand(30).astype(np.float32)
    eye_ish = np.eye(4, dtype=np.float32)
    rt_12 = eye_ish.copy(); rt_12[:3, 3] = rng.randn(3).astype(np.float32)
    rt_12_gt = eye_ish.copy(); rt_12_gt[:3, 3] = rng.randn(3).astype(np.float32)

    weights = {"rgb_weight": 1.0, "depth_weight": 0.04,
               "weight_dist_1st_loss": 0.1, "weight_dist_2nd_loss": 0.15,
               "pc_weight": 0.2, "rgb_s_weight": 0.3,
               "depth_consistency_weight": 0.05, "t_cycle_weight": 0.07}

    want = loss_mod.forward(
        rgb_pred=_t(rgb_pred), rgb_gt=_t(rgb_gt),
        depth_pred=_t(depth_pred), depth_gt=_t(depth_gt),
        t_list=_t(t_list), X=_t(X[None]), Y=_t(Y[None]),
        rgb_pc1=_t(rgb_pc1), rgb_pc1_proj=_t(rgb_pc1_proj),
        valid_points=_t(valid).bool(),
        d1_proj=_t(d1_proj[None]), d2=_t(d2[None]),
        weights=weights, rgb_loss_type="l2",
        rt_12=_t(rt_12), rt_12_gt=_t(rt_12_gt))

    cfg = LossConfig(depth_loss_type="l1", with_ssim=False, with_auto_mask=False,
                     use_rgb=True, use_depth=True, use_dist=True, use_pc=True,
                     use_rgb_s=True, use_depth_consistency=True, use_t_cycle=True)
    got = compute_losses(
        cfg, {k: jnp.asarray(v, jnp.float32) for k, v in weights.items()},
        rgb_pred=jnp.asarray(rgb_pred[0]), rgb_gt=jnp.asarray(rgb_gt[0]),
        rgb_loss_type="l2",
        depth_pred=jnp.asarray(depth_pred), depth_gt=jnp.asarray(depth_gt),
        t_list=jnp.asarray(t_list), pc_x=jnp.asarray(X), pc_y=jnp.asarray(Y),
        rgb_pc1=jnp.asarray(rgb_pc1), rgb_pc1_proj=jnp.asarray(rgb_pc1_proj),
        valid_points=jnp.asarray(valid),
        d1_proj=jnp.asarray(d1_proj), d2=jnp.asarray(d2),
        rt_12=jnp.asarray(rt_12), rt_12_gt=jnp.asarray(rt_12_gt),
        chamfer_tile=32)

    for key in ("loss", "loss_rgb", "loss_depth", "l2_mean", "loss_dist_1st",
                "loss_dist_2nd", "loss_pc", "loss_rgb_s",
                "loss_depth_consistency", "loss_t_cycle"):
        np.testing.assert_allclose(float(got[key]), float(want[key]), rtol=2e-5,
                                   atol=1e-7, err_msg=f"term {key}")


# ---------------------------------------------------------------------------
# Renderer forward + gradients (model/rendering.py:36-168)
# ---------------------------------------------------------------------------

RENDER_CFG = {"depth_range": [0.01, 10.0], "n_max_network_queries": 64000,
              "white_background": False, "num_points": 24, "dist_alpha": False,
              "sample_option": "uniform", "use_ray_dir": True,
              "normalise_ray": True, "normal_loss": False, "outside_steps": 0}

# torch Linear module -> our param prefix (weights transposed torch (out,in) ->
# ours (in,out))
_PARAM_MAP = [
    ("layers0.0", "trunk0_0"), ("layers0.2", "trunk0_1"),
    ("layers0.4", "trunk0_2"), ("layers0.6", "trunk0_3"),
    ("layers1.0", "trunk1_0"), ("layers1.2", "trunk1_1"),
    ("layers1.4", "trunk1_2"), ("layers1.6", "trunk1_3"),
    ("fc_density", "density"), ("fc_feature", "feature"),
    ("rgb_layers.0", "rgb_hidden"), ("fc_rgb", "rgb"),
]


def _make_ref_model(ref, hidden_dim, dist_alpha, white_background=False):
    cfg = {"model": {"hidden_dim": hidden_dim, "pos_enc_levels": 10,
                     "dir_enc_levels": 4, "occ_activation": "softplus"},
           "rendering": {"white_background": white_background,
                         "dist_alpha": dist_alpha}}
    torch.manual_seed(11)
    return ref.nerf.OfficialStaticNerf(cfg)


def _params_from_torch(model):
    named = dict(model.named_parameters())
    params = {}
    for tname, oname in _PARAM_MAP:
        params[f"{oname}_w"] = jnp.asarray(
            named[f"{tname}.weight"].detach().numpy().T)
        params[f"{oname}_b"] = jnp.asarray(named[f"{tname}.bias"].detach().numpy())
    return params


@pytest.fixture(scope="module")
def render_setup(ref):
    from nope_nerf_tpu.geometry.camera import intrinsics_ndc
    rng = np.random.RandomState(12)
    n_rays = 24
    pixels = rng.uniform(-1, 1, (n_rays, 2)).astype(np.float32)
    depth = rng.uniform(2.0, 6.0, (n_rays, 1)).astype(np.float32)
    K = np.asarray(intrinsics_ndc(30.0, 30.0, 32, 24), np.float32)
    r_vec = (rng.randn(3) * 0.1).astype(np.float32)
    t_vec = (rng.randn(3) * 0.5).astype(np.float32)
    return pixels, depth, K, r_vec, t_vec


def _ref_render(ref, model, pixels, depth, K, r, t, dist_alpha,
                backward=False, dtype=torch.float32):
    rv = _t(r, dtype, grad=True)
    tv = _t(t, dtype, grad=True)
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(dtype)  # reference builds f32 helpers internally
    try:
        c2w = ref.common.make_c2w(rv, tv)
        world = torch.inverse(c2w)[None]
        eye = torch.eye(4, dtype=dtype)[None]
        renderer = ref.rendering.Renderer(
            model, {**RENDER_CFG, "dist_alpha": dist_alpha}, device=None)
        out = renderer(_t(pixels, dtype)[None], _t(depth, dtype)[None],
                       _t(K, dtype)[None], world, eye,
                       "nope_nerf", add_noise=False, eval_=False)
        loss = (out["rgb"].square().mean()
                + 0.04 * (out["depth_pred"] - out["depth_gt"]).abs().mean())
    finally:
        torch.set_default_dtype(prev_default)
    grads = None
    if backward:
        loss.backward()
        named = dict(model.named_parameters())
        grads = {}
        for tname, oname in _PARAM_MAP:
            grads[f"{oname}_w"] = named[f"{tname}.weight"].grad.numpy().T
            grads[f"{oname}_b"] = named[f"{tname}.bias"].grad.numpy()
        grads["__r"] = rv.grad.numpy()
        grads["__t"] = tv.grad.numpy()
    return out, float(loss), grads


def _our_render_loss(params, pixels, depth, K, r, t, dist_alpha):
    from nope_nerf_tpu.geometry.lie import make_c2w
    from nope_nerf_tpu.models.nerf import NerfConfig
    from nope_nerf_tpu.ops.render import RenderConfig, render_nope_nerf

    ncfg = NerfConfig(hidden_dim=64, dist_alpha=dist_alpha,
                      compute_dtype="float32")
    rcfg = RenderConfig(num_points=24, dist_alpha=dist_alpha)

    def loss_fn(params, r, t):
        world = jnp.linalg.inv(make_c2w(r, t))
        out = render_nope_nerf(params, pixels, depth, K, world, None, None,
                               rcfg, ncfg, add_noise=False)
        loss = (jnp.mean(out["rgb"] ** 2)
                + 0.04 * jnp.mean(jnp.abs(out["depth_pred"] - out["depth_gt"])))
        return loss, out

    return loss_fn


@pytest.mark.parametrize("dist_alpha", [False, True])
def test_renderer_forward_matches_reference(ref, render_setup, dist_alpha):
    pixels, depth, K, r, t = render_setup
    model = _make_ref_model(ref, 64, dist_alpha)
    params = _params_from_torch(model)
    want, loss_want, _ = _ref_render(ref, model, pixels, depth, K, r, t,
                                     dist_alpha)
    loss_fn = _our_render_loss(params, jnp.asarray(pixels), jnp.asarray(depth),
                               jnp.asarray(K), None, None, dist_alpha)
    loss_got, out = loss_fn(params, jnp.asarray(r), jnp.asarray(t))

    assert bool(np.all(np.asarray(out["object_mask"])))  # all priors valid
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               want["rgb"][0].detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth_pred"]),
                               want["depth_pred"].detach().numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["depth_gt"]),
                               want["depth_gt"].detach().numpy(), atol=2e-3)
    np.testing.assert_allclose(float(loss_got), loss_want, rtol=2e-4)


def test_renderer_gradients_match_reference(ref, render_setup):
    """The north-star check, against the real reference: gradients through the
    volume renderer into the MLP weights AND the axis-angle pose.

    Runs float64 on BOTH sides: under f32, accumulation-order noise flips relu
    kinks and a handful of gradient entries diverge macroscopically in either
    implementation; f64 removes the kink flips and makes the comparison tight."""
    pixels, depth, K, r, t = render_setup
    model = _make_ref_model(ref, 64, False).double()
    _, _, g_want = _ref_render(ref, model, pixels.astype(np.float64),
                               depth.astype(np.float64), K.astype(np.float64),
                               r.astype(np.float64), t.astype(np.float64),
                               False, backward=True, dtype=torch.float64)

    jax.config.update("jax_enable_x64", True)
    try:
        params = _params_from_torch(model)
        loss_fn = _our_render_loss(params, jnp.asarray(pixels, jnp.float64),
                                   jnp.asarray(depth, jnp.float64),
                                   jnp.asarray(K, jnp.float64), None, None, False)
        g_params, g_r, g_t = jax.grad(
            lambda p, r_, t_: loss_fn(p, r_, t_)[0], argnums=(0, 1, 2))(
                params, jnp.asarray(r, jnp.float64), jnp.asarray(t, jnp.float64))

        for k, want in g_want.items():
            got = {"__r": g_r, "__t": g_t}.get(k, g_params.get(k))
            got = np.asarray(got)
            scale = max(np.abs(want).max(), 1e-12)
            # atol 1e-6: the reference builds its z linspace in f32 even on an
            # f64 graph (rendering.py:89), so sample positions differ by f32 ulps.
            np.testing.assert_allclose(got / scale, want / scale, atol=1e-6,
                                       err_msg=f"grad mismatch {k}")
    finally:
        jax.config.update("jax_enable_x64", False)
    assert np.abs(g_want["__r"]).max() > 0
    assert np.abs(g_want["__t"]).max() > 0


# ---------------------------------------------------------------------------
# LLFF load + preprocessing (dataloading/common.py, dataset.py:230-278)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    """A tiny on-disk LLFF scene: images/ pngs + poses_bounds.npy + poses_gt.npy."""
    import cv2
    root = tmp_path_factory.mktemp("llff_scene")
    (root / "images").mkdir()
    rng = np.random.RandomState(13)
    n, h, w = 5, 16, 24

    def rows(seed):
        rr = np.random.RandomState(seed)
        out = np.zeros((n, 17), np.float64)
        for i in range(n):
            c2w = np.eye(4)
            angle = rr.randn(3) * 0.1
            import scipy.spatial.transform as st
            c2w[:3, :3] = st.Rotation.from_rotvec(angle).as_matrix()
            c2w[:3, 3] = rr.randn(3) * 2.0 + np.asarray([0, 0, 4.0 + i])
            m = np.concatenate([c2w[:3, :4],
                                np.asarray([[h], [w], [50.0]])], axis=1)
            out[i, :15] = m.reshape(-1)
            out[i, 15:] = [2.0 + rr.rand(), 10.0 + rr.rand()]
        return out

    np.save(root / "poses_bounds.npy", rows(20))
    np.save(root / "poses_gt.npy", rows(21))
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"{i:04d}.png"), img[..., ::-1])
    return str(root)


def test_load_llff_matches_reference(ref, llff_scene):
    from nope_nerf_tpu.data.llff import load_llff_data
    want = ref.dl_common._load_data(llff_scene, factor=None, load_imgs=True)
    w_poses, w_bds, w_imgs, w_names, _, _ = want
    poses, bds, imgs, names = load_llff_data(llff_scene)
    np.testing.assert_allclose(poses, w_poses, atol=1e-12)
    np.testing.assert_allclose(bds, w_bds, atol=1e-12)
    assert names == w_names
    # reference stacks (H, W, 3, N); ours (N, H, W, 3)
    np.testing.assert_allclose(imgs, np.moveaxis(w_imgs, -1, 0), atol=1e-7)

    want = ref.dl_common._load_data(llff_scene, factor=None, load_imgs=True,
                                    load_gt_llff=True)
    poses, bds, _, _ = load_llff_data(llff_scene, load_gt_llff=True)
    np.testing.assert_allclose(poses, want[0], atol=1e-12)
    np.testing.assert_allclose(bds, want[1], atol=1e-12)


@pytest.mark.parametrize("spherify", [False, True])
def test_make_c2ws_matches_reference(ref, llff_scene, spherify):
    from nope_nerf_tpu.data.llff import load_llff_data, make_c2ws_from_llff
    poses, bds, _, _ = load_llff_data(llff_scene, load_imgs=False)

    self_stub = types.SimpleNamespace()
    w_c2ws, w_H, w_W, w_focal, w_rev = ref.dataset.DataField.make_c2ws_from_llff(
        self_stub, poses.copy(), bds.copy(), spherify)
    c2ws, H, W, focal, rev, _ = make_c2ws_from_llff(poses.copy(), bds.copy(),
                                                    spherify)
    assert (H, W) == (w_H, w_W)
    np.testing.assert_allclose(focal, w_focal, rtol=1e-6)
    np.testing.assert_allclose(c2ws, w_c2ws.numpy(), atol=1e-5)
    np.testing.assert_allclose(rev["sc"], w_rev["sc"], rtol=1e-6)
    np.testing.assert_allclose(rev["recenter"], w_rev["recenter"], atol=1e-6)
    if spherify:
        np.testing.assert_allclose(rev["sc_spherify"], w_rev["sc_spherify"],
                                   rtol=1e-5)
        np.testing.assert_allclose(rev["c2w_spherify"], w_rev["c2w_spherify"],
                                   atol=1e-5)

    # metric revert round-trip (evaluation/eval_poses.py:22-37): reverting the
    # preprocessed c2ws with the REFERENCE-produced reverse dict must recover the
    # original metric camera centers.
    from nope_nerf_tpu.evaluation.pose_eval import revert_to_metric
    reverted = revert_to_metric(np.asarray(w_c2ws), w_rev)
    orig = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    orig_t = np.moveaxis(orig, -1, 0)[:, :3, 3]
    np.testing.assert_allclose(reverted[:, :3, 3], orig_t, atol=1e-4)


# ---------------------------------------------------------------------------
# ATE / RPE / Umeyama alignment (utils_poses/, ATE/)
# ---------------------------------------------------------------------------

def _random_traj(seed, n=10):
    import scipy.spatial.transform as st
    rng = np.random.RandomState(seed)
    out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    out[:, :3, :3] = st.Rotation.from_rotvec(rng.randn(n, 3) * 0.3).as_matrix()
    out[:, :3, 3] = np.cumsum(rng.randn(n, 3) * 0.5, axis=0)
    return out


def test_ate_rpe_match_reference(ref):
    from nope_nerf_tpu.evaluation.pose_eval import (compute_ATE, compute_ATE_v2,
                                                    compute_rpe)
    gt, pred = _random_traj(30), _random_traj(31)
    np.testing.assert_allclose(compute_ATE(gt, pred),
                               ref.comp_ate.compute_ATE(gt, pred), rtol=1e-9)
    np.testing.assert_allclose(compute_ATE_v2(gt, pred),
                               ref.comp_ate.compute_ATE_v2(gt, pred), rtol=1e-9)
    np.testing.assert_allclose(compute_rpe(gt, pred),
                               ref.comp_ate.compute_rpe(gt, pred), rtol=1e-9)


def test_umeyama_alignment_matches_reference(ref):
    from nope_nerf_tpu.evaluation.align import (align_ate_c2b_use_a2b,
                                                align_ate_init_pose)
    a, b = _random_traj(32), _random_traj(33)
    want = ref.align_traj.align_ate_c2b_use_a2b(_t(a), _t(b)).numpy()
    got = align_ate_c2b_use_a2b(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)

    want = ref.align_traj.align_ate_init_pose(_t(a), _t(b)).numpy()
    got = align_ate_init_pose(a, b)
    np.testing.assert_allclose(got, want, atol=1e-6)
