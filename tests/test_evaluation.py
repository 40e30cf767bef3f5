"""Evaluation-stack tests: Umeyama alignment recovers known sim3 transforms, ATE/RPE
golden values, metric revert round-trips, image metrics, trajectory interpolation."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from nope_nerf_tpu.evaluation import (
    align_umeyama, align_trajectory, align_ate_c2b_use_a2b, align_ate_init_pose,
    align_scale_c2b_use_a2b,
    compute_ATE, compute_ATE_v2, compute_rpe, revert_to_metric,
    eval_image, depth_confusion,
    interp_poses, interp_poses_bspline, generate_spiral_nerf,
)
from nope_nerf_tpu.evaluation.pose_eval import full_pose_evaluation
from nope_nerf_tpu.utils.metrics import compute_errors, mse2psnr
from nope_nerf_tpu.data.llff import make_c2ws_from_llff


def _random_traj(n=20, seed=0):
    rng = np.random.RandomState(seed)
    c2ws = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        c2ws[i, :3, :3] = R.from_rotvec(rng.randn(3) * 0.2).as_matrix()
        c2ws[i, :3, 3] = rng.randn(3) * 3 + [0, 0, i * 0.5]
    return c2ws


def test_umeyama_recovers_known_sim3():
    rng = np.random.RandomState(1)
    data = rng.randn(30, 3)
    R_true = R.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    model = s_true * (data @ R_true.T) + t_true
    s, Rot, t = align_umeyama(model, data)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(Rot, R_true, atol=1e-6)
    # convention: model = s * R @ data + t
    pred = s * (data @ Rot.T) + t
    np.testing.assert_allclose(pred, model, atol=1e-6)


def test_align_ate_c2b_perfect_alignment_zero_ate():
    traj_b = _random_traj(15, seed=2)
    # a = sim3-transformed version of b
    R_g = R.from_rotvec([0.1, 0.3, -0.2]).as_matrix()
    s_g, t_g = 0.7, np.array([2.0, 1.0, -1.0])
    traj_a = traj_b.copy()
    traj_a[:, :3, :3] = np.einsum("ij,njk->nik", R_g.T, traj_b[:, :3, :3])
    traj_a[:, :3, 3] = (traj_b[:, :3, 3] - t_g) @ R_g / s_g
    aligned = align_ate_c2b_use_a2b(traj_a, traj_b)
    assert compute_ATE(traj_b, aligned) < 1e-6


def test_align_init_pose():
    traj = _random_traj(10, seed=3)
    rel = np.eye(4)
    rel[:3, :3] = R.from_rotvec([0, 0.5, 0]).as_matrix()
    rel[:3, 3] = [1, 2, 3]
    pred = np.linalg.inv(rel)[None] @ traj
    aligned = align_ate_init_pose(pred, traj)
    np.testing.assert_allclose(aligned[0], traj[0], atol=1e-8)
    # rigidly misaligned trajectories come back exactly
    np.testing.assert_allclose(aligned, traj, atol=1e-8)


def test_ate_rpe_golden():
    gt = _random_traj(12, seed=4)
    pred = gt.copy()
    pred[:, :3, 3] += 0.1  # constant offset
    ate = compute_ATE(gt, pred)
    np.testing.assert_allclose(ate, np.sqrt(3) * 0.1, rtol=1e-6)
    rpe_t, rpe_r = compute_rpe(gt, pred)
    # relative poses differ only through rotation-conjugated offsets; rot err = 0
    assert rpe_r < 1e-6
    ate_t, ate_r = compute_ATE_v2(gt, gt)
    assert ate_t < 1e-9 and ate_r < 1e-6


def test_revert_to_metric_roundtrip():
    """LLFF preprocess (swizzle excluded) then revert must recover the metric
    trajectory."""
    rng = np.random.RandomState(5)
    n = 8
    mats = []
    for i in range(n):
        rot = R.from_rotvec(rng.randn(3) * 0.1).as_matrix()
        t = rng.randn(3) * 4 + [0, 0, 12]
        hwf = np.array([24, 32, 20.0])[:, None]
        mats.append(np.concatenate([rot, t[:, None], hwf], 1))
    poses = np.stack(mats, -1)
    bds = np.stack([np.full(n, 5.0), np.full(n, 30.0)], 0)

    c2ws, _, _, _, reverse, _ = make_c2ws_from_llff(poses, bds, spherify=True,
                                                    bd_factor=0.75)
    metric = revert_to_metric(c2ws, reverse)
    # the swizzled-metric original: (x,y,z)->(y,-x,z) applied column-wise
    swz = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    orig = np.moveaxis(swz, -1, 0)[:, :3, :4]
    np.testing.assert_allclose(metric[:, :3, :4], orig, atol=1e-4)


def test_full_pose_evaluation_zero_for_identical():
    gt = _random_traj(10, seed=6)
    out = full_pose_evaluation(gt.copy(), gt.copy())
    assert out["ate_trans"] < 1e-6
    assert out["rpe_rot_deg"] < 1e-4


def test_depth_confusion():
    pred = np.array([[0.05, 5.0], [25.0, 10.0]])
    gt = np.array([[5.0, 5.0], [0.05, 25.0]])
    mask, mask_r, conf = depth_confusion(pred, gt, 0.1, 20.0)
    # pred valid: [F,T],[F,T]; gt valid: [T,T],[F,F]
    assert mask.tolist() == [[False, True], [False, False]]
    np.testing.assert_allclose(conf * 3, [[1, 1], [1, 1]])


def test_eval_image_metrics():
    rng = np.random.RandomState(7)
    gt = rng.rand(24, 32, 3).astype(np.float32)
    pred = np.clip(gt + 0.05 * rng.randn(24, 32, 3), 0, 1).astype(np.float32)
    d_gt = (5 + rng.rand(24, 32) * 5).astype(np.float32)
    d_pred = d_gt * 1.1
    out = eval_image(pred, gt, d_pred, d_gt, sc=1.0, min_depth=0.1, max_depth=20,
                     with_lpips=False)
    assert 20 < out["psnr"] < 40
    assert 0.5 < out["ssim"] <= 1.0
    abs_rel = out["depth_errors"][0]
    np.testing.assert_allclose(abs_rel, 0.1, rtol=1e-3)


def test_compute_errors_golden():
    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.1, 1.8, 4.0])
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_errors(gt, pred)
    np.testing.assert_allclose(abs_rel, np.mean([0.1, 0.1, 0.0]), rtol=1e-6)
    assert a1 == 1.0


def test_interp_poses_endpoints():
    c2ws = _random_traj(5, seed=8).astype(np.float32)
    out = interp_poses(c2ws, 20)
    assert out.shape == (20, 4, 4)
    np.testing.assert_allclose(out[0, :3, :3], c2ws[0, :3, :3], atol=1e-5)
    np.testing.assert_allclose(out[-1, :3, :3], c2ws[-1, :3, :3], atol=1e-5)
    RtR = np.einsum("nij,nik->njk", out[:, :3, :3], out[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)


def test_interp_poses_bspline():
    c2ws = _random_traj(6, seed=9).astype(np.float32)
    times = np.linspace(0, 1, 6)
    out = interp_poses_bspline(c2ws, 30, times, degree=3)
    assert out.shape == (30, 4, 4)
    np.testing.assert_allclose(out[:, 3], np.tile([0, 0, 0, 1], (30, 1)), atol=0)
    # translations stay within the control-point bounding box (convex hull property)
    lo = c2ws[:, :3, 3].min(0) - 1e-4
    hi = c2ws[:, :3, 3].max(0) + 1e-4
    assert np.all(out[:, :3, 3] >= lo) and np.all(out[:, :3, 3] <= hi)


def test_generate_spiral():
    c2ws = _random_traj(8, seed=10).astype(np.float32)
    hwf = np.tile(np.array([24, 32, 20.0], np.float32)[None, :, None], (8, 1, 1))
    bds = np.array([4.0, 30.0])
    out = generate_spiral_nerf(c2ws, bds, 40, hwf)
    assert out.shape == (40, 4, 4)
    RtR = np.einsum("nij,nik->njk", out[:, :3, :3], out[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (40, 1, 1)), atol=1e-4)


def test_scale_alignment():
    traj_b = _random_traj(10, seed=11)
    traj_a = traj_b.copy()
    traj_a[:, :3, 3] *= 0.25
    aligned, scale = align_scale_c2b_use_a2b(traj_a, traj_b)
    np.testing.assert_allclose(scale, 4.0, rtol=1e-6)
    np.testing.assert_allclose(aligned[:, :3, 3], traj_b[:, :3, 3], atol=1e-8)


@pytest.mark.slow
def test_pose_opt_chunk_padding_is_noop():
    """optimize_test_poses pads the lr schedule so every scan chunk compiles
    once; the padded epochs must be true no-ops — the result for n_epochs=7
    must be identical whether log_every divides it (7) or not (5 -> chunks
    5+2-padded-to-5)."""
    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, make_synthetic_scene
    from nope_nerf_tpu.evaluation.pose_opt import optimize_test_poses
    from nope_nerf_tpu.training import ModelConfigs, create_train_state

    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=2, h=8, w=12)))
    cfg = load_config(overrides={"model": {"hidden_dim": 32},
                                 "rendering": {"num_points": 8}})
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    state, _ = create_train_state(jax.random.key(0), mc)

    def run(log_every):
        _, c2ws = optimize_test_poses(
            state.params["nerf"], None, scene, mc.nerf, mc.render,
            init_c2ws=np.asarray(scene.c2ws_gt), n_points=16, n_epochs=7,
            lr=1e-2, log_every=log_every)
        return c2ws

    np.testing.assert_allclose(run(7), run(5), rtol=0, atol=0)


def test_view_artifacts_and_video(tmp_path):
    """Per-view artifact set + eval video parity (model/eval_images.py:109-198,
    evaluation/eval.py:215-227): every png the reference leaves must appear."""
    from nope_nerf_tpu.evaluation.artifacts import (write_eval_video,
                                                    write_view_artifacts)

    rng = np.random.RandomState(3)
    h, w = 12, 16
    img = rng.rand(h, w, 3).astype(np.float32)
    depth = (0.5 + 4 * rng.rand(h, w)).astype(np.float32)
    depth[0, 0] = 0.01   # below min -> fn/fp territory
    gt = depth * 1.05
    d = str(tmp_path)
    frame = write_view_artifacts(d, 0, img, img, depth_out=depth, depth_gt=gt,
                                 min_depth=0.1, max_depth=20.0,
                                 show_errors=True)
    assert frame.dtype == np.uint8 and frame.shape == (h, w, 3)
    for sub in ("img_out", "img_gt_out", "depth_out", "depth_gt_out",
                "disp_out", "disp_gt_out"):
        assert os.path.exists(os.path.join(d, sub, "0000.png")), sub
    for suffix in ("_mask_rendered", "_mask_gt", "_mask_combined", "_gt", ""):
        assert os.path.exists(os.path.join(d, "depth_mask",
                                           f"0000{suffix}.png")), suffix
    assert os.path.exists(os.path.join(d, "0000_conf.png"))

    path = write_eval_video(d, [frame, frame])
    assert os.path.exists(path)
    assert os.path.dirname(path).endswith("video_out")


def test_aggregate_depth_errors_is_per_view_mean():
    """evaluation/eval.py:200-207 means compute_errors over views, not over
    concatenated pixels — views with different pixel counts weigh equally."""
    from nope_nerf_tpu.evaluation.image_eval import aggregate_depth_errors
    from nope_nerf_tpu.utils.metrics import compute_errors

    a = {"depth_errors": compute_errors(np.array([2.0, 2.0]),
                                        np.array([1.0, 1.0]))}
    b = {"depth_errors": compute_errors(np.full(100, 4.0), np.full(100, 4.0))}
    out = aggregate_depth_errors([a, b])
    np.testing.assert_allclose(out["abs_rel"], 0.25)  # (0.5 + 0.0) / 2


def test_write_frustums_ply(tmp_path):
    """PLY line-set export (information parity with the reference's Open3D
    frustum viewer, utils_poses/vis_cam_traj.py:31-62): vertex/edge counts and
    header must be consistent and parseable."""
    from nope_nerf_tpu.cli.vis_poses import write_frustums_ply

    c2ws = _random_traj(3, seed=11)
    path = write_frustums_ply([c2ws, c2ws], ["green", "red"], 120, 160,
                              100.0, 100.0, str(tmp_path / "f.ply"))
    lines = open(path).read().splitlines()
    assert lines[0] == "ply" and "end_header" in lines
    nv = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    ne = int(next(l for l in lines if l.startswith("element edge")).split()[-1])
    # per trajectory: 3 cams x 8 segs x 2 verts + 3 polyline verts = 51
    assert nv == 2 * (3 * 8 * 2 + 3)
    # per trajectory: 3*8 frustum edges + 2 polyline edges = 26
    assert ne == 2 * (3 * 8 + 2)
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == nv + ne
    ax, ay, az, r, g, b = body[0].split()
    assert (int(r), int(g), int(b)) == (0, 180, 0)
    v1, v2 = map(int, body[nv].split())
    assert 0 <= v1 < nv and 0 <= v2 < nv
