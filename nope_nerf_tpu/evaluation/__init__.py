from .align import (
    align_umeyama,
    align_trajectory,
    align_ate_c2b_use_a2b,
    align_ate_init_pose,
    align_scale_c2b_use_a2b,
    pts_dist_max,
)
from .pose_eval import compute_ATE, compute_ATE_v2, compute_rpe, revert_to_metric
from .image_eval import eval_image, depth_confusion
from .artifacts import write_view_artifacts, write_eval_video
from .pose_opt import optimize_test_poses, init_test_poses
from .extract import (
    interp_poses,
    interp_poses_bspline,
    generate_spiral_nerf,
    render_trajectory,
)
