from .nerf import (
    NerfConfig,
    init_nerf_params,
    nerf_apply,
    nerf_density,
    nerf_gradient,
    encode_position,
)
from .poses import PoseConfig, init_pose_params, pose_c2w, pose_c2w_all
from .intrinsics import FocalConfig, init_focal_params, focal_fxfy
from .distortions import DistortionConfig, init_distortion_params, distortion_scale_shift
