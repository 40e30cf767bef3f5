from .render import RenderConfig, render_nope_nerf, sample_uniform, composite
from .interp import (
    grid_sample,
    resize_nearest,
    resize_bilinear,
    resize_area,
)
from .ssim import ssim_loss_map, ssim as ssim_eval
from .chamfer import chamfer_loss, nearest_dists
