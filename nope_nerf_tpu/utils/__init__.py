from .metrics import mse2psnr, compute_errors
from .safemath import safe_norm
