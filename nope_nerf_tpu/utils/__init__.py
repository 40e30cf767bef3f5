from .metrics import mse2psnr, compute_errors
