from .mesh import make_mesh, default_mesh
from .multihost import (
    globalize_replicated,
    host_frame_schedule,
    host_image_tiles,
    host_ray_slice,
)
from .sharding import sharded_compute_step_loss, make_sharded_train_step
