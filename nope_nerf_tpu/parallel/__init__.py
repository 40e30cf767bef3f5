from .mesh import make_mesh, default_mesh
from .sharding import sharded_compute_step_loss, make_sharded_train_step
