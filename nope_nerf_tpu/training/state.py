"""TrainState: one pytree holding every learnable group + optimizer state.

The reference spreads this across four nn.Modules, four torch Adam optimizers and
loose scalars round-tripped through checkpoints (`train.py:59-154`,
`model/checkpoints.py:29-41`). Here it is a single chex dataclass so the whole
training step is state -> state under jit, checkpointing is one pytree save, and
multi-chip replication is one device_put.

Learning rates are *inputs* to the step (host-controlled per epoch), not baked into
the optimizer chain — the reference's auto-scheduler mutates param_group['lr'] the
same way (`train.py:326-346`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from ..models.nerf import NerfConfig, init_nerf_params
from ..models.poses import PoseConfig, init_pose_params
from ..models.intrinsics import FocalConfig, init_focal_params
from ..models.distortions import DistortionConfig, init_distortion_params
from ..ops.render import RenderConfig
from ..losses import LossConfig


@dataclasses.dataclass(frozen=True)
class ModelConfigs:
    """All static (hashable) model/render/loss configuration, passed as a jit
    static argument."""
    nerf: NerfConfig
    render: RenderConfig
    loss: LossConfig
    pose: Optional[PoseConfig]
    focal: Optional[FocalConfig]
    distortion: Optional[DistortionConfig]
    n_training_points: int = 1024
    pc_ratio: int = 4
    nearest_limit: float = 0.01
    shift_first: bool = False
    detach_ref_img: bool = True
    detach_gt_depth: bool = False
    detach_rgbs_scale: bool = False
    scale_pcs: bool = True
    use_sparse_depth_resample: bool = False  # GT-depth mode: resample rays until >=1 valid
    chamfer_tile: int = 512   # 256-2048 measure within ~0.1 ms/step on v5e;
    # 512 keeps the live (S, tile) d2 block smallest without adding sweep steps
    weight_decay: float = 0.0
    stratified_noise: bool = True  # per-interval jitter during training renders
    use_pallas_chamfer: bool = False  # VMEM-resident Chamfer argmin kernel

    @classmethod
    def from_cfg(cls, cfg: dict, num_cams: int) -> "ModelConfigs":
        t = cfg["training"]
        return cls(
            nerf=NerfConfig.from_cfg(cfg),
            render=RenderConfig.from_cfg(cfg),
            loss=LossConfig.from_cfg(cfg),
            pose=PoseConfig.from_cfg(cfg, num_cams) if cfg["pose"]["learn_pose"] else None,
            focal=FocalConfig.from_cfg(cfg) if cfg["pose"]["learn_focal"] else None,
            distortion=(DistortionConfig.from_cfg(cfg, num_cams)
                        if cfg["distortion"]["learn_distortion"] else None),
            n_training_points=t["n_training_points"],
            pc_ratio=t["pc_ratio"],
            nearest_limit=t["nearest_limit"],
            shift_first=t["shift_first"],
            detach_ref_img=t["detach_ref_img"],
            detach_gt_depth=t["detach_gt_depth"],
            detach_rgbs_scale=t["detach_rgbs_scale"],
            scale_pcs=t["scale_pcs"],
            use_sparse_depth_resample=cfg["dataloading"]["with_depth"],
            weight_decay=t["weight_decay"],
            # measured: the XLA lax.scan Chamfer matches the Pallas kernel's speed
            # on v5e (the K=3 matmuls underuse the MXU either way), so the kernel
            # stays opt-in
            use_pallas_chamfer=bool(cfg.get("tpu", {}).get("use_pallas_chamfer",
                                                           False)),
        )


@chex.dataclass
class TrainState:
    params: Dict[str, Any]          # {'nerf': ..., 'pose': ..., 'focal': ..., 'distortion': ...}
    opt_state: Dict[str, Any]       # matching optax states per group
    it: jax.Array                   # iteration counter (int32)
    rng: jax.Array                  # PRNG key threaded through steps


def make_optimizer(weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam *without* the lr baked in: the train step applies `params -= lr * update`
    with a traced lr argument, so the host can retune lr every epoch (the reference
    mutates param_group['lr'] likewise) without recompiling.

    Torch-Adam parity: weight decay is L2 added to the gradient BEFORE the moment
    updates (torch.optim.Adam semantics), hence add_decayed_weights comes first.
    """
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)


def apply_updates_with_lr(params, updates, lr):
    """params - lr * adam_update (lr is a traced scalar)."""
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)


def create_train_state(key: jax.Array, mc: ModelConfigs,
                       init_c2w=None, init_focal=None) -> Tuple[TrainState, Dict[str, optax.GradientTransformation]]:
    knerf, krng = jax.random.split(key)
    params: Dict[str, Any] = {"nerf": init_nerf_params(knerf, mc.nerf)}
    if mc.pose is not None:
        params["pose"] = init_pose_params(mc.pose, init_c2w=init_c2w)
    if mc.focal is not None:
        params["focal"] = init_focal_params(mc.focal, init_focal=init_focal)
    if mc.distortion is not None:
        params["distortion"] = init_distortion_params(mc.distortion)

    optimizers = {g: make_optimizer(mc.weight_decay if g == "nerf" else 0.0)
                  for g in params}
    opt_state = {g: optimizers[g].init(params[g]) for g in params}
    state = TrainState(params=params, opt_state=opt_state,
                       it=jnp.asarray(-1, jnp.int32), rng=krng)
    return state, optimizers
