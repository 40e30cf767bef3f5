"""Quality demonstration: joint NeRF + pose optimization from identity pose
initialization (no GT poses) with the full NoPe-NeRF loss stack — the core
capability (BASELINE.json north star). Prints PSNR and ATE trajectory over training.

Run: PYTHONPATH=. python scripts/demo_joint_pose_training.py
"""
import time, numpy as np, jax, jax.numpy as jnp
from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene, frame_iterator
from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state
from nope_nerf_tpu.models.poses import pose_c2w_all
from nope_nerf_tpu.evaluation.pose_eval import full_pose_evaluation
from nope_nerf_tpu.utils.metrics import mse2psnr

cfg = load_config(overrides={
    "training": {"n_training_points": 1024},
    "pose": {"learn_pose": True, "init_pose": False},  # start from identity!
    "tpu": {"use_pallas_renderer": True},
})
scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=8, h=120, w=160))).to_device()
mc = ModelConfigs.from_cfg(cfg, num_cams=8)
state, optimizers = create_train_state(jax.random.key(0), mc)
trainer = Trainer(cfg, mc, optimizers)

gt = np.asarray(scene.c2ws_gt)
def ate_now(state):
    learned = np.asarray(pose_c2w_all(state.params["pose"], mc.pose))
    return full_pose_evaluation(learned, gt)

m0 = ate_now(state)
print(f"initial: ATE_t {m0['ate_trans']:.4f} m, ATE_r {m0['ate_r_v2_deg']:.3f} deg", flush=True)

t0 = time.time()
for ep in range(400):
    l2s = []
    for batch in frame_iterator(scene, seed=ep):
        state, ld = trainer.step(state, batch, ep, scheduling_start=10000)
        l2s.append(ld["l2_mean"])
    if ep % 50 == 0 or ep == 399:
        m = ate_now(state)
        print(f"ep {ep:4d}: PSNR {float(mse2psnr(float(jnp.mean(jnp.stack(l2s))))):6.2f}  "
              f"ATE_t {m['ate_trans']:.4f}  ATE_r {m['ate_r_v2_deg']:.3f}deg  "
              f"pc {float(ld['loss_pc']):.4f} rgb_s {float(ld['loss_rgb_s']):.4f}  "
              f"({time.time()-t0:.0f}s)", flush=True)
m1 = ate_now(state)
print(f"final: ATE_t {m1['ate_trans']:.4f} m ({m0['ate_trans']:.4f} init), "
      f"ATE_r {m1['ate_r_v2_deg']:.3f} deg ({m0['ate_r_v2_deg']:.3f} init)")
