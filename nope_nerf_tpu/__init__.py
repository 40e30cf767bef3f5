"""nope_nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of js0n-lai/my-nope-nerf.

A depth-supervised, pose-free neural radiance field framework for autonomous-driving
scenes (Virtual KITTI and LLFF-format datasets), built from scratch for TPU:

- the compute path (ray generation, stratified sampling, the positional-encoded NeRF MLP,
  alpha compositing, and all losses) is pure JAX, jitted end-to-end into a single
  XLA program per train step, with a fused Pallas kernel for the render inner loop;
- camera poses are per-frame se(3) parameters mapped through a Rodrigues exp-map;
- depth priors carry per-frame learnable scale/shift distortions;
- rays are the sharded axis: `shard_map` over a ('data',) device mesh with psum
  gradient all-reduce over ICI scales the trainer to a pod slice.

Reference capability map: see SURVEY.md at the repo root. Reference file:line citations
in the docstrings point into /root/reference (the PyTorch implementation this framework
is capability-parity with, but shares no code or architecture with).
"""

__version__ = "0.1.0"
