"""gstk_tpu — a TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the Gaussian-Splatting-Toolkit
(reference: /root/reference) for TPU hardware:

- The differentiable tile rasterizer (reference: CUDA kernels under
  ``gs_toolkit/gs_components/rasterizer/cuda/csrc``) is re-built as a fully
  on-device JAX pipeline: vectorized EWA projection, static-capacity
  intersection binning via ``jax.lax.sort``, and front-to-back compositing
  expressed as exclusive cumprods + matmuls (MXU-friendly), with Pallas TPU
  kernels for the hot tile loop.
- Training (reference: ``gs_toolkit/engine/trainer.py``) is a jitted,
  shard_map-able train step with optax multi-transform optimizers and
  static-shape adaptive density control (padded capacity + alive masks).
- Multi-device scaling uses ``jax.sharding.Mesh`` + collectives instead of
  NCCL/DDP.
"""

__version__ = "0.1.0"
