"""cspn_tpu: a TPU-native convolutional spatial propagation network engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
XinJCheng/CSPN reference (depth completion on NYU-v2/KITTI with 2D CSPN,
3D CSPN over stereo cost volumes), redesigned TPU-first:

- the 24-step CSPN recurrence is a fused Pallas kernel that keeps the whole
  propagation state in VMEM (one HBM read + one write instead of 24),
- models are Flax/NHWC with parameterized geometry,
- scaling is expressed over a `jax.sharding.Mesh` (data parallel +
  spatially-sharded propagation with halo exchange), not CUDA/NCCL.
"""

__version__ = "0.1.0"
