"""sgv3d_tpu — TPU-native (JAX/XLA/Pallas) roadside 3D detection framework.

A ground-up rebuild of the capabilities of yanglei18/SGV3D (BEVHeight + SGV3D
model families, DAIR-V2X-I / Rope3D datasets, KITTI R40 AP evaluation) designed
for TPU hardware: functional core, NHWC layouts, jit-compiled train/eval steps,
SPMD data parallelism over a `jax.sharding.Mesh`, and a fused lift-splat voxel
pooling path that never materialises the B*C*D*H*W outer-product tensor.
"""

__version__ = "0.1.0"
