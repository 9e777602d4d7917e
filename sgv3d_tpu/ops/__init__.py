from sgv3d_tpu.ops.voxel_pooling import voxel_pooling, lift_splat_pool

__all__ = ["voxel_pooling", "lift_splat_pool"]
