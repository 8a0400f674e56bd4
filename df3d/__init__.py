"""df3d — TPU-native 3D Dual-Fusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rasd3/3D-Dual-Fusion (camera+LiDAR 3D detection: Voxel R-CNN / CenterPoint /
TransFusion-L hosts + the dual-query deformable fusion core), designed
TPU-first: static shapes everywhere, sparse conv as gather-GEMM-scatter on
the MXU, fusion attention as Pallas kernels, data parallelism via
jax.sharding meshes.

Layout:
  df3d.core      pure-JAX geometry: boxes, rotated IoU, NMS, coders, targets
  df3d.ops       voxelization, sparse tensors/convs, point ops, Pallas kernels
  df3d.models    VFEs, 3D/2D backbones, image nets, fusion core, heads, detectors
  df3d.data      dataset infos, augmentation, input pipeline
  df3d.train     trainer, schedules, checkpointing
  df3d.parallel  device-mesh / sharding helpers
  df3d.config    unified config schema for all three reference stacks
"""

__version__ = "0.1.0"
