"""det3d_tpu: TPU-native 3D object detection framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of Det3D
(VoxelNet/SECOND, PointPillars, CBGS on KITTI/nuScenes/Lyft): on-device
voxelization and target assignment, mesh-parallel training via pjit/shard_map,
fused rotated-IoU/NMS, orbax checkpointing.
"""

__version__ = "0.1.0"
