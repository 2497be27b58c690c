"""xchu_slam_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
xchu_slam system (ROS/C++/PCL/GTSAM): point-cloud filtering, NDT
scan-to-localmap odometry, Scan Context / Intensity Scan Context / radius
loop-closure retrieval with ICP verification, and pose-graph optimization —
all as fixed-shape, jit-compiled device programs scalable over a
`jax.sharding.Mesh`.
"""

from xchu_slam_tpu.config import SlamConfig, default_config, tiny_config
from xchu_slam_tpu.types import Cloud, KeyframeStore, VoxelGrid, make_cloud

__version__ = "0.1.0"

__all__ = [
    "SlamConfig",
    "default_config",
    "tiny_config",
    "Cloud",
    "VoxelGrid",
    "KeyframeStore",
    "make_cloud",
]
