"""pagnerf_tpu — a TPU-native panoptic neural radiance field framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of PAg-NeRF
(Agricultural-Robotics-Bonn/pagnerf) plus the kaolin-wisp runtime surface it consumes:
multiresolution hash / permutohedral feature grids, occupancy-skipping volume tracing,
panoptic (semantic + instance) neural fields with delta-grid corrections, online
bundle adjustment, linear-assignment instance losses, and a config-driven trainer —
all designed for TPU (dense static layouts, jit end-to-end, ray-sharded data
parallelism over a device mesh).
"""

__version__ = "0.1.0"
