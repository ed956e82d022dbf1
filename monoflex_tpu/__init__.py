"""monoflex_tpu: a TPU-native monocular 3D object detection framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of MonoFlex
(CVPR 2021): KITTI data pipeline with geometric target encoding, DLA-34 +
deformable-conv neck, multi-head prediction tower with edge fusion,
uncertainty-weighted multi-task losses, on-device decoding, official-metric
KITTI AP evaluation, and pjit/mesh data-parallel training.
"""

__version__ = "0.1.0"
