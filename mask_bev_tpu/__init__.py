"""maskbev-tpu: TPU-native BEV instance-mask LiDAR detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
norlab-ulaval/mask_bev (reference at /root/reference): joint LiDAR object
detection and footprint completion as bird's-eye-view instance-mask
prediction.

Package layout:
  - ``config``      flat dataclass configs (YAML-compatible with the reference keys)
  - ``ops``         TPU-native compute primitives (pillarization, Hungarian,
                    point sampling, morphology, rotated IoU)
  - ``models``      flax model stack (pillar encoder, Swin backbone, pixel
                    decoder, Mask2Former-style decoder)
  - ``losses``      matching + CE/mask/dice(/height) losses, fully batched
  - ``train``       train loop, optimizers/schedules, checkpoints, metrics
  - ``parallel``    mesh/sharding helpers, pjit train/eval steps
  - ``datasets``    host-side numpy data layer (KITTI, SemanticKITTI, Waymo)
  - ``augmentations`` vectorized numpy augmentations incl. GT-paste
  - ``evaluation``  AP / mask IoU / official KITTI AP
"""

__version__ = "0.1.0"
