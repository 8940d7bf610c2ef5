"""pose3d_tpu — TPU-native framework for 3D-augmented contrastive knowledge
distillation for image-based object pose estimation.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the reference
PyTorch repo "3D-Augmented Contrastive Knowledge Distillation for Image-based
Object Pose Estimation" (ICMR 2022). The compute path is jit-compiled XLA with
optional Pallas TPU kernels; data parallelism rides a `jax.sharding.Mesh`.

Layering (see SURVEY.md §1/§7):
  geometry      — rotation algebra + Acc@pi/6 / MedErr metrics
  losses        — binned CE + delta regression, infoNCE/poseNCE family, KD losses
  models        — Flax ResNet / VGG / PointNet / DeformNet / pose estimators
  ops           — Pallas TPU kernels with XLA fallbacks
  parallel      — device mesh + sharding helpers
  data          — host-side datasets / transforms / loader (fixed-shape output)
  train         — jit'd train steps, trainers, single-pass category eval, ckpt
  cli           — flag-compatible entry points (training / trainingKD / testing / inference)
"""

__version__ = "0.1.0"

from pose3d_tpu import geometry  # noqa: F401
