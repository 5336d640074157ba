"""flope_tpu: a TPU-native flower pose estimation framework.

Re-creation of the capabilities of wvu-irl/flope (the `sunflower` package) as a
JAX/XLA/Pallas framework designed for TPU hardware: the whole per-frame
detect -> segment -> crop -> PoseNet -> depth-lift -> track computation compiles
to fused fixed-shape XLA programs, scaled across chips with jax.sharding.

Layers (bottom-up):
  geometry/  pure-JAX rotation + projective geometry core
  ops/       batched preprocessing kernels (crop+resize on the MXU, erosion,
             masked depth pooling, NMS)
  models/    PoseNet (ResNet-18 + 9D SO(3) head), YOLO11-seg detector
  pipeline/  the fused per-frame predictor graph (fixed MAX_DET + validity masks)
  tracking/  multi-view fusion: closed-form 7D Kalman table + weighted averaging
  train/     pjit data-parallel training (chordal loss, angle metrics)
  parallel/  device mesh + sharding helpers
  data/      dataset layout, loaders, synthetic scene generator, augmentation
  eval/      the reference-defined metric suite (angle/trans error, success
             rates, DICE) + throughput benchmarks
"""

__version__ = "0.1.0"
