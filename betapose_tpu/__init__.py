"""betapose_tpu — a TPU-native (JAX/XLA/Pallas) 6D object-pose estimation framework.

Re-implements the full capability surface of the Betapose pipeline
("Estimating 6D Pose From Localizing Designated Surface Keypoints",
arXiv 1812.01387) as a from-scratch TPU-first design:

- Stage 1: keypoint designation (3D SIFT over mesh point clouds) — `tools/designator`
- Stage 2: keypoint annotation (z-buffer projection, h5 packing)  — `tools/annotator`
- Stage 3: runtime 6D pose estimation — YOLOv3 detection, KPD keypoint
  heatmap regression (SE-ResNet101 + DUC), heatmap peak decoding,
  parametric pose-NMS, and batched PnP — fused into a single jit'd
  device graph (`eval/pipeline.py`), plus pjit/shard_map training for
  both networks (`train/`).

Layout is NHWC; compute dtype is bfloat16 on the matmul path with
float32 accumulation; multi-chip scaling is expressed with
`jax.sharding.Mesh` + `shard_map`, never with host-staged transfers.
"""

__version__ = "0.1.0"
