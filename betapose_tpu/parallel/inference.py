"""Multi-chip inference: shard the fused pose pipeline over a device mesh.

Serving-scale path (BASELINE.md's v5e-8 target): frames are sharded on the
mesh 'data' axis, weights replicated — each chip runs the full fused graph
on its slice with zero cross-chip communication (embarrassingly parallel,
so throughput scales linearly with chips over ICI-attached hosts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from betapose_tpu.parallel import mesh as mesh_mod
from betapose_tpu.eval.pipeline import make_pose_step, PipelineConfig


class ShardedPosePipeline:
    """PosePipeline equivalent whose batches are sharded over a mesh.

    The global batch must be divisible by the mesh's 'data' size.

    model_parallel > 1 builds a 2-D ('data', 'model') mesh and shards the
    networks' channel dimensions over the model axis (tensor parallelism,
    `mesh.shard_params_tp`) in addition to batch DP — XLA/GSPMD inserts the
    cross-chip collectives.  For the stock model sizes DP alone is optimal
    (weights fit per-chip); TP is the scale-up path for wider variants.

    spatial_parallel > 1 adds a 'space' mesh axis and shards the image H
    dimension across it (spatial partitioning — the conv-workload analog of
    context parallelism, SURVEY.md section 5.7; absent in the reference).
    GSPMD partitions every convolution spatially and inserts the halo
    exchanges over ICI.  This is the LATENCY scale-out: a single frame's
    conv work spreads over chips where DP has nothing to split (batch-1
    serving).  Composes with DP (('data','space') mesh) and with TP."""

    def __init__(self, spec, yolo_params, kpd_params, kp3d, cam_K,
                 cfg: PipelineConfig | None = None, mesh=None,
                 n_devices=None, model_parallel: int = 1,
                 spatial_parallel: int = 1):
        self.cfg = cfg or PipelineConfig()
        if self.cfg.det_capacity > 1 and self.cfg.host_pose_nms:
            raise ValueError(
                "ShardedPosePipeline runs fully fused graphs; the "
                "reference-style host clustering (host_pose_nms=True) "
                "breaks the graph — use PosePipeline, or the default "
                "device pose-NMS (host_pose_nms=False)")
        self.mesh = mesh or mesh_mod.make_mesh(n_devices, model_parallel,
                                               spatial_parallel)
        self.spec = spec
        if model_parallel > 1 or "model" in self.mesh.shape:
            self.yolo_params = mesh_mod.shard_params_tp(self.mesh,
                                                        yolo_params)
            self.kpd_params = mesh_mod.shard_params_tp(self.mesh, kpd_params)
        else:
            self.yolo_params = mesh_mod.replicate(self.mesh, yolo_params)
            self.kpd_params = mesh_mod.replicate(self.mesh, kpd_params)
        self.kp3d = mesh_mod.replicate(self.mesh,
                                       jnp.asarray(kp3d, jnp.float32))
        self.cam_K = mesh_mod.replicate(self.mesh,
                                        jnp.asarray(cam_K, jnp.float32))
        step = make_pose_step(spec, self.cfg)
        self._step = jax.jit(step)

    def __call__(self, frames_u8):
        frames = mesh_mod.shard_frames(self.mesh, jnp.asarray(frames_u8))
        return self._step(self.yolo_params, self.kpd_params, frames,
                          self.kp3d, self.cam_K)
