"""End-to-end throughput benchmark: frames/sec of the fused pose pipeline
(YOLOv3-416 detect -> crop -> FastPose SE-ResNet101 -> heatmap decode ->
PnP) on LineMod-shaped 480x640 frames, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the >=500 fps/chip north star, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.models import kpd as kpd_mod
    from betapose_tpu.models.darknet_cfg import make_yolov3_cfg
    from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig

    spec = yolo_mod.build_spec(make_yolov3_cfg(num_classes=1))
    yolo_params = yolo_mod.fold_bn(
        spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
    kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=50,
                                     arch="resnet101")
    rng = np.random.default_rng(0)
    kp3d = rng.standard_normal((50, 3)) * 0.05
    cam_K = np.array([[572.4114, 0.0, 325.2611],
                      [0.0, 573.57043, 242.04899],
                      [0.0, 0.0, 1.0]])
    pipe = PosePipeline(spec, yolo_params, kpd_params, kp3d, cam_K,
                        PipelineConfig())

    frames = rng.integers(0, 255, (batch, 480, 640, 3), dtype=np.uint8)
    frames_dev = jax.device_put(jnp.asarray(frames))

    # compile + warmup
    for _ in range(warmup):
        out = pipe(frames_dev)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(frames_dev)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "e2e_linemod_pose_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
