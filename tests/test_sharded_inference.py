"""Multi-chip (simulated) sharded inference: 8-device mesh output equals
single-device output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig
from betapose_tpu.parallel.inference import ShardedPosePipeline

TINY_YOLO_CFG = """
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=1
num=3
ignore_thresh = .7
"""

CAM_K = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]])


def test_sharded_matches_single_device():
    assert jax.device_count() >= 8
    spec = yolo_mod.build_spec(TINY_YOLO_CFG)
    yolo_params = yolo_mod.fold_bn(
        spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
    kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                     arch="resnet50")
    kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
    cfg = PipelineConfig(reso=96, inp_h=64, inp_w=32, out_h=16, out_w=8,
                         n_kp=6, left_keypoints=6, compute_dtype="float32",
                         pallas_decode=False)
    frames = np.random.default_rng(1).integers(
        0, 255, (8, 120, 160, 3), dtype=np.uint8)

    single = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
    out1 = {k: np.asarray(v) for k, v in single(frames).items()}

    sharded = ShardedPosePipeline(spec, yolo_params, kpd_params, kp3d,
                                  CAM_K, cfg, n_devices=8)
    out2 = {k: np.asarray(v) for k, v in sharded(frames).items()}

    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)
