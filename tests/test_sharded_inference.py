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


def test_tp_sharded_matches_single_device():
    """2x4 ('data','model') mesh — tensor-parallel channel sharding of both
    networks (mesh.shard_params_tp) + batch DP must reproduce the
    single-device outputs; GSPMD inserts the cross-shard collectives."""
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
        0, 255, (4, 120, 160, 3), dtype=np.uint8)

    single = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
    out1 = {k: np.asarray(v) for k, v in single(frames).items()}

    tp = ShardedPosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K,
                             cfg, n_devices=8, model_parallel=4)
    # weights really are distributed over the model axis
    tp_specs = [x.sharding.spec for x in
                jax.tree_util.tree_leaves(tp.kpd_params)]
    assert any(len(s) and s[-1] == "model" for s in tp_specs)
    out2 = {k: np.asarray(v) for k, v in tp(frames).items()}

    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_shard_params_tp_places_shards():
    from betapose_tpu.parallel import mesh as mesh_mod
    mesh = mesh_mod.make_mesh(8, model_parallel=4)
    w = jnp.zeros((3, 3, 16, 32))     # HWIO conv kernel
    v = jnp.zeros((32,))              # channel vector
    odd = jnp.zeros((3, 3, 16, 18))   # 18 % 4 != 0 -> replicated
    tree = {"w": w, "v": v, "odd": odd}
    out = mesh_mod.shard_params_tp(mesh, tree)
    def spec_of(x):
        return x.sharding.spec
    assert spec_of(out["w"])[-1] == "model"
    assert spec_of(out["v"])[-1] == "model"
    assert all(s is None for s in spec_of(out["odd"]))


def test_sharded_multi_candidate_matches_single_device():
    """det_capacity>1 now runs fully fused (device pose-NMS), so the
    multi-candidate graph shards over the mesh too — occlusion workloads
    scale across chips like capacity-1 (round-3 unlock)."""
    assert jax.device_count() >= 8
    spec = yolo_mod.build_spec(TINY_YOLO_CFG)
    yolo_params = yolo_mod.fold_bn(
        spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
    kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                     arch="resnet50")
    kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
    cfg = PipelineConfig(reso=96, inp_h=64, inp_w=32, out_h=16, out_w=8,
                         n_kp=6, left_keypoints=6, compute_dtype="float32",
                         pallas_decode=False, det_capacity=3,
                         confidence=0.0)
    frames = np.random.default_rng(2).integers(
        0, 255, (8, 120, 160, 3), dtype=np.uint8)

    single = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
    out1 = {k: np.asarray(v) for k, v in single(frames).items()}

    sharded = ShardedPosePipeline(spec, yolo_params, kpd_params, kp3d,
                                  CAM_K, cfg, n_devices=8)
    out2 = {k: np.asarray(v) for k, v in sharded(frames).items()}
    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_spatial_sharded_batch1_matches_single_device():
    """1x8 ('data','space') mesh — ONE frame's rows spread over 8 devices
    (spatial conv partitioning, GSPMD halo exchange).  The batch-1 latency
    scale-out: DP has nothing to split at batch 1; the 'space' axis does."""
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
    frames = np.random.default_rng(3).integers(
        0, 255, (1, 120, 160, 3), dtype=np.uint8)

    single = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
    out1 = {k: np.asarray(v) for k, v in single(frames).items()}

    sp = ShardedPosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K,
                             cfg, n_devices=8, spatial_parallel=8)
    assert dict(sp.mesh.shape) == {"data": 1, "space": 8}
    out2 = {k: np.asarray(v) for k, v in sp(frames).items()}
    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_dp_x_spatial_sharded_matches_single_device():
    """2x4 ('data','space') mesh: batch sharded two ways at once — frames
    across 'data', each frame's rows across 'space'."""
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
    frames = np.random.default_rng(4).integers(
        0, 255, (4, 120, 160, 3), dtype=np.uint8)

    single = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
    out1 = {k: np.asarray(v) for k, v in single(frames).items()}

    sp = ShardedPosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K,
                             cfg, n_devices=8, spatial_parallel=4)
    assert dict(sp.mesh.shape) == {"data": 2, "space": 4}
    out2 = {k: np.asarray(v) for k, v in sp(frames).items()}
    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_sharded_rejects_host_clustering_mode():
    spec = yolo_mod.build_spec(TINY_YOLO_CFG)
    cfg = PipelineConfig(det_capacity=3, host_pose_nms=True)
    with pytest.raises(ValueError, match="host"):
        ShardedPosePipeline(spec, {}, {}, np.zeros((6, 3)), CAM_K, cfg,
                            n_devices=8)
