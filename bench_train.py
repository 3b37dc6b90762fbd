"""Single-chip training-throughput benchmark (VERDICT r2 #5): steady-state
imgs/sec for

- the KPD train step: FastPose SE-ResNet101 @ 320x256, batch 28, adam,
  on-device DPG augmentation in the measured loop (the reference's
  `train_KPD/src/train.py` + `utils/pose.py` path; its perf surface is the
  tensorboardX per-iter scalars, SURVEY.md section 6);
- the YOLO train step: YOLOv3-416, batch 64, crop-jitter/flip/HSV
  augmentation in the measured loop (the reference's perf surface is
  darknet's per-batch seconds print, `detector.c:201`).

Prints ONE JSON line.  Run it on the TPU (no env overrides) or on CPU for
a smoke check: BENCH_TRAIN_ITERS=2 JAX_PLATFORMS=cpu python bench_train.py
"""

import json
import os
import sys
import time

import numpy as np


def _bench_kpd(jax, jnp, iters, warmup, batch=28, precision=None):
    from betapose_tpu.models import kpd as kpd_mod
    from betapose_tpu.train import kpd_train
    from betapose_tpu.train.augment import AugmentConfig, augment_batch

    params = kpd_mod.init_params(jax.random.PRNGKey(0), n_classes=50,
                                 arch="resnet101")
    tx = kpd_train.make_optimizer("adam", lr=2.5e-4)
    opt_state = tx.init(params)
    step = kpd_train.make_train_step(
        tx, out_res_h=80,
        matmul_precision=precision or kpd_train.DEFAULT_TRAIN_PRECISION)
    aug_cfg = AugmentConfig(add_dpg=True)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, 480, 640, 3), np.float32))
    bndbox = jnp.asarray(
        np.tile(np.array([120.0, 90.0, 420.0, 360.0], np.float32),
                (batch, 1)))
    part = jnp.asarray(rng.uniform(140, 340, (batch, 50, 2)).astype(
        np.float32))
    key = jax.random.PRNGKey(1)

    def one_iter(params, opt_state, key):
        key, k1 = jax.random.split(key)
        b = augment_batch(k1, imgs, bndbox, part, aug_cfg)
        params, opt_state, m = step(params, opt_state, b)
        return params, opt_state, key, m

    for _ in range(warmup):
        params, opt_state, key, m = one_iter(params, opt_state, key)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, key, m = one_iter(params, opt_state, key)
    jax.device_get(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt, float(m["loss"])


def _bench_yolo(jax, jnp, iters, warmup, batch=64, reso=416,
                precision=None):
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.models.darknet_cfg import make_yolov3_cfg
    from betapose_tpu.train import yolo_train

    spec = yolo_mod.build_spec(make_yolov3_cfg(num_classes=1))
    params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
    cfg = yolo_train.YoloTrainConfig()
    tx = yolo_train.make_optimizer(cfg)
    opt_state = tx.init(params)
    step = yolo_train.make_train_step(
        spec, tx, reso, reso,
        matmul_precision=precision or yolo_train.DEFAULT_TRAIN_PRECISION)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, reso, reso, 3), np.float32))
    truths = np.zeros((batch, 10, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.3, 0.4, 0.0]
    truths = jnp.asarray(truths)
    key = jax.random.PRNGKey(1)

    def one_iter(params, opt_state, key):
        key, k1 = jax.random.split(key)
        aug_imgs, aug_truths = yolo_train.augment_detection_batch(
            k1, imgs, truths, cfg, reso, reso)
        params, opt_state, m = step(params, opt_state, aug_imgs, aug_truths)
        return params, opt_state, key, m

    for _ in range(warmup):
        params, opt_state, key, m = one_iter(params, opt_state, key)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, key, m = one_iter(params, opt_state, key)
    jax.device_get(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt, float(m["loss"])


def main():
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_TRAIN_WARMUP", "3"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from betapose_tpu.train.kpd_train import DEFAULT_TRAIN_PRECISION
    precision = os.environ.get("BENCH_TRAIN_PRECISION") \
        or DEFAULT_TRAIN_PRECISION
    kpd_ips, kpd_loss = _bench_kpd(jax, jnp, iters, warmup,
                                   precision=precision)
    yolo_ips, yolo_loss = _bench_yolo(jax, jnp, iters, warmup,
                                      precision=precision)
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "kpd_train_ips": round(kpd_ips, 2),
        "kpd_batch": 28,
        "kpd_loss_finite": bool(np.isfinite(kpd_loss)),
        "yolo_train_ips": round(yolo_ips, 2),
        "yolo_batch": 64,
        "yolo_loss_finite": bool(np.isfinite(yolo_loss)),
        "train_precision": precision,
        "device": str(jax.devices()[0].device_kind),
        "note": ("steady-state imgs/sec, single chip, augmentation "
                 "included in the measured loop (DPG for KPD, "
                 "crop-jitter/flip/HSV for YOLO)"),
    }))


if __name__ == "__main__":
    main()
