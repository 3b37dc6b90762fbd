"""YOLO training driver.

Counterpart of darknet's `train_detector` (`detector.c:38-232`) on the TPU
stack: .data/.cfg/.weights triplet, resume-from-weights, burn-in + steps LR,
crop-jitter/flip/HSV augmentation on device, weight snapshots into backup/
every 100 iterations (byte-compatible .weights), NaN loss guard
(`detector.c:197` resets the running average on NaN), and multi-chip DP over
the device mesh (replacing the host-staged weight averaging of
`network_kernels.cu:372-421`; `-gpus a,b,...` maps to mesh size).

Random-resize training (`detector.c:131-161`: every 10 iters pick a random
net resolution +-40% snapped to /32) is realized with a static bucket set —
each bucket is one compiled graph; buckets cycle every 10 iterations.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.train import yolo_train
from betapose_tpu.parallel import mesh as mesh_mod


def _net_cfg_options(spec):
    net = spec.net_info
    get = lambda k, d: type(d)(net.get(k, d))
    steps = tuple(int(s) for s in str(net.get("steps", "3000,5000")).split(","))
    scales = tuple(float(s) for s in str(net.get("scales", ".1,.1")).split(","))
    return yolo_train.YoloTrainConfig(
        lr=get("learning_rate", 1e-3),
        burn_in=get("burn_in", 1000),
        steps=steps, scales=scales,
        momentum=get("momentum", 0.9),
        decay=get("decay", 5e-4),
        max_batches=get("max_batches", 6100),
        jitter=0.3,
        hue=get("hue", 0.1),
        saturation=get("saturation", 1.5),
        exposure=get("exposure", 1.5),
    )


def resolution_buckets(base: int, span: float = 0.4, n: int = 3):
    """Static analog of darknet random-resize: n resolutions within
    +-span of base, snapped to /32."""
    lo = int(base * (1 - span)) // 32 * 32
    hi = int(base * (1 + span)) // 32 * 32
    if n == 1:
        return [base]
    step = max(32, (hi - lo) // (n - 1) // 32 * 32)
    buckets = sorted({min(hi, lo + i * step) for i in range(n)} | {base})
    return list(buckets)


def train_from_data_cfg(data_path, cfg_path, weights_path=None,
                        clear=False, n_devices=None, batch=None,
                        snapshot_every=100, log_every=1,
                        resize_buckets=3, max_batches=None,
                        precision=None):
    from betapose_tpu.tools.darknet_cli import read_data_cfg

    opts = read_data_cfg(data_path)
    backup = opts.get("backup", "backup")
    os.makedirs(backup, exist_ok=True)
    with open(cfg_path) as f:
        cfg_text = f.read()
    spec = yolo_mod.build_spec(cfg_text)
    tcfg = _net_cfg_options(spec)
    if max_batches is not None:
        tcfg.max_batches = max_batches
    net = spec.net_info
    base_reso = int(net.get("width", 416))
    global_batch = batch or int(net.get("batch", 64))
    base_name = os.path.splitext(os.path.basename(cfg_path))[0]

    params = None
    seen = 0
    if weights_path and os.path.exists(weights_path):
        params, header = yolo_mod.load_darknet_weights(spec, weights_path)
        seen = 0 if clear else int(header[3])
        print(f"Resuming from {weights_path} (seen={seen})")
    else:
        params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)

    tx = yolo_train.make_optimizer(tcfg)
    opt_state = tx.init(params)
    opt_state = yolo_train.fast_forward_opt_state(
        opt_state, seen // global_batch)

    mesh = mesh_mod.make_mesh(n_devices)
    params = mesh_mod.replicate(mesh, params)
    opt_state = mesh_mod.replicate(mesh, opt_state)

    buckets = resolution_buckets(base_reso, n=resize_buckets) \
        if int(net.get("random", 0)) else [base_reso]
    precision = precision or yolo_train.DEFAULT_TRAIN_PRECISION
    steps_by_reso = {
        r: yolo_train.make_train_step(spec, tx, r, r, donate=False,
                                      matmul_precision=precision)
        for r in buckets}
    print(f"resolution buckets: {buckets}")
    has_dropout = any(l.kind == "dropout" for l in spec.layers)

    paths, truths = yolo_train.load_darknet_labels(
        opts["train"], max_boxes=tcfg.max_boxes)
    print(f"{len(paths)} training images")
    from betapose_tpu.data.loader import imread_rgb

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    start_iter = seen // global_batch
    avg_loss = -1.0
    cur_reso = base_reso
    import concurrent.futures as cf
    pool = cf.ThreadPoolExecutor(8)

    def load_batch(idxs):
        imgs = list(pool.map(
            lambda i: imread_rgb(paths[i]).astype(np.float32) / 255.0, idxs))
        return np.stack(imgs), truths[idxs]

    pending = None
    for it in range(start_iter, tcfg.max_batches):
        if it % 10 == 0 and len(buckets) > 1:
            cur_reso = buckets[rng.integers(len(buckets))]
        idxs = rng.integers(0, len(paths), global_batch)
        imgs_host, truths_host = load_batch(idxs)
        key, k1, k_drop = jax.random.split(key, 3)
        batch_dev = mesh_mod.shard_batch(mesh, {
            "imgs": imgs_host, "truths": truths_host})
        aug_imgs, aug_truths = yolo_train.augment_detection_batch(
            k1, batch_dev["imgs"], batch_dev["truths"], tcfg,
            cur_reso, cur_reso)
        t0 = time.time()
        params, opt_state, m = steps_by_reso[cur_reso](
            params, opt_state, aug_imgs, aug_truths,
            np.int32((it + 1) * global_batch),
            dropout_key=(k_drop if has_dropout else None))
        loss = float(m["loss"])
        if not np.isfinite(loss):
            # darknet NaN guard (detector.c:197): reset the average
            avg_loss = -1.0
            print(f"{it}: loss is NaN — skipping average update")
        else:
            avg_loss = loss if avg_loss < 0 else avg_loss * 0.9 + loss * 0.1
        if it % log_every == 0:
            print(f"{it}: {loss:.6f}, {avg_loss:.6f} avg, "
                  f"reso {cur_reso}, {time.time() - t0:.3f} s")
        if snapshot_every and it > 0 and it % snapshot_every == 0:
            out = os.path.join(backup, f"{base_name}_{it}.weights")
            yolo_mod.save_darknet_weights(
                spec, jax.device_get(params), out,
                seen=(it + 1) * global_batch)
            print(f"Saving weights to {out}")
    out = os.path.join(backup, f"{base_name}_final.weights")
    yolo_mod.save_darknet_weights(spec, jax.device_get(params), out,
                                  seen=tcfg.max_batches * global_batch)
    print(f"Saving weights to {out}")
    return params


if __name__ == "__main__":
    import sys
    train_from_data_cfg(*sys.argv[1:4])
