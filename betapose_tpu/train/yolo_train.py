"""YOLOv3 training: darknet-semantics trainer on the TPU stack.

Reference: `train_YOLO/src/detector.c:38-232` train_detector +
`src/data.c:811-862` load_data_detection + `src/network.c` SGD.

Mapped behaviors:
- SGD with momentum 0.9, weight decay 0.0005 (cfg [net]);
- LR policy: burn-in (lr * (it/burn_in)^4, network.c get_current_rate) then
  'steps' decays x0.1 at the cfg milestones;
- augmentation (on device, batched): random crop-jitter +-30% per side
  (jitter=0.3), random horizontal flip, HSV distortion (hue +-0.1,
  saturation/exposure 1/1.5..1.5) — the geometry matches
  `load_data_detection`'s crop/placement math; boxes are re-normalized to
  the cropped viewport and clipped (`data.c:fill_truth_detection`);
- random-resize training (`detector.c:131-161`, every 10 iters +-40%
  snapped to /32): realized as a static set of bucketed resolutions cycled
  by the caller (each bucket is its own compiled graph — XLA needs static
  shapes; behavioral analog without per-iteration recompiles);
- multi-chip DP via mesh sharding (replaces `train_networks`'s host-staged
  weight averaging);
- checkpoints: darknet-format .weights snapshots every N iters
  (`detector.c:210-218` semantics, byte-compatible files).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.train.kpd_train import DEFAULT_TRAIN_PRECISION
from betapose_tpu.train.yolo_loss import yolo_loss


@dataclasses.dataclass
class YoloTrainConfig:
    lr: float = 1e-3
    burn_in: int = 1000
    steps: tuple = (3000, 5000)
    scales: tuple = (0.1, 0.1)
    momentum: float = 0.9
    decay: float = 5e-4
    max_batches: int = 6100
    jitter: float = 0.3
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5
    flip: bool = True
    max_boxes: int = 10
    ignore_thresh: float = 0.7


def lr_schedule(cfg: YoloTrainConfig):
    """darknet get_current_rate for policy=steps with burn_in
    (network.c:110-140)."""
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        rate = jnp.asarray(cfg.lr, jnp.float32)
        burn = jnp.where(
            step < cfg.burn_in,
            cfg.lr * jnp.power(step / max(cfg.burn_in, 1), 4.0), cfg.lr)
        for s, sc in zip(cfg.steps, cfg.scales):
            rate = jnp.where(step > s, rate * sc, rate)
        return jnp.where(step < cfg.burn_in, burn, rate)
    return lr


def _leaf_key(path):
    return getattr(path[-1], "key", None)


def _decay_mask(params):
    """darknet decays only conv weights (convolutional_layer.c
    update_convolutional_layer: `axpy(-decay*batch, l.weights)`; biases and
    BN scale/bias/stats are never decayed)."""
    return jax.tree_util.tree_map_with_path(
        lambda pth, _: _leaf_key(pth) == "w", params)


def _trainable_mask(params):
    """BN rolling mean/var are buffers updated by apply_bn_updates, not
    optimizer-driven parameters — keep SGD (and decay) off them."""
    return jax.tree_util.tree_map_with_path(
        lambda pth, _: _leaf_key(pth) not in ("bn_mean", "bn_var"), params)


def make_optimizer(cfg: YoloTrainConfig):
    sched = lr_schedule(cfg)
    tx = optax.chain(
        optax.masked(optax.add_decayed_weights(cfg.decay), _decay_mask),
        optax.sgd(learning_rate=sched, momentum=cfg.momentum),
    )
    return optax.masked(tx, _trainable_mask)


def fast_forward_opt_state(opt_state, start_iter: int):
    """Resume semantics: darknet's get_current_rate reads net.seen, so a
    resumed run continues the LR schedule mid-curve.  optax schedule
    counters start at 0 on tx.init — set them to the resumed iteration,
    otherwise burn-in re-ramps and poly/step schedules restart (while the
    PRINTED rate, computed from the loop index, looks right)."""
    if start_iter <= 0:
        return opt_state
    try:
        return optax.tree_utils.tree_set(
            opt_state, count=jnp.asarray(start_iter, jnp.int32))
    except KeyError:          # stateless schedule (constant lr)
        return opt_state


# ---------------------------------------------------------------------------
# On-device detection augmentation
# ---------------------------------------------------------------------------

def _rgb_to_hsv(rgb):
    return jax.vmap(jax.vmap(_px_rgb2hsv))(rgb)


def _px_rgb2hsv(px):
    r, g, b = px[0], px[1], px[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    s = jnp.where(mx > 0, d / jnp.maximum(mx, 1e-12), 0.0)
    rc = jnp.where(d > 0, (mx - r) / jnp.maximum(d, 1e-12), 0.0)
    gc = jnp.where(d > 0, (mx - g) / jnp.maximum(d, 1e-12), 0.0)
    bc = jnp.where(d > 0, (mx - b) / jnp.maximum(d, 1e-12), 0.0)
    h = jnp.where(mx == r, bc - gc,
                  jnp.where(mx == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(d > 0, h, 0.0)
    return jnp.stack([h, s, mx])


def _px_hsv2rgb(px):
    h, s, v = px[0] * 6.0, px[1], px[2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    idx = (i.astype(jnp.int32)) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [v, q, p, p, t], v)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [t, v, v, q, p], p)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [p, p, t, v, v], q)
    return jnp.stack([r, g, b])


def _hsv_to_rgb(hsv):
    return jax.vmap(jax.vmap(_px_hsv2rgb))(hsv)


def distort_hsv(key, img, hue, sat, expo):
    """darknet random_distort_image (image.c:1693): random hue shift in
    [-hue, hue], saturation/exposure scaled by s in [1, x] or 1/s."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dhue = jax.random.uniform(k1, minval=-hue, maxval=hue)

    def rand_scale(ka, kb, up):
        s = jax.random.uniform(ka, minval=1.0, maxval=up)
        inv = jax.random.uniform(kb) > 0.5
        return jnp.where(inv, 1.0 / s, s)

    dsat = rand_scale(k2, k3, sat)
    dexp = rand_scale(k4, k5, expo)
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + dhue) % 1.0
    s = jnp.clip(hsv[..., 1] * dsat, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * dexp, 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def crop_jitter(key, img, boxes, box_valid, jitter, out_h, out_w):
    """darknet crop-jitter: sample dl/dr/dt/db ~ U(-jitter, jitter) * dim,
    crop viewport [l, w-r] x [t, h-b], resize to net dims, remap boxes.
    img: [H,W,3]; boxes [T,5] normalized (x,y,w,h,cls)."""
    h, w, _ = img.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dw, dh = jitter * w, jitter * h
    pleft = jax.random.uniform(k1, minval=-dw, maxval=dw)
    pright = jax.random.uniform(k2, minval=-dw, maxval=dw)
    ptop = jax.random.uniform(k3, minval=-dh, maxval=dh)
    pbot = jax.random.uniform(k4, minval=-dh, maxval=dh)
    swidth = w - pleft - pright
    sheight = h - ptop - pbot

    # sample grid over the jittered viewport (zero padding outside); the
    # resampling is axis-aligned -> separable -> two matmuls on the MXU
    # (gathers are ~100x slower on TPU)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * sheight \
        + ptop - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * swidth \
        + pleft - 0.5
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.clip(1.0 - jnp.abs(ys[:, None] - rows[None, :]), 0.0)
    wx = jnp.clip(1.0 - jnp.abs(xs[:, None] - cols[None, :]), 0.0)
    with jax.default_matmul_precision("float32"):
        tmp = jnp.einsum("ih,hwc->iwc", wy, img)
        out = jnp.einsum("jw,iwc->ijc", wx, tmp)

    # flip
    do_flip = jax.random.uniform(k5) < 0.5
    out = jnp.where(do_flip, out[:, ::-1, :], out)

    # remap boxes: x' = (x*w - pleft)/swidth
    bx = (boxes[:, 0] * w - pleft) / swidth
    by = (boxes[:, 1] * h - ptop) / sheight
    bw = boxes[:, 2] * w / swidth
    bh = boxes[:, 3] * h / sheight
    bx = jnp.where(do_flip, 1.0 - bx, bx)
    # clip to viewport (fill_truth_detection constrains boxes to [0,1])
    x1 = jnp.clip(bx - bw / 2, 0.0, 1.0)
    x2 = jnp.clip(bx + bw / 2, 0.0, 1.0)
    y1 = jnp.clip(by - bh / 2, 0.0, 1.0)
    y2 = jnp.clip(by + bh / 2, 0.0, 1.0)
    nbx = (x1 + x2) / 2
    nby = (y1 + y2) / 2
    nbw = x2 - x1
    nbh = y2 - y1
    valid = box_valid & (nbw > 0.001) & (nbh > 0.001)
    new_boxes = jnp.stack(
        [jnp.where(valid, nbx, 0.0), jnp.where(valid, nby, 0.0),
         jnp.where(valid, nbw, 0.0), jnp.where(valid, nbh, 0.0),
         boxes[:, 4]], axis=1)
    return out, new_boxes


_AUG_CACHE = {}


def augment_detection_batch(key, imgs, truths, cfg: YoloTrainConfig,
                            out_h: int, out_w: int):
    """imgs: [B,H,W,3] float [0,1]; truths [B,T,5] normalized.
    Returns (images [B,out_h,out_w,3], truths').  The batched augmentation
    is jit-compiled (cached per config/shape) — running it eagerly costs
    hundreds of per-op dispatches per step."""
    sig = (cfg.jitter, cfg.hue, cfg.saturation, cfg.exposure, out_h, out_w)
    fn = _AUG_CACHE.get(sig)
    if fn is None:
        def batch_fn(key, imgs, truths):
            def one(k, img, tr):
                k1, k2 = jax.random.split(k)
                valid = tr[:, 0] != 0
                img2, tr2 = crop_jitter(k1, img, tr, valid, cfg.jitter,
                                        out_h, out_w)
                img2 = distort_hsv(k2, img2, cfg.hue, cfg.saturation,
                                   cfg.exposure)
                return img2, tr2

            keys = jax.random.split(key, imgs.shape[0])
            return jax.vmap(one)(keys, imgs, truths)

        fn = jax.jit(batch_fn)
        _AUG_CACHE[sig] = fn
    return fn(key, imgs, truths)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_train_step(spec, tx, net_w: int, net_h: int, donate: bool = True,
                    matmul_precision: str = DEFAULT_TRAIN_PRECISION):
    """matmul_precision: MXU mode for the conv forward+backward —
    'bfloat16' (1-pass bf16 multiplies, f32 accumulation; ~2.3x the
    'float32' step rate, selftest-verified), 'tensorfloat32' (3-pass),
    'float32' (6-pass exact).  The head losses, BN statistics, and the
    optimizer always run in f32."""
    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, images, truths, seen=10**9,
                   dropout_key=None):
        # `seen` (images consumed, traced scalar) drives [region]'s
        # <12800-image warmup; [yolo] heads ignore it.  The python-int
        # default folds to the post-warmup branch.  dropout_key activates
        # [dropout] layers (v1 classifier-style cfgs); None = identity.
        def loss_fn(p):
            bn_stats = {}
            # Batch-stat BN (train=True) matches darknet's
            # forward_batchnorm_layer — without it activations are
            # unnormalized and the deep stack eventually overflows.
            with jax.default_matmul_precision(matmul_precision):
                loss, metrics = yolo_loss(spec, p, images, truths,
                                          net_w, net_h, train=True,
                                          bn_stats=bn_stats, seen=seen,
                                          dropout_key=dropout_key)
            return loss, (metrics, bn_stats)

        (loss, (metrics, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = yolo_mod.apply_bn_updates(
            params, jax.tree_util.tree_map(jax.lax.stop_gradient, bn_stats))
        metrics = dict(metrics)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return train_step


def load_darknet_labels(list_file, max_boxes: int = 10):
    """Read a darknet train list: each line an image path; labels at the
    sibling .txt ('class cx cy w h' normalized, scripts/*_object.py).
    Returns (paths, truths [N, max_boxes, 5] with (x,y,w,h,cls))."""
    import os
    paths = [ln.strip() for ln in open(list_file) if ln.strip()]
    truths = np.zeros((len(paths), max_boxes, 5), np.float32)
    for i, p in enumerate(paths):
        txt = os.path.splitext(p)[0] + ".txt"
        if not os.path.exists(txt):
            txt = p.replace("images", "labels").rsplit(".", 1)[0] + ".txt"
        if not os.path.exists(txt):
            continue
        rows = []
        for ln in open(txt):
            vals = ln.split()
            if len(vals) >= 5:
                cls, cx, cy, w, h = (float(v) for v in vals[:5])
                rows.append([cx, cy, w, h, cls])
        for j, r in enumerate(rows[:max_boxes]):
            truths[i, j] = r
    return paths, truths
