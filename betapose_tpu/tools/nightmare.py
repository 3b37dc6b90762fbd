"""`darknet nightmare` — gradient ascent / reconstruction on the input
image (`nightmare.c:40-290`, dispatched from `darknet.c:351`).

Two modes, both gradient-to-input problems that are one `jax.grad` in
this stack (darknet hand-drives forward/backward with a crafted delta):

- **dream** (default): per iteration, jitter the image (shift dx,dy ~
  rand%16-8 with edge clamp, random horizontal flip, downscale by
  1/1.3333^octave), run the net TRUNCATED at a layer, and ascend the
  thresholded activation energy: darknet sets delta = output where
  output > mean + thresh*std else 0 (`calculate_loss`, nightmare.c:25-34)
  and backprops — exactly the input gradient of
  0.5*sum(output^2 masked by that stop-gradiented selection).  The
  resulting input delta is un-flipped, resized back, un-shifted,
  optionally mean/std-normalized (utils.c normalize_array), scaled by
  rate and added; pixels clamp to [0,1] (constrain_image).
- **-reconstruct**: capture target features f(image)+U(-.19,.19) noise
  (nightmare.c:247-250, noise over at most 14*14*512 entries — the
  hardcoded extractor hack, transcribed), restart from a random image
  (make_random_image: N(0.5, 0.25)), then momentum gradient descent on
  the feature cost plus darknet's neighborhood smoothing term
  (`smooth`, nightmare.c:141-160: update[o] += lambda*(recon[n] -
  recon[o]) over the (2*smooth+1)^2 window — the gradient of a local
  smoothness energy) with update *= momentum per step
  (`reconstruct_picture`, nightmare.c:162-200).

Documented deviations: the downscale/upscale resample uses this
framework's canonical half-pixel bilinear (`ops/image.
resize_bilinear_matmul`, cv2 convention) where image.c resize_image is
align-corners; rounds save PNG via cv2 (save_image_png).  The `-rotate`
flag is parsed and ignored exactly like the reference body (nightmare.c
parses it at :203 and never uses it).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.ops.image import resize_bilinear_matmul


def truncate_spec(spec, n):
    """Forward prefix net->n = n+1 (optimize_picture, nightmare.c:43)."""
    return yolo_mod.NetworkSpec(
        layers=spec.layers[:n + 1],
        cache_idxs=frozenset(i for i in spec.cache_idxs if i <= n),
        net_info=spec.net_info,
        dims=spec.dims[:n + 2] if spec.dims else ())


def _normalize_array(x):
    """utils.c normalize_array: (x - mean) / sigma."""
    mean = jnp.mean(x)
    sigma = jnp.sqrt(jnp.mean((x - mean) ** 2))
    return (x - mean) / jnp.maximum(sigma, 1e-12)


def _shift_edge_clamp(img, dy, dx, pad=8):
    """crop_image(im, dx, dy, w, h) (image.c): same-size shift with
    border clamp (get_pixel constrains) — an edge-padded dynamic_slice,
    so dx/dy stay traced scalars (one compile for all 256 jitters)."""
    h, w, c = img.shape
    padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return jax.lax.dynamic_slice(
        padded, (pad + dy, pad + dx, 0), (h, w, c))


_DREAM_CACHE = {}


def _dream_step_fn(spec, max_layer, scale_hw, norm, thresh):
    """One optimize_picture step (nightmare.c:36-135) as a jitted
    function of (params, img, dy, dx, flip): returns the rate-unscaled
    update to add to the image."""
    key = (id(spec), max_layer, scale_hw, norm, thresh)
    fn = _DREAM_CACHE.get(key)
    if fn is not None:
        return fn
    tspec = truncate_spec(spec, max_layer)
    sh, sw = scale_hw

    def objective(params, img):
        out = yolo_mod.forward(tspec, params, img[None], sw, decode=True)
        out = out.astype(jnp.float32)
        mean = jnp.mean(out)
        var = jnp.mean((out - mean) ** 2)
        sel = jax.lax.stop_gradient(
            out > mean + thresh * jnp.sqrt(var))
        return 0.5 * jnp.sum(jnp.where(sel, out, 0.0) ** 2)

    @jax.jit
    def step(params, img, dy, dx, flip):
        shifted = _shift_edge_clamp(img, dy, dx)
        small = resize_bilinear_matmul(shifted[None], sh, sw)[0]
        small = jnp.where(flip, small[:, ::-1, :], small)
        g = jax.grad(lambda im: objective(params, im))(small)
        g = jnp.where(flip, g[:, ::-1, :], g)
        g = resize_bilinear_matmul(g[None], img.shape[0], img.shape[1])[0]
        g = _shift_edge_clamp(g, -dy, -dx)
        if norm:
            g = _normalize_array(g)
        return g

    _DREAM_CACHE[key] = step
    return step


def dream(spec, params, img, max_layer, rounds=1, iters=10, octaves=4,
          range_=1, norm=1, rate=0.04, thresh=1.0, rng=None,
          on_round=None):
    """The non-reconstruct loop of run_nightmare (nightmare.c:260-281).
    img: [H,W,3] float [0,1].  Returns the final image; on_round(e, img)
    fires after each round (the save point)."""
    rng = rng or np.random.default_rng(0)
    h, w = img.shape[:2]
    img = jnp.asarray(img, jnp.float32)
    for e in range(rounds):
        for _ in range(iters):
            layer = max_layer + int(rng.integers(0, max(range_, 1))) \
                - range_ // 2
            layer = int(np.clip(layer, 0, len(spec.layers) - 1))
            octave = int(rng.integers(0, max(octaves, 1)))
            scale = 1.0 / (1.33333333 ** octave)
            sh, sw = max(int(h * scale), 1), max(int(w * scale), 1)
            dy, dx = int(rng.integers(-8, 8)), int(rng.integers(-8, 8))
            flip = bool(rng.integers(0, 2))
            step = _dream_step_fn(spec, layer, (sh, sw), bool(norm),
                                  float(thresh))
            g = step(params, img, dy, dx, flip)
            img = jnp.clip(img + rate * g, 0.0, 1.0)   # constrain_image
        if on_round:
            on_round(e, np.asarray(img))
    return np.asarray(img)


def smooth_term(recon, smooth_size):
    """The per-cell smoothing delta of `smooth` (nightmare.c:141-160):
    sum over the clipped (2*smooth_size+1)^2 window of
    (recon[neighbor] - recon[center]), per channel — expressed as two
    box-sum convolutions (neighbor sum minus count*center)."""
    h, w, _ = recon.shape
    win = 2 * smooth_size + 1
    ones = jnp.ones((1, 1, win, win), recon.dtype)
    neigh_sum = jax.lax.conv_general_dilated(
        recon.transpose(2, 0, 1)[:, None], ones, (1, 1),
        [(smooth_size, smooth_size)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0] \
        .transpose(1, 2, 0)
    cnt = jax.lax.conv_general_dilated(
        jnp.ones((1, 1, h, w), recon.dtype), ones, (1, 1),
        [(smooth_size, smooth_size)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0][..., None]
    return neigh_sum - cnt * recon


def reconstruct(spec, params, img, rounds=1, iters=10, rate=0.01,
                momentum=0.9, lambda_=0.01, smooth_size=1, rng=None,
                on_round=None):
    """-reconstruct mode (nightmare.c:229-257 + reconstruct_picture).
    Feature inversion by momentum descent from a random image."""
    rng = rng or np.random.default_rng(0)
    h, w, c = img.shape
    reso = w

    @jax.jit
    def features_of(params, im):
        return yolo_mod.forward(spec, params, im[None], reso,
                                decode=True).astype(jnp.float32)

    feats = features_of(params, jnp.asarray(img, jnp.float32))
    flat = np.array(feats, np.float32).ravel()
    n_noise = min(flat.size, 14 * 14 * 512)          # nightmare.c:248
    flat[:n_noise] += rng.uniform(-0.19, 0.19, n_noise).astype(np.float32)
    feats = jnp.asarray(flat.reshape(feats.shape))

    # make_random_image (image.c): N(0.5, 0.25)
    recon = jnp.asarray(
        rng.normal(0.5, 0.25, (h, w, c)).astype(np.float32))
    update = jnp.zeros_like(recon)

    @jax.jit
    def one_iter(params, recon, update):
        def cost(im):
            out = features_of(params, im)
            # [cost sse] delta = (truth - out); the input delta is the
            # negative gradient of 0.5*||truth - out||^2
            return 0.5 * jnp.sum((feats - out) ** 2)

        g = -jax.grad(cost)(recon)                  # darknet's delta sign
        update = update + g + lambda_ * smooth_term(recon, smooth_size)
        recon = jnp.clip(recon + rate * update, 0.0, 1.0)
        return recon, update * momentum

    for e in range(rounds):
        for _ in range(iters):
            recon, update = one_iter(params, recon, update)
        if on_round:
            on_round(e, np.asarray(recon))
    return np.asarray(recon)


def _save_png(path, img01):
    import cv2
    bgr = np.clip(np.asarray(img01)[..., ::-1] * 255.0, 0, 255) \
        .astype(np.uint8)
    cv2.imwrite(path, bgr)


def run_nightmare(argv):
    """CLI body (run_nightmare, nightmare.c:173-290): positional
    cfg weights image layer, darknet's flag set, per-round PNG saves
    named {prefix/}{im}_{cfg}_{layer}_{round:06d}.png."""
    from betapose_tpu.core.compile_cache import enable_compile_cache
    from betapose_tpu.data.loader import imread_rgb
    enable_compile_cache()
    if len(argv) < 4:
        print("usage: darknet_cli nightmare [cfg] [weights] [image] "
              "[layer] [options]")
        return 1
    pos, flags = [], {}
    BOOL = {"reconstruct"}
    i = 0
    while i < len(argv):
        if argv[i].startswith("-") and not argv[i].lstrip("-").isdigit():
            name = argv[i].lstrip("-")
            if name in BOOL or i + 1 >= len(argv):
                flags[name] = ""
                i += 1
            else:
                flags[name] = argv[i + 1]
                i += 2
        else:
            pos.append(argv[i])
            i += 1
    cfg_path, weights_path, image_path = pos[0], pos[1], pos[2]
    max_layer = int(pos[3])
    with open(cfg_path) as f:
        spec = yolo_mod.build_spec(f.read())
    params, _ = yolo_mod.load_darknet_weights(spec, weights_path)
    img = imread_rgb(image_path).astype(np.float32) / 255.0

    rounds = int(flags.get("rounds", 1))
    iters = int(flags.get("iters", 10))
    prefix = flags.get("prefix")
    imbase = os.path.splitext(os.path.basename(image_path))[0]
    cfgbase = os.path.splitext(os.path.basename(cfg_path))[0]
    rng = np.random.default_rng(0)                   # srand(0), :175

    def on_round(e, im):
        name = f"{imbase}_{cfgbase}_{max_layer}_{e:06d}.png"
        path = os.path.join(prefix, name) if prefix else name
        if prefix:
            os.makedirs(prefix, exist_ok=True)
        _save_png(path, im)
        print(f"saved {path}")

    if "reconstruct" in flags:
        out = reconstruct(
            spec, params, img, rounds=rounds, iters=iters,
            rate=float(flags.get("rate", 0.01)),
            momentum=float(flags.get("momentum", 0.9)),
            lambda_=float(flags.get("lambda", 0.01)),
            smooth_size=int(flags.get("smooth", 1)),
            rng=rng, on_round=on_round)
    else:
        out = dream(
            spec, params, img, max_layer, rounds=rounds, iters=iters,
            octaves=int(flags.get("octaves", 4)),
            range_=int(flags.get("range", 1)),
            norm=int(flags.get("norm", 1)),
            rate=float(flags.get("rate", 0.04)),
            thresh=float(flags.get("thresh", 1.0)),
            rng=rng, on_round=on_round)
    return out
