"""On-device image ops: letterbox resize, affine box crop, coordinate
transforms between heatmap and image space.

These replace the reference's host-side cv2/torchsample pipeline stages:
- `letterbox_image` (`yolo/preprocess.py:19-31`): aspect-preserving resize
  onto a 128-gray canvas.
- `cropBox` (`KPD/src/utils/img.py:242-262`): crop box -> center-pad to the
  network aspect -> bilinear resize with align_corners=True.  Here the whole
  chain is ONE gather-based bilinear sampling per output pixel (vmapped over
  boxes), instead of crop+pad+resize materializations.
- `transformBoxInvert(_batch)` (`KPD/src/utils/img.py:204-239`): heatmap
  coordinates back to image coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def letterbox(img, dst_h: int, dst_w: int, method: str = "linear",
              fill: float = 128.0):
    """Aspect-preserving resize of [H,W,C] (or [B,H,W,C]) onto a fill-gray
    canvas of (dst_h, dst_w).  Matches the integer geometry of
    `yolo/preprocess.py:19-31`: new_w = int(w*min(s)), offset = (dst-new)//2.

    Note: the reference uses cv2.INTER_CUBIC for the resize; XLA's 'cubic'
    kernel (Keys a=-0.5) differs slightly from OpenCV's (a=-0.75), and
    'linear' is faster on TPU.  Detection output is insensitive to this
    (conv features, not pixel-exact), so 'linear' is the default.
    """
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    b, h, w, c = img.shape
    scale = min(dst_w / w, dst_h / h)
    new_w, new_h = int(w * scale), int(h * scale)
    resized = jax.image.resize(
        img, (b, new_h, new_w, c),
        method={"linear": "linear", "cubic": "cubic",
                "nearest": "nearest"}[method])
    top = (dst_h - new_h) // 2
    left = (dst_w - new_w) // 2
    canvas = jnp.full((b, dst_h, dst_w, c), fill, dtype=resized.dtype)
    canvas = jax.lax.dynamic_update_slice(
        canvas, resized, (0, top, left, 0))
    return canvas if batched else canvas[0]


def _bilinear_gather(img, ys, xs, mask_val=0.0):
    """Sample img [H,W,C] at float coords (ys, xs) [h',w'], bilinear with
    zero (mask_val) outside bounds."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1, x1 = y0 + 1, x0 + 1
    wy = ys - y0
    wx = xs - x0

    def get(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # advanced indexing -> gather
        return jnp.where(valid[..., None], vals, mask_val)

    v00 = get(y0, x0)
    v01 = get(y0, x1)
    v10 = get(y1, x0)
    v11 = get(y1, x1)
    wy = wy[..., None]
    wx = wx[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def crop_box_params(ul, br, res_h: int, res_w: int):
    """Compute the canvas geometry of the reference cropBox for one box.

    ul, br: float (2,) [x, y] (already int-truncated by the caller to match
    `cropBox`'s `.int()`).  Returns (len_h, len_w, pad_top, pad_left, box_h,
    box_w) — the reference pipeline is: crop [ul:br), center-pad (ceil before,
    floor after) to (len_h, len_w), bilinear align-corners resize to
    (res_h, res_w)."""
    box_w = br[0] - ul[0]
    box_h = br[1] - ul[1]
    len_h = jnp.maximum(box_h, box_w * res_h / res_w)
    len_w = len_h * res_w / res_h
    # torchsample Pad: ceil(diff/2) before, floor after, on int canvas dims
    len_h_i = jnp.floor(len_h)
    len_w_i = jnp.floor(len_w)
    pad_top = jnp.ceil((len_h_i - box_h) / 2.0)
    pad_left = jnp.ceil((len_w_i - box_w) / 2.0)
    return len_h_i, len_w_i, pad_top, pad_left, box_h, box_w


def crop_box(img, ul, br, res_h: int, res_w: int):
    """TPU equivalent of `cropBox(img, ul, br, resH, resW)`
    (`KPD/src/utils/img.py:242-262`) for HWC images with float box corners.

    Returns [res_h, res_w, C].  Implemented as a single bilinear gather:
    output (i,j) samples canvas coords (i*(lenH-1)/(resH-1), j*(lenW-1)/(resW-1))
    (align_corners=True), shifted by the centering pad and the crop origin.
    """
    ul = jnp.floor(ul.astype(jnp.float32))  # reference .int() truncation
    br = jnp.floor(br.astype(jnp.float32))
    len_h, len_w, pad_top, pad_left, box_h, box_w = crop_box_params(
        ul, br, res_h, res_w)

    ii = jnp.arange(res_h, dtype=jnp.float32)[:, None]
    jj = jnp.arange(res_w, dtype=jnp.float32)[None, :]
    ys_canvas = ii * (len_h - 1.0) / (res_h - 1.0)
    xs_canvas = jj * (len_w - 1.0) / (res_w - 1.0)
    ys = jnp.broadcast_to(ys_canvas, (res_h, res_w)) - pad_top + ul[1]
    xs = jnp.broadcast_to(xs_canvas, (res_h, res_w)) - pad_left + ul[0]

    # Mask to the crop region [ul, br) like SpecialCrop+Pad zeros.
    sampled = _bilinear_gather_masked(img, ys, xs, ul, br)
    return sampled


def _bilinear_gather_masked(img, ys, xs, ul, br):
    h, w, _ = img.shape
    lo_y, hi_y = ul[1], br[1]
    lo_x, hi_x = ul[0], br[0]

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1, x1 = y0 + 1, x0 + 1
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def get(yi, xi):
        valid = ((yi >= lo_y) & (yi < hi_y) & (xi >= lo_x) & (xi < hi_x)
                 & (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return jnp.where(valid[..., None], img[yc, xc], 0.0)

    return ((1 - wy) * ((1 - wx) * get(y0, x0) + wx * get(y0, x1))
            + wy * ((1 - wx) * get(y1, x0) + wx * get(y1, x1)))


def resize_bilinear_matmul(x, out_h: int, out_w: int,
                           antialias: bool = False):
    """Static-shape separable bilinear resize as two matmuls (MXU-fast,
    half-pixel sampling grid).  x: [B,H,W,C].

    antialias=False (default) matches cv2.resize INTER_LINEAR — the
    convention of the reference pipeline AND of this framework's on-device
    training augmentation; mixing kernels between train and eval is a real
    domain shift (AA flattens high-frequency content).  antialias=True
    matches jax.image.resize 'linear' (scale-widened triangle kernel)."""
    b, h, w, c = x.shape
    dtype = x.dtype

    def interp_matrix(src, dst):
        scale = max(src / dst, 1.0) if antialias else 1.0
        pos = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * (src / dst) - 0.5
        pos = pos if antialias else jnp.clip(pos, 0.0, src - 1.0)
        grid = jnp.arange(src, dtype=jnp.float32)
        wmat = jnp.clip(1.0 - jnp.abs(pos[:, None] - grid[None, :]) / scale,
                        0.0)
        return (wmat / jnp.sum(wmat, axis=1, keepdims=True)).astype(dtype)

    ry = interp_matrix(h, out_h)
    rx = interp_matrix(w, out_w)
    # f32 inputs keep the f32-precision pin (geometry-grade exactness);
    # bf16 inputs (NN-feed path: the pixels land in bf16 convs anyway) run
    # native MXU bf16 passes — forcing f32 there would cost 3x passes.
    prec = "float32" if x.dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        t = jnp.einsum("ih,bhwc->biwc", ry, x)
        return jnp.einsum("jw,biwc->bijc", rx, t)


def crop_box_matmul(img, ul, br, res_h: int, res_w: int):
    """MXU-friendly equivalent of `crop_box`: the crop's bilinear resampling
    is an axis-aligned scale+translate, hence SEPARABLE — output =
    R_y @ img @ R_x^T with per-box interpolation matrices whose rows are the
    hat-function weights clip(1 - |src - j|, 0), masked to the crop window
    [ul, br) (reproducing SpecialCrop+Pad's zero fill).  Turns the gather
    (very slow on TPU) into two dense matmuls per box (~13x faster measured).
    """
    h, w, _ = img.shape
    ul = jnp.floor(ul.astype(jnp.float32))
    br = jnp.floor(br.astype(jnp.float32))
    len_h, len_w, pad_top, pad_left, _bh, _bw = crop_box_params(
        ul, br, res_h, res_w)

    ii = jnp.arange(res_h, dtype=jnp.float32)
    jj = jnp.arange(res_w, dtype=jnp.float32)
    src_y = ii * (len_h - 1.0) / (res_h - 1.0) - pad_top + ul[1]   # [res_h]
    src_x = jj * (len_w - 1.0) / (res_w - 1.0) - pad_left + ul[0]  # [res_w]

    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    # hat weights + crop-window mask (neighbors outside [ul, br) read as 0)
    wy = jnp.clip(1.0 - jnp.abs(src_y[:, None] - rows[None, :]), 0.0)
    wy = wy * ((rows[None, :] >= ul[1]) & (rows[None, :] < br[1]))
    wx = jnp.clip(1.0 - jnp.abs(src_x[:, None] - cols[None, :]), 0.0)
    wx = wx * ((cols[None, :] >= ul[0]) & (cols[None, :] < br[0]))

    # weights are built in f32 (sub-pixel coordinates), then cast to the
    # image dtype: f32 path keeps the f32-precision pin, bf16 path (NN
    # feed) runs native MXU bf16 (see resize_bilinear_matmul)
    prec = "float32" if img.dtype == jnp.float32 else "default"
    wy = wy.astype(img.dtype)
    wx = wx.astype(img.dtype)
    with jax.default_matmul_precision(prec):
        tmp = jnp.einsum("ih,hwc->iwc", wy, img)
        out = jnp.einsum("jw,iwc->ijc", wx, tmp)
    return out


def expand_boxes(boxes, img_h: int, img_w: int):
    """Reference `crop_from_dets` box expansion (`dataloader.py:802-825`):
    pad by scaleRate/2 per side (0.2 if width>100 else 0.3), clamp to the
    image with a 5px minimum extent.  boxes: (N,4) xyxy -> (ul (N,2), br (N,2)).
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    width = x2 - x1
    ht = y2 - y1
    rate = jnp.where(width > 100, 0.2, 0.3)
    ul_x = jnp.maximum(0.0, x1 - width * rate / 2)
    ul_y = jnp.maximum(0.0, y1 - ht * rate / 2)
    br_x = jnp.maximum(jnp.minimum(img_w - 1.0, x2 + width * rate / 2),
                       ul_x + 5)
    br_y = jnp.maximum(jnp.minimum(img_h - 1.0, y2 + ht * rate / 2),
                       ul_y + 5)
    return (jnp.stack([ul_x, ul_y], axis=1),
            jnp.stack([br_x, br_y], axis=1))


# Per-channel normalization offsets used before KPD (dataloader.py:802-804,
# applied to RGB in [0,1]).
KPD_RGB_OFFSETS = (-0.406, -0.457, -0.480)


def crop_from_dets(img_rgb01, boxes, res_h: int, res_w: int,
                   method: str = "matmul"):
    """Batch version of reference `crop_from_dets` for one image.

    img_rgb01: [H,W,3] float RGB in [0,1]; boxes: (N,4) xyxy.
    Returns (inps [N,res_h,res_w,3], pt1 (N,2), pt2 (N,2)).
    method: 'matmul' (MXU separable resampling, TPU-fast) or 'gather'."""
    h, w, _ = img_rgb01.shape
    img = img_rgb01 + jnp.asarray(KPD_RGB_OFFSETS, img_rgb01.dtype)
    ul, br = expand_boxes(boxes, h, w)
    crop = crop_box_matmul if method == "matmul" else crop_box
    crops = jax.vmap(lambda u, b: crop(img, u, b, res_h, res_w))(ul, br)
    return crops, ul, br


def transform_box_invert_batch(pt, ul, br, inp_h: int, inp_w: int,
                               res_h: int, res_w: int):
    """Heatmap coords -> image coords (`transformBoxInvert_batch`,
    `KPD/src/utils/img.py:217-239`).

    pt: [n, K, 2]; ul, br: [n, 2].  Note: the reference passes the FLOAT
    expanded corners here even though cropBox truncated them to int for the
    crop itself — we reproduce that (sub-pixel) inconsistency for parity."""
    center = (br - 1 - ul) / 2.0                       # [n,2]
    size = br - ul
    size_h = jnp.maximum(size[:, 1], size[:, 0] * (inp_h / inp_w))  # lenH [n]
    len_w = size_h * (inp_w / inp_h)

    _pt = pt * size_h[:, None, None] / res_h
    off_x = jnp.clip((len_w - 1) / 2.0 - center[:, 0], 0.0, None)
    off_y = jnp.clip((size_h - 1) / 2.0 - center[:, 1], 0.0, None)
    x = _pt[..., 0] - off_x[:, None] + ul[:, 0:1]
    y = _pt[..., 1] - off_y[:, None] + ul[:, 1:2]
    return jnp.stack([x, y], axis=-1)
