"""Heatmap target rendering and peak decoding — fully vectorized.

Replaces the reference's per-keypoint Python loops:
- `drawGaussian` (`KPD/src/utils/img.py:82-111`): sigma is *overridden* to
  size/4 = (6*sigma_arg+1)/4 inside the function; center value 1.
- `getPrediction` (`KPD/src/utils/eval.py:113-147`): per-channel argmax, +-0.25
  gradient-sign refinement on interior peaks, +0.2 offset, then
  transformBoxInvert back to image coordinates.  The O(B*50) Python loop
  becomes one gather per neighbor direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from betapose_tpu.ops.image import transform_box_invert_batch


def draw_gaussian_batch(pts, res_h: int, res_w: int, sigma: float = 1):
    """Render [N, K, 2] (x, y) keypoints into [N, K, res_h, res_w] heatmaps.

    Matches reference drawGaussian semantics: window of size 6*sigma+1 around
    int(pt), gaussian with effective sigma = size/4, center 1; keypoints whose
    window is entirely out of bounds produce an unchanged (zero) map.
    Out-of-window pixels are zero.  Fully vectorized — the gaussian value is
    computed per-pixel with the window bound applied as a mask.
    """
    tmp_size = int(3 * sigma)
    size = 2 * tmp_size + 1
    eff_sigma = size / 4.0

    # reference: ul = int(pt - tmpSize), br = int(pt + tmpSize + 1) — python
    # int() truncates toward zero, so for fractional pt < tmpSize the window
    # is asymmetric (size 6 instead of 7).  Window is [ul, br); the gaussian
    # center sits at ul + size//2 = ul + tmpSize.
    ul_x = jnp.trunc(pts[..., 0] - tmp_size).astype(jnp.int32)
    ul_y = jnp.trunc(pts[..., 1] - tmp_size).astype(jnp.int32)
    br_x = jnp.trunc(pts[..., 0] + tmp_size + 1).astype(jnp.int32)
    br_y = jnp.trunc(pts[..., 1] + tmp_size + 1).astype(jnp.int32)
    px = ul_x + tmp_size
    py = ul_y + tmp_size

    xs = jnp.arange(res_w, dtype=jnp.float32)
    ys = jnp.arange(res_h, dtype=jnp.float32)
    dx = xs[None, None, None, :] - px[..., None, None].astype(jnp.float32)
    dy = ys[None, None, :, None] - py[..., None, None].astype(jnp.float32)
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2.0 * eff_sigma ** 2))
    xi = jnp.arange(res_w, dtype=jnp.int32)
    yi = jnp.arange(res_h, dtype=jnp.int32)
    in_x = ((xi[None, None, None, :] >= ul_x[..., None, None])
            & (xi[None, None, None, :] < br_x[..., None, None]))
    in_y = ((yi[None, None, :, None] >= ul_y[..., None, None])
            & (yi[None, None, :, None] < br_y[..., None, None]))

    # Reference in-bounds check: skip keypoint entirely when the window
    # misses the image.
    visible = ((ul_x < res_w) & (ul_y < res_h) & (br_x >= 0) & (br_y >= 0))
    return jnp.where(in_x & in_y & visible[..., None, None], g, 0.0)


def heatmap_concentration(hms):
    """Per-keypoint peak CONCENTRATION: the inverse participation ratio
    of the rectified heatmap, sum(h+^2) / sum(h+)^2, in 1/pixels.

    A clean unimodal gaussian of std s has concentration ~ 1/(4*pi*s^2)
    regardless of its height; a flattened or multimodal response (the
    occlusion failure mode: the net hedges between two plausible sites)
    spreads mass and drives it toward 1/support_area.  Gather-free (two
    reductions), so it rides the fused eval graph at no cost — unlike a
    window-moment estimate around the argmax.

    Extension beyond the reference: `utils/utils.py:17-41` weights
    nothing (cv2.solvePnP, equal weights); this statistic feeds the
    optional PnP confidence weighting (PipelineConfig.pnp_spread_power).

    hms: [n, K, H, W].  Returns [n, K] float32, 0 for all-nonpositive maps.
    """
    h = jnp.maximum(hms.astype(jnp.float32), 0.0)
    mass = h.sum(axis=(-1, -2))
    mass2 = (h * h).sum(axis=(-1, -2))
    return jnp.where(mass > 0, mass2 / jnp.maximum(mass, 1e-12) ** 2, 0.0)


def decode_heatmaps(hms, pt1, pt2, inp_h: int, inp_w: int,
                    res_h: int, res_w: int, use_pallas: bool = False):
    """Vectorized `getPrediction` (`KPD/src/utils/eval.py:113-147`).

    hms: [n, K, H, W]; pt1/pt2: [n, 2] crop corners (float).
    Returns (preds [n,K,2] heatmap coords, preds_img [n,K,2] image coords,
    maxval [n,K,1]).  use_pallas=True routes the peak stage through the
    fused single-VMEM-pass TPU kernel (ops/pallas/heatmap_decode.py;
    bit-identical output)."""
    if use_pallas:
        from betapose_tpu.ops.pallas.heatmap_decode import decode_peaks
        out = decode_peaks(hms)
        preds = out[..., :2]
        maxval = out[..., 2:3]
        preds_img = transform_box_invert_batch(
            preds, pt1, pt2, inp_h, inp_w, res_h, res_w)
        return preds, preds_img, maxval
    n, k, h, w = hms.shape
    flat = hms.reshape(n, k, h * w)
    maxval = jnp.max(flat, axis=2)
    idx = jnp.argmax(flat, axis=2)

    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)          # [n,K,2]
    mask = (maxval > 0).astype(jnp.float32)[..., None]
    preds = preds * mask

    # gradient-sign refinement on strict-interior peaks
    px = jnp.round(preds[..., 0]).astype(jnp.int32)
    py = jnp.round(preds[..., 1]).astype(jnp.int32)
    interior = (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    flat_idx = pyc * w + pxc
    right = jnp.take_along_axis(flat, (flat_idx + 1)[..., None], 2)[..., 0]
    left = jnp.take_along_axis(flat, (flat_idx - 1)[..., None], 2)[..., 0]
    down = jnp.take_along_axis(flat, (flat_idx + w)[..., None], 2)[..., 0]
    up = jnp.take_along_axis(flat, (flat_idx - w)[..., None], 2)[..., 0]

    diff_x = jnp.sign(right - left) * 0.25
    diff_y = jnp.sign(down - up) * 0.25
    adj = jnp.stack([diff_x, diff_y], axis=-1) * interior[..., None]
    preds = preds + adj + 0.2                    # +0.2 offset (eval.py:141)

    preds_img = transform_box_invert_batch(
        preds, pt1, pt2, inp_h, inp_w, res_h, res_w)
    return preds, preds_img, maxval[..., None]
