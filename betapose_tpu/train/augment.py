"""On-device training augmentation for KPD (DPG pipeline).

The reference runs this per-sample on 30-40 CPU workers
(`train_KPD/src/utils/pose.py:18-145` generateSampleBox).  Here the whole
augmentation is a single batched, jittable device computation driven by
`jax.random` — color jitter, box scale-padding, DPG box perturbation /
patch-crop / half-crops, affine crop to the network input, gaussian target
rendering, random flip and rotation.  Host code only decodes PNGs.

Semantics mirrored from the reference (same constants):
- per-channel color jitter U(0.7, 1.3), clamp to [0,1] (pose.py:22-24);
- RGB mean offsets (-0.406, -0.457, -0.480) (pose.py:26-28);
- box scale-pad by U(0.2, 0.3)/2 per side, clamped (pose.py:36-41);
- DPG (pose.py:44-72): with p=0.15 an aspect-preserving random patch,
  else gaussian-perturbed corners (the published DPG distribution);
- DPG half-crops when >13 joints visible, 8 variants at p=0.04 each
  (pose.py:83-105);
- visible-joint test: strictly inside the box and x>0 (pose.py:76-80);
- crop via cropBox to (inputResH, inputResW); all-black input if no joint
  visible (pose.py:110-113);
- labels: transformBox (rounded) -> drawGaussian sigma=hmGauss; setMask is
  all-ones over every keypoint channel (pose.py:117-127 — note the
  reference adds 1 to EVERY channel's mask regardless of visibility);
- flip p=0.5 (no left/right swap — flipRef is empty for LineMod keypoints);
- rotation r ~ clip(N(0, 30), +-60) with p=0.4, else 0 (pose.py:129-143).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from betapose_tpu.ops import image as image_ops
from betapose_tpu.ops import heatmap as hm_ops

RGB_OFFSETS = image_ops.KPD_RGB_OFFSETS


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    inp_h: int = 320
    inp_w: int = 256
    out_h: int = 80
    out_w: int = 64
    scale_min: float = 0.2
    scale_max: float = 0.3
    rotate: float = 30.0
    hm_gauss: int = 1
    add_dpg: bool = False
    train: bool = True
    flip: bool = True            # reference flips at p=0.5 (pose.py:131)


def _rnd(key, x):
    """reference rnd(): clip(N(0,1)*x, -2x, 2x) (pose.py:14-15)."""
    return jnp.clip(jax.random.normal(key) * x, -2 * x, 2 * x)


def transform_box(pt, ul, br, inp_h, inp_w, res_h, res_w):
    """Image coords -> heatmap coords with rounding (`transformBox`,
    KPD/src/utils/img.py:178-196). pt: (..., 2); ul/br: (2,)."""
    center_x = (br[0] - 1 - ul[0]) / 2
    center_y = (br[1] - 1 - ul[1]) / 2
    len_h = jnp.maximum(br[1] - ul[1], (br[0] - ul[0]) * inp_h / inp_w)
    len_w = len_h * inp_w / inp_h
    x = pt[..., 0] - ul[0] + jnp.maximum(0.0, (len_w - 1) / 2 - center_x)
    y = pt[..., 1] - ul[1] + jnp.maximum(0.0, (len_h - 1) / 2 - center_y)
    out = jnp.stack([x, y], axis=-1) * res_h / len_h
    return jnp.round(out)


def _rotate_image(img, deg):
    """Rotate about the image center by `deg` degrees (torchsample Rotate
    semantics: output(x) = input(R^-1 x), bilinear, zero fill).  img: HWC.

    Gather-based single-pass transcription — kept as the semantic oracle for
    `rotate_image_shear` (the augment hot path uses the shear version:
    TPU gathers are ~100x slower than matmuls)."""
    h, w, _ = img.shape
    theta = -deg * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_x = cos * xs - sin * ys + cx
    src_y = sin * xs + cos * ys + cy
    sx = jnp.broadcast_to(src_x, (h, w))
    sy = jnp.broadcast_to(src_y, (h, w))
    return image_ops._bilinear_gather(img, sy, sx)


def rotate_image_shear(img, deg):
    """MXU rotation via the two-pass Catmull-Smith warp — same coordinate
    map as `_rotate_image` (output(p) = input(R(theta)(p-c)+c), theta =
    -deg*pi/180, zero fill), with the 2-D bilinear kernel split into two
    1-D bilinear passes (an x-pass then a y-pass), each an axis-aligned
    hat-weight resample = a batched small matmul.  No TPU gathers.

    R(theta) = [[p, q], [0, 1]] @ [[1, 0], [r, s]] with p = 1/cos(theta),
    q = -tan(theta), r = sin(theta), s = cos(theta).  Because the x-pass
    preserves rows and the y-pass only reads columns the x-pass wrote, the
    intermediate needs NO canvas growth (unlike the 3-shear decomposition,
    which clips corners at large angles).  Valid for |deg| < 90 (the
    augmentation draws clip(N(0, 30), +-60))."""
    h, w, _ = img.shape
    theta = -deg * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    p, q = 1.0 / cos, -jnp.tan(theta)
    r, s = sin, cos

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    # x-pass: out1[i, xo] = img[i, p*(xo-cx) + q*(i-cy) + cx]  (1-D bilinear)
    src1 = p * (xs[None, :] - cx) + q * (ys[:, None] - cy) + cx   # [h, w]
    w1 = jnp.clip(1.0 - jnp.abs(src1[:, :, None] - xs[None, None, :]), 0.0)
    # f32 inputs keep the f32-precision pin (TPU matmuls on f32 inputs
    # otherwise run 1-pass bf16), same convention as crop_box_matmul
    prec = "float32" if img.dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        out1 = jnp.einsum("ixw,iwc->ixc", w1.astype(img.dtype), img)
        # y-pass: out[yo, x] = out1[r*(x-cx) + s*(yo-cy) + cy, x]
        src2 = r * (xs[None, :] - cx) + s * (ys[:, None] - cy) + cy  # [h, w]
        w2 = jnp.clip(1.0 - jnp.abs(src2[:, :, None] - ys[None, None, :]),
                      0.0)
        return jnp.einsum("yxh,hxc->yxc", w2.astype(img.dtype), out1)


def rotate_points(pts, deg, res_h: int, res_w: int):
    """Where `_rotate_image` moves a feature at p: to R(theta)^-1(p-c)+c.
    pts: (..., 2) (x, y) in a res_h x res_w canvas."""
    phi = deg * jnp.pi / 180.0      # = -theta: the inverse rotation
    cx, cy = (res_w - 1) / 2.0, (res_h - 1) / 2.0
    dx = pts[..., 0] - cx
    dy = pts[..., 1] - cy
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack([cos * dx - sin * dy + cx,
                      sin * dx + cos * dy + cy], axis=-1)


def _augment_one(key, img, bndbox, part, cfg: AugmentConfig, kp_vis=None):
    """img: [H,W,3] RGB float [0,1]; bndbox: (4,); part: (K,2);
    kp_vis: optional (K,) visibility in [0,1] — occluded keypoints get a
    ZERO heatmap target (the network is taught low confidence there, so
    score-based pruning and pose-NMS discount them; cf. the reference's
    occlusion marking, `utils/utils.py handle_occlusion`)."""
    keys = jax.random.split(key, 12)
    h, w, _ = img.shape
    n_kp = part.shape[0]

    if cfg.train:
        jit3 = jax.random.uniform(keys[0], (3,), minval=0.7, maxval=1.3)
        img = jnp.clip(img * jit3[None, None, :], 0.0, 1.0)
    img = img + jnp.asarray(RGB_OFFSETS, img.dtype)

    ul = jnp.floor(bndbox[:2])
    br = jnp.floor(bndbox[2:])
    width = br[0] - ul[0]
    ht = br[1] - ul[1]
    rate = jax.random.uniform(keys[1], minval=cfg.scale_min,
                              maxval=cfg.scale_max)
    ul = jnp.maximum(0.0, ul - jnp.stack([width, ht]) * rate / 2)
    br = jnp.minimum(jnp.asarray([w - 1.0, h - 1.0]),
                     br + jnp.stack([width, ht]) * rate / 2)

    if cfg.add_dpg and cfg.train:
        patch_scale = jax.random.uniform(keys[2])

        def patch_branch(_):
            ratio = ht / width
            patch_w = jnp.where(width < ht, patch_scale * width,
                                patch_scale * ht / ratio)
            patch_h = jnp.where(width < ht, patch_scale * width * ratio,
                                patch_scale * ht)
            xmin = ul[0] + jax.random.uniform(keys[3]) * (width - patch_w)
            ymin = ul[1] + jax.random.uniform(keys[4]) * (ht - patch_h)
            return jnp.stack([xmin, ymin]), jnp.stack(
                [xmin + patch_w + 1, ymin + patch_h + 1])

        def gauss_branch(_):
            g = jax.random.normal(keys[5], (4,))
            xmin = jnp.clip(ul[0] + (g[0] * 0.1158 - 0.0142) * width,
                            1.0, w - 3.0)
            ymin = jnp.clip(ul[1] + (g[1] * 0.068 + 0.0043) * ht,
                            1.0, h - 3.0)
            xmax = jnp.clip(
                jnp.maximum(xmin + 2, br[0] + (g[2] * 0.1337 + 0.0154) * width),
                0.0, w - 3.0)
            ymax = jnp.clip(
                jnp.maximum(ymin + 2, br[1] + (g[3] * 0.0711 - 0.0013) * ht),
                0.0, h - 3.0)
            return jnp.stack([xmin, ymin]), jnp.stack([xmax, ymax])

        ul, br = jax.lax.cond(patch_scale > 0.85, patch_branch, gauss_branch,
                              None)

    # visible-joint test (pose.py:76-80)
    def visible(ul_, br_):
        return ((part[:, 0] > 0) & (part[:, 0] > ul_[0])
                & (part[:, 1] > ul_[1]) & (part[:, 0] < br_[0])
                & (part[:, 1] < br_[1]))

    joint_num = jnp.sum(visible(ul, br))

    if cfg.add_dpg and cfg.train:
        # half-crop variants (pose.py:83-105)
        switch = jax.random.uniform(keys[6])
        mid = (ul + br) / 2.0

        def hc(ulx, uly, brx, bry):
            return jnp.stack([ulx, uly]), jnp.stack([brx, bry])

        variants = [
            lambda: hc(ul[0], ul[1], mid[0], mid[1]),       # > .96
            lambda: hc(mid[0], ul[1], br[0], mid[1]),       # > .92
            lambda: hc(ul[0], mid[1], mid[0], br[1]),       # > .88
            lambda: hc(mid[0], mid[1], br[0], br[1]),       # > .84
            lambda: hc(ul[0], ul[1], mid[0], br[1]),        # > .80
            lambda: hc(mid[0], ul[1], br[0], br[1]),        # > .76
            lambda: hc(ul[0], ul[1], br[0], mid[1]),        # > .72
            lambda: hc(ul[0], mid[1], br[0], br[1]),        # > .68
            lambda: (ul, br),                                # no crop
        ]
        thresholds = jnp.asarray([0.96, 0.92, 0.88, 0.84, 0.80, 0.76,
                                  0.72, 0.68, -1.0])
        idx = jnp.argmax(switch > thresholds)
        idx = jnp.where(joint_num > 13, idx, 8)
        ul, br = jax.lax.switch(idx, variants)

    # separable-matmul crop (crop_box_matmul == crop_box, equivalence-tested;
    # the gather version is ~100x slower on TPU and dominated the train step)
    inp = image_ops.crop_box_matmul(img, ul, br, cfg.inp_h, cfg.inp_w)
    inp = jnp.where(joint_num == 0, jnp.zeros_like(inp), inp)

    vis = visible(ul, br)
    hm_pts = transform_box(part, ul, br, cfg.inp_h, cfg.inp_w,
                           cfg.out_h, cfg.out_w)

    if cfg.train:
        do_flip = (jax.random.uniform(keys[7]) < 0.5) & cfg.flip
        inp = jnp.where(do_flip, inp[:, ::-1, :], inp)

        r = _rnd(keys[8], cfg.rotate)
        r = jnp.where(jax.random.uniform(keys[9]) < 0.6, 0.0, r)
        inp = jnp.where(r != 0, rotate_image_shear(inp, r), inp)

        # Labels: the reference flips/rotates the DRAWN heatmaps
        # (pose.py:129-143); with isotropic gaussians that equals moving the
        # centers, so flip/rotate the keypoints analytically and draw once —
        # no label-image resample.  Deviation: the drawn gaussian stays
        # crisp at the rounded rotated center instead of picking up the
        # reference's bilinear resampling blur (see PARITY.md).
        flipped_x = jnp.where(do_flip, cfg.out_w - 1.0 - hm_pts[..., 0],
                              hm_pts[..., 0])
        hm_pts = jnp.stack([flipped_x, hm_pts[..., 1]], axis=-1)
        hm_pts = jnp.round(rotate_points(hm_pts, r, cfg.out_h, cfg.out_w))

    labels = hm_ops.draw_gaussian_batch(
        hm_pts[None], cfg.out_h, cfg.out_w, sigma=cfg.hm_gauss)[0]
    labels = labels * vis[:, None, None]              # [K, out_h, out_w]
    if kp_vis is not None:
        labels = labels * kp_vis[:, None, None]
    set_mask = jnp.ones((n_kp, cfg.out_h, cfg.out_w), labels.dtype)

    # NHWC for the train step
    return inp, labels.transpose(1, 2, 0), set_mask.transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _augment_batch_jit(key, imgs, bndboxes, parts, cfg, kp_vis):
    keys = jax.random.split(key, imgs.shape[0])
    inps, labels, masks = jax.vmap(
        lambda k, i, b, p, v: _augment_one(k, i, b, p, cfg, v))(
            keys, imgs, bndboxes, parts, kp_vis)
    return {"inps": inps, "labels": labels, "set_mask": masks}


def augment_batch(key, imgs, bndboxes, parts, cfg: AugmentConfig,
                  kp_vis=None):
    """imgs: [B,H,W,3] RGB in [0,1]; bndboxes: [B,4]; parts: [B,K,2];
    kp_vis: optional [B,K] per-keypoint visibility (see _augment_one).
    Returns dict(inps [B,iH,iW,3], labels [B,oH,oW,K], set_mask)."""
    if kp_vis is None:
        kp_vis = jnp.ones(parts.shape[:2], jnp.float32)
    return _augment_batch_jit(key, imgs, bndboxes, parts, cfg,
                              jnp.asarray(kp_vis, jnp.float32))
