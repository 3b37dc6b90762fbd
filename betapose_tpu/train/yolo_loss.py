"""YOLOv3 training loss — vectorized re-expression of darknet's
`forward_yolo_layer` truth assignment (`train_YOLO/src/yolo_layer.c:166-281`).

darknet semantics reproduced (gradient-equivalent):
- Per anchor/cell: objectness is pushed to 0 (BCE) unless the predicted
  box's best IoU over the frame's GT boxes exceeds ignore_thresh (0.7) —
  then no objectness gradient (`yolo_layer.c:219-221`).
- Per GT box: the best of all 9 anchors by shape-only IoU is selected
  (`yolo_layer.c:235-250`); if it belongs to this head's mask, the cell
  (floor(x*gw), floor(y*gh)) gets: box regression on (sigma-space tx, ty and
  log-space tw, th) scaled by (2 - w*h) (`delta_yolo_box:94-109`),
  objectness target 1, one-hot class BCE (`delta_yolo_class:112-147`).
- darknet applies its deltas directly to pre-activations; for the logistic
  entries (x, y, obj, class) delta = (target - sigmoid(z)) which is exactly
  the BCE gradient, and for w/h delta = (t - z), the gradient of squared
  error 0.5*(t-z)^2.  The JAX loss below therefore uses BCE for logistic
  entries and 0.5*SE for w/h, yielding identical gradients.

GT boxes come padded: truths [B, max_boxes, 5] = (x, y, w, h, class) with
x == 0 marking padding (darknet's `if(!truth.x) break`, all coords
normalized to [0, 1]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _iou_xywh(b1, b2):
    """IoU of (x,y,w,h) center boxes; broadcastable."""
    l1, r1 = b1[..., 0] - b1[..., 2] / 2, b1[..., 0] + b1[..., 2] / 2
    t1, d1 = b1[..., 1] - b1[..., 3] / 2, b1[..., 1] + b1[..., 3] / 2
    l2, r2 = b2[..., 0] - b2[..., 2] / 2, b2[..., 0] + b2[..., 2] / 2
    t2, d2 = b2[..., 1] - b2[..., 3] / 2, b2[..., 1] + b2[..., 3] / 2
    iw = jnp.clip(jnp.minimum(r1, r2) - jnp.maximum(l1, l2), 0)
    ih = jnp.clip(jnp.minimum(d1, d2) - jnp.maximum(t1, t2), 0)
    inter = iw * ih
    union = (b1[..., 2] * b1[..., 3] + b2[..., 2] * b2[..., 3] - inter)
    return inter / jnp.maximum(union, 1e-12)


def _bce_from_logits(z, target):
    """Elementwise BCE with logits (stable)."""
    return jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z)))


def head_loss(raw, anchors, all_anchors, num_classes, net_w, net_h,
              truths, ignore_thresh=0.7):
    """Loss of one yolo head.

    raw: [B, gh, gw, nA*(5+nC)] pre-activation conv output (NHWC).
    anchors: this head's (w,h) anchor pixel sizes; all_anchors: all 9.
    truths: [B, T, 5] normalized (x,y,w,h,cls), x==0 padding.
    Returns (scalar loss, metrics dict).
    """
    b, gh, gw, _ = raw.shape
    na = len(anchors)
    nc = num_classes
    x = raw.reshape(b, gh, gw, na, 5 + nc).transpose(0, 3, 1, 2, 4)
    # [B, nA, gh, gw, 5+nc]

    tx_z, ty_z = x[..., 0], x[..., 1]
    tw_z, th_z = x[..., 2], x[..., 3]
    obj_z = x[..., 4]
    cls_z = x[..., 5:]

    grid_x = jnp.arange(gw, dtype=jnp.float32)[None, None, None, :]
    grid_y = jnp.arange(gh, dtype=jnp.float32)[None, None, :, None]
    anc = jnp.asarray(anchors, jnp.float32)
    aw = anc[:, 0][None, :, None, None]
    ah = anc[:, 1][None, :, None, None]

    # decoded predictions in normalized coords (get_yolo_box, yolo_layer.c:84)
    # exp args clipped: these feed only the ignore-mask IoU test and the
    # avg-iou metric, and unclipped exps overflow on early-training spikes
    px = (jax.nn.sigmoid(tx_z) + grid_x) / gw
    py = (jax.nn.sigmoid(ty_z) + grid_y) / gh
    pw = jnp.exp(jnp.clip(tw_z, -12.0, 12.0)) * aw / net_w
    ph = jnp.exp(jnp.clip(th_z, -12.0, 12.0)) * ah / net_h
    pred = jnp.stack([px, py, pw, ph], axis=-1)  # [B,nA,gh,gw,4]

    gt_valid = truths[..., 0] != 0                     # [B,T]
    gt_boxes = truths[..., :4]                         # [B,T,4]
    gt_cls = truths[..., 4].astype(jnp.int32)

    # ---- rule 1: objectness background with ignore mask ----
    ious = _iou_xywh(pred[..., None, :], gt_boxes[:, None, None, None, :, :])
    ious = jnp.where(gt_valid[:, None, None, None, :], ious, 0.0)
    best_iou = jnp.max(ious, axis=-1)                  # [B,nA,gh,gw]
    obj_weight = jnp.where(best_iou > ignore_thresh, 0.0, 1.0)
    obj_target = jnp.zeros_like(obj_z)

    # ---- rule 2: anchor assignment per GT ----
    all_anc = jnp.asarray(all_anchors, jnp.float32)    # [9,2]
    anc_shapes = jnp.concatenate(
        [jnp.zeros_like(all_anc), all_anc / jnp.asarray(
            [net_w, net_h], jnp.float32)], axis=1)     # (0,0,w,h) normalized
    gt_shift = gt_boxes.at[..., :2].set(0.0)           # [B,T,4]
    shape_iou = _iou_xywh(gt_shift[:, :, None, :],
                          anc_shapes[None, None, :, :])  # [B,T,9]
    best_n = jnp.argmax(shape_iou, axis=-1)            # [B,T]

    # map global anchor idx -> local head anchor idx (or -1)
    local_idx = -jnp.ones((len(all_anchors),), jnp.int32)
    for li, a in enumerate(anchors):
        gi = list(map(tuple, all_anchors)).index(tuple(a))
        local_idx = local_idx.at[gi].set(li)
    mask_n = local_idx[best_n]                         # [B,T]
    assign = gt_valid & (mask_n >= 0)

    ci = jnp.clip((gt_boxes[..., 0] * gw).astype(jnp.int32), 0, gw - 1)
    cj = jnp.clip((gt_boxes[..., 1] * gh).astype(jnp.int32), 0, gh - 1)
    an = jnp.clip(mask_n, 0, na - 1)

    # regression targets (delta_yolo_box, yolo_layer.c:94-109)
    t_x = gt_boxes[..., 0] * gw - ci
    t_y = gt_boxes[..., 1] * gh - cj
    anc_w = all_anc[best_n][..., 0]
    anc_h = all_anc[best_n][..., 1]
    t_w = jnp.log(jnp.maximum(gt_boxes[..., 2] * net_w, 1e-9) /
                  jnp.maximum(anc_w, 1e-9))
    t_h = jnp.log(jnp.maximum(gt_boxes[..., 3] * net_h, 1e-9) /
                  jnp.maximum(anc_h, 1e-9))
    scale = 2.0 - gt_boxes[..., 2] * gt_boxes[..., 3]

    # gather predicted logits at assigned sites
    bi = jnp.arange(b)[:, None]
    z_x = tx_z[bi, an, cj, ci]
    z_y = ty_z[bi, an, cj, ci]
    z_w = tw_z[bi, an, cj, ci]
    z_h = th_z[bi, an, cj, ci]
    z_o = obj_z[bi, an, cj, ci]
    z_c = cls_z[bi, an, cj, ci]                        # [B,T,nc]

    # ---- darknet collision semantics (yolo_layer.c:235-279): the truth
    # loop is sequential, so when several GTs land on the same (cell,
    # anchor) site the box/objectness delta is OVERWRITTEN — the last
    # writer wins — while delta_yolo_class's already-set short-circuit
    # (yolo_layer.c:112-120) only upgrades the new class entry, making the
    # effective class target the UNION of the colliding one-hots.  A naive
    # gather-sum would add every colliding GT's full contribution instead.
    t_idx = jnp.arange(truths.shape[1])
    later = t_idx[None, :] > t_idx[:, None]                     # [T,T]
    same_site = (assign[:, :, None] & assign[:, None, :]
                 & (an[:, :, None] == an[:, None, :])
                 & (cj[:, :, None] == cj[:, None, :])
                 & (ci[:, :, None] == ci[:, None, :]))          # [B,T,T]
    overwritten = jnp.any(same_site & later[None], axis=2)      # [B,T]
    is_last = assign & ~overwritten
    same_cls = same_site & (gt_cls[:, :, None] == gt_cls[:, None, :])
    cls_dup = jnp.any(same_cls & later[None], axis=2)

    m = is_last.astype(jnp.float32)
    coord_loss = jnp.sum(m * scale * (
        _bce_from_logits(z_x, t_x) + _bce_from_logits(z_y, t_y)
        + 0.5 * (z_w - t_w) ** 2 + 0.5 * (z_h - t_h) ** 2))
    obj_pos_loss = jnp.sum(m * _bce_from_logits(z_o, 1.0))
    cls_onehot = jax.nn.one_hot(gt_cls, nc)
    # last writer carries the full one-hot BCE vector; each earlier
    # colliding GT only flips ITS class entry's target 0 -> 1, worth
    # BCE(z,1) - BCE(z,0) = -z (skipped when a later GT shares the class,
    # so a union entry is counted exactly once)
    cls_loss = jnp.sum(m[..., None] * _bce_from_logits(z_c, cls_onehot))
    m_flip = (assign & ~is_last & ~cls_dup).astype(jnp.float32)
    z_own = jnp.take_along_axis(z_c, gt_cls[..., None], axis=-1)[..., 0]
    cls_loss = cls_loss + jnp.sum(m_flip * (-z_own))

    # background objectness everywhere, minus the gradient already applied
    # at assigned sites (darknet overwrites delta at the assigned index).
    bg = obj_weight * _bce_from_logits(obj_z, obj_target)
    # zero the assigned sites out of the background sum via scatter
    assigned_bg = m * obj_weight[bi, an, cj, ci] * _bce_from_logits(
        z_o, 0.0)
    obj_bg_loss = jnp.sum(bg) - jnp.sum(assigned_bg)

    total = coord_loss + obj_pos_loss + cls_loss + obj_bg_loss
    # count/avg_iou tally every assigned GT, collisions included (darknet
    # increments per truth, yolo_layer.c:276-278)
    n_assign = jnp.sum(assign.astype(jnp.float32))
    metrics = {
        "coord": coord_loss, "obj": obj_pos_loss, "cls": cls_loss,
        "noobj": obj_bg_loss,
        "count": n_assign,
        "avg_iou": jnp.sum(
            jnp.where(assign, _iou_xywh(pred[bi, an, cj, ci], gt_boxes), 0.0)
        ) / jnp.maximum(n_assign, 1.0),
    }
    return total, metrics


def yolo_loss(spec, params, images, truths, net_w, net_h,
              ignore_thresh=0.7, train=True, bn_stats=None):
    """Total loss over all heads.  images: [B,H,W,3]; truths [B,T,5].
    train=True uses batch-stat BN (darknet training semantics)."""
    from betapose_tpu.models import yolov3 as yolo_mod

    if not spec.yolo_idxs and any(
            l.kind in ("region", "detection") for l in spec.layers):
        raise NotImplementedError(
            "training losses for YOLOv1 [detection] / YOLOv2 [region] "
            "heads are not implemented — inference/decode only "
            "(detection_layer.c / region_layer.c train branches); "
            "Betapose trains [yolo] heads")
    raw_heads = yolo_mod.forward(spec, params, images, net_w, decode=False,
                                 train=train, bn_stats=bn_stats)
    head_specs = [spec.layers[i] for i in spec.yolo_idxs]
    all_anchors = _canonical_anchor_order(head_specs)

    total = 0.0
    metrics = {}
    for k, (raw, hs) in enumerate(zip(raw_heads, head_specs)):
        li, m = head_loss(raw, hs.anchors, all_anchors, hs.num_classes,
                          net_w, net_h, truths, hs.ignore_thresh)
        total = total + li
        for mk, mv in m.items():
            metrics[f"head{k}/{mk}"] = mv
    batch = images.shape[0]
    return total / batch, metrics


def _canonical_anchor_order(head_specs):
    """Reconstruct the cfg's full anchor list from the heads' masked
    subsets: cfg order is small->large, so sort anchor groups by area."""
    groups = [list(hs.anchors) for hs in head_specs]
    groups_sorted = sorted(groups, key=lambda g: np.mean(
        [w * h for w, h in g]) if g else 0)
    return [a for g in groups_sorted for a in g]
