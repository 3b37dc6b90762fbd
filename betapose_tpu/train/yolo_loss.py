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
              truths, ignore_thresh=0.7, focal=False):
    """Loss of one yolo head.

    raw: [B, gh, gw, nA*(5+nC)] pre-activation conv output (NHWC).
    anchors: this head's (w,h) anchor pixel sizes; all_anchors: all 9.
    truths: [B, T, 5] normalized (x,y,w,h,cls), x==0 padding.
    focal: the cfg's focal_loss knob (parser.c:284) — class deltas use
    darknet's focal formula (`delta_yolo_class`, yolo_layer.c:121-138):
    alpha = 0.5, pt = p_target + 1e-15, every class entry's plain delta
    multiplied by alpha * -(1-pt)(2·pt·ln(pt) + pt - 1).  darknet never
    differentiates through that multiplier (it IS the hand-written
    gradient), so it enters here under stop_gradient.
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

    # class_id >= classes labels are skipped in BOTH truth loops
    # (yolo_layer.c:204-207 ignore-mask pass, :238 assignment pass)
    gt_valid = (truths[..., 0] != 0) & (truths[..., 4] < nc)   # [B,T]
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
    # mode="clip": padded/skipped slots may carry class >= nc (masked out
    # below, but the default fill-mode gather would return NaN and
    # 0 * NaN poisons the sum)
    z_own = jnp.take_along_axis(z_c, gt_cls[..., None], axis=-1,
                                mode="clip")[..., 0]
    if not focal:
        # last writer carries the full one-hot BCE vector; each earlier
        # colliding GT only flips ITS class entry's target 0 -> 1, worth
        # BCE(z,1) - BCE(z,0) = -z (skipped when a later GT shares the
        # class, so a union entry is counted exactly once)
        cls_loss = jnp.sum(m[..., None] * _bce_from_logits(z_c, cls_onehot))
        m_flip = (assign & ~is_last & ~cls_dup).astype(jnp.float32)
        cls_loss = cls_loss + jnp.sum(m_flip * (-z_own))
    else:
        # focal collision semantics INVERT the attribution: the FIRST
        # writer at a site finds no delta set and writes the focal-scaled
        # full vector (every entry nonzero afterwards); every LATER
        # colliding GT hits the already-set short-circuit
        # (yolo_layer.c:115-119) and overwrites only ITS entry with the
        # PLAIN delta 1 - p.  So: first writer -> focal BCE over all
        # entries; each later writer's class entry (once per site+class;
        # the short-circuit rewrite is idempotent) -> remove the first
        # writer's focal term there, add plain BCE(z, 1).
        earlier = t_idx[None, :] < t_idx[:, None]
        is_first = assign & ~jnp.any(same_site & earlier[None], axis=2)
        p_cls = jax.nn.sigmoid(z_c)
        pt = jnp.take_along_axis(p_cls, gt_cls[..., None], axis=-1,
                                 mode="clip")[..., 0] + 1e-15
        grad_f = -(1.0 - pt) * (2.0 * pt * jnp.log(pt) + pt - 1.0)
        w_f = 0.5 * jax.lax.stop_gradient(grad_f)      # alpha = 0.5
        mf = is_first.astype(jnp.float32)
        cls_loss = jnp.sum((mf * w_f)[..., None]
                           * _bce_from_logits(z_c, cls_onehot))
        flip_keep = (assign & ~is_first & ~cls_dup).astype(jnp.float32)
        # the (unique) first writer at each flipper's site: its focal
        # weight and whether its one-hot had the flipper's class set
        first_sel = (same_site & is_first[:, None, :]).astype(jnp.float32)
        wf_first = jnp.sum(first_sel * w_f[:, None, :], axis=2)
        tgt_first = jnp.sum(
            first_sel * (gt_cls[:, None, :] == gt_cls[:, :, None]),
            axis=2)
        cls_loss = cls_loss + jnp.sum(flip_keep * (
            _bce_from_logits(z_own, 1.0)
            - wf_first * _bce_from_logits(z_own, tgt_first)))

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


def _last_writer(assign, site_keys):
    """Darknet's sequential truth loop overwrites deltas when several GTs
    claim the same site — the LAST valid writer wins.  assign: [B,T] bool;
    site_keys: tuple of [B,T] int arrays identifying the site.  Returns
    (is_last [B,T], any earlier/later collision helpers are local)."""
    t_idx = jnp.arange(assign.shape[1])
    later = t_idx[None, :] > t_idx[:, None]                     # [T,T]
    same = assign[:, :, None] & assign[:, None, :]
    for k in site_keys:
        same = same & (k[:, :, None] == k[:, None, :])
    overwritten = jnp.any(same & later[None], axis=2)           # [B,T]
    return assign & ~overwritten


def region_head_loss(raw, l, truths, seen=10**9):
    """YOLOv2 [region] training loss — gradient-equivalent vectorization
    of `forward_region_layer` (`region_layer.c:179-362`, DOABS=1,
    classfix=0, no softmax_tree/map/focal — absent from stock cfgs).

    darknet applies deltas to the layer INPUT with the logistic gradient
    folded in, so (unlike v3's BCE) the v2 loss is SQUARED ERROR in
    sigmoid space for x/y/obj and raw space for w/h; the softmax-class
    delta `class_scale*(onehot - p)` written straight to the input is
    exactly the cross-entropy gradient, so softmax classes use CE.

    Semantics reproduced:
    - per site: noobject 0.5*noobj*(0-sig(o))^2, zeroed where the
      predicted box's best IoU over GTs > thresh (region_layer.c:268-281);
    - seen < 12800 warmup: every site's box pulled toward its anchor
      prior at (cell center) with scale .01 (region_layer.c:283-292);
    - per GT (sequential, last-writer-wins on collisions): cell =
      (floor(x*gw), floor(y*gh)); best of the n anchors by shape IoU —
      against the anchor PRIOR when bias_match else the predicted w/h at
      that cell (region_layer.c:316-336); box delta with coord_scale
      (tw = log(w*gw/anchor), delta_region_box:93-111); objectness
      target 1 (or stop-grad IoU when rescore); class one-hot
      (delta_region_class:114-160).
    raw: [B, gh, gw, nA*(5+nc)] pre-activation NHWC; truths [B,T,5]
    normalized (x,y,w,h,cls), x==0 padding.  `seen` may be a python int
    (warmup branch folds at trace time) or a traced scalar.
    """
    b, gh, gw, _ = raw.shape
    na = len(l.anchors)
    nc = l.num_classes
    x = raw.reshape(b, gh, gw, na, 5 + nc).transpose(0, 3, 1, 2, 4)
    # [B, nA, gh, gw, 5+nc] — anchor-major channel blocks, the same
    # layout the decode uses (entry_index, region_layer.c:172-177)

    sx = jax.nn.sigmoid(x[..., 0])
    sy = jax.nn.sigmoid(x[..., 1])
    zw, zh = x[..., 2], x[..., 3]
    so = jax.nn.sigmoid(x[..., 4])
    cls_z = x[..., 5:]

    grid_x = jnp.arange(gw, dtype=jnp.float32)[None, None, None, :]
    grid_y = jnp.arange(gh, dtype=jnp.float32)[None, None, :, None]
    anc = jnp.asarray(l.anchors, jnp.float32)           # grid units
    aw = anc[:, 0][None, :, None, None]
    ah = anc[:, 1][None, :, None, None]

    # get_region_box w/ DOABS (region_layer.c:78-90): normalized by GRID
    px = (sx + grid_x) / gw
    py = (sy + grid_y) / gh
    pw = jnp.exp(jnp.clip(zw, -12.0, 12.0)) * aw / gw
    ph = jnp.exp(jnp.clip(zh, -12.0, 12.0)) * ah / gh
    pred = jnp.stack([px, py, pw, ph], axis=-1)

    gt_valid = (truths[..., 0] != 0) & (truths[..., 4] < nc)
    gt_boxes = truths[..., :4]
    gt_cls = truths[..., 4].astype(jnp.int32)
    if l.class_map:
        # l.map remap of the truth id (region_layer.c:350, `map=` cfg)
        gt_cls = jnp.asarray(l.class_map, jnp.int32)[
            jnp.clip(gt_cls, 0, len(l.class_map) - 1)]

    ious = _iou_xywh(pred[..., None, :], gt_boxes[:, None, None, None, :, :])
    ious = jnp.where(gt_valid[:, None, None, None, :], ious, 0.0)
    best_iou = jnp.max(ious, axis=-1)                   # [B,nA,gh,gw]

    # ---- per-GT assignment ----
    ci = jnp.clip((gt_boxes[..., 0] * gw).astype(jnp.int32), 0, gw - 1)
    cj = jnp.clip((gt_boxes[..., 1] * gh).astype(jnp.int32), 0, gh - 1)
    bi = jnp.arange(b)[:, None]
    # candidate shapes at the GT's cell: anchor priors (bias_match) or the
    # predicted w/h there (region_layer.c:318-330)
    if l.bias_match:
        cand_w = jnp.broadcast_to((anc[:, 0] / gw)[None, None, :],
                                  (b, truths.shape[1], na))
        cand_h = jnp.broadcast_to((anc[:, 1] / gh)[None, None, :],
                                  (b, truths.shape[1], na))
    else:
        cand_w = pw.transpose(0, 2, 3, 1)[bi, cj, ci]   # [B,T,nA]
        cand_h = ph.transpose(0, 2, 3, 1)[bi, cj, ci]
    shape = jnp.stack([jnp.zeros_like(cand_w), jnp.zeros_like(cand_w),
                       cand_w, cand_h], axis=-1)        # [B,T,nA,4]
    gt_shift = gt_boxes.at[..., :2].set(0.0)
    best_n = jnp.argmax(_iou_xywh(shape, gt_shift[:, :, None, :]),
                        axis=-1)                        # [B,T]

    is_last = _last_writer(gt_valid, (best_n, cj, ci))
    m = is_last.astype(jnp.float32)

    an = best_n
    z_x = sx[bi, an, cj, ci]
    z_y = sy[bi, an, cj, ci]
    z_w = zw[bi, an, cj, ci]
    z_h = zh[bi, an, cj, ci]
    z_o = so[bi, an, cj, ci]
    z_c = cls_z[bi, an, cj, ci]                         # [B,T,nc]

    t_x = gt_boxes[..., 0] * gw - ci
    t_y = gt_boxes[..., 1] * gh - cj
    anc_bt = anc[an]                                    # [B,T,2]
    t_w = jnp.log(jnp.maximum(gt_boxes[..., 2] * gw, 1e-9)
                  / jnp.maximum(anc_bt[..., 0], 1e-9))
    t_h = jnp.log(jnp.maximum(gt_boxes[..., 3] * gh, 1e-9)
                  / jnp.maximum(anc_bt[..., 1], 1e-9))

    coord_loss = jnp.sum(m * 0.5 * l.coord_scale * (
        (t_x - z_x) ** 2 + (t_y - z_y) ** 2
        + (t_w - z_w) ** 2 + (t_h - z_h) ** 2))

    iou_at = _iou_xywh(pred[bi, an, cj, ci], gt_boxes)  # [B,T]
    obj_target = (jax.lax.stop_gradient(iou_at) if l.rescore
                  else jnp.ones_like(iou_at))
    obj_pos_loss = jnp.sum(m * 0.5 * l.object_scale
                           * (obj_target - z_o) ** 2)

    onehot = jax.nn.one_hot(gt_cls, nc)
    if l.tree is not None:
        # softmax-tree class delta (delta_region_class hier branch,
        # region_layer.c:116-129): a softmax CE delta within EVERY
        # ancestor level's sibling group, zero elsewhere — the gradient
        # of  -sum_{a in path(c)} log p_group(a)[a].  The onlyclass
        # sentinel branch (truth.x > 1e5, region_layer.c:225-247 — the
        # YOLO9000 joint-classification hack) is out of scope with its
        # dataloader.
        from betapose_tpu.data.wordtree import group_log_softmax
        logp = group_log_softmax(z_c, l.tree.group_onehot())  # [B,T,nc]
        path = jnp.asarray(l.tree.ancestor_matrix(), jnp.float32)
        cls_loss = jnp.sum(
            m * l.class_scale * -jnp.sum(path[gt_cls] * logp, axis=-1))
    elif l.det_softmax:
        # delta class_scale*(onehot - softmax) on the input == CE grad
        cls_loss = jnp.sum(
            m * l.class_scale
            * -jnp.sum(onehot * jax.nn.log_softmax(z_c), axis=-1))
    else:
        cls_loss = jnp.sum(m[..., None] * 0.5 * l.class_scale
                           * (onehot - z_c) ** 2)

    # sites claimed by ANY GT: their noobj/warmup deltas are overwritten
    claimed = jnp.zeros((b, na, gh, gw), bool).at[bi, an, cj, ci].max(
        gt_valid)
    free = (~claimed).astype(jnp.float32)

    noobj_keep = jnp.where(best_iou > l.ignore_thresh, 0.0, 1.0)
    noobj_loss = jnp.sum(free * noobj_keep * 0.5 * l.noobject_scale
                         * so ** 2)

    warm_on = (jnp.asarray(seen) < 12800).astype(jnp.float32)
    warm_loss = warm_on * jnp.sum(free * 0.5 * 0.01 * (
        (0.5 - sx) ** 2 + (0.5 - sy) ** 2 + zw ** 2 + zh ** 2))

    total = coord_loss + obj_pos_loss + cls_loss + noobj_loss + warm_loss
    n_assign = jnp.sum(gt_valid.astype(jnp.float32))
    metrics = {
        "coord": coord_loss, "obj": obj_pos_loss, "cls": cls_loss,
        "noobj": noobj_loss, "count": n_assign,
        "avg_iou": jnp.sum(jnp.where(gt_valid, iou_at, 0.0))
        / jnp.maximum(n_assign, 1.0),
        "recall": jnp.sum(jnp.where(gt_valid, (iou_at > 0.5), False)
                          .astype(jnp.float32))
        / jnp.maximum(n_assign, 1.0),
    }
    return total, metrics


def detection_head_loss(x_prev, l, truths):
    """YOLOv1 [detection] training loss — gradient-equivalent
    vectorization of `forward_detection_layer` (`detection_layer.c:
    49-218`; forced/random out of scope — absent from stock v1 cfgs).

    All outputs are raw (no sigmoids in v1); deltas are plain
    (target - output), so every term is squared error — except softmax
    classes where the delta written to the input is the CE gradient
    (same situation as [region]).

    Truth conversion: darknet feeds a dense per-cell truth layout built
    by fill_truth_region (`data.c:260-300`): FIRST box to claim a cell
    wins, boxes with w or h < .001 skipped, class one-hot zeroed when
    id >= classes.  Reproduced here from the padded [B,T,5] box list.

    Per obj cell (detection_layer.c:95-181): class deltas; best of the
    `num` boxes by IoU in the cell-relative frame (x/side, no col/row
    offset) — or by min RMSE while every IoU is zero; objectness target
    1 (stop-grad IoU when rescore) at the best box, its noobject term
    removed; coord deltas with coord_scale (sqrt(w) targets when sqrt).
    """
    s, n, nc = l.side, l.num, l.num_classes
    sc = s * s
    b = x_prev.shape[0]
    flat = (x_prev.transpose(0, 3, 1, 2).reshape(b, -1)
            if x_prev.ndim == 4 else x_prev.reshape(b, -1))
    flat = flat.astype(jnp.float32)
    cls_z = flat[:, :sc * nc].reshape(b, sc, nc)
    obj = flat[:, sc * nc:sc * (nc + n)].reshape(b, sc, n)
    boxes = flat[:, sc * (nc + n):sc * (nc + n) + sc * n * 4]
    boxes = boxes.reshape(b, sc, n, 4)

    # ---- dense truth from the box list (fill_truth_region) ----
    T = truths.shape[1]
    gt_valid = ((truths[..., 0] != 0)
                & (truths[..., 2] >= 0.001) & (truths[..., 3] >= 0.001))
    col = jnp.clip((truths[..., 0] * s).astype(jnp.int32), 0, s - 1)
    row = jnp.clip((truths[..., 1] * s).astype(jnp.int32), 0, s - 1)
    cell = row * s + col                                 # [B,T]
    t_idx = jnp.arange(T)
    earlier = t_idx[None, :] < t_idx[:, None]            # [T,T]
    same_cell = (gt_valid[:, :, None] & gt_valid[:, None, :]
                 & (cell[:, :, None] == cell[:, None, :]))
    wins = gt_valid & ~jnp.any(same_cell & earlier[None], axis=2)

    w1 = wins.astype(jnp.float32)
    cell_oh = jax.nn.one_hot(cell, sc) * w1[..., None]   # [B,T,sc]
    is_obj = jnp.max(cell_oh, axis=1)                    # [B,sc]
    gt_cls = truths[..., 4].astype(jnp.int32)
    cls_oh = jax.nn.one_hot(gt_cls, nc) * (gt_cls < nc)[..., None]
    t_cls = jnp.einsum("btc,btk->bck", cell_oh, cls_oh)  # [B,sc,nc]
    tx = truths[..., 0] * s - col
    ty = truths[..., 1] * s - row
    t_box = jnp.einsum("btc,btk->bck", cell_oh, jnp.stack(
        [tx, ty, truths[..., 2], truths[..., 3]], axis=-1))  # [B,sc,4]

    # ---- noobject everywhere (minus best-box slots, removed below) ----
    noobj_all = 0.5 * l.noobject_scale * obj ** 2        # [B,sc,n]

    # ---- class loss at obj cells ----
    if l.det_softmax:
        # lse(z) - t.z == CE for one-hot t, but its gradient (p - t)
        # also matches darknet's delta when t is all-zero (a truth with
        # id >= classes still claims the cell, fill_truth_region:292)
        cls_loss = jnp.sum(is_obj * l.class_scale * (
            jax.nn.logsumexp(cls_z, axis=-1)
            - jnp.sum(t_cls * cls_z, axis=-1)))
    else:
        cls_loss = jnp.sum(is_obj[..., None] * 0.5 * l.class_scale
                           * (t_cls - cls_z) ** 2)

    # ---- best box per obj cell (cell-relative frame, /side) ----
    out_xy = boxes[..., :2] / s
    out_wh = boxes[..., 2:] ** 2 if l.det_sqrt else boxes[..., 2:]
    out_box = jnp.concatenate([out_xy, out_wh], axis=-1)  # [B,sc,n,4]
    tb = t_box.at[..., :2].divide(s)[:, :, None, :]       # [B,sc,1,4]
    iou = _iou_xywh(out_box, tb)                          # [B,sc,n]
    rmse = jnp.sqrt(jnp.sum((out_box - tb) ** 2, axis=-1))
    any_iou = jnp.max(iou, axis=-1) > 0
    best = jnp.where(any_iou, jnp.argmax(iou, axis=-1),
                     jnp.argmin(rmse, axis=-1))           # [B,sc]
    best_oh = jax.nn.one_hot(best, n) * is_obj[..., None]  # [B,sc,n]

    iou_b = jnp.take_along_axis(iou, best[..., None], axis=-1)[..., 0]
    obj_b = jnp.take_along_axis(obj, best[..., None], axis=-1)[..., 0]
    o_target = (jax.lax.stop_gradient(iou_b) if l.rescore
                else jnp.ones_like(iou_b))
    obj_loss = jnp.sum(is_obj * 0.5 * l.object_scale
                       * (o_target - obj_b) ** 2)
    noobj_loss = jnp.sum(noobj_all) - jnp.sum(best_oh * noobj_all)

    box_b = jnp.take_along_axis(
        boxes, best[..., None, None].repeat(4, -1), axis=2)[:, :, 0, :]
    t_reg = (t_box.at[..., 2:].set(jnp.sqrt(t_box[..., 2:]))
             if l.det_sqrt else t_box)
    coord_loss = jnp.sum(is_obj[..., None] * 0.5 * l.coord_scale
                         * (t_reg - box_b) ** 2)

    total = cls_loss + obj_loss + noobj_loss + coord_loss
    n_obj = jnp.sum(is_obj)
    metrics = {
        "coord": coord_loss, "obj": obj_loss, "cls": cls_loss,
        "noobj": noobj_loss, "count": n_obj,
        "avg_iou": jnp.sum(is_obj * iou_b) / jnp.maximum(n_obj, 1.0),
    }
    return total, metrics


def yolo_loss(spec, params, images, truths, net_w, net_h,
              ignore_thresh=0.7, train=True, bn_stats=None, seen=10**9,
              dropout_key=None):
    """Total loss over all detector heads ([yolo], [region], [detection]).
    images: [B,H,W,3]; truths [B,T,5] normalized (x,y,w,h,cls), x==0
    padding.  train=True uses batch-stat BN (darknet training semantics).
    `seen` (images consumed so far) drives [region]'s <12800 warmup; v3
    heads ignore it.  dropout_key activates [dropout] layers (v1 cfgs)."""
    from betapose_tpu.models import yolov3 as yolo_mod

    raw_heads = yolo_mod.forward(spec, params, images, net_w, decode=False,
                                 train=train, bn_stats=bn_stats,
                                 dropout_key=dropout_key)
    head_specs = [spec.layers[i] for i, l in enumerate(spec.layers)
                  if l.kind in ("yolo", "region", "detection")]
    yolo_specs = [hs for hs in head_specs if hs.kind == "yolo"]
    all_anchors = _canonical_anchor_order(yolo_specs)

    total = 0.0
    metrics = {}
    for k, (raw, hs) in enumerate(zip(raw_heads, head_specs)):
        raw = raw.astype(jnp.float32)   # head loss math always in f32
        if hs.kind == "yolo":
            li, m = head_loss(raw, hs.anchors, all_anchors, hs.num_classes,
                              net_w, net_h, truths, hs.ignore_thresh,
                              focal=hs.focal_loss)
        elif hs.kind == "region":
            li, m = region_head_loss(raw, hs, truths, seen=seen)
        else:
            li, m = detection_head_loss(raw, hs, truths)
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
