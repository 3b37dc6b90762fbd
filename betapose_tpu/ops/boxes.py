"""Box post-processing: xywh->xyxy, IoU, confidence filtering and the
reference's best-box selection — fixed-shape, mask-based, fully on device.

Reference behavior being reproduced (`yolo/util.py:104-224`):
- objectness-confidence threshold mask;
- class-0 filter (single-object eval);
- per-class NMS is HARDCODED OFF (`yolo/util.py:181` `nms = False`); instead
  a single best box per (image, class) is kept by max objectness
  (`yolo/util.py:210-211` argmax over col 5 after sorting by objectness);
- `dynamic_write_results` re-runs with nms_conf-0.05 if >100 dets survive —
  irrelevant under best-box (<=1 det/image), preserved for API parity.

On TPU this becomes one masked argmax per image: [B, nBoxes, 5+nC] ->
(boxes [B,4], score [B], cls_score [B], valid [B]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh_to_xyxy(boxes):
    """(cx, cy, w, h) -> (x1, y1, x2, y2) (`yolo/util.py:126-131`)."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_iou(box1, box2):
    """IoU with the reference's +1 convention (`yolo/bbox.py:51-77`).
    box1: (..., 4), box2: (..., 4) broadcastable, xyxy."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = (jnp.clip(x2 - x1 + 1, 0) * jnp.clip(y2 - y1 + 1, 0))
    a1 = (box1[..., 2] - box1[..., 0] + 1) * (box1[..., 3] - box1[..., 1] + 1)
    a2 = (box2[..., 2] - box2[..., 0] + 1) * (box2[..., 3] - box2[..., 1] + 1)
    return inter / (a1 + a2 - inter)


def best_box(predictions, confidence: float, target_class: int = 0):
    """Fixed-shape equivalent of write_results' keep-single-best-box path.

    predictions: [B, nBoxes, 5+nC] decoded YOLO output
    Returns dict with:
      boxes     [B, 4] xyxy in network-input pixels
      obj_score [B]    objectness of the selected box (= reference `scores`)
      cls_score [B]    max class probability of the selected box
      valid     [B]    bool, whether any box passed the confidence threshold
                       with argmax class == target_class
    """
    obj = predictions[..., 4]                       # [B, N]
    cls_probs = predictions[..., 5:]                # [B, N, nC]
    cls_best = jnp.argmax(cls_probs, axis=-1)       # [B, N]
    cls_score = jnp.max(cls_probs, axis=-1)         # [B, N]

    mask = (obj > confidence) & (cls_best == target_class)
    neg = jnp.asarray(-1.0, obj.dtype)
    masked_obj = jnp.where(mask, obj, neg)
    sel = jnp.argmax(masked_obj, axis=-1)           # [B]
    valid = jnp.any(mask, axis=-1)

    take = jax.vmap(lambda p, i: p[i])
    best = take(predictions, sel)                   # [B, 5+nC]
    boxes = xywh_to_xyxy(best[..., :4])
    return {
        "boxes": boxes,
        "obj_score": take(obj, sel),
        "cls_score": take(cls_score, sel),
        "valid": valid,
    }


def top_boxes(predictions, confidence: float, target_class: int = 0,
              capacity: int = 4, nms_thresh: float = 0.4,
              prefilter: int = 64):
    """Capacity-N extension of `best_box` for crowded/occlusion scenes:
    keep up to `capacity` target-class boxes per frame by objectness after
    greedy NMS (the reference's `nms=True` branch semantics,
    `yolo/util.py:183-199`, feeding pPose-NMS with a real cluster,
    `pPose_nms.py:24`).

    Fixed shapes throughout: the candidate set is first cut to the top
    `prefilter` boxes by masked objectness (NMS over the full ~10k-row
    decode would serialize a 10k-iteration loop on device), then greedy
    NMS selects up to `capacity`.

    predictions: [B, nBoxes, 5+nC].  Returns dict with
      boxes [B, N, 4] xyxy, obj_score [B, N], cls_score [B, N],
      valid [B, N] (False rows are zero-padded slots or below-threshold).
    """
    m = min(prefilter, predictions.shape[1])

    def one(pred):
        obj = pred[:, 4]
        cls_probs = pred[:, 5:]
        cls_best = jnp.argmax(cls_probs, axis=-1)
        cls_score = jnp.max(cls_probs, axis=-1)
        mask = (obj > confidence) & (cls_best == target_class)
        masked_obj = jnp.where(mask, obj, -1.0)
        top_sc, top_i = jax.lax.top_k(masked_obj, m)
        boxes_m = xywh_to_xyxy(pred[top_i, :4])
        keep_idx, keep_mask = nms(boxes_m, top_sc, nms_thresh, capacity)
        valid = keep_mask & mask[top_i[keep_idx]]
        return (boxes_m[keep_idx], obj[top_i[keep_idx]],
                cls_score[top_i[keep_idx]], valid)

    boxes, obj_score, cls_score, valid = jax.vmap(one)(predictions)
    return {"boxes": boxes, "obj_score": obj_score,
            "cls_score": cls_score, "valid": valid}


def rescale_boxes(boxes, orig_w, orig_h, reso: int):
    """Reference DetectionLoader box rescale (`dataloader.py:354-363`):
    multiply by (orig/reso) per axis.  NOTE: the reference letterboxes the
    input but rescales as if it had been stretch-resized; we reproduce that
    behavior when preprocessing in 'stretch' mode (the default eval path
    trains and infers consistently in stretch geometry).

    boxes [B,4] xyxy; orig_w/orig_h scalars or [B]."""
    w_ratio = orig_w / reso
    h_ratio = orig_h / reso
    if hasattr(w_ratio, "ndim") and getattr(w_ratio, "ndim", 0) == 1:
        w_ratio = w_ratio[:, None]
        h_ratio = h_ratio[:, None]
    return jnp.stack([
        boxes[..., 0] * w_ratio, boxes[..., 1] * h_ratio,
        boxes[..., 2] * w_ratio, boxes[..., 3] * h_ratio], axis=-1)


def unletterbox_boxes(boxes, orig_w, orig_h, reso: int):
    """Geometrically-correct inverse of `letterbox` for boxes (available as
    an alternative to `rescale_boxes` when preprocessing really letterboxes)."""
    scale = jnp.minimum(reso / orig_w, reso / orig_h)
    new_w = jnp.floor(orig_w * scale)
    new_h = jnp.floor(orig_h * scale)
    off_x = (reso - new_w) // 2
    off_y = (reso - new_h) // 2
    return jnp.stack([
        (boxes[..., 0] - off_x) / scale, (boxes[..., 1] - off_y) / scale,
        (boxes[..., 2] - off_x) / scale, (boxes[..., 3] - off_y) / scale],
        axis=-1)


def nms(boxes, scores, iou_thresh: float, max_out: int):
    """Classic greedy NMS as a fixed-shape lax loop (capability parity with
    the reference's dead `nms=True` branch, `yolo/util.py:183-199`, and
    darknet's `do_nms_sort`).  Returns (keep_idx [max_out], keep_mask)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    alive = jnp.ones((n,), bool)

    def body(i, state):
        alive, out_idx, out_mask = state
        is_alive = alive[i]
        cur = boxes_sorted[i]
        ious = bbox_iou(cur[None, :], boxes_sorted)
        suppress = (ious >= iou_thresh) & (jnp.arange(n) > i)
        alive = jnp.where(is_alive, alive & ~suppress, alive)
        count = jnp.sum(out_mask)
        write = is_alive & (count < max_out)
        out_idx = jnp.where(
            write, out_idx.at[jnp.minimum(count, max_out - 1)].set(order[i]),
            out_idx)
        out_mask = jnp.where(
            write, out_mask.at[jnp.minimum(count, max_out - 1)].set(True),
            out_mask)
        return alive, out_idx, out_mask

    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_mask = jnp.zeros((max_out,), bool)
    _, out_idx, out_mask = jax.lax.fori_loop(
        0, n, body, (alive, out_idx, out_mask))
    return out_idx, out_mask
