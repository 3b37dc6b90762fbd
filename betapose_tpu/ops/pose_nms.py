"""Parametric pose NMS (pPose-NMS) + score-weighted pose merging.

Faithful reimplementation of reference `pPose_nms.py:24-281` in numpy
(host-side, used for the multi-candidate path, e.g. occlusion scenes) plus a
jit-friendly single-candidate fast path used by the fused eval pipeline (the
LineMod eval keeps exactly one best box per frame — `yolo/util.py:210-211` —
so the NMS loop degenerates to the score filter + constant merge).

Eval-path constants (`pPose_nms.py:12-20`; the canonical values per
SURVEY.md 2.10):
  delta1 = 1, mu = 1.7, delta2 = 2.65, gamma = 22.48,
  scoreThreds = 0.3, matchThreds = 5, areaThres = 0, alpha = 0.1.
Output keypoints carry the reference's -0.3 offset; proposal_score =
mean(scores) + bbox_score + 1.25 * max(scores).
"""

from __future__ import annotations

import numpy as np

DELTA1 = 1.0
MU = 1.7
DELTA2 = 2.65
GAMMA = 22.48
SCORE_THRESH = 0.3
MATCH_THRESH = 5
AREA_THRESH = 0.0
ALPHA = 0.1
KP_OFFSET = -0.3


def _parametric_distance(pick, preds, scores, ref_dist, delta2=DELTA2):
    """`get_parametric_distance` (`pPose_nms.py:244-268`).  delta2 defaults
    to the eval-path constant 2.65; the trainer-side variant
    (`train_KPD/src/predict/p_poseNMS.py`) uses 1.3 — pass it through
    `pose_nms(..., delta2=1.3)` for that behavior."""
    pick_preds = preds[pick]            # [K,2]
    pred_scores = scores[pick][:, 0]    # [K]
    dist = np.sqrt(np.sum((pick_preds[None] - preds) ** 2, axis=2))  # [n,K]
    mask = dist <= 1.0
    kp_num = preds.shape[1]
    score_dists = np.zeros((preds.shape[0], kp_num))
    sc = scores[:, :, 0]                # [n,K]
    ps = np.broadcast_to(pred_scores[None, :], sc.shape)
    score_dists[mask] = (np.tanh(ps[mask] / DELTA1)
                         * np.tanh(sc[mask] / DELTA1))
    point_dist = np.exp(-dist / delta2)
    return score_dists.sum(axis=1) + MU * point_dist.sum(axis=1)


def _pck_match(pick_pred, preds, ref_dist):
    """`PCK_match` (`pPose_nms.py:271-281`).  A degenerate zero-size box
    gives ref == 0; numpy's inf/nan comparison semantics then match the
    reference's behavior exactly — just don't warn about it."""
    dist = np.sqrt(np.sum((pick_pred[None] - preds) ** 2, axis=2))
    ref = min(ref_dist, 7)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sum(dist / ref <= 1, axis=1)


def _merge_fast(ref_pose, cluster_preds, cluster_scores, ref_dist):
    """`p_merge_fast` (`pPose_nms.py:204-241`): score-weighted merge of all
    cluster poses whose per-keypoint distance to the reference pose is within
    min(ref_dist, 15)."""
    dist = np.sqrt(np.sum((ref_pose[None] - cluster_preds) ** 2, axis=2))
    ref = min(ref_dist, 15)
    mask = dist <= ref                                   # [m,K]
    masked_scores = cluster_scores * mask[..., None]     # [m,K,1]
    denom = masked_scores.sum(axis=0)                    # [K,1]
    denom = np.where(denom == 0, 1e-12, denom)
    normed = masked_scores / denom
    final_pose = (cluster_preds * normed).sum(axis=0)    # [K,2]
    final_score = (masked_scores * normed).sum(axis=0)[:, 0]  # [K]
    return final_pose, final_score


def pose_nms(bboxes, bbox_scores, pose_preds, pose_scores, delta2=DELTA2):
    """Parametric pose NMS (`pPose_nms.py:24-122`).

    bboxes (n,4) xyxy; bbox_scores (n,); pose_preds (n,K,2);
    pose_scores (n,K,1).  Returns a list of result dicts with keys
    'bbox', 'keypoints', 'kp_score', 'proposal_score'."""
    bboxes = np.asarray(bboxes, np.float64)
    bbox_scores = np.asarray(bbox_scores, np.float64).reshape(-1)
    pose_preds = np.asarray(pose_preds, np.float64)
    pose_scores = np.asarray(pose_scores, np.float64)
    if pose_scores.ndim == 2:
        pose_scores = pose_scores[..., None]
    pose_scores = pose_scores.copy()
    pose_scores[pose_scores == 0] = 1e-5

    n = bboxes.shape[0]
    widths = bboxes[:, 2] - bboxes[:, 0]
    heights = bboxes[:, 3] - bboxes[:, 1]
    ref_dists = ALPHA * np.maximum(widths, heights)

    ori_preds = pose_preds.copy()
    ori_scores = pose_scores.copy()
    ori_bbox_scores = bbox_scores.copy()

    human_scores = pose_scores.mean(axis=1)[:, 0]
    human_ids = np.arange(n)
    preds, scores, bscores = pose_preds, pose_scores, bbox_scores

    pick, merge_ids = [], []
    while human_scores.shape[0] != 0:
        pick_id = int(np.argmax(human_scores))
        pick.append(human_ids[pick_id])
        ref_dist = ref_dists[human_ids[pick_id]]
        simi = _parametric_distance(pick_id, preds, scores, ref_dist, delta2)
        n_match = _pck_match(preds[pick_id], preds, ref_dist)
        delete_ids = np.arange(human_scores.shape[0])[
            (simi > GAMMA) | (n_match >= MATCH_THRESH)]
        if delete_ids.size == 0:
            delete_ids = np.array([pick_id])
        merge_ids.append(human_ids[delete_ids])
        preds = np.delete(preds, delete_ids, axis=0)
        scores = np.delete(scores, delete_ids, axis=0)
        human_ids = np.delete(human_ids, delete_ids)
        human_scores = np.delete(human_scores, delete_ids, axis=0)
        bscores = np.delete(bscores, delete_ids, axis=0)

    final_result = []
    for j, p in enumerate(pick):
        scores_pick = ori_scores[p]
        if scores_pick[:, 0].max() < SCORE_THRESH:
            continue
        merge_id = merge_ids[j]
        merge_pose, merge_score = _merge_fast(
            ori_preds[p], ori_preds[merge_id], ori_scores[merge_id],
            ref_dists[p])
        max_score = merge_score.max()
        if max_score < SCORE_THRESH:
            continue
        xmax, xmin = merge_pose[:, 0].max(), merge_pose[:, 0].min()
        ymax, ymin = merge_pose[:, 1].max(), merge_pose[:, 1].min()
        if 1.5 ** 2 * (xmax - xmin) * (ymax - ymin) < AREA_THRESH:
            continue
        final_result.append({
            # reference appends bboxes[0] (sic — first box, pPose_nms.py:115)
            "bbox": bboxes[0],
            "keypoints": merge_pose + KP_OFFSET,
            "kp_score": merge_score[:, None],
            "proposal_score": float(
                merge_score.mean() + ori_bbox_scores[p]
                + 1.25 * merge_score.max()),
            # extensions beyond the reference dict (additive): the PICKED
            # candidate's own box/score, so callers can attribute outputs
            # to the detection that actually won the cluster
            "pick_bbox": bboxes[p],
            "bbox_score": float(ori_bbox_scores[p]),
        })
    return final_result


def pose_nms_device(bboxes, bbox_scores, preds, scores, valid,
                    delta2=DELTA2, extra=None):
    """Fixed-capacity on-device pPose-NMS returning the best surviving
    proposal (what the multi-candidate pipeline needs per frame).

    Full transcription of the reference clustering loop
    (`pPose_nms.py:24-122` pick-max / parametric-similarity delete /
    score-weighted merge `p_merge_fast:204-241`) as a `lax.fori_loop` with
    exactly `capacity` trips: each trip deletes at least the picked
    candidate, so `capacity` trips exhaust the candidate set.  All
    similarity/match/merge tensors are precomputed [N,N,K] elementwise ops
    (N = det_capacity <= ~16), so nothing here leaves the accelerator —
    unlike the reference's per-frame host loop through DataWriter.

    One deliberate guard beyond the reference: the picked candidate is
    always included in its own delete/merge set.  With K >= 5 keypoints the
    reference's own PCK self-match (== K >= matchThreds) already guarantees
    this; for degenerate K < 5 the reference would loop forever, we
    terminate.

    bboxes [N,4] xyxy; bbox_scores [N]; preds [N,K,2]; scores [N,K];
    valid [N] bool (padded/below-threshold detection slots).
    Returns (keypoints [K,2] w/ -0.3 offset, kp_score [K], proposal_score,
    pick_bbox [4], pick_bbox_score, valid_out) for the surviving proposal
    with the highest proposal_score.

    extra: optional [N,K] per-keypoint statistic (e.g. heatmap
    concentration) carried through the SAME score-weighted merge as the
    keypoint coordinates; when given, the merged [K] row for the winning
    proposal is appended to the return tuple.
    """
    import jax
    import jax.numpy as jnp

    n, k = scores.shape
    bboxes = bboxes.astype(jnp.float32)
    bbox_scores = bbox_scores.astype(jnp.float32).reshape(-1)
    preds = preds.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    scores = jnp.where(scores == 0, 1e-5, scores)      # pPose_nms.py:40

    widths = bboxes[:, 2] - bboxes[:, 0]
    heights = bboxes[:, 3] - bboxes[:, 1]
    ref_dists = ALPHA * jnp.maximum(widths, heights)   # pPose_nms.py:52
    human_scores = scores.mean(axis=1)                 # mean kp score

    # pairwise per-keypoint distances: d[p, j, kp] = |preds[p,kp]-preds[j,kp]|
    d = jnp.sqrt(jnp.sum((preds[:, None] - preds[None]) ** 2, axis=-1))

    # simi[p, j]: parametric distance of candidate j to pick p
    # (get_parametric_distance, pPose_nms.py:244-268; score term masked by
    # dist<=1, point term NOT masked)
    tanh_s = jnp.tanh(scores / DELTA1)                 # [N,K]
    score_d = jnp.where(d <= 1.0, tanh_s[:, None] * tanh_s[None], 0.0)
    simi = score_d.sum(-1) + MU * jnp.exp(-d / delta2).sum(-1)   # [N,N]

    # n_match[p, j]: PCK matches vs pick p (PCK_match, pPose_nms.py:271-281)
    pck_ref = jnp.minimum(ref_dists, 7.0)[:, None, None]
    n_match = jnp.sum(d / pck_ref <= 1.0, axis=-1)     # [N,N]

    idx = jnp.arange(n)

    def body(_, state):
        alive, picked, merge_mat = state
        any_alive = jnp.any(alive)
        hs = jnp.where(alive, human_scores, -jnp.inf)
        p = jnp.argmax(hs)
        del_row = alive & ((simi[p] > GAMMA) | (n_match[p] >= MATCH_THRESH))
        # empty delete set -> delete the pick alone (pPose_nms.py:75-76);
        # always include the pick (termination guard, see docstring)
        del_row = jnp.where(jnp.any(del_row), del_row, idx == p)
        del_row = (del_row | (idx == p)) & alive & any_alive
        picked = picked | ((idx == p) & alive & any_alive)
        merge_mat = merge_mat.at[p].set(
            jnp.where(any_alive, del_row, merge_mat[p]))
        alive = alive & ~del_row
        return alive, picked, merge_mat

    alive0 = jnp.asarray(valid, bool)
    picked0 = jnp.zeros((n,), bool)
    merge0 = jnp.zeros((n, n), bool)
    _, picked, merge_mat = jax.lax.fori_loop(
        0, n, body, (alive0, picked0, merge0))

    # ---- score-weighted merge, vectorized over all picks (p_merge_fast) ----
    merge_ref = jnp.minimum(ref_dists, 15.0)[:, None, None]
    m_mask = (d <= merge_ref) & merge_mat[:, :, None]            # [N,N,K]
    m_scores = scores[None] * m_mask                             # [N,N,K]
    denom = m_scores.sum(axis=1)                                 # [N,K]
    denom = jnp.where(denom == 0, 1e-12, denom)
    normed = m_scores / denom[:, None]                           # [N,N,K]
    final_pose = jnp.einsum("pjk,jkc->pkc", normed, preds)       # [N,K,2]
    final_score = (m_scores * normed).sum(axis=1)                # [N,K]

    # ---- filters + proposal score (pPose_nms.py:101-121) ----
    f_pick = scores.max(axis=1) >= SCORE_THRESH
    max_fs = final_score.max(axis=1)
    f_merge = max_fs >= SCORE_THRESH
    span_x = final_pose[..., 0].max(1) - final_pose[..., 0].min(1)
    span_y = final_pose[..., 1].max(1) - final_pose[..., 1].min(1)
    f_area = 1.5 ** 2 * span_x * span_y >= AREA_THRESH
    proposal = final_score.mean(axis=1) + bbox_scores + 1.25 * max_fs

    survive = picked & f_pick & f_merge & f_area
    best = jnp.argmax(jnp.where(survive, proposal, -jnp.inf))
    valid_out = jnp.any(survive)
    out = (final_pose[best] + KP_OFFSET, final_score[best],
           proposal[best], bboxes[best], bbox_scores[best], valid_out)
    if extra is not None:
        final_extra = jnp.einsum(
            "pjk,jk->pk", normed, extra.astype(jnp.float32))
        out = out + (final_extra[best],)
    return out


def pose_nms_single(bbox, bbox_score, pose_pred, pose_score):
    """Single-candidate fast path (n == 1), jit/numpy agnostic.

    With one candidate, NMS picks it, the merge cluster is itself, the merge
    mask is all-true (distance 0), so merged pose == pose and merged score ==
    score.  Returns (keypoints [K,2], kp_score [K], proposal_score, valid).
    Everything is computed unconditionally; `valid` carries the
    scoreThreds/area filters so the caller can mask.
    """
    import jax.numpy as jnp
    score = jnp.where(pose_score == 0, 1e-5, pose_score)
    score = score.reshape(-1)
    keypoints = pose_pred + KP_OFFSET
    max_score = jnp.max(score)
    valid = max_score >= SCORE_THRESH
    proposal = jnp.mean(score) + bbox_score + 1.25 * max_score
    return keypoints, score, proposal, valid
