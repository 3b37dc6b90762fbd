"""Heatmap decode, gaussian target rendering, best-box selection, pose-NMS."""

import numpy as np
import pytest

import jax.numpy as jnp

from betapose_tpu.ops import heatmap as hm_ops
from betapose_tpu.ops import boxes as box_ops
from betapose_tpu.ops import pose_nms as pnms


def _reference_get_prediction(hms, res_h, res_w):
    """Numpy transcription of getPrediction's peak+refine loop
    (KPD/src/utils/eval.py:113-141), heatmap-coords part only."""
    n, k, h, w = hms.shape
    preds = np.zeros((n, k, 2), np.float32)
    maxval = np.zeros((n, k), np.float32)
    for i in range(n):
        for j in range(k):
            flat = hms[i, j].reshape(-1)
            idx = int(np.argmax(flat))
            maxval[i, j] = flat[idx]
            x, y = idx % w, idx // w
            px, py = float(x), float(y)
            if maxval[i, j] <= 0:
                px, py = 0.0, 0.0
            pX, pY = int(round(px)), int(round(py))
            dx = dy = 0.0
            if 0 < pX < w - 1 and 0 < pY < h - 1:
                dx = np.sign(hms[i, j, pY, pX + 1] - hms[i, j, pY, pX - 1]) * 0.25
                dy = np.sign(hms[i, j, pY + 1, pX] - hms[i, j, pY - 1, pX]) * 0.25
            preds[i, j] = [px + dx + 0.2, py + dy + 0.2]
    return preds, maxval


class TestHeatmapDecode:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(0)
        hms = rng.standard_normal((3, 5, 80, 64)).astype(np.float32)
        pt1 = jnp.zeros((3, 2))
        pt2 = jnp.asarray(np.tile([256.0, 320.0], (3, 1)))
        preds, preds_img, maxval = hm_ops.decode_heatmaps(
            jnp.asarray(hms), pt1, pt2, 320, 256, 80, 64)
        golden, gold_max = _reference_get_prediction(hms, 80, 64)
        np.testing.assert_allclose(np.asarray(preds), golden, atol=1e-5)
        np.testing.assert_allclose(np.asarray(maxval)[..., 0], gold_max,
                                   rtol=1e-6)

    def test_peak_at_border_not_refined(self):
        hms = np.zeros((1, 1, 8, 8), np.float32)
        hms[0, 0, 0, 0] = 1.0  # corner peak: no refinement
        preds, _, _ = hm_ops.decode_heatmaps(
            jnp.asarray(hms), jnp.zeros((1, 2)),
            jnp.asarray([[64.0, 80.0]]), 320, 256, 8, 8)
        np.testing.assert_allclose(np.asarray(preds)[0, 0], [0.2, 0.2],
                                   atol=1e-6)


def _reference_draw_gaussian(pt, res_h, res_w, sigma):
    """Numpy transcription of drawGaussian (KPD/src/utils/img.py:82-111)."""
    img = np.zeros((res_h, res_w), np.float32)
    tmp_size = 3 * sigma
    ul = [int(pt[0] - tmp_size), int(pt[1] - tmp_size)]
    br = [int(pt[0] + tmp_size + 1), int(pt[1] + tmp_size + 1)]
    if ul[0] >= res_w or ul[1] >= res_h or br[0] < 0 or br[1] < 0:
        return img
    size = 2 * tmp_size + 1
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    s = size / 4.0
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * s ** 2))
    g_x = max(0, -ul[0]), min(br[0], res_w) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], res_h) - ul[1]
    img_x = max(0, ul[0]), min(br[0], res_w)
    img_y = max(0, ul[1]), min(br[1], res_h)
    img[img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
        g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return img


class TestDrawGaussian:
    @pytest.mark.parametrize("pt", [
        (32.0, 40.0), (0.5, 0.5), (63.0, 79.0), (5.7, 2.3), (-2.0, 40.0),
        (70.0, 40.0),
    ])
    def test_matches_reference(self, pt):
        ours = np.asarray(hm_ops.draw_gaussian_batch(
            jnp.asarray([[pt]]), 80, 64, sigma=1))[0, 0]
        golden = _reference_draw_gaussian(pt, 80, 64, 1)
        np.testing.assert_allclose(ours, golden, atol=1e-6)


def _reference_best_box(preds, confidence):
    """Numpy emulation of write_results' best-box path (yolo/util.py:118-224)
    for one image, single class."""
    obj = preds[:, 4]
    cls_score = preds[:, 5:].max(axis=1)
    cls_idx = preds[:, 5:].argmax(axis=1)
    mask = (obj > confidence) & (cls_idx == 0)
    if not mask.any():
        return None
    cand = np.where(mask)[0]
    best = cand[np.argmax(obj[cand])]
    b = preds[best]
    box = [b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2]
    return box, obj[best], cls_score[best]


class TestBestBox:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        preds = rng.random((2, 100, 7)).astype(np.float32)
        preds[:, :, :4] *= 416
        out = box_ops.best_box(jnp.asarray(preds), confidence=0.5)
        for b in range(2):
            golden = _reference_best_box(preds[b], 0.5)
            if golden is None:
                assert not bool(out["valid"][b])
            else:
                assert bool(out["valid"][b])
                np.testing.assert_allclose(np.asarray(out["boxes"][b]),
                                           golden[0], rtol=1e-5)
                np.testing.assert_allclose(float(out["obj_score"][b]),
                                           golden[1], rtol=1e-6)

    def test_no_detection(self):
        preds = np.zeros((1, 10, 7), np.float32)
        out = box_ops.best_box(jnp.asarray(preds), confidence=0.5)
        assert not bool(out["valid"][0])

    def test_class_filter(self):
        # nC=2: boxes whose argmax class != 0 must be ignored
        preds = np.zeros((1, 3, 8), np.float32)
        preds[0, 0, 4] = 0.9
        preds[0, 0, 5:7] = [0.1, 0.9]   # class 1 -> filtered
        preds[0, 1, 4] = 0.7
        preds[0, 1, 5:7] = [0.8, 0.2]   # class 0 -> eligible
        out = box_ops.best_box(jnp.asarray(preds), confidence=0.5)
        assert bool(out["valid"][0])
        assert abs(float(out["obj_score"][0]) - 0.7) < 1e-6


class TestPoseNMS:
    def _mk(self, rng, n=3, k=50):
        bboxes = np.array([[10, 10, 110, 120]] * n, np.float64)
        bscores = rng.random(n)
        preds = rng.random((n, k, 2)) * 100
        scores = rng.random((n, k, 1))
        return bboxes, bscores, preds, scores

    def test_single_candidate_paths_agree(self):
        rng = np.random.default_rng(2)
        bboxes, bscores, preds, scores = self._mk(rng, n=1)
        full = pnms.pose_nms(bboxes, bscores, preds, scores)
        kp, ksc, prop, valid = pnms.pose_nms_single(
            jnp.asarray(bboxes[0]), float(bscores[0]),
            jnp.asarray(preds[0]), jnp.asarray(scores[0]))
        assert bool(valid) == (len(full) == 1)
        if full:
            np.testing.assert_allclose(np.asarray(kp), full[0]["keypoints"],
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(ksc),
                                       full[0]["kp_score"][:, 0], rtol=1e-5)
            np.testing.assert_allclose(float(prop),
                                       full[0]["proposal_score"], rtol=1e-5)

    def test_low_score_filtered(self):
        rng = np.random.default_rng(3)
        bboxes, bscores, preds, scores = self._mk(rng, n=1)
        scores *= 0.2  # max < 0.3
        assert pnms.pose_nms(bboxes, bscores, preds, scores) == []
        _, _, _, valid = pnms.pose_nms_single(
            jnp.asarray(bboxes[0]), float(bscores[0]),
            jnp.asarray(preds[0]), jnp.asarray(scores[0]))
        assert not bool(valid)

    def test_identical_poses_merge_to_one(self):
        rng = np.random.default_rng(4)
        bboxes, bscores, preds, scores = self._mk(rng, n=3)
        preds[1] = preds[0]
        preds[2] = preds[0]
        scores[:] = 0.9
        out = pnms.pose_nms(bboxes, bscores, preds, scores)
        assert len(out) == 1
        # merged pose of identical candidates is the pose itself (+offset)
        np.testing.assert_allclose(out[0]["keypoints"], preds[0] - 0.3,
                                   rtol=1e-6)

    def test_distinct_poses_kept(self):
        rng = np.random.default_rng(5)
        bboxes, bscores, preds, scores = self._mk(rng, n=2)
        preds[1] = preds[0] + 500.0  # far apart
        scores[:] = 0.9
        out = pnms.pose_nms(bboxes, bscores, preds, scores)
        assert len(out) == 2


class TestGreedyNMS:
    def test_matches_host_nms(self):
        """Device fixed-shape NMS vs a straightforward host greedy NMS."""
        rng = np.random.default_rng(8)
        n = 24
        centers = rng.uniform(50, 350, (n, 2))
        sizes = rng.uniform(30, 80, (n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
        scores = rng.random(n).astype(np.float32)

        keep_idx, keep_mask = box_ops.nms(
            jnp.asarray(boxes.astype(np.float32)), jnp.asarray(scores),
            iou_thresh=0.4, max_out=n)
        ours = set(np.asarray(keep_idx)[np.asarray(keep_mask)].tolist())

        # host oracle with the same +1 IoU convention
        order = np.argsort(-scores)
        alive = np.ones(n, bool)
        golden = set()
        for oi, i in enumerate(order):
            if not alive[i]:
                continue
            golden.add(int(i))
            for j in order[oi + 1:]:
                if alive[j]:
                    iou = float(box_ops.bbox_iou(
                        jnp.asarray(boxes[i]), jnp.asarray(boxes[j])))
                    if iou >= 0.4:
                        alive[j] = False
        assert ours == golden


class TestTopBoxes:
    def test_matches_host_oracle(self):
        """top_boxes (capacity-N selection for the multi-candidate pipeline)
        vs a host transcription: confidence+class mask, then greedy NMS by
        objectness, keep up to N."""
        rng = np.random.default_rng(11)
        nb, nc, cap = 40, 3, 4
        centers = rng.uniform(60, 340, (nb, 2))
        sizes = rng.uniform(40, 90, (nb, 2))
        xywh = np.concatenate([centers, sizes], 1).astype(np.float32)
        obj = rng.random(nb).astype(np.float32)
        cls = rng.random((nb, nc)).astype(np.float32)
        preds = np.concatenate([xywh, obj[:, None], cls], 1)[None]

        out = box_ops.top_boxes(jnp.asarray(preds), confidence=0.3,
                                target_class=1, capacity=cap,
                                nms_thresh=0.45)
        got = {tuple(np.round(b, 3))
               for b, v in zip(np.asarray(out["boxes"][0]),
                               np.asarray(out["valid"][0])) if v}

        # host oracle: greedy NMS over masked-objectness order; the valid
        # outputs are the first `cap` mask-passing survivors
        mask = (obj > 0.3) & (cls.argmax(1) == 1)
        boxes = np.asarray(box_ops.xywh_to_xyxy(jnp.asarray(xywh)))
        order = np.argsort(-np.where(mask, obj, -1.0), kind="stable")
        alive = np.ones(nb, bool)
        survivors = []
        for i in order:
            if not alive[i]:
                continue
            survivors.append(i)
            for j in order:
                if j != i and alive[j]:
                    iou = float(box_ops.bbox_iou(
                        jnp.asarray(boxes[i]), jnp.asarray(boxes[j])))
                    if iou >= 0.45:
                        alive[j] = False
        golden = [i for i in survivors if mask[i]][:cap]
        want = {tuple(np.round(boxes[i], 3)) for i in golden}
        assert got == want

    def test_invalid_slots_masked(self):
        # one passing box, capacity 3 -> exactly one valid slot
        pred = np.zeros((1, 5, 7), np.float32)
        pred[0, 2, :4] = [100, 100, 40, 40]
        pred[0, 2, 4] = 0.9
        pred[0, 2, 5] = 0.8           # class 0
        out = box_ops.top_boxes(jnp.asarray(pred), confidence=0.5,
                                target_class=0, capacity=3)
        assert int(np.asarray(out["valid"][0]).sum()) == 1


class TestPoseNMSPickFields:
    def test_pick_bbox_and_score_attribute_the_winner(self):
        """The additive pick_bbox/bbox_score fields must belong to the
        candidate the NMS picked (highest mean pose score), not to index 0
        (whose bbox the reference-quirk 'bbox' field reports)."""
        rng = np.random.default_rng(9)
        n, k = 2, 50
        bboxes = np.array([[10, 10, 110, 120], [500, 10, 610, 130]],
                          np.float64)
        bscores = np.array([0.2, 0.9])
        preds = rng.random((n, k, 2)) * 50
        preds[1] += 500.0                      # far apart -> two proposals
        scores = np.full((n, k, 1), 0.5)
        scores[1] = 0.95                       # candidate 1 wins its cluster
        out = pnms.pose_nms(bboxes, bscores, preds, scores)
        assert len(out) == 2
        by_score = {round(r["bbox_score"], 6) for r in out}
        assert by_score == {0.2, 0.9}
        for r in out:
            if r["bbox_score"] == 0.9:
                np.testing.assert_array_equal(r["pick_bbox"], bboxes[1])
            # reference-quirk field stays bboxes[0] for every result
            np.testing.assert_array_equal(r["bbox"], bboxes[0])


class TestHeatmapConcentration:
    """heatmap_concentration (PnP spread-weighting extension): inverse
    participation ratio of the rectified map."""

    def _gauss(self, h, w, cy, cx, s):
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        return np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))

    def test_gaussian_matches_closed_form(self):
        """For an interior gaussian of std s, sum(g^2)/sum(g)^2 ->
        1/(4*pi*s^2) (continuous-integral ratio)."""
        import jax.numpy as jnp
        from betapose_tpu.ops import heatmap as hm
        for s in (1.5, 3.0):
            g = self._gauss(64, 64, 32, 32, s)[None, None]
            got = float(hm.heatmap_concentration(jnp.asarray(g))[0, 0])
            want = 1.0 / (4.0 * np.pi * s * s)
            assert abs(got - want) / want < 0.02

    def test_orders_sharp_above_flat_and_bimodal(self):
        import jax.numpy as jnp
        from betapose_tpu.ops import heatmap as hm
        sharp = self._gauss(48, 48, 24, 24, 1.5)
        flat = self._gauss(48, 48, 24, 24, 5.0)
        bimodal = 0.5 * (self._gauss(48, 48, 14, 14, 1.5)
                         + self._gauss(48, 48, 34, 34, 1.5))
        c = np.asarray(hm.heatmap_concentration(
            jnp.asarray(np.stack([sharp, flat, bimodal])[None])))[0]
        assert c[0] > c[2] > c[1]       # sharp > bimodal > flat
        # height-invariant: scaling the map doesn't change it
        c10 = float(hm.heatmap_concentration(
            jnp.asarray(10.0 * sharp[None, None]))[0, 0])
        assert abs(c10 - c[0]) < 1e-6 * c[0] + 1e-9

    def test_nonpositive_map_is_zero(self):
        import jax.numpy as jnp
        from betapose_tpu.ops import heatmap as hm
        z = np.full((1, 2, 8, 8), -0.5, np.float32)
        out = np.asarray(hm.heatmap_concentration(jnp.asarray(z)))
        np.testing.assert_array_equal(out, 0.0)
