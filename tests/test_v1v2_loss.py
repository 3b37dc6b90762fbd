"""YOLOv1 [detection] / YOLOv2 [region] training-loss oracles.

Each test transcribes the reference C delta loop in numpy —
`region_layer.c forward_region_layer:179-362` (sequential truth loop,
warmup, bias_match, rescore, softmax/SE classes) and
`detection_layer.c forward_detection_layer:49-218` (dense per-cell truth
via a `data.c fill_truth_region:260-300` transcription, IoU-then-RMSE
best-box rule) — and checks jax.grad of the vectorized losses equals the
NEGATIVE delta exactly (darknet's delta is the negative input gradient,
applied by `backward_*_layer`'s axpy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3
from betapose_tpu.train.yolo_loss import (detection_head_loss,
                                          region_head_loss, yolo_loss)


def _sig(v):
    return 1.0 / (1.0 + np.exp(-v))


def _iou(b1, b2):
    l1, r1 = b1[0] - b1[2] / 2, b1[0] + b1[2] / 2
    t1, d1 = b1[1] - b1[3] / 2, b1[1] + b1[3] / 2
    l2, r2 = b2[0] - b2[2] / 2, b2[0] + b2[2] / 2
    t2, d2 = b2[1] - b2[3] / 2, b2[1] + b2[3] / 2
    iw = max(0.0, min(r1, r2) - max(l1, l2))
    ih = max(0.0, min(d1, d2) - max(t1, t2))
    inter = iw * ih
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return inter / union if union > 0 else 0.0


# ---------------------------------------------------------------------------
# [region]
# ---------------------------------------------------------------------------

def _region_grad(raw, l, truths, seen):
    """-delta of forward_region_layer (region_layer.c:179-362), float64."""
    b, gh, gw, _ = raw.shape
    na = len(l.anchors)
    nc = l.num_classes
    x = raw.reshape(b, gh, gw, na, 5 + nc)
    delta = np.zeros_like(x)
    anc = np.asarray(l.anchors, np.float64)

    def pred_box(bi, j, i, n):
        return ((i + _sig(x[bi, j, i, n, 0])) / gw,
                (j + _sig(x[bi, j, i, n, 1])) / gh,
                np.exp(x[bi, j, i, n, 2]) * anc[n, 0] / gw,
                np.exp(x[bi, j, i, n, 3]) * anc[n, 1] / gh)

    def softmax(z):
        e = np.exp(z - z.max())
        return e / e.sum()

    for bi in range(b):
        gts = [t for t in truths[bi] if t[0] != 0 and t[4] < nc]
        # ---- site loop (region_layer.c:255-293) ----
        for j in range(gh):
            for i in range(gw):
                for n in range(na):
                    p = pred_box(bi, j, i, n)
                    best = max((_iou(p, t[:4]) for t in gts), default=0.0)
                    so = _sig(x[bi, j, i, n, 4])
                    delta[bi, j, i, n, 4] = (
                        l.noobject_scale * (0.0 - so) * so * (1 - so))
                    if best > l.ignore_thresh:
                        delta[bi, j, i, n, 4] = 0.0
                    if seen < 12800:
                        # delta_region_box toward the anchor prior at the
                        # cell center, scale .01 (tw target = log(1) = 0)
                        s0 = _sig(x[bi, j, i, n, 0])
                        s1 = _sig(x[bi, j, i, n, 1])
                        delta[bi, j, i, n, 0] = \
                            0.01 * (0.5 - s0) * s0 * (1 - s0)
                        delta[bi, j, i, n, 1] = \
                            0.01 * (0.5 - s1) * s1 * (1 - s1)
                        delta[bi, j, i, n, 2] = 0.01 * (0 - x[bi, j, i, n, 2])
                        delta[bi, j, i, n, 3] = 0.01 * (0 - x[bi, j, i, n, 3])
        # ---- sequential truth loop (region_layer.c:296-355) ----
        for t in gts:
            tx, ty, tw, th, tcls = t
            i, j = int(tx * gw), int(ty * gh)
            best_iou, best_n = 0.0, 0
            for n in range(na):
                if l.bias_match:
                    pw, ph = anc[n, 0] / gw, anc[n, 1] / gh
                else:
                    _, _, pw, ph = pred_box(bi, j, i, n)
                iou = _iou((0, 0, pw, ph), (0, 0, tw, th))
                if iou > best_iou:
                    best_iou, best_n = iou, n
            n = best_n
            s0 = _sig(x[bi, j, i, n, 0])
            s1 = _sig(x[bi, j, i, n, 1])
            delta[bi, j, i, n, 0] = (l.coord_scale * ((tx * gw - i) - s0)
                                     * s0 * (1 - s0))
            delta[bi, j, i, n, 1] = (l.coord_scale * ((ty * gh - j) - s1)
                                     * s1 * (1 - s1))
            delta[bi, j, i, n, 2] = l.coord_scale * (
                np.log(tw * gw / anc[n, 0]) - x[bi, j, i, n, 2])
            delta[bi, j, i, n, 3] = l.coord_scale * (
                np.log(th * gh / anc[n, 1]) - x[bi, j, i, n, 3])
            iou = _iou(pred_box(bi, j, i, n), (tx, ty, tw, th))
            so = _sig(x[bi, j, i, n, 4])
            target = iou if l.rescore else 1.0
            delta[bi, j, i, n, 4] = (l.object_scale * (target - so)
                                     * so * (1 - so))
            out_c = (softmax(x[bi, j, i, n, 5:]) if l.det_softmax
                     else x[bi, j, i, n, 5:])
            for k in range(nc):
                delta[bi, j, i, n, 5 + k] = l.class_scale * (
                    (1.0 if k == int(tcls) else 0.0) - out_c[k])
    return (-delta).reshape(raw.shape)


def _region_spec(**kw):
    defaults = dict(anchors=((1.2, 1.8), (3.0, 2.4)), num_classes=3,
                    det_softmax=True, ignore_thresh=0.5, bias_match=True,
                    coord_scale=1.0, object_scale=5.0, noobject_scale=1.0,
                    class_scale=1.0, rescore=False)
    defaults.update(kw)
    return yolov3.LayerSpec("region", 0, **defaults)


class TestRegionLoss:
    def _compare(self, l, truths, seen=10**9, seed=0):
        rng = np.random.default_rng(seed)
        gh = gw = 4
        na, nc = len(l.anchors), l.num_classes
        raw = rng.standard_normal(
            (2, gh, gw, na * (5 + nc))).astype(np.float32) * 0.5
        want = _region_grad(raw.astype(np.float64), l, truths, seen)
        got = np.asarray(jax.grad(
            lambda r: region_head_loss(r, l, jnp.asarray(truths),
                                       seen=seen)[0])(jnp.asarray(raw)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    @staticmethod
    def _truths(*rows, T=4):
        t = np.zeros((2, T, 5), np.float32)
        for bi, ti, row in rows:
            t[bi, ti] = row
        return t

    def test_baseline_softmax_bias_match(self):
        self._compare(_region_spec(), self._truths(
            (0, 0, [0.31, 0.62, 0.30, 0.40, 1]),
            (1, 0, [0.80, 0.20, 0.60, 0.55, 2])))

    def test_warmup_seen_below_12800(self):
        self._compare(_region_spec(), self._truths(
            (0, 0, [0.31, 0.62, 0.30, 0.40, 1])), seen=640)

    def test_rescore_iou_target(self):
        self._compare(_region_spec(rescore=True), self._truths(
            (0, 0, [0.31, 0.62, 0.30, 0.40, 0]),
            (1, 1, [0.55, 0.45, 0.25, 0.30, 2])))

    def test_pred_shape_anchor_match(self):
        # bias_match=0: the anchor race uses the PREDICTED w/h at the cell
        self._compare(_region_spec(bias_match=False), self._truths(
            (0, 0, [0.31, 0.62, 0.30, 0.40, 1])), seed=3)

    def test_se_classes_no_softmax(self):
        self._compare(_region_spec(det_softmax=False, class_scale=2.0),
                      self._truths((0, 0, [0.31, 0.62, 0.30, 0.40, 1])))

    def test_collision_last_writer_wins(self):
        # two GTs in the same cell racing to the same anchor: darknet's
        # sequential loop overwrites every delta — last writer wins
        self._compare(_region_spec(), self._truths(
            (0, 0, [0.30, 0.60, 0.30, 0.40, 1]),
            (0, 1, [0.33, 0.58, 0.32, 0.42, 2])))

    def test_thresh_zeroes_high_iou_objectness(self):
        # craft the raw logits at the GT's cell/anchor so the predicted
        # box ≈ the GT -> best_iou > thresh -> noobj delta zeroed there
        l = _region_spec()
        rng = np.random.default_rng(1)
        gh = gw = 4
        na, nc = 2, 3
        raw = rng.standard_normal(
            (2, gh, gw, na * (5 + nc))).astype(np.float32) * 0.5
        gt = [0.31, 0.62, 0.30, 0.40, 1]
        i, j = int(gt[0] * gw), int(gt[1] * gh)
        def logit(p):
            return float(np.log(p / (1 - p)))
        v = raw[0, j, i].reshape(na, 5 + nc).copy()
        v[1, 0] = logit(gt[0] * gw - i)
        v[1, 1] = logit(gt[1] * gh - j)
        v[1, 2] = float(np.log(gt[2] * gw / l.anchors[1][0]))
        v[1, 3] = float(np.log(gt[3] * gh / l.anchors[1][1]))
        raw[0, j, i] = v.reshape(-1)
        truths = self._truths((0, 0, gt))
        want = _region_grad(raw.astype(np.float64), l, truths, 10**9)
        got = np.asarray(jax.grad(
            lambda r: region_head_loss(r, l, jnp.asarray(truths))[0]
        )(jnp.asarray(raw)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_class_ge_nc_truth_skipped(self):
        # region_layer.c:306-312 skips labels with class_id >= classes
        self._compare(_region_spec(), self._truths(
            (0, 0, [0.31, 0.62, 0.30, 0.40, 7]),
            (0, 1, [0.80, 0.20, 0.25, 0.30, 1])))


# ---------------------------------------------------------------------------
# [detection]
# ---------------------------------------------------------------------------

def _fill_truth_region(truths_b, side, classes):
    """data.c fill_truth_region:260-300: dense [sc, 5+classes] per-cell
    truth, FIRST writer wins, tiny boxes skipped."""
    sc = side * side
    dense = np.zeros((sc, 1 + classes + 4), np.float64)
    for t in truths_b:
        x, y, w, h, cid = t
        if x == 0:
            continue
        if w < 0.001 or h < 0.001:
            continue
        col, row = int(x * side), int(y * side)
        idx = col + row * side
        if dense[idx, 0]:
            continue
        dense[idx, 0] = 1
        if int(cid) < classes:
            dense[idx, 1 + int(cid)] = 1
        dense[idx, 1 + classes:] = [x * side - col, y * side - row, w, h]
    return dense


def _detection_grad(flat, l, truths):
    """-delta of forward_detection_layer (detection_layer.c:49-218)."""
    s, n, nc = l.side, l.num, l.num_classes
    sc = s * s
    b = flat.shape[0]
    delta = np.zeros_like(flat)

    def softmax(z):
        e = np.exp(z - z.max())
        return e / e.sum()

    for bi in range(b):
        out = flat[bi].copy()
        if l.det_softmax:
            for i in range(sc):
                out[i * nc:(i + 1) * nc] = softmax(out[i * nc:(i + 1) * nc])
        dense = _fill_truth_region(truths[bi], s, nc)
        for i in range(sc):
            for j in range(n):
                p = sc * nc + i * n + j
                delta[bi, p] = l.noobject_scale * (0.0 - out[p])
            if not dense[i, 0]:
                continue
            ci = i * nc
            for k in range(nc):
                delta[bi, ci + k] = l.class_scale * (
                    dense[i, 1 + k] - out[ci + k])
            truth = dense[i, 1 + nc:].copy()
            truth[0] /= s
            truth[1] /= s
            best_iou, best_rmse, best_j = 0.0, 20.0, -1
            for j in range(n):
                bx = sc * (nc + n) + (i * n + j) * 4
                ob = out[bx:bx + 4].copy()
                ob[0] /= s
                ob[1] /= s
                if l.det_sqrt:
                    ob[2] *= ob[2]
                    ob[3] *= ob[3]
                iou = _iou(ob, truth)
                rmse = float(np.sqrt(np.sum((ob - truth) ** 2)))
                if best_iou > 0 or iou > 0:
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                else:
                    if rmse < best_rmse:
                        best_rmse, best_j = rmse, j
            j = best_j
            bx = sc * (nc + n) + (i * n + j) * 4
            ob = out[bx:bx + 4].copy()
            ob[0] /= s
            ob[1] /= s
            if l.det_sqrt:
                ob[2] *= ob[2]
                ob[3] *= ob[3]
            iou = _iou(ob, truth)
            p = sc * nc + i * n + j
            target = iou if l.rescore else 1.0
            delta[bi, p] = l.object_scale * (target - out[p])
            tr = dense[i, 1 + nc:]
            delta[bi, bx + 0] = l.coord_scale * (tr[0] - out[bx + 0])
            delta[bi, bx + 1] = l.coord_scale * (tr[1] - out[bx + 1])
            delta[bi, bx + 2] = l.coord_scale * (tr[2] - out[bx + 2])
            delta[bi, bx + 3] = l.coord_scale * (tr[3] - out[bx + 3])
            if l.det_sqrt:
                delta[bi, bx + 2] = l.coord_scale * (
                    np.sqrt(tr[2]) - out[bx + 2])
                delta[bi, bx + 3] = l.coord_scale * (
                    np.sqrt(tr[3]) - out[bx + 3])
    return -delta


def _det_spec(**kw):
    defaults = dict(side=3, num=2, num_classes=3, coords=4,
                    det_softmax=False, det_sqrt=False, coord_scale=5.0,
                    object_scale=1.0, noobject_scale=0.5, class_scale=1.0,
                    rescore=False)
    defaults.update(kw)
    return yolov3.LayerSpec("detection", 0, **defaults)


class TestDetectionLoss:
    def _compare(self, l, truths, seed=0, positive_boxes=False):
        rng = np.random.default_rng(seed)
        inputs = l.side ** 2 * (l.num_classes + l.num * 5)
        flat = rng.standard_normal((2, inputs)).astype(np.float32) * 0.4
        if positive_boxes:
            flat = np.abs(flat)  # sqrt mode predicts sqrt(w) >= 0
        want = _detection_grad(flat.astype(np.float64), l, truths)
        got = np.asarray(jax.grad(
            lambda r: detection_head_loss(r, l, jnp.asarray(truths))[0]
        )(jnp.asarray(flat)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    @staticmethod
    def _truths(*rows, T=4):
        t = np.zeros((2, T, 5), np.float32)
        for bi, ti, row in rows:
            t[bi, ti] = row
        return t

    def test_baseline(self):
        self._compare(_det_spec(), self._truths(
            (0, 0, [0.40, 0.60, 0.30, 0.25, 1]),
            (1, 0, [0.75, 0.30, 0.40, 0.35, 2])))

    def test_softmax_sqrt_rescore(self):
        self._compare(
            _det_spec(det_softmax=True, det_sqrt=True, rescore=True),
            self._truths((0, 0, [0.40, 0.60, 0.30, 0.25, 1]),
                         (1, 1, [0.20, 0.20, 0.50, 0.45, 0])),
            positive_boxes=True)

    def test_first_writer_wins_and_tiny_skipped(self):
        # two GTs in one cell: FIRST claims it (fill_truth_region:289);
        # a w<.001 box is skipped entirely (fill_truth_region:280)
        self._compare(_det_spec(), self._truths(
            (0, 0, [0.40, 0.60, 0.30, 0.25, 1]),
            (0, 1, [0.45, 0.55, 0.20, 0.20, 2]),   # same cell -> ignored
            (0, 2, [0.80, 0.80, 0.0005, 0.3, 0]),  # tiny -> skipped
            (1, 0, [0.75, 0.30, 0.40, 0.35, 2])))

    def test_class_ge_nc_claims_cell_zero_onehot(self):
        # id >= classes still sets is_obj but leaves the one-hot zero
        # (fill_truth_region:292) — all class probs get pushed down
        self._compare(_det_spec(det_softmax=True), self._truths(
            (0, 0, [0.40, 0.60, 0.30, 0.25, 9])))

    def test_rmse_path_when_all_ious_zero(self):
        # GT far from every predicted box (tiny random preds near zero
        # w/h often produce zero IoU); craft preds with zero overlap
        l = _det_spec()
        truths = self._truths((0, 0, [0.17, 0.17, 0.05, 0.05, 0]))
        rng = np.random.default_rng(5)
        inputs = l.side ** 2 * (l.num_classes + l.num * 5)
        flat = rng.standard_normal((2, inputs)).astype(np.float32) * 0.05
        # park every box of the GT's cell far away with tiny size
        sc = l.side ** 2
        for j in range(l.num):
            bx = sc * (l.num_classes + l.num) + (0 * l.num + j) * 4
            flat[0, bx:bx + 4] = [2.9, 2.9, 0.01, 0.01]
        want = _detection_grad(flat.astype(np.float64), l, truths)
        got = np.asarray(jax.grad(
            lambda r: detection_head_loss(r, l, jnp.asarray(truths))[0]
        )(jnp.asarray(flat)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: the v2 cfg trains
# ---------------------------------------------------------------------------

V2_TRAIN_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=4
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=35
activation=linear

[region]
anchors = 1.0,1.0, 3.0,3.0, 1.5,3.0, 3.0,1.5, 2.0,2.0
bias_match=1
classes=2
coords=4
num=5
softmax=1
object_scale=5
noobject_scale=1
coord_scale=1
class_scale=1
thresh=0.6
"""


class TestRegionTraining:
    def test_v2_cfg_loss_decreases(self):
        import optax
        from betapose_tpu.train.yolo_train import make_train_step
        spec = yolov3.build_spec(V2_TRAIN_CFG)
        assert spec.layers[-1].kind == "region"
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        tx = optax.sgd(1e-3, momentum=0.9)
        opt_state = tx.init(params)
        step = make_train_step(spec, tx, 64, 64, donate=False)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((4, 64, 64, 3)), jnp.float32)
        truths = np.zeros((4, 3, 5), np.float32)
        for bi in range(4):
            truths[bi, 0] = [0.3 + 0.1 * bi, 0.5, 0.3, 0.35, bi % 2]
        truths = jnp.asarray(truths)
        losses = []
        for it in range(25):
            params, opt_state, m = step(params, opt_state, imgs, truths,
                                        np.int32((it + 1) * 4))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7
        assert float(m["head0/count"]) == 4.0

    def test_v2_dp_step_matches_single_device(self):
        # the v2 loss under mesh DP (batch sharded, params replicated) ==
        # the same step on one device — the [region] analog of
        # test_train.py::TestDataParallel
        import optax
        from betapose_tpu.parallel import mesh as mesh_mod
        from betapose_tpu.train.yolo_train import make_train_step
        assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
        spec = yolov3.build_spec(V2_TRAIN_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(1), spec)
        tx = optax.sgd(1e-3)
        step = make_train_step(spec, tx, 64, 64, donate=False)
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.random((8, 64, 64, 3)), jnp.float32)
        truths = np.zeros((8, 2, 5), np.float32)
        for bi in range(8):
            truths[bi, 0] = [0.2 + 0.08 * bi, 0.5, 0.3, 0.3, bi % 2]
        truths = jnp.asarray(truths)
        seen = np.int32(64)   # inside warmup: exercises that term too

        p1, o1, m1 = step(params, tx.init(params), imgs, truths, seen)

        mesh = mesh_mod.make_mesh(8)
        sh = mesh_mod.shard_batch(mesh, {"i": imgs, "t": truths})
        params_r = mesh_mod.replicate(mesh, params)
        opt_r = mesh_mod.replicate(mesh, tx.init(params))
        p2, o2, m2 = step(params_r, opt_r, sh["i"], sh["t"], seen)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
