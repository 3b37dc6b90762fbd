"""Classifier verb parity (`classifier.c` train/predict/valid).

Oracles transcribe the reference FORMULAS:
- cost/softmax gradient chain: l2_cpu/smooth_l1_cpu deltas (blas.c) +
  backward_softmax_layer pass-through (softmax_layer.c:63-69)
- rotate_crop_image rad=0 bilinear geometry (image.c:1402-1421) with
  get_pixel_extend=0 borders
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3
from betapose_tpu.train import classifier_train as ct


class TestCostGradOracle:
    """grad(loss) at the logits must equal darknet's effective delta:
    cost delta through a Jacobian-free softmax backward."""

    def test_sse_grad_is_scaled_softmax_ce(self):
        rs = np.random.RandomState(0)
        x = rs.randn(4, 5).astype(np.float32)
        t = np.eye(5, dtype=np.float32)[rs.randint(0, 5, 4)]
        scale = 0.7

        def loss(logits):
            p = yolov3._darknet_softmax(logits)
            return ct.darknet_cost(p, jnp.asarray(t), "sse", scale)

        g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
        p = np.exp(x - x.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        # delta at softmax output = (t - p) (l2_cpu, no factor 2), scaled,
        # passed through unchanged; minimization sign flips it
        np.testing.assert_allclose(g, scale * (p - t) / 4, rtol=1e-5,
                                   atol=1e-6)

    def test_sse_value_is_sum_sq_over_batch(self):
        p = jnp.asarray([[0.2, 0.8], [0.6, 0.4]])
        t = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        v = float(ct.darknet_cost(p, t, "sse", 3.0))  # scale NOT in value
        expect = ((0.2 ** 2 + 0.2 ** 2) + (0.4 ** 2 + 0.4 ** 2)) / 2
        assert abs(v - expect) < 1e-6

    def test_smooth_l1_delta_transcription(self):
        # includes |diff| >= 1 where darknet's delta sign is inverted
        # (blas.c smooth_l1_cpu: delta = +1 when diff < 0) — transcribed
        # quirk and all
        pred = jnp.asarray([[0.5, 2.0, -1.5]])
        truth = jnp.asarray([[0.3, 0.0, 0.0]])

        def loss(p):
            return ct.darknet_cost(p, truth, "smooth", 1.0)

        g = np.asarray(jax.grad(loss)(pred))[0]
        # diffs: -0.2 (quad), -2.0 (lin), 1.5 (lin)
        # darknet delta:  -0.2,  +1 (inverted),  -1 (inverted)
        # grad = -delta / batch
        np.testing.assert_allclose(g, [0.2, -1.0, 1.0], rtol=1e-6)

    def test_softmax_inference_unchanged(self):
        x = jnp.asarray(np.random.RandomState(1).randn(3, 7))
        np.testing.assert_allclose(
            np.asarray(yolov3._darknet_softmax(x)),
            np.asarray(jax.nn.softmax(x, axis=-1)), rtol=1e-6)


class TestScaleCrop:
    """scale_crop vs a numpy transcription of rotate_crop_image rad=0."""

    def _oracle(self, img, scale, aspect, dx, dy, size):
        h, w, c = img.shape
        out = np.zeros((size, size, c), np.float32)

        def pix(x, y, ch):
            if x < 0 or x >= w or y < 0 or y >= h:
                return 0.0
            return img[y, x, ch]

        for y in range(size):
            for x in range(size):
                rx = (x - size / 2.0) / scale * aspect \
                    + dx / scale * aspect + w / 2.0
                ry = (y - size / 2.0) / scale + dy / scale + h / 2.0
                ix, iy = int(np.floor(rx)), int(np.floor(ry))
                fx, fy = rx - ix, ry - iy
                for ch in range(c):
                    out[y, x, ch] = (
                        (1 - fy) * ((1 - fx) * pix(ix, iy, ch)
                                    + fx * pix(ix + 1, iy, ch))
                        + fy * ((1 - fx) * pix(ix, iy + 1, ch)
                                + fx * pix(ix + 1, iy + 1, ch)))
        return out

    def test_matches_reference_geometry(self):
        rs = np.random.RandomState(2)
        img = rs.rand(14, 11, 3).astype(np.float32)
        for scale, aspect, dx, dy in [(1.0, 1.0, 0.0, 0.0),
                                      (1.7, 1.0, 2.3, -1.1),
                                      (0.6, 1.25, -3.0, 4.0)]:
            got = np.asarray(ct.scale_crop(
                jnp.asarray(img), scale, aspect, dx, dy, 8))
            np.testing.assert_allclose(
                got, self._oracle(img, scale, aspect, dx, dy, 8),
                rtol=1e-4, atol=1e-5)

    def test_batch_augment_shapes_and_range(self):
        cfg = ct.ClassifierTrainConfig(min_crop=16, max_crop=32,
                                       saturation=1.2, exposure=1.2,
                                       hue=0.05)
        imgs = jnp.asarray(
            np.random.RandomState(3).rand(4, 24, 24, 3).astype(np.float32))
        out = np.asarray(ct.augment_classification_batch(
            jax.random.PRNGKey(0), imgs, cfg, 16))
        assert out.shape == (4, 16, 16, 3)
        assert np.isfinite(out).all() and out.min() >= 0


class TestLrPolicies:
    """network.c get_current_rate formula oracle (network.c:88-120)."""

    def _cfg(self, **kw):
        from betapose_tpu.train.classifier_train import ClassifierTrainConfig
        return ClassifierTrainConfig(lr=0.1, burn_in=0, **kw)

    def test_step_policy_int_division(self):
        from betapose_tpu.train.classifier_train import lr_schedule
        lr = lr_schedule(self._cfg(policy="step", step=100, scale=0.5))
        for it in [0, 99, 100, 250, 999]:
            expect = 0.1 * 0.5 ** (it // 100)
            np.testing.assert_allclose(float(lr(it)), expect, rtol=1e-6)

    def test_exp_policy(self):
        from betapose_tpu.train.classifier_train import lr_schedule
        lr = lr_schedule(self._cfg(policy="exp", gamma=0.99))
        for it in [0, 1, 50]:
            np.testing.assert_allclose(float(lr(it)), 0.1 * 0.99 ** it,
                                       rtol=1e-5)

    def test_sigmoid_policy_uses_gamma_and_step(self):
        from betapose_tpu.train.classifier_train import lr_schedule
        lr = lr_schedule(self._cfg(policy="sigmoid", gamma=0.0002,
                                   step=1000))
        for it in [0, 1000, 5000]:
            expect = 0.1 / (1.0 + np.exp(0.0002 * (it - 1000)))
            np.testing.assert_allclose(float(lr(it)), expect, rtol=1e-5)
        # the old bug: rate must NOT collapse near zero at iteration 1
        assert float(lr(1)) > 0.049

    def test_random_policy_bounded_and_deterministic(self):
        from betapose_tpu.train.classifier_train import lr_schedule
        lr = lr_schedule(self._cfg(policy="random", power=4.0))
        vals = [float(lr(i)) for i in range(5)]
        assert all(0.0 <= v <= 0.1 for v in vals)
        assert len(set(vals)) > 1                 # varies per iteration
        np.testing.assert_allclose(vals, [float(lr(i)) for i in range(5)])

    def test_cfg_parses_gamma_step_scale(self):
        from betapose_tpu.models import yolov3 as yolo_mod
        from betapose_tpu.train.classifier_train import net_cfg_to_config
        cfg_text = TINY_CFG.replace(
            "policy=poly\npower=4",
            "policy=sigmoid\ngamma=0.0002\nstep=1000\nscale=0.5")
        spec = yolo_mod.build_spec(cfg_text)
        cfg = net_cfg_to_config(spec)
        assert (cfg.policy, cfg.gamma, cfg.step, cfg.scale) == (
            "sigmoid", 0.0002, 1000, 0.5)


TINY_CFG = """[net]
batch=16
width=16
height=16
channels=3
learning_rate=0.05
momentum=0.9
decay=0.0005
max_batches=40
policy=poly
power=4
min_crop=12
max_crop=20
flip=1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[connected]
output=2
activation=linear

[dropout]
probability=.2

[softmax]

[cost]
type=sse
"""


def _write_dataset(tmp_path, n=24):
    """Two-class color dataset; class name embedded in the path
    (fill_truth substring semantics)."""
    import cv2
    rs = np.random.RandomState(0)
    paths = []
    for i in range(n):
        cls = "reddish" if i % 2 == 0 else "bluish"
        img = np.zeros((24, 24, 3), np.uint8)
        img[..., 0 if cls == "reddish" else 2] = rs.randint(150, 255)
        img[..., 1] = rs.randint(0, 60)
        d = tmp_path / cls
        d.mkdir(exist_ok=True)
        p = str(d / f"img_{i}.png")
        cv2.imwrite(p, img[..., ::-1])
        paths.append(p)
    (tmp_path / "labels.txt").write_text("reddish\nbluish\n")
    (tmp_path / "train.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "net.data").write_text(
        f"classes=2\ntrain={tmp_path}/train.txt\n"
        f"valid={tmp_path}/train.txt\nlabels={tmp_path}/labels.txt\n"
        f"backup={tmp_path}/backup\ntop=2\n")
    return tmp_path / "net.data", paths


class TestClassifierEndToEnd:
    def test_train_valid_predict(self, tmp_path, capsys):
        from betapose_tpu.tools import darknet_cli

        data, paths = _write_dataset(tmp_path)
        cfg = tmp_path / "tiny.cfg"
        cfg.write_text(TINY_CFG)

        darknet_cli.main(["classifier", "train", str(data), str(cfg)])
        out = capsys.readouterr().out
        assert "Saving weights to" in out
        lines = [ln for ln in out.splitlines() if " avg, " in ln]
        first = float(lines[0].split(":")[1].split(",")[0])
        last = float(lines[-1].split(":")[1].split(",")[0])
        assert last < first  # loss decreases

        final = os.path.join(tmp_path, "backup", "tiny_final.weights")
        assert os.path.exists(final)

        acc = darknet_cli.cmd_classifier_valid(str(data), str(cfg), final)
        assert acc == 1.0  # trivially separable colors

        top = darknet_cli.cmd_classifier_predict(
            str(data), str(cfg), final, paths[0], top=2)
        assert top[0][0] == 0  # reddish
        out = capsys.readouterr().out
        assert "reddish:" in out
