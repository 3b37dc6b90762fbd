"""`darknet nightmare` (nightmare.c) — gradient ascent / feature
reconstruction on the input image.

Oracles transcribe the reference FORMULAS:
- `smooth` (nightmare.c:141-160): update[out_index] += lambda *
  (recon[in_index] - recon[out_index]) over the clipped
  (2*smooth+1)^2 window — numpy loop transcription vs the conv form
- `calculate_loss` (nightmare.c:25-34): delta = out where
  out > mean + thresh*std — checked as the gradient of the masked
  energy at a linear layer where the gradient IS the delta
- crop_image border-clamp shift geometry (image.c get_pixel constrain)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.tools import nightmare


TINY_CFG = """[net]
width=24
height=24
channels=3
batch=1

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=12
size=3
stride=1
pad=1
activation=leaky
"""


@pytest.fixture(scope="module")
def net():
    spec = yolo_mod.build_spec(TINY_CFG)
    params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
    return spec, params


class TestSmoothOracle:
    def test_matches_c_loop(self):
        """nightmare.c:141-160 transcription: for each (k,y,x), sum
        (recon[k, y+dy, x+dx] - recon[k, y, x]) over the window clipped
        to the image."""
        rs = np.random.RandomState(0)
        recon = rs.rand(5, 7, 3).astype(np.float32)
        size = 1
        h, w, c = recon.shape
        want = np.zeros_like(recon)
        for k in range(c):
            for y in range(h):
                for x in range(w):
                    for dy in range(-size, size + 1):
                        for dx in range(-size, size + 1):
                            iy, ix = y + dy, x + dx
                            if 0 <= iy < h and 0 <= ix < w:
                                want[y, x, k] += (recon[iy, ix, k]
                                                  - recon[y, x, k])
        got = np.asarray(nightmare.smooth_term(jnp.asarray(recon), size))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_window_2(self):
        rs = np.random.RandomState(1)
        recon = rs.rand(6, 6, 2).astype(np.float32)
        got = np.asarray(nightmare.smooth_term(jnp.asarray(recon), 2))
        # interior cell: plain neighborhood sum minus 25*center
        y, x = 3, 3
        win = recon[1:6, 1:6, 0]
        assert abs(got[y, x, 0] - (win.sum() - 25 * recon[y, x, 0])) < 1e-4


class TestShiftEdgeClamp:
    def test_matches_clamped_index(self):
        rs = np.random.RandomState(0)
        img = rs.rand(6, 8, 3).astype(np.float32)
        for dy, dx in [(2, -3), (-1, 4), (0, 0), (8, 8)]:
            got = np.asarray(nightmare._shift_edge_clamp(
                jnp.asarray(img), dy, dx, pad=8))
            ys = np.clip(np.arange(6) + dy, 0, 5)
            xs = np.clip(np.arange(8) + dx, 0, 7)
            np.testing.assert_allclose(got, img[np.ix_(ys, xs)], atol=1e-6)


class TestCalculateLossGradient:
    def test_masked_energy_gradient_is_darknet_delta(self):
        """At the truncated output, d/d_out of 0.5*sum(masked out^2) =
        out * mask — exactly calculate_loss's delta (nightmare.c:25-34)."""
        rs = np.random.RandomState(0)
        out = rs.randn(40).astype(np.float32)
        thresh = 1.0

        def objective(o):
            mean = jnp.mean(o)
            var = jnp.mean((o - mean) ** 2)
            sel = jax.lax.stop_gradient(o > mean + thresh * jnp.sqrt(var))
            return 0.5 * jnp.sum(jnp.where(sel, o, 0.0) ** 2)

        g = np.asarray(jax.grad(objective)(jnp.asarray(out)))
        mask = out > out.mean() + thresh * out.std()
        np.testing.assert_allclose(g, np.where(mask, out, 0.0),
                                   rtol=1e-5, atol=1e-6)


class TestTruncate:
    def test_prefix_output(self, net):
        spec, params = net
        tspec = nightmare.truncate_spec(spec, 0)
        x = jnp.zeros((1, 24, 24, 3))
        out = yolo_mod.forward(tspec, params, x, 24)
        assert out.shape == (1, 24, 24, 8)
        full = nightmare.truncate_spec(spec, len(spec.layers) - 1)
        a = yolo_mod.forward(full, params, x, 24)
        b = yolo_mod.forward(spec, params, x, 24)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDream:
    def test_changes_image_in_bounds(self, net):
        spec, params = net
        rs = np.random.default_rng(0)
        img = rs.random((24, 24, 3)).astype(np.float32)
        rounds = []
        out = nightmare.dream(spec, params, img, max_layer=2, rounds=2,
                              iters=2, octaves=2, rng=rs,
                              on_round=lambda e, im: rounds.append(e))
        assert rounds == [0, 1]
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.abs(out - img).max() > 1e-4
        assert np.isfinite(out).all()


class TestReconstruct:
    def test_feature_distance_decreases(self, net):
        spec, params = net
        rs = np.random.default_rng(0)
        img = rs.random((24, 24, 3)).astype(np.float32)
        target = np.asarray(yolo_mod.forward(spec, params,
                                             jnp.asarray(img)[None], 24))

        def dist(im):
            f = np.asarray(yolo_mod.forward(spec, params,
                                            jnp.asarray(im)[None], 24))
            return float(((f - target) ** 2).sum())

        snaps = []
        nightmare.reconstruct(spec, params, img, rounds=3, iters=10,
                              rate=0.05, rng=np.random.default_rng(1),
                              on_round=lambda e, im: snaps.append(im))
        assert dist(snaps[-1]) < dist(snaps[0])


class TestCli:
    def test_dream_writes_round_pngs(self, net, tmp_path, monkeypatch):
        pytest.importorskip("cv2")
        import cv2
        spec, params = net
        monkeypatch.chdir(tmp_path)
        open("tiny-conv.cfg", "w").write(TINY_CFG)
        yolo_mod.save_darknet_weights(spec, params, "tiny.weights")
        rs = np.random.default_rng(0)
        cv2.imwrite("in.png", rs.integers(0, 255, (24, 24, 3),
                                          dtype=np.uint8))
        nightmare.run_nightmare(["tiny-conv.cfg", "tiny.weights", "in.png",
                                 "2", "-rounds", "2", "-iters", "1",
                                 "-prefix", "outp"])
        # {im}_{cfg}_{layer}_{round:06d}.png under -prefix (nightmare.c:284)
        assert sorted(os.listdir("outp")) == [
            "in_tiny-conv_2_000000.png", "in_tiny-conv_2_000001.png"]

    def test_cli_dispatch_from_darknet(self, capsys):
        from betapose_tpu.tools import darknet_cli
        rc = darknet_cli.main(["nightmare"])
        assert rc == 1
        assert "usage" in capsys.readouterr().out
