"""Image op golden tests: letterbox geometry, cropBox vs a torch
transcription of the reference formulas, transformBoxInvert."""

import numpy as np
import pytest

import jax.numpy as jnp

from betapose_tpu.ops import image as im


class TestLetterbox:
    def test_geometry_640x480_to_416(self):
        # reference: new_w=416, new_h=312, top offset (416-312)//2=52
        img = jnp.ones((480, 640, 3)) * 255.0
        out = im.letterbox(img, 416, 416)
        assert out.shape == (416, 416, 3)
        out = np.asarray(out)
        np.testing.assert_allclose(out[:52], 128.0)
        np.testing.assert_allclose(out[364:], 128.0)
        np.testing.assert_allclose(out[52:364], 255.0, rtol=1e-5)

    def test_batched(self):
        img = jnp.zeros((2, 480, 640, 3))
        out = im.letterbox(img, 416, 416)
        assert out.shape == (2, 416, 416, 3)


def _reference_crop_box(img_chw, ul, br, res_h, res_w):
    """Torch transcription of the reference cropBox math
    (KPD/src/utils/img.py:242-262): top-left crop -> center pad (ceil
    before/floor after) -> bilinear align_corners=True resize."""
    torch = pytest.importorskip("torch")
    ul = np.floor(np.asarray(ul)).astype(int)
    br = np.floor(np.asarray(br)).astype(int)
    box_h = br[1] - ul[1]
    box_w = br[0] - ul[0]
    len_h = max(box_h, box_w * res_h / res_w)
    len_w = len_h * res_w / res_h
    c = img_chw.shape[0]
    crop = img_chw[:, ul[1]:br[1], ul[0]:br[0]]
    canvas = np.zeros((c, int(len_h), int(len_w)), dtype=np.float32)
    dh = int(len_h) - box_h
    dw = int(len_w) - box_w
    top = int(np.ceil(dh / 2))
    left = int(np.ceil(dw / 2))
    canvas[:, top:top + box_h, left:left + box_w] = crop
    t = torch.from_numpy(canvas)[None]
    out = torch.nn.functional.interpolate(
        t, size=(res_h, res_w), mode="bilinear", align_corners=True)
    return out[0].numpy()


class TestCropBox:
    @pytest.mark.parametrize("box", [
        (50.0, 40.0, 200.0, 180.0),     # tall-ish
        (10.0, 20.0, 250.0, 90.0),      # wide -> height padded
        (0.0, 0.0, 100.0, 100.0),       # at origin
        (33.3, 41.7, 190.2, 170.9),     # fractional corners
    ])
    def test_matches_reference(self, box):
        rng = np.random.default_rng(0)
        img = rng.random((240, 320, 3)).astype(np.float32)
        ul = jnp.asarray(box[:2])
        br = jnp.asarray(box[2:])
        ours = np.asarray(im.crop_box(jnp.asarray(img), ul, br, 64, 48))
        golden = _reference_crop_box(
            img.transpose(2, 0, 1), box[:2], box[2:], 64, 48)
        np.testing.assert_allclose(
            ours.transpose(2, 0, 1), golden, rtol=1e-4, atol=1e-4)

    def test_edge_box(self):
        # box touching the image bottom-right corner
        rng = np.random.default_rng(1)
        img = rng.random((240, 320, 3)).astype(np.float32)
        box = (250.0, 150.0, 319.0, 239.0)
        ours = np.asarray(im.crop_box(
            jnp.asarray(img), jnp.asarray(box[:2]), jnp.asarray(box[2:]),
            64, 48))
        golden = _reference_crop_box(
            img.transpose(2, 0, 1), box[:2], box[2:], 64, 48)
        np.testing.assert_allclose(
            ours.transpose(2, 0, 1), golden, rtol=1e-4, atol=1e-4)


class TestExpandBoxes:
    def test_scale_rate(self):
        boxes = jnp.asarray([
            [100.0, 100.0, 300.0, 250.0],   # width 200 > 100 -> rate 0.2
            [100.0, 100.0, 180.0, 160.0],   # width 80 <= 100 -> rate 0.3
        ])
        ul, br = im.expand_boxes(boxes, 480, 640)
        np.testing.assert_allclose(np.asarray(ul[0]), [80.0, 85.0])
        np.testing.assert_allclose(np.asarray(br[0]), [320.0, 265.0])
        np.testing.assert_allclose(np.asarray(ul[1]), [88.0, 91.0])
        np.testing.assert_allclose(np.asarray(br[1]), [192.0, 169.0])

    def test_clamping(self):
        boxes = jnp.asarray([[0.0, 0.0, 639.0, 479.0]])
        ul, br = im.expand_boxes(boxes, 480, 640)
        assert np.asarray(ul).min() >= 0
        assert np.asarray(br[0, 0]) <= 639
        assert np.asarray(br[0, 1]) <= 479


class TestTransformBoxInvert:
    def test_formula(self):
        """Direct numpy transcription of transformBoxInvert_batch
        (KPD/src/utils/img.py:217-239)."""
        rng = np.random.default_rng(3)
        n, k = 4, 50
        pt = rng.random((n, k, 2)).astype(np.float32) * np.array([64, 80])
        ul = rng.random((n, 2)).astype(np.float32) * 100
        br = ul + 50 + rng.random((n, 2)).astype(np.float32) * 200
        inp_h, inp_w, res_h, res_w = 320, 256, 80, 64

        ours = np.asarray(im.transform_box_invert_batch(
            jnp.asarray(pt), jnp.asarray(ul), jnp.asarray(br),
            inp_h, inp_w, res_h, res_w))

        center = (br - 1 - ul) / 2
        size = (br - ul).copy()
        size[:, 0] *= inp_h / inp_w
        len_h = size.max(axis=1)
        len_w = len_h * inp_w / inp_h
        _pt = pt * len_h[:, None, None] / res_h
        _pt[..., 0] -= np.clip((len_w[:, None] - 1) / 2 - center[:, 0:1], 0, None)
        _pt[..., 1] -= np.clip((len_h[:, None] - 1) / 2 - center[:, 1:2], 0, None)
        golden = np.stack([_pt[..., 0] + ul[:, 0:1], _pt[..., 1] + ul[:, 1:2]],
                          axis=-1)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-3)

    def test_crop_then_invert_identity(self):
        """A point at heatmap coords maps back near its image location."""
        ul = jnp.asarray([[60.0, 40.0]])
        br = jnp.asarray([[220.0, 200.0]])
        # center of the crop in heatmap coords
        pt = jnp.asarray([[[32.0, 40.0]]])  # (x=W/2, y=H/2) of 80x64 map
        out = np.asarray(im.transform_box_invert_batch(
            pt, ul, br, 320, 256, 80, 64))[0, 0]
        # center of box (140, 120) within a couple px
        assert abs(out[0] - 140) < 3 and abs(out[1] - 120) < 3


class TestCropBoxMatmul:
    @pytest.mark.parametrize("box", [
        (50.0, 40.0, 200.0, 180.0),
        (10.0, 20.0, 250.0, 90.0),
        (0.0, 0.0, 100.0, 100.0),
        (33.3, 41.7, 190.2, 170.9),
        (250.0, 150.0, 319.0, 239.0),
    ])
    def test_matches_gather_version(self, box):
        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.random((240, 320, 3)).astype(np.float32))
        ul = jnp.asarray(box[:2])
        br = jnp.asarray(box[2:])
        a = np.asarray(im.crop_box(img, ul, br, 64, 48))
        b = np.asarray(im.crop_box_matmul(img, ul, br, 64, 48))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)


class TestResizeMatmul:
    def test_aa_matches_jax_image_resize(self):
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.random((2, 48, 64, 3)).astype(np.float32))
        a = np.asarray(im.resize_bilinear_matmul(x, 41, 41, antialias=True))
        import jax
        b = np.asarray(jax.image.resize(x, (2, 41, 41, 3), method="linear"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_noaa_matches_cv2_linear(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(10)
        x = rng.random((1, 48, 64, 3)).astype(np.float32)
        a = np.asarray(im.resize_bilinear_matmul(jnp.asarray(x), 24, 32))[0]
        b = cv2.resize(x[0], (32, 24), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
