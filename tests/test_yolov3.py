"""YOLOv3 tests: cfg parsing/spec building, darknet .weights roundtrip,
BN folding, torch-layout golden checks, and detection decode."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import darknet_cfg, yolov3

TINY_CFG = """
[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
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
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=1
num=3
ignore_thresh = .7
"""


class TestSpec:
    def test_parse_blocks(self):
        blocks = darknet_cfg.parse_cfg(TINY_CFG)
        assert blocks[0]["type"] == "convolutional"
        assert blocks[-1]["type"] == "yolo"
        assert blocks[-1]["mask"] == "0,1,2"

    def test_build_spec(self):
        spec = yolov3.build_spec(TINY_CFG)
        kinds = [l.kind for l in spec.layers]
        assert kinds == ["conv", "conv", "conv", "conv", "shortcut",
                        "conv", "yolo"]
        assert spec.layers[4].from_idx == 1  # shortcut from=-3 at idx 4
        assert spec.layers[6].anchors == ((10, 13), (16, 30), (33, 23))
        # shortcut needs layers 1 and 3 cached; yolo needs 5
        assert 1 in spec.cache_idxs and 3 in spec.cache_idxs

    def test_generated_yolov3_cfg(self):
        cfg = darknet_cfg.make_yolov3_cfg(num_classes=1)
        spec = yolov3.build_spec(cfg)
        convs = [l for l in spec.layers if l.kind == "conv"]
        assert len(convs) == 75  # parity with yolo-linemod-single.cfg
        assert len(spec.yolo_idxs) == 3
        heads = [spec.layers[i] for i in spec.yolo_idxs]
        assert heads[0].anchors == ((116, 90), (156, 198), (373, 326))
        assert heads[2].anchors == ((10, 13), (16, 30), (33, 23))
        # head convs output (1+5)*3 = 18 filters
        for i in spec.yolo_idxs:
            assert spec.layers[i - 1].out_channels == 18


class TestForward:
    def test_shapes_tiny(self):
        spec = yolov3.build_spec(TINY_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = jnp.zeros((2, 32, 32, 3))
        out = yolov3.forward(spec, params, x, reso=32)
        # one head at stride 2: gs=16, 3 anchors -> 768 boxes, 5+1 attrs
        assert out.shape == (2, 3 * 16 * 16, 6)

    def test_full_box_count(self):
        cfg = darknet_cfg.make_yolov3_cfg(num_classes=1, width=416, height=416)
        model = yolov3.YoloV3(cfg, reso=416)
        x = jnp.zeros((1, 416, 416, 3))
        out = model(x)
        assert out.shape == (1, (13 * 13 + 26 * 26 + 52 * 52) * 3, 6)

    def test_weights_roundtrip(self, tmp_path):
        spec = yolov3.build_spec(TINY_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(1), spec)
        path = str(tmp_path / "w.weights")
        yolov3.save_darknet_weights(spec, params, path, seen=1234)
        loaded, header = yolov3.load_darknet_weights(spec, path)
        assert header[3] == 1234
        for p, q in zip(params, loaded):
            assert set(p) == set(q)
            for k in p:
                np.testing.assert_allclose(np.asarray(p[k]), np.asarray(q[k]),
                                           rtol=1e-6)

    def test_bn_fold_equivalence(self):
        spec = yolov3.build_spec(TINY_CFG)
        key = jax.random.PRNGKey(2)
        params = yolov3.init_params(key, spec)
        # randomize bn stats so folding is non-trivial
        for p in params:
            if "bn_mean" in p:
                c = p["bn_mean"].shape[0]
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                p["bn_mean"] = jax.random.normal(k1, (c,)) * 0.1
                p["bn_var"] = jnp.abs(jax.random.normal(k2, (c,))) + 0.5
                p["bn_scale"] = 1 + jax.random.normal(k3, (c,)) * 0.1
                p["bn_bias"] = jax.random.normal(k4, (c,)) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        out1 = yolov3.forward(spec, params, x, reso=32)
        folded = yolov3.fold_bn(spec, params)
        out2 = yolov3.forward(spec, folded, x, reso=32)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-4, atol=1e-5)


class TestTorchGolden:
    """Pin NHWC/HWIO conventions against torch NCHW/OIHW primitives."""

    def test_conv_bn_leaky_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
        w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)  # HWIO
        bn = {k: rng.standard_normal(7).astype(np.float32) * 0.1 + v
              for k, v in [("bn_scale", 1.0), ("bn_bias", 0.0),
                           ("bn_mean", 0.0)]}
        bn["bn_var"] = np.abs(rng.standard_normal(7).astype(np.float32)) + 0.5

        l = yolov3.LayerSpec("conv", 7, size=3, stride=2, pad=1,
                             batch_normalize=True, activation="leaky",
                             in_channels=5)
        p = {"w": jnp.asarray(w), **{k: jnp.asarray(v) for k, v in bn.items()}}
        ours = np.asarray(yolov3._conv_layer(l, p, jnp.asarray(x)))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        yt = torch.nn.functional.conv2d(xt, wt, stride=2, padding=1)
        yt = torch.nn.functional.batch_norm(
            yt, torch.from_numpy(bn["bn_mean"]), torch.from_numpy(bn["bn_var"]),
            torch.from_numpy(bn["bn_scale"]), torch.from_numpy(bn["bn_bias"]),
            training=False, eps=1e-5)
        yt = torch.nn.functional.leaky_relu(yt, 0.1)
        golden = yt.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)

    def test_upsample_vs_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(1).standard_normal((1, 4, 4, 3)).astype(np.float32)
        ours = np.asarray(yolov3._upsample_nearest(jnp.asarray(x), 2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        golden = torch.nn.functional.interpolate(xt, scale_factor=2,
                                                 mode="nearest")
        np.testing.assert_allclose(
            ours, golden.numpy().transpose(0, 2, 3, 1), rtol=1e-6)


class TestDecode:
    def test_decode_formula(self):
        """Decoded boxes vs a direct numpy transcription of the reference
        DetectionLayer equations (yolo/darknet.py:157-169)."""
        rng = np.random.default_rng(5)
        gs, na, nc, reso = 4, 3, 2, 32
        anchors = ((10, 13), (16, 30), (33, 23))
        stride = reso // gs
        raw = rng.standard_normal((2, gs, gs, na * (5 + nc))).astype(np.float32)

        out = np.asarray(yolov3.decode_head(jnp.asarray(raw), anchors, nc, reso))

        def sig(v):
            return 1 / (1 + np.exp(-v))

        # numpy golden: [B,gs,gs,na,attrs] -> anchor-major rows
        x = raw.reshape(2, gs, gs, na, 5 + nc).transpose(0, 3, 1, 2, 4)
        golden = np.zeros_like(x)
        grid = np.arange(gs, dtype=np.float32)
        golden[..., 0] = (sig(x[..., 0]) + grid[None, None, None, :]) * stride
        golden[..., 1] = (sig(x[..., 1]) + grid[None, None, :, None]) * stride
        aw = np.array([a[0] for a in anchors], np.float32) / stride
        ah = np.array([a[1] for a in anchors], np.float32) / stride
        golden[..., 2] = np.exp(x[..., 2]) * aw[None, :, None, None] * stride
        golden[..., 3] = np.exp(x[..., 3]) * ah[None, :, None, None] * stride
        golden[..., 4] = sig(x[..., 4])
        golden[..., 5:] = sig(x[..., 5:])
        golden = golden.reshape(2, na * gs * gs, 5 + nc)
        np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)


class TestPartialWeights:
    def test_backbone_extraction_and_partial_load(self, tmp_path):
        """save_partial_weights + allow_partial load = darknet's pretrained
        backbone workflow (darknet53.conv.74 / train_all.sh)."""
        spec = yolov3.build_spec(TINY_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(7), spec)
        path = str(tmp_path / "backbone.weights")
        # keep only the first 3 layers
        yolov3.save_partial_weights(spec, params, path, cutoff=3)
        loaded, _ = yolov3.load_darknet_weights(
            spec, path, init_key=jax.random.PRNGKey(99))
        for i in range(3):
            if spec.layers[i].kind != "conv":
                continue
            np.testing.assert_allclose(np.asarray(loaded[i]["w"]),
                                       np.asarray(params[i]["w"]), rtol=1e-6)
        # the remaining conv layers come from the init_key init (not the
        # original params)
        later = [i for i in range(3, len(spec.layers))
                 if spec.layers[i].kind == "conv"]
        assert later
        i = later[0]
        assert not np.allclose(np.asarray(loaded[i]["w"]),
                               np.asarray(params[i]["w"]))

    def test_strict_mode_raises(self, tmp_path):
        spec = yolov3.build_spec(TINY_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(7), spec)
        path = str(tmp_path / "backbone.weights")
        yolov3.save_partial_weights(spec, params, path, cutoff=2)
        with pytest.raises(ValueError):
            yolov3.load_darknet_weights(spec, path, allow_partial=False)


CLASSIFIER_CFG = """
[net]
width=64
height=64
channels=3

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

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=relu

[dropout]
probability=.5

[avgpool]

[connected]
output=12
activation=relu

[connected]
batch_normalize=1
output=10
activation=linear

[softmax]
groups=1

[cost]
type=sse
"""


class TestLayerZoo:
    """Stock-darknet classifier layers beyond YOLOv3's subset
    (parser.c:699-780: avgpool/connected/dropout/softmax/cost) — keeps
    non-v3 cfgs loadable.  avgpool is darknet's GLOBAL pool
    (avgpool_layer.c); connected follows connected_layer.c (flatten ->
    matmul; with batch_normalize the bias array is BN's beta); dropout and
    cost are inference no-ops (their forwards gate on net.train)."""

    def _build(self):
        spec = yolov3.build_spec(CLASSIFIER_CFG)
        rng = np.random.RandomState(0)
        params = yolov3.init_params(jax.random.PRNGKey(3), spec)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * rng.standard_normal(a.shape).astype(np.float32),
            params)
        return spec, params

    def test_spec_kinds_and_connected_sizing(self):
        spec, _ = self._build()
        kinds = [l.kind for l in spec.layers]
        assert kinds == ["conv", "maxpool", "conv", "dropout", "avgpool",
                         "connected", "connected", "softmax", "cost"]
        fc = [l for l in spec.layers if l.kind == "connected"]
        # avgpool collapses to 1x1x16 -> 16 inputs; then 12
        assert [l.in_features for l in fc] == [16, 12]
        assert fc[1].batch_normalize

    def test_cost_type_does_not_clobber_block_type(self):
        blocks = darknet_cfg.parse_cfg(CLASSIFIER_CFG)
        assert blocks[-1]["type"] == "cost"
        assert blocks[-1]["type_option"] == "sse"

    def test_forward_softmax_output(self):
        spec, params = self._build()
        x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3)
                        .astype(np.float32))
        out = np.asarray(yolov3.forward(spec, params, x, reso=64))
        assert out.shape == (2, 1, 1, 10)
        np.testing.assert_allclose(out.reshape(2, -1).sum(1), 1.0, rtol=1e-5)
        assert (out >= 0).all()

    def test_weights_byte_roundtrip(self, tmp_path):
        spec, params = self._build()
        path = str(tmp_path / "cls.weights")
        yolov3.save_darknet_weights(spec, params, path)
        loaded, _ = yolov3.load_darknet_weights(spec, path,
                                                allow_partial=False)
        fa = jax.tree_util.tree_leaves(params)
        fb = jax.tree_util.tree_leaves(loaded)
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_connected_matches_numpy_oracle(self):
        spec, params = self._build()
        x = np.random.RandomState(2).rand(3, 64, 64, 3).astype(np.float32)
        out = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=64))
        # replay the tail (avgpool -> fc1 relu -> fc2 BN -> softmax) in numpy
        # from the conv trunk's output
        trunk_spec = yolov3.NetworkSpec(spec.layers[:4], spec.cache_idxs,
                                        spec.net_info)
        feats = np.asarray(yolov3.forward(
            trunk_spec, list(params)[:4], jnp.asarray(x), reso=64))
        f = feats.mean(axis=(1, 2))                       # global avgpool
        p1, p2 = params[5], params[6]
        h = f @ np.asarray(p1["w"]) + np.asarray(p1["b"])
        h = np.maximum(h, 0.0)
        scale = np.asarray(p2["bn_scale"]) / np.sqrt(
            np.asarray(p2["bn_var"]) + yolov3.BN_EPS)
        z = (h @ np.asarray(p2["w"])) * scale + (
            np.asarray(p2["bn_bias"]) - np.asarray(p2["bn_mean"]) * scale)
        e = np.exp(z - z.max(axis=1, keepdims=True))
        ref = e / e.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(out.reshape(3, -1), ref, atol=1e-5)

    def test_unsupported_block_message_lists_zoo(self):
        # [lstm] is absent from the reference fork's parser.c — stays out
        with pytest.raises(ValueError, match="avgpool"):
            yolov3.build_spec("[net]\nwidth=32\nheight=32\n\n[lstm]\noutput=4")


YOLOV2_TINY_CFG = """
[net]
width=96
height=96
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
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
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[route]
layers=-2

[reorg]
stride=2

[route]
layers=-1,-3

[convolutional]
size=1
stride=1
pad=1
filters=35
activation=linear

[region]
anchors = 1.3221, 1.73145,  3.19275, 4.00944,  5.05587, 8.09892,  9.47112, 4.84053,  11.2364, 10.0071
bias_match=1
classes=2
coords=4
num=5
softmax=1
"""


def _reorg_oracle_chw(x, stride):
    """Direct transcription of blas.c reorg_cpu (non-reverse forward:
    out[in_index] = x[out_index], reorg_layer.c:79-87).  x: [B,C,H,W]."""
    b_, c, h, w = x.shape
    out_c, out_h, out_w = c * stride * stride, h // stride, w // stride
    in_c = out_c // (stride * stride)
    out = np.zeros((b_, out_c, out_h, out_w), x.dtype)
    for b in range(b_):
        for k in range(out_c):
            for j in range(out_h):
                for i in range(out_w):
                    c2 = k % in_c
                    offset = k // in_c
                    w2 = i * stride + offset % stride
                    h2 = j * stride + offset // stride
                    out[b, k, j, i] = x[b, c2, h2, w2]
    return out


class TestYoloV2:
    """YOLOv2 layers: [reorg] (darknet space-to-depth interleave) and
    [region] (grid-unit anchors + softmax classes, region_layer.c)."""

    def test_reorg_matches_c_transcription(self):
        rng = np.random.RandomState(0)
        x_chw = rng.rand(2, 4, 6, 8).astype(np.float32)
        want = _reorg_oracle_chw(x_chw, 2)
        x_nhwc = jnp.asarray(x_chw.transpose(0, 2, 3, 1))
        got = np.asarray(yolov3._reorg(x_nhwc, 2)).transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(got, want)

    def test_region_decode_matches_numpy_oracle(self):
        rng = np.random.RandomState(1)
        gs, na, nc, reso = 3, 2, 2, 96
        anchors = ((1.5, 2.0), (3.25, 1.0))
        attrs = 5 + nc
        raw = rng.randn(1, gs, gs, na * attrs).astype(np.float32)
        got = np.asarray(yolov3.decode_region_head(
            jnp.asarray(raw), anchors, nc, reso))

        def sigmoid(v):
            return 1.0 / (1.0 + np.exp(-v))

        # oracle: get_region_box w/ DOABS (region_layer.c:78-90) scaled to
        # input pixels; anchor-major row order
        r = raw.reshape(1, gs, gs, na, attrs)
        for a in range(na):
            for j in range(gs):
                for i in range(gs):
                    row = got[0, a * gs * gs + j * gs + i]
                    t = r[0, j, i, a]
                    np.testing.assert_allclose(
                        row[0], (i + sigmoid(t[0])) / gs * reso, rtol=1e-5)
                    np.testing.assert_allclose(
                        row[1], (j + sigmoid(t[1])) / gs * reso, rtol=1e-5)
                    np.testing.assert_allclose(
                        row[2], np.exp(t[2]) * anchors[a][0] / gs * reso,
                        rtol=1e-5)
                    np.testing.assert_allclose(
                        row[3], np.exp(t[3]) * anchors[a][1] / gs * reso,
                        rtol=1e-5)
                    np.testing.assert_allclose(row[4], sigmoid(t[4]),
                                               rtol=1e-5)
                    e = np.exp(t[5:] - t[5:].max())
                    np.testing.assert_allclose(row[5:], e / e.sum(),
                                               rtol=1e-4)

    def test_v2_net_builds_runs_roundtrips(self, tmp_path):
        spec = yolov3.build_spec(YOLOV2_TINY_CFG)
        kinds = [l.kind for l in spec.layers]
        assert "reorg" in kinds and "region" in kinds
        params = yolov3.init_params(jax.random.PRNGKey(5), spec)
        x = jnp.asarray(np.random.RandomState(2).rand(2, 96, 96, 3)
                        .astype(np.float32))
        dets = np.asarray(yolov3.forward(spec, params, x, reso=96))
        # 12x12 grid (stride 8), 5 anchors, 2 classes
        assert dets.shape == (2, 5 * 12 * 12, 7)
        # objectness and class probs in [0,1], class rows sum to 1
        assert (dets[..., 4] >= 0).all() and (dets[..., 4] <= 1).all()
        np.testing.assert_allclose(dets[..., 5:].sum(-1), 1.0, rtol=1e-4)
        path = str(tmp_path / "v2.weights")
        yolov3.save_darknet_weights(spec, params, path)
        loaded, _ = yolov3.load_darknet_weights(spec, path,
                                                allow_partial=False)
        out2 = np.asarray(yolov3.forward(spec, loaded, x, reso=96))
        np.testing.assert_array_equal(dets, out2)


class TestYoloV1Detection:
    """YOLOv1 [detection] head (detection_layer.c): flat-layout decode
    against a numpy transcription of get_detection_boxes:532-558, cfg
    build via [connected] -> [detection], and .weights roundtrip."""

    V1_CFG = """
[net]
width=64
height=64

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[connected]
output=208
activation=linear

[detection]
classes=3
coords=4
rescore=1
side=4
num=2
softmax=0
sqrt=1
jitter=.2
"""

    def _decode_oracle(self, flat, side, num, classes, sqrt_flag, reso):
        """numpy transcription of get_detection_boxes (image w=h=reso)."""
        sc = side * side
        rows = []
        for i in range(sc):
            row_i, col_i = i // side, i % side
            for n in range(num):
                p_index = sc * classes + i * num + n
                scale = flat[p_index]
                bi = sc * (classes + num) + (i * num + n) * 4
                x = (flat[bi + 0] + col_i) / side * reso
                y = (flat[bi + 1] + row_i) / side * reso
                w = flat[bi + 2] ** (2 if sqrt_flag else 1) * reso
                h = flat[bi + 3] ** (2 if sqrt_flag else 1) * reso
                cls = flat[i * classes:(i + 1) * classes]
                rows.append([x, y, w, h, scale] + list(cls))
        return np.asarray(rows, np.float32)

    def test_decode_matches_c_transcription(self):
        rng = np.random.RandomState(0)
        side, num, nc, reso = 4, 2, 3, 64
        flat = rng.rand(side * side * (nc + num * 5)).astype(np.float32)
        spec_l = yolov3.LayerSpec(
            "detection", 0, side=side, num=num, num_classes=nc,
            coords=4, det_sqrt=True)
        got = np.asarray(yolov3.decode_detection_head(
            jnp.asarray(flat[None]), spec_l, reso))[0]
        want = self._decode_oracle(flat, side, num, nc, True, reso)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_cfg_builds_runs_and_roundtrips(self, tmp_path):
        spec = yolov3.build_spec(self.V1_CFG)
        kinds = [l.kind for l in spec.layers]
        assert kinds[-2:] == ["connected", "detection"]
        det = spec.layers[-1]
        assert (det.side, det.num, det.num_classes) == (4, 2, 3)
        assert det.det_sqrt and not det.det_softmax
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = jnp.asarray(np.random.RandomState(1).rand(
            2, 64, 64, 3).astype(np.float32))
        out = yolov3.forward(spec, params, x, 64)
        assert out.shape == (2, 4 * 4 * 2, 5 + 3)
        assert np.isfinite(np.asarray(out)).all()

        # byte roundtrip: [detection] holds no params; conv/connected do
        path = str(tmp_path / "v1.weights")
        yolov3.save_darknet_weights(spec, params, path)
        loaded, _ = yolov3.load_darknet_weights(spec, path)
        out2 = yolov3.forward(spec, loaded, x, 64)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                                   rtol=1e-6)

    def test_softmax_classes(self):
        rng = np.random.RandomState(2)
        side, num, nc = 2, 1, 3
        flat = rng.randn(side * side * (nc + num * 5)).astype(np.float32)
        l_soft = yolov3.LayerSpec("detection", 0, side=side, num=num,
                                  num_classes=nc, coords=4,
                                  det_softmax=True)
        got = np.asarray(yolov3.decode_detection_head(
            jnp.asarray(flat[None]), l_soft, 64))[0]
        cls = got[:, 5:]
        np.testing.assert_allclose(cls.sum(axis=1), 1.0, rtol=1e-5)

    def test_train_loss_v1_head(self):
        # v1 heads train now (detection_layer.c loss; oracle coverage in
        # tests/test_v1v2_loss.py) — finite loss with flowing gradients
        from betapose_tpu.train.yolo_loss import yolo_loss
        spec = yolov3.build_spec(self.V1_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = jnp.asarray(np.random.RandomState(0).rand(
            1, 64, 64, 3).astype(np.float32))
        truths = np.zeros((1, 4, 5), np.float32)
        truths[0, 0] = [0.4, 0.6, 0.3, 0.25, 1]
        loss, metrics = yolo_loss(spec, params, x, jnp.asarray(truths),
                                  64, 64, train=False)
        assert np.isfinite(float(loss))
        assert float(metrics["head0/count"]) == 1.0
        g = jax.grad(lambda p: yolo_loss(
            spec, p, x, jnp.asarray(truths), 64, 64, train=False)[0]
        )(params)
        gn = sum(float(jnp.sum(jnp.abs(v)))
                 for v in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0


DARKNET_TAIL_CFG = """
[net]
width=16
height=16
channels=3

[crop]
crop_height=12
crop_width=12

[convolutional]
batch_normalize=1
filters=6
size=3
stride=1
pad=1
activation=leaky

[normalization]
size=5
alpha=0.0002
beta=0.75
kappa=2.0

[local]
filters=4
size=3
stride=1
pad=1
activation=leaky

[connected]
output=7
activation=linear
"""

RECURRENT_CFG = """
[net]
width=2
height=2
channels=3
time_steps=2

[crnn]
batch_normalize=1
hidden_filters=4
output_filters=5
shortcut=1
activation=leaky

[rnn]
output=5
hidden=6
activation=tanh
logistic=2
shortcut=1

[gru]
output=4
"""


def _nchw(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _im2col_cpu(im_chw, ksize, stride, pad):
    """Direct transcription of darknet im2col.c:16-46 (zero OOB pad)."""
    channels, height, width = im_chw.shape
    height_col = (height + 2 * pad - ksize) // stride + 1
    width_col = (width + 2 * pad - ksize) // stride + 1
    channels_col = channels * ksize * ksize
    col = np.zeros((channels_col, height_col * width_col), np.float32)
    for c in range(channels_col):
        w_offset = c % ksize
        h_offset = (c // ksize) % ksize
        c_im = c // ksize // ksize
        for h in range(height_col):
            for w in range(width_col):
                im_row = h_offset + h * stride - pad
                im_col = w_offset + w * stride - pad
                v = 0.0
                if 0 <= im_row < height and 0 <= im_col < width:
                    v = im_chw[c_im, im_row, im_col]
                col[c, h * width_col + w] = v
    return col


class TestDarknetTail:
    """The last darknet layer kinds beyond the detector zoo
    (crop/normalization/local/rnn/crnn/gru) — each checked against a numpy
    transcription of the C forward, plus byte roundtrips and the CHW-flatten
    memory-order contract for [connected] after spatial layers."""

    def test_crop_matches_c_transcription(self):
        # crop_layer.c:67-103 inference branch: center crop + x*2-1
        rng = np.random.RandomState(0)
        x = rng.rand(2, 9, 7, 3).astype(np.float32)
        l = yolov3.LayerSpec("crop", 3, crop_h=4, crop_w=5)
        got = _nchw(yolov3._crop_layer(l, jnp.asarray(x)))
        xc = _nchw(x)
        dh, dw = (9 - 4) // 2, (7 - 5) // 2
        ref = xc[:, :, dh:dh + 4, dw:dw + 5] * 2.0 - 1.0
        np.testing.assert_allclose(got, ref, atol=1e-6)
        l2 = yolov3.LayerSpec("crop", 3, crop_h=4, crop_w=5, noadjust=True)
        got2 = _nchw(yolov3._crop_layer(l2, jnp.asarray(x)))
        np.testing.assert_allclose(got2, xc[:, :, dh:dh + 4, dw:dw + 5],
                                   atol=1e-6)

    @pytest.mark.parametrize("size,c", [(5, 8), (3, 4), (2, 6)])
    def test_lrn_matches_c_transcription(self, size, c):
        # normalization_layer.c:65-94 rolling-window loop, including the
        # short seed (sums k < size/2, one shy of the clipped window)
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 4, c).astype(np.float32)
        l = yolov3.LayerSpec("normalization", c, size=size,
                             lrn_alpha=2e-4, lrn_beta=0.75, lrn_kappa=1.5)
        got = _nchw(yolov3._lrn_layer(l, jnp.asarray(x)))
        xc = _nchw(x)
        sq = xc * xc
        norms = np.empty_like(xc)
        norms[:, 0] = l.lrn_kappa
        for k in range(size // 2):
            norms[:, 0] += l.lrn_alpha * sq[:, k]
        for k in range(1, c):
            norms[:, k] = norms[:, k - 1]
            prev = k - (size - 1) // 2 - 1
            nxt = k + size // 2
            if prev >= 0:
                norms[:, k] -= l.lrn_alpha * sq[:, prev]
            if nxt < c:
                norms[:, k] += l.lrn_alpha * sq[:, nxt]
        ref = xc * norms ** (-l.lrn_beta)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("pad", [0, 1])
    def test_local_matches_c_transcription(self, pad):
        # local_layer.c forward:91-119: per-location [n,k] weight block vs
        # im2col column j; bias layout [n, locations]
        rng = np.random.RandomState(2)
        size, stride, cin, n = 3, 1, 3, 4
        h = w = 6
        out_h = (h - 1) // stride + 1 if pad else (h - size) // stride + 1
        out_w = out_h
        locations = out_h * out_w
        k = size * size * cin
        x = rng.randn(2, h, w, cin).astype(np.float32)
        wts = rng.randn(locations, n, k).astype(np.float32)
        b = rng.randn(n, locations).astype(np.float32)
        l = yolov3.LayerSpec("local", n, size=size, stride=stride, pad=pad,
                             activation="leaky", in_channels=cin,
                             loc_h=out_h, loc_w=out_w)
        got = _nchw(yolov3._local_layer(
            l, {"w": jnp.asarray(wts), "b": jnp.asarray(b)},
            jnp.asarray(x)))
        ref = np.empty((2, n, out_h, out_w), np.float32)
        for bi in range(2):
            col = _im2col_cpu(_nchw(x)[bi], size, stride, pad)
            out = b.copy()
            for j in range(locations):
                out[:, j] += wts[j] @ col[:, j]
            out = np.where(out > 0, out, 0.1 * out)   # leaky
            ref[bi] = out.reshape(n, out_h, out_w)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_rnn_matches_c_transcription(self):
        # rnn_layer.c forward:83-122 with shortcut=1, logistic=2 (LOGGY
        # self activation), tanh elsewhere; steps ride the leading batch
        rng = np.random.RandomState(3)
        steps, batch, in_f, hidden, out = 3, 2, 5, 4, 3
        l = yolov3.LayerSpec("rnn", out, hidden=hidden, activation="tanh",
                             rnn_logistic=2, rnn_shortcut=True,
                             in_features=in_f, steps=steps)
        p = {name: {"w": jnp.asarray(rng.randn(i, o).astype(np.float32)),
                    "b": jnp.asarray(rng.randn(o).astype(np.float32))}
             for name, i, o in (("input", in_f, hidden),
                                ("self", hidden, hidden),
                                ("output", hidden, out))}
        x = rng.randn(steps * batch, 1, 1, in_f).astype(np.float32)
        got = np.asarray(yolov3._rnn_layer(l, p, jnp.asarray(x)))
        got = got.reshape(steps, batch, out)

        def dense(pp, v, act):
            y = v @ np.asarray(pp["w"]) + np.asarray(pp["b"])
            if act == "tanh":
                return np.tanh(y)
            if act == "loggy":
                return 2.0 / (1.0 + np.exp(-y)) - 1.0
            return y

        xs = x.reshape(steps, batch, in_f)
        state = np.zeros((batch, hidden), np.float32)
        for t in range(steps):
            i = dense(p["input"], xs[t], "tanh")
            s = dense(p["self"], state, "loggy")
            state = state + i + s                     # shortcut=1
            o = dense(p["output"], state, "tanh")
            np.testing.assert_allclose(got[t], o, rtol=1e-5, atol=1e-5)

    def test_rnn_no_shortcut_resets_state_sum(self):
        # shortcut=0: state' = input + self (fill 0 then two axpy)
        rng = np.random.RandomState(4)
        steps, batch, in_f, hidden, out = 2, 1, 3, 3, 2
        l = yolov3.LayerSpec("rnn", out, hidden=hidden,
                             activation="logistic", in_features=in_f,
                             steps=steps)
        p = {name: {"w": jnp.asarray(rng.randn(i, o).astype(np.float32)),
                    "b": jnp.asarray(rng.randn(o).astype(np.float32))}
             for name, i, o in (("input", in_f, hidden),
                                ("self", hidden, hidden),
                                ("output", hidden, out))}
        x = rng.randn(steps * batch, 1, 1, in_f).astype(np.float32)
        got = np.asarray(yolov3._rnn_layer(l, p, jnp.asarray(x)))
        got = got.reshape(steps, batch, out)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        xs = x.reshape(steps, batch, in_f)
        state = np.zeros((batch, hidden), np.float32)
        for t in range(steps):
            state = (sig(xs[t] @ np.asarray(p["input"]["w"])
                         + np.asarray(p["input"]["b"]))
                     + sig(state @ np.asarray(p["self"]["w"])
                           + np.asarray(p["self"]["b"])))
            o = sig(state @ np.asarray(p["output"]["w"])
                    + np.asarray(p["output"]["b"]))
            np.testing.assert_allclose(got[t], o, rtol=1e-5, atol=1e-5)

    def test_gru_matches_c_transcription(self):
        # gru_layer.c forward:117-193: z/r sigmoids AFTER input+state sum,
        # candidate h sigmoid (USET off), out = z*old_state + (1-z)*h
        rng = np.random.RandomState(5)
        steps, batch, in_f, out = 3, 2, 4, 3
        l = yolov3.LayerSpec("gru", out, in_features=in_f, steps=steps)
        names = yolov3._GRU_SUBLAYERS
        p = {n: {"w": jnp.asarray(rng.randn(
                     in_f if n.startswith("input") else out, out)
                     .astype(np.float32)),
                 "b": jnp.asarray(rng.randn(out).astype(np.float32))}
             for n in names}
        x = rng.randn(steps * batch, 1, 1, in_f).astype(np.float32)
        got = np.asarray(yolov3._gru_layer(l, p, jnp.asarray(x)))
        got = got.reshape(steps, batch, out)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        lin = lambda n, v: v @ np.asarray(p[n]["w"]) + np.asarray(p[n]["b"])
        xs = x.reshape(steps, batch, in_f)
        state = np.zeros((batch, out), np.float32)
        for t in range(steps):
            z = sig(lin("input_z", xs[t]) + lin("state_z", state))
            r = sig(lin("input_r", xs[t]) + lin("state_r", state))
            h = sig(lin("input_h", xs[t]) + lin("state_h", r * state))
            state = z * state + (1.0 - z) * h
            np.testing.assert_allclose(got[t], state, rtol=1e-5, atol=1e-5)

    def test_crnn_matches_python_loop(self):
        # crnn_layer.c forward:90-131 — same recurrence as [rnn] with 3x3
        # conv sublayers; oracle replays the scan as a Python loop over
        # the already-tested _conv_layer
        spec = yolov3.build_spec(RECURRENT_CFG)
        l = spec.layers[0]
        assert (l.kind, l.hidden, l.out_channels, l.steps,
                l.rnn_shortcut) == ("crnn", 4, 5, 2, True)
        params = yolov3.init_params(jax.random.PRNGKey(7), spec)
        rng = np.random.RandomState(6)
        x = rng.randn(4, 2, 2, 3).astype(np.float32)    # steps=2, batch=2
        got = np.asarray(yolov3._crnn_layer(l, params[0], jnp.asarray(x)))
        mk = lambda cin, cout: yolov3.LayerSpec(
            "conv", cout, size=3, stride=1, pad=1, batch_normalize=True,
            activation="leaky", in_channels=cin)
        state = jnp.zeros((2, 2, 2, 4), jnp.float32)
        outs = []
        for t in range(2):
            xt = jnp.asarray(x[t * 2:(t + 1) * 2])
            i = yolov3._conv_layer(mk(3, 4), params[0]["input"], xt)
            s = yolov3._conv_layer(mk(4, 4), params[0]["self"], state)
            state = state + i + s                        # shortcut=1
            outs.append(np.asarray(yolov3._conv_layer(
                mk(4, 5), params[0]["output"], state)))
        np.testing.assert_allclose(got, np.concatenate(outs), rtol=1e-5,
                                   atol=1e-5)

    def test_tail_cfg_builds_runs_roundtrips(self, tmp_path):
        spec = yolov3.build_spec(DARKNET_TAIL_CFG)
        assert [l.kind for l in spec.layers] == [
            "crop", "conv", "normalization", "local", "connected"]
        assert spec.layers[3].loc_h == 12       # pad=1 size=3: (12-1)/1+1
        assert spec.layers[4].in_features == 4 * 12 * 12
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(2, 16, 16, 3).astype(np.float32))
        out = np.asarray(yolov3.forward(spec, params, x, reso=16))
        assert out.shape == (2, 1, 1, 7)
        path = str(tmp_path / "tail.weights")
        yolov3.save_darknet_weights(spec, params, path)
        loaded, _ = yolov3.load_darknet_weights(spec, path,
                                                allow_partial=False)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_recurrent_cfg_builds_runs_roundtrips(self, tmp_path):
        spec = yolov3.build_spec(RECURRENT_CFG)
        assert [l.kind for l in spec.layers] == ["crnn", "rnn", "gru"]
        assert spec.layers[1].in_features == 5 * 2 * 2
        assert spec.layers[2].in_features == 5
        params = yolov3.init_params(jax.random.PRNGKey(1), spec)
        x = jnp.asarray(np.random.RandomState(1)
                        .rand(4, 2, 2, 3).astype(np.float32))
        out = np.asarray(yolov3.forward(spec, params, x, reso=2))
        assert out.shape == (4, 1, 1, 4)
        assert np.isfinite(out).all()
        path = str(tmp_path / "rec.weights")
        yolov3.save_darknet_weights(spec, params, path)
        loaded, _ = yolov3.load_darknet_weights(spec, path,
                                                allow_partial=False)
        la = jax.tree_util.tree_leaves(params)
        lb = jax.tree_util.tree_leaves(loaded)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        with pytest.raises(ValueError, match="rnn"):
            yolov3.forward(spec, params, x, reso=2, train=True)

    def test_connected_flattens_chw(self):
        # connected_layer.c consumes the previous layer's CHW-flat buffer;
        # an NHWC ravel would permute the weight rows whenever the input
        # still has spatial extent (regression for the flatten order)
        cfg = """
[net]
width=4
height=4
channels=3

[convolutional]
filters=2
size=1
stride=1
pad=0
activation=linear

[connected]
output=5
activation=linear
"""
        spec = yolov3.build_spec(cfg)
        assert spec.layers[1].in_features == 2 * 4 * 4
        params = yolov3.init_params(jax.random.PRNGKey(2), spec)
        rng = np.random.RandomState(7)
        params[1]["w"] = jnp.asarray(rng.randn(32, 5).astype(np.float32))
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        feats = np.asarray(yolov3.forward(
            yolov3.NetworkSpec(spec.layers[:1], spec.cache_idxs,
                               spec.net_info),
            params[:1], jnp.asarray(x), reso=4))
        flat = _nchw(feats).reshape(2, -1)          # darknet CHW order
        ref = flat @ np.asarray(params[1]["w"]) + np.asarray(
            params[1]["b"])
        got = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=4)).reshape(2, -1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _reorg_cpu_oracle(x_flat, W, H, C, stride, forward):
    """Direct transcription of darknet blas.c reorg_cpu:9-33 (one sample,
    flat CHW buffers)."""
    out = np.zeros_like(x_flat)
    in_c = C // (stride * stride)
    for k in range(C):
        for j in range(H):
            for i in range(W):
                in_index = i + W * (j + H * k)
                c2 = k % in_c
                offset = k // in_c
                w2 = i * stride + offset % stride
                h2 = j * stride + offset // stride
                out_index = w2 + W * stride * (h2 + H * stride * c2)
                if forward:
                    out[out_index] = x_flat[in_index]
                else:
                    out[in_index] = x_flat[out_index]
    return out


class TestFinalZoo:
    """The last three parser.c layer kinds ([activation], [batchnorm],
    [reorg_old]) + [reorg] reverse + the section-name alias table —
    with these, every LAYER_TYPE in string_to_layer_type:44-79 builds."""

    @pytest.mark.parametrize("name,f", [
        ("elu", lambda x: x if x >= 0 else math.exp(x) - 1),
        ("relie", lambda x: x if x > 0 else 0.01 * x),
        ("ramp", lambda x: x * (x > 0) + 0.1 * x),
        ("plse", lambda x: (0.01 * (x + 4) if x < -4 else
                            0.01 * (x - 4) + 1 if x > 4 else
                            0.125 * x + 0.5)),
        ("hardtan", lambda x: -1.0 if x < -1 else (1.0 if x > 1 else x)),
        ("lhtan", lambda x: (0.001 * x if x < 0 else
                             0.001 * (x - 1) + 1 if x > 1 else x)),
        ("stair", lambda x: (math.floor(x / 2.0)
                             if int(math.floor(x)) % 2 == 0 else
                             (x - math.floor(x)) + math.floor(x / 2.0))),
    ])
    def test_activation_formulas_match_c(self, name, f):
        # activations.h:22-55 scalar formulas (incl. negative inputs;
        # stair's parity test uses Python %, which matches C's !=0 test
        # on negatives because parity is sign-independent)
        xs = np.array([-5.5, -4.0, -2.5, -1.5, -1.0, -0.3, 0.0, 0.4,
                       1.0, 1.7, 3.0, 4.0, 6.25], np.float32)
        got = np.asarray(yolov3._activate(jnp.asarray(xs), name))
        want = np.array([f(float(v)) for v in xs], np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_activation_layer_in_graph(self):
        cfg = ("[net]\nwidth=4\nheight=4\nchannels=3\n\n"
               "[activation]\nactivation=loggy\n")
        spec = yolov3.build_spec(cfg)
        assert [l.kind for l in spec.layers] == ["activation"]
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
        got = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=4))
        np.testing.assert_allclose(got, 2.0 / (1.0 + np.exp(-x)) - 1.0,
                                   rtol=1e-5, atol=1e-6)

    def test_batchnorm_matches_c_transcription(self):
        # batchnorm_layer.c forward:129-151 inference: normalize_cpu
        # divides by (sqrt(var) + 1e-6) — epsilon OUTSIDE the sqrt — then
        # scale_bias; no beta exists
        rng = np.random.RandomState(3)
        c = 5
        x = rng.randn(2, 3, 4, c).astype(np.float32)
        p = {"bn_scale": jnp.asarray(rng.rand(c).astype(np.float32) + .5),
             "bn_mean": jnp.asarray(rng.randn(c).astype(np.float32)),
             "bn_var": jnp.asarray(rng.rand(c).astype(np.float32) + .2)}
        l = yolov3.LayerSpec("batchnorm", c)
        got = np.asarray(yolov3._batchnorm_layer(l, p, jnp.asarray(x)))
        want = ((x - np.asarray(p["bn_mean"]))
                / (np.sqrt(np.asarray(p["bn_var"])) + 1e-6)
                * np.asarray(p["bn_scale"]))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_batchnorm_train_records_batch_stats(self):
        rng = np.random.RandomState(4)
        x = rng.randn(4, 3, 3, 2).astype(np.float32) * 3 + 1
        spec = yolov3.build_spec(
            "[net]\nwidth=3\nheight=3\nchannels=2\n\n[batchnorm]\n")
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        stats = {}
        out = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=3, train=True, bn_stats=stats))
        mean, var = (np.asarray(v) for v in stats[0])
        np.testing.assert_allclose(mean, x.mean(axis=(0, 1, 2)), atol=1e-5)
        np.testing.assert_allclose(var, x.var(axis=(0, 1, 2)), atol=1e-5)
        # normalized output has ~zero mean / unit variance per channel
        np.testing.assert_allclose(out.mean(axis=(0, 1, 2)), 0, atol=1e-5)
        np.testing.assert_allclose(out.var(axis=(0, 1, 2)), 1, atol=1e-3)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_reorg_old_matches_c_transcription(self, reverse):
        # reorg_old_layer.c forward:80-88: reorg_cpu gets the layer's
        # INPUT dims; reverse flips the forward flag
        rng = np.random.RandomState(5)
        s, h, w, c = 2, 4, 6, 8
        x = rng.randn(2, h, w, c).astype(np.float32)
        cfg = (f"[net]\nwidth={w}\nheight={h}\nchannels={c}\n\n"
               f"[reorg_old]\nstride={s}\nreverse={int(reverse)}\n")
        spec = yolov3.build_spec(cfg)
        (l,) = spec.layers
        assert l.kind == "reorg_old" and l.reverse == reverse
        got = np.asarray(yolov3.forward(
            spec, [{}], jnp.asarray(x), reso=max(h, w)))
        oc = c // (s * s) if reverse else c * s * s
        oh = h * s if reverse else h // s
        ow = w * s if reverse else w // s
        assert got.shape == (2, oh, ow, oc)
        for bi in range(2):
            flat = np.transpose(x[bi], (2, 0, 1)).ravel()
            want = _reorg_cpu_oracle(flat, w, h, c, s, int(reverse))
            np.testing.assert_array_equal(
                np.transpose(got[bi], (2, 0, 1)).ravel(), want)

    def test_reorg_reverse_matches_c_transcription(self):
        # reorg_layer.c forward:78-86 reverse branch: reorg_cpu gets the
        # OUT dims (w*s, h*s, c/s^2) with forward=1 — note the double
        # /s^2 decomposition means c must divide s^4
        rng = np.random.RandomState(6)
        s, h, w, c = 2, 3, 5, 16
        x = rng.randn(2, h, w, c).astype(np.float32)
        cfg = (f"[net]\nwidth={w}\nheight={h}\nchannels={c}\n\n"
               f"[reorg]\nstride={s}\nreverse=1\n")
        spec = yolov3.build_spec(cfg)
        got = np.asarray(yolov3.forward(
            spec, [{}], jnp.asarray(x), reso=max(h, w)))
        assert got.shape == (2, h * s, w * s, c // (s * s))
        for bi in range(2):
            flat = np.transpose(x[bi], (2, 0, 1)).ravel()
            want = _reorg_cpu_oracle(flat, w * s, h * s, c // (s * s), s, 1)
            np.testing.assert_array_equal(
                np.transpose(got[bi], (2, 0, 1)).ravel(), want)

    def test_reorg_reverse_rejects_bad_channels(self):
        with pytest.raises(ValueError, match="divisible"):
            yolov3.build_spec(
                "[net]\nwidth=4\nheight=4\nchannels=8\n\n"
                "[reorg]\nstride=2\nreverse=1\n")
        with pytest.raises(ValueError, match="divisible"):
            yolov3.build_spec(
                "[net]\nwidth=4\nheight=4\nchannels=6\n\n"
                "[reorg_old]\nstride=2\n")

    def test_section_alias_table(self):
        # parser.c string_to_layer_type:44-79: [conv]/[conn]/[max]/[avg]/
        # [lrn]/[soft]/[network] are aliases of the long names
        cfg = """
[network]
width=8
height=8
channels=3

[conv]
filters=4
size=3
stride=1
pad=1
activation=leaky

[max]
size=2
stride=2
padding=0

[lrn]
size=3

[conv]
filters=6
size=1
stride=1
pad=0
activation=linear

[avg]

[conn]
output=5
activation=linear

[soft]
"""
        spec = yolov3.build_spec(cfg)
        assert [l.kind for l in spec.layers] == [
            "conv", "maxpool", "normalization", "conv", "avgpool",
            "connected", "softmax"]
        assert spec.net_info["width"] == "8"
        assert spec.layers[5].in_features == 6  # after global avgpool
        params = yolov3.init_params(jax.random.PRNGKey(1), spec)
        x = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
        out = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=8))
        assert out.shape == (2, 1, 1, 5)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)

    def test_final_zoo_cfg_builds_runs_roundtrips(self, tmp_path):
        cfg = """
[net]
width=8
height=8
channels=4

[reorg_old]
stride=2

[batchnorm]

[activation]
activation=elu

[reorg]
stride=2
reverse=1

[connected]
output=3
activation=linear
"""
        spec = yolov3.build_spec(cfg)
        assert [l.kind for l in spec.layers] == [
            "reorg_old", "batchnorm", "activation", "reorg", "connected"]
        assert spec.layers[4].in_features == 4 * 8 * 8
        params = yolov3.init_params(jax.random.PRNGKey(2), spec)
        # zero rolling variance (darknet's calloc init) must not NaN
        params[1]["bn_var"] = params[1]["bn_var"] + 0.5
        x = np.random.RandomState(2).rand(2, 8, 8, 4).astype(np.float32)
        out = np.asarray(yolov3.forward(spec, params, jnp.asarray(x),
                                        reso=8))
        assert out.shape == (2, 1, 1, 3)
        assert np.isfinite(out).all()
        path = str(tmp_path / "fz.weights")
        yolov3.save_darknet_weights(spec, params, path)
        # on-disk float count: header(4 int32) + batchnorm 3*c +
        # connected bias+weights — batchnorm carries NO beta
        n_floats = (os.path.getsize(path) - 16) // 4
        assert n_floats == 3 * 16 + (3 + 4 * 8 * 8 * 3)
        loaded, _ = yolov3.load_darknet_weights(spec, path,
                                                allow_partial=False)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDropoutTraining:
    """[dropout] training semantics (dropout_layer.c forward: drop with
    prob p, survivors scaled 1/(1-p); identity at inference or when no
    key is supplied)."""

    CFG = ("[net]\nwidth=4\nheight=4\nchannels=3\n\n"
           "[dropout]\nprobability=0.3\n")

    def test_inference_identity_and_train_mask(self):
        spec = yolov3.build_spec(self.CFG)
        assert spec.layers[0].dropout_p == 0.3
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = np.random.RandomState(0).rand(64, 4, 4, 3).astype(
            np.float32) + 1.0
        xj = jnp.asarray(x)
        # no key (or train=False) -> identity
        np.testing.assert_array_equal(
            np.asarray(yolov3.forward(spec, params, xj, 4, train=True)), x)
        np.testing.assert_array_equal(
            np.asarray(yolov3.forward(
                spec, params, xj, 4,
                dropout_key=jax.random.PRNGKey(1))), x)
        # train + key: zeros at drop rate, survivors scaled by 1/(1-p)
        out = np.asarray(yolov3.forward(
            spec, params, xj, 4, train=True,
            dropout_key=jax.random.PRNGKey(1)))
        dropped = out == 0
        rate = dropped.mean()
        assert 0.2 < rate < 0.4          # ~p over 3072 units
        np.testing.assert_allclose(out[~dropped], x[~dropped] / 0.7,
                                   rtol=1e-6)
        # E[out] ~= E[x] (inverted dropout preserves expectation)
        assert abs(out.mean() - x.mean()) < 0.1 * x.mean()
