"""YOLOv3 tests: cfg parsing/spec building, darknet .weights roundtrip,
BN folding, torch-layout golden checks, and detection decode."""

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
        with pytest.raises(ValueError, match="avgpool"):
            yolov3.build_spec("[net]\nwidth=32\nheight=32\n\n[rnn]\noutput=4")


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

    def test_train_loss_rejects_v1_head(self):
        from betapose_tpu.train.yolo_loss import yolo_loss
        spec = yolov3.build_spec(self.V1_CFG)
        params = yolov3.init_params(jax.random.PRNGKey(0), spec)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        truths = jnp.zeros((1, 4, 5), jnp.float32)
        with pytest.raises(NotImplementedError, match="detection"):
            yolo_loss(spec, params, x, truths, 64, 64)
