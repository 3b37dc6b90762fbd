"""darknet weight-surgery verbs (darknet.c:384-449): average, rescale,
rgbgr, reset, denormalize, statistics, speed, ops.

Each test transcribes the darknet FORMULA (axpy/scal means, rescale_weights
scale+trans, BN folds from convolutional_layer.c:416 / connected_layer.c:200)
and checks the verb against it — the fold verbs additionally by whole-graph
forward equivalence, which is the property the surgery exists to preserve.
"""

import re

import jax
import numpy as np
import pytest

from betapose_tpu.models import yolov3
from betapose_tpu.tools import darknet_cli

from test_yolov3 import CLASSIFIER_CFG


def _randomized_params(spec, seed):
    """Init + perturb every leaf; give BN stats non-identity values so the
    fold verbs actually have something to fold."""
    rng = np.random.RandomState(seed)
    params = yolov3.init_params(jax.random.PRNGKey(seed), spec)
    out = []
    for p in params:
        q = {}
        for k, v in p.items():
            v = np.asarray(v, np.float32)
            if k == "bn_var":
                q[k] = (0.5 + rng.rand(*v.shape)).astype(np.float32)
            elif k in ("bn_mean", "bn_scale", "bn_bias", "b"):
                q[k] = rng.standard_normal(v.shape).astype(np.float32)
            else:
                q[k] = (v + 0.1 * rng.standard_normal(v.shape)
                        ).astype(np.float32)
        out.append(q)
    return out


@pytest.fixture()
def net(tmp_path):
    cfg_path = str(tmp_path / "net.cfg")
    with open(cfg_path, "w") as f:
        f.write(CLASSIFIER_CFG)
    spec = yolov3.build_spec(CLASSIFIER_CFG)
    params = _randomized_params(spec, 0)
    w_path = str(tmp_path / "net.weights")
    yolov3.save_darknet_weights(spec, params, w_path)
    return spec, params, cfg_path, w_path, tmp_path


def _fwd(spec, params, x):
    return np.asarray(yolov3.forward(spec, params, x, reso=64))


class TestAverage:
    def test_conv_mean_connected_quirk(self, net):
        spec, p1, cfg_path, w1, tmp = net
        p2 = _randomized_params(spec, 1)
        w2 = str(tmp / "net2.weights")
        yolov3.save_darknet_weights(spec, p2, w2)
        out = str(tmp / "avg.weights")
        darknet_cli.main(["average", cfg_path, out, w1, w2])
        avg, _ = yolov3.load_darknet_weights(spec, out)
        for li, l in enumerate(spec.layers):
            if l.kind == "conv":
                for k in p1[li]:
                    np.testing.assert_allclose(
                        np.asarray(avg[li][k]),
                        (np.asarray(p1[li][k]) + np.asarray(p2[li][k])) / 2,
                        rtol=1e-6, atol=1e-6, err_msg=f"layer {li} {k}")
            elif l.kind == "connected":
                for k in ("w", "b", "bn_bias"):
                    if k in p1[li]:
                        np.testing.assert_allclose(
                            np.asarray(avg[li][k]),
                            (np.asarray(p1[li][k])
                             + np.asarray(p2[li][k])) / 2,
                            rtol=1e-6, atol=1e-6)
                # darknet's CONNECTED branch never touches the BN arrays:
                # they keep the FIRST file's values (darknet.c:64-67 quirk)
                for k in ("bn_scale", "bn_mean", "bn_var"):
                    if k in p1[li]:
                        np.testing.assert_array_equal(
                            np.asarray(avg[li][k]), np.asarray(p1[li][k]))


class TestFirstConvSurgery:
    def test_rescale_formula(self, net):
        spec, params, cfg_path, w_path, tmp = net
        out = str(tmp / "rescaled.weights")
        darknet_cli.main(["rescale", cfg_path, w_path, out])
        got, _ = yolov3.load_darknet_weights(spec, out)
        li, l = darknet_cli._first_conv(spec)
        w_new = 2.0 * np.asarray(params[li]["w"])
        np.testing.assert_allclose(np.asarray(got[li]["w"]), w_new,
                                   rtol=1e-6)
        # rescale_weights (convolutional_layer.c:947): bias += sum of the
        # ALREADY-SCALED filter * trans (-0.5)
        bias_key = "bn_bias" if l.batch_normalize else "b"
        expect_b = (np.asarray(params[li][bias_key])
                    + w_new.sum(axis=(0, 1, 2)) * -0.5)
        np.testing.assert_allclose(np.asarray(got[li][bias_key]), expect_b,
                                   rtol=1e-5, atol=1e-6)
        # only the first conv is touched
        for lj, lspec in enumerate(spec.layers):
            if lj != li and lspec.kind == "conv":
                np.testing.assert_array_equal(np.asarray(got[lj]["w"]),
                                              np.asarray(params[lj]["w"]))

    def test_rgbgr_swaps_and_self_inverts(self, net):
        spec, params, cfg_path, w_path, tmp = net
        out1 = str(tmp / "bgr.weights")
        out2 = str(tmp / "rgb.weights")
        darknet_cli.main(["rgbgr", cfg_path, w_path, out1])
        darknet_cli.main(["rgbgr", cfg_path, out1, out2])
        li, _ = darknet_cli._first_conv(spec)
        got1, _ = yolov3.load_darknet_weights(spec, out1)
        np.testing.assert_array_equal(
            np.asarray(got1[li]["w"]),
            np.asarray(params[li]["w"])[:, :, ::-1, :])
        got2, _ = yolov3.load_darknet_weights(spec, out2)
        np.testing.assert_array_equal(np.asarray(got2[li]["w"]),
                                      np.asarray(params[li]["w"]))


class TestBNFolding:
    def test_reset_keeps_bn_and_preserves_forward(self, net):
        spec, params, cfg_path, w_path, tmp = net
        out = str(tmp / "reset.weights")
        darknet_cli.main(["reset", cfg_path, w_path, out])
        folded, _ = yolov3.load_darknet_weights(spec, out)
        for li, l in enumerate(spec.layers):
            if l.batch_normalize:
                np.testing.assert_array_equal(
                    np.asarray(folded[li]["bn_mean"]), 0.0)
                np.testing.assert_array_equal(
                    np.asarray(folded[li]["bn_var"]), 1.0)
                np.testing.assert_array_equal(
                    np.asarray(folded[li]["bn_scale"]), 1.0)
        x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
        # identity-BN forward still divides by sqrt(1+eps): ~5e-6 relative
        # residual is darknet's exact behavior, hence the loose tolerance
        np.testing.assert_allclose(_fwd(spec, folded, x),
                                   _fwd(spec, params, x),
                                   rtol=2e-3, atol=2e-4)

    def test_denormalize_strips_bn_and_preserves_forward(self, net):
        spec, params, cfg_path, w_path, tmp = net
        out = str(tmp / "denorm.weights")
        darknet_cli.main(["denormalize", cfg_path, w_path, out])
        # reload needs the BN-stripped cfg, as with darknet
        stripped = re.sub(r"batch_normalize=1\n", "", CLASSIFIER_CFG)
        spec_nb = yolov3.build_spec(stripped)
        assert not any(l.batch_normalize for l in spec_nb.layers)
        folded, _ = yolov3.load_darknet_weights(spec_nb, out,
                                                allow_partial=False)
        x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
        np.testing.assert_allclose(_fwd(spec_nb, folded, x),
                                   _fwd(spec, params, x),
                                   rtol=1e-4, atol=1e-5)


class TestNormalize:
    def test_adds_identity_bn_to_non_bn_layers(self, net, tmp_path):
        """normalize_net (darknet.c:240): non-BN conv/connected gain
        scale=1, rolling_mean=0, rolling_var=0 (darknet callocs the
        variance to ZERO — quirk), bias becomes BN beta, weights
        untouched.  Already-BN layers are left alone."""
        spec, params, cfg_path, w_path, tmp = net
        out = str(tmp / "norm.weights")
        darknet_cli.main(["normalize", cfg_path, w_path, out])
        # reload needs a cfg with batch_normalize=1 everywhere (mirror of
        # denormalize's caveat)
        all_bn = re.sub(r"\[(convolutional|connected)\]\n",
                        "[\\1]\nbatch_normalize=1\n", CLASSIFIER_CFG)
        spec_bn = yolov3.build_spec(all_bn)
        got, _ = yolov3.load_darknet_weights(spec_bn, out,
                                             allow_partial=False)
        for li, l in enumerate(spec.layers):
            if l.kind not in ("conv", "connected"):
                continue
            if l.batch_normalize:   # untouched layers roundtrip exactly
                for k in params[li]:
                    np.testing.assert_array_equal(
                        np.asarray(got[li][k]), np.asarray(params[li][k]))
            else:
                np.testing.assert_array_equal(np.asarray(got[li]["w"]),
                                              np.asarray(params[li]["w"]))
                np.testing.assert_array_equal(
                    np.asarray(got[li]["bn_bias"]),
                    np.asarray(params[li]["b"]))
                np.testing.assert_array_equal(
                    np.asarray(got[li]["bn_scale"]), 1.0)
                np.testing.assert_array_equal(
                    np.asarray(got[li]["bn_mean"]), 0.0)
                np.testing.assert_array_equal(
                    np.asarray(got[li]["bn_var"]), 0.0)

    def test_normalize_then_denormalize_is_stable(self, net, tmp_path):
        """The two verbs are surgical inverses up to the BN layout (the
        var=0 identity arrays fold to scale/sqrt(eps) — darknet's exact
        arithmetic; we only check the denormalize verb ACCEPTS the
        normalized file, the caveat chain darknet documents)."""
        spec, params, cfg_path, w_path, tmp = net
        normed = str(tmp / "n.weights")
        darknet_cli.main(["normalize", cfg_path, w_path, normed])
        all_bn = re.sub(r"\[(convolutional|connected)\]\n",
                        "[\\1]\nbatch_normalize=1\n", CLASSIFIER_CFG)
        cfg_bn = str(tmp / "bn.cfg")
        open(cfg_bn, "w").write(all_bn)
        out = str(tmp / "dn.weights")
        darknet_cli.main(["denormalize", cfg_bn, normed, out])
        stripped = re.sub(r"batch_normalize=1\n", "", CLASSIFIER_CFG)
        spec_nb = yolov3.build_spec(stripped)
        got, _ = yolov3.load_darknet_weights(spec_nb, out,
                                             allow_partial=False)
        assert all("bn_scale" not in p for p in got)


ONEOFF_CFG = """
[net]
width=16
height=16
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=6
size=1
stride=1
pad=0
activation=linear

[avgpool]
"""


class TestOneoff:
    def test_tiles_head_thirds_and_zeros_seen(self, tmp_path, capsys):
        """oneoff (darknet.c:126-148) on a 1x1 second-to-last conv (the
        intended shape — exact semantics): biases and weights of filters
        [0, n/3) are copied over filters [n/3, 2n/3) and [2n/3, n), and
        `seen` is zeroed in the saved header."""
        cfg_path = str(tmp_path / "o.cfg")
        open(cfg_path, "w").write(ONEOFF_CFG)
        spec = yolov3.build_spec(ONEOFF_CFG)
        params = _randomized_params(spec, 7)
        w_path = str(tmp_path / "o.weights")
        yolov3.save_darknet_weights(spec, params, w_path, seen=12345)
        out = str(tmp_path / "oneoff.weights")
        darknet_cli.main(["oneoff", cfg_path, w_path, out])
        # darknet.c:141 prints oldn on its own line
        assert re.search(r"^6$", capsys.readouterr().out, re.M)
        got, header = yolov3.load_darknet_weights(spec, out,
                                                  allow_partial=False)
        assert int(header[3]) == 0              # *net.seen = 0
        b = np.asarray(got[1]["b"])
        b0 = np.asarray(params[1]["b"])
        np.testing.assert_array_equal(b[0:2], b0[0:2])
        np.testing.assert_array_equal(b[2:4], b0[0:2])
        np.testing.assert_array_equal(b[4:6], b0[0:2])
        # HWIO weights: 1x1 filters live on the O axis
        w = np.asarray(got[1]["w"])[0, 0]       # (I=8, O=6)
        w0 = np.asarray(params[1]["w"])[0, 0]
        np.testing.assert_array_equal(w[:, 0:2], w0[:, 0:2])
        np.testing.assert_array_equal(w[:, 2:4], w0[:, 0:2])
        np.testing.assert_array_equal(w[:, 4:6], w0[:, 0:2])
        # first (BN) conv untouched
        for k in params[0]:
            np.testing.assert_array_equal(np.asarray(got[0][k]),
                                          np.asarray(params[0][k]))

    def test_visualize_writes_filter_pngs(self, net, tmp_path,
                                          monkeypatch):
        """Headless `visualize` (darknet.c:339 -> show_images save half,
        image.c:2001): one normalized filter-collage PNG per conv
        layer, named like darknet's "Layer <i>.png" windows."""
        pytest.importorskip("cv2")
        import cv2
        spec, _, cfg_path, w_path, _ = net
        monkeypatch.chdir(tmp_path)
        saved = darknet_cli.main(["visualize", cfg_path, w_path])
        conv_idx = [i for i, l in enumerate(spec.layers)
                    if l.kind == "conv"]
        assert len(saved) == len(conv_idx)
        for i, path in zip(conv_idx, saved):
            assert path.endswith(f"Layer {i}.png")
            img = cv2.imread(path)
            assert img is not None and img.size > 0
            # normalize_image: collage spans the full [0,255] range
            assert img.max() == 255 and img.min() == 0

    def test_imtest_writes_distortion_pngs(self, tmp_path, monkeypatch,
                                           capsys):
        """Headless `imtest` (image.c test_resize): L2-norm print plus
        Original/Gray/C1..C4 PNGs (the four fixed HSV distortions)."""
        pytest.importorskip("cv2")
        import cv2
        rng = np.random.default_rng(0)
        src = str(tmp_path / "in.png")
        cv2.imwrite(src, rng.integers(0, 255, (32, 40, 3),
                                      dtype=np.uint8))
        monkeypatch.chdir(tmp_path)
        saved = darknet_cli.main(["imtest", src])
        assert "L2 Norm:" in capsys.readouterr().out
        names = {p.split("/")[-1] for p in saved}
        assert names == {"Original.png", "Gray.png", "C1.png", "C2.png",
                         "C3.png", "C4.png"}
        orig = cv2.imread(str(tmp_path / "Original.png"))
        c1 = cv2.imread(str(tmp_path / "C1.png"))
        assert orig.shape == c1.shape
        assert np.abs(orig.astype(int) - c1.astype(int)).max() > 10

    def test_mkimg_not_an_option(self, capsys):
        """This fork's dispatch has no mkimg (darknet.c:453-460) — the
        reference prints "Not an option"."""
        rc = darknet_cli.main(["mkimg", "x.cfg"])
        assert isinstance(rc, darknet_cli.CliError)
        assert "Not an option" in capsys.readouterr().out


class TestDiagnostics:
    def test_ops_counts_conv_and_connected_macs(self, net):
        _, _, cfg_path, _, _ = net
        # conv1 3->8 3x3 @64x64; maxpool /2; conv2 8->16 3x3 s2 -> 16x16;
        # connected 16->12 and 12->10 (darknet.c operations():110)
        expect = (2 * 8 * 9 * 3 * 64 * 64 + 2 * 16 * 9 * 8 * 16 * 16
                  + 2 * 16 * 12 + 2 * 12 * 10)
        assert darknet_cli.main(["ops", cfg_path]) == expect

    def test_statistics_output(self, net, capsys):
        _, _, cfg_path, w_path, _ = net
        darknet_cli.main(["statistics", cfg_path, w_path])
        out = capsys.readouterr().out
        assert "Connected Layer 6" in out
        assert "Scales MSE:" in out
        assert "Biases MSE:" in out
        assert "Weights MSE:" in out

    def test_speed_smoke(self, net, capsys):
        _, _, cfg_path, _, _ = net
        darknet_cli.main(["speed", cfg_path, "3"])
        out = capsys.readouterr().out
        assert "3 evals" in out and "Hz" in out


class TestCalcAnchors:
    """detector calc_anchors (detector.c:905): k-means++ over GT box
    pixel sizes, centers sorted ascending by area, anchors.txt output."""

    def _make_dataset(self, tmp_path, sizes):
        """Write a darknet list + label txts; images never get read."""
        lines = []
        for i, group in enumerate(sizes):
            img = tmp_path / f"img_{i}.png"
            txt = tmp_path / f"img_{i}.txt"
            with open(txt, "w") as f:
                for (w, h) in group:
                    f.write(f"0 0.5 0.5 {w} {h}\n")
            lines.append(str(img))
        lst = tmp_path / "train.list"
        lst.write_text("\n".join(lines) + "\n")
        data = tmp_path / "obj.data"
        data.write_text(f"classes=1\ntrain={lst}\n")
        return str(data)

    def test_two_well_separated_clusters(self, tmp_path, monkeypatch, capsys):
        rng = np.random.RandomState(0)
        small = [(0.1 + 0.004 * rng.randn(), 0.1 + 0.004 * rng.randn())
                 for _ in range(20)]
        big = [(0.6 + 0.004 * rng.randn(), 0.8 + 0.004 * rng.randn())
               for _ in range(20)]
        data = self._make_dataset(tmp_path, [small, big])
        monkeypatch.chdir(tmp_path)   # anchors.txt lands here
        rc = darknet_cli.main(["detector", "calc_anchors", data,
                               "-num_of_clusters", "2",
                               "-width", "416", "-height", "416"])
        assert rc == 0
        anchors = [float(v) for v in
                   (tmp_path / "anchors.txt").read_text().replace(
                       ",", " ").split()]
        assert len(anchors) == 4
        # ascending by area: the ~0.1-relative cluster first
        np.testing.assert_allclose(anchors[:2], [41.6, 41.6], atol=2.0)
        np.testing.assert_allclose(anchors[2:], [249.6, 332.8], atol=3.0)
        out = capsys.readouterr().out
        assert "avg IoU" in out and "calculating k-means++" in out

    def test_requires_dims(self, tmp_path, capsys):
        data = self._make_dataset(tmp_path, [[(0.5, 0.5)]])
        rc = darknet_cli.main(["detector", "calc_anchors", data])
        assert rc == 1
        assert "set width and height" in capsys.readouterr().out

    def test_wrong_label_flagged_and_skipped(self, tmp_path, monkeypatch,
                                             capsys):
        data = self._make_dataset(
            tmp_path, [[(0.2, 0.2)], [(1.5, 0.2)], [(0.2, 0.21)]])
        monkeypatch.chdir(tmp_path)
        rc = darknet_cli.main(["detector", "calc_anchors", data,
                               "-num_of_clusters", "1",
                               "-width", "100", "-height", "100"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Wrong label" in out
        anchors = [float(v) for v in
                   (tmp_path / "anchors.txt").read_text().split(",")]
        np.testing.assert_allclose(anchors, [20.0, 20.5], atol=0.6)


class TestMissingWeightsHardError:
    """Surgery/diagnostic verbs must never run on silent random init and
    persist a plausible-looking artifact (same convention as the eval
    CLI's explicit-weights check)."""

    def test_rescale_missing_weights_raises(self, tmp_path):
        import os
        cfg_path = str(tmp_path / "net.cfg")
        open(cfg_path, "w").write(CLASSIFIER_CFG)
        out = str(tmp_path / "out.weights")
        with pytest.raises(FileNotFoundError):
            darknet_cli.main(["rescale", cfg_path,
                              str(tmp_path / "nope.weights"), out])
        assert not os.path.exists(out)

    def test_explicit_typod_path_raises_on_eval_verbs(self, tmp_path):
        """A typo'd --weights on classifier valid / detector test must
        error, not evaluate random init with a plausible readout."""
        cfg_path = str(tmp_path / "net.cfg")
        open(cfg_path, "w").write(CLASSIFIER_CFG)
        data_path = str(tmp_path / "d.data")
        lbl = tmp_path / "labels.txt"
        lbl.write_text("a\nb\n")
        vf = tmp_path / "valid.txt"
        vf.write_text("")
        open(data_path, "w").write(
            f"classes=2\nvalid={vf}\nlabels={lbl}\n")
        with pytest.raises(FileNotFoundError):
            darknet_cli.main(["classifier", "valid", data_path, cfg_path,
                              str(tmp_path / "nope.weights")])

    def test_error_returns_are_cli_errors(self):
        rc = darknet_cli.main(["bogus-verb"])
        assert isinstance(rc, darknet_cli.CliError) and rc == 1
        rc2 = darknet_cli.main(["detector", "bogus"])
        assert isinstance(rc2, darknet_cli.CliError) and rc2 == 1

    def test_data_return_of_one_is_not_an_error(self):
        # the __main__ shim maps only CliError to exit 1
        assert not isinstance(1, darknet_cli.CliError)
