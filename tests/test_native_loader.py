"""Native C++ frame loader (betapose_tpu/native/loader.cpp): codec
correctness vs cv2, batch order/padding equivalence with PrefetchLoader,
error propagation, and make_loader backend selection.

The feed must be a pure transport — PNG is lossless, so the native
decode must be BYTE-IDENTICAL to cv2's (both wrap libpng); JPEG decode
is also held to exactness here because both paths wrap the same system
libjpeg family, and any systematic drift would silently skew eval inputs.
"""

import os

import numpy as np
import pytest

from betapose_tpu.data.loader import PrefetchLoader, make_loader
from betapose_tpu.native import loader as native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native loader unavailable (no g++ or libpng/libjpeg)")


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.default_rng(7)
    paths = []
    for i in range(11):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        p = str(d / f"{i:04d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _cv2_rgb(path):
    import cv2
    return cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


class TestNativeCodecs:
    def test_png_byte_identical_to_cv2(self, img_dir):
        for p in img_dir[:3]:
            np.testing.assert_array_equal(native.imread_rgb(p), _cv2_rgb(p))

    def test_jpeg_matches_cv2(self, img_dir, tmp_path):
        import cv2
        src = _cv2_rgb(img_dir[0])
        p = str(tmp_path / "x.jpg")
        cv2.imwrite(p, cv2.cvtColor(src, cv2.COLOR_RGB2BGR))
        np.testing.assert_array_equal(native.imread_rgb(p), _cv2_rgb(p))

    def test_gray_and_rgba_png_promoted_to_rgb(self, tmp_path):
        import cv2
        rng = np.random.default_rng(1)
        gray = rng.integers(0, 255, (20, 30), dtype=np.uint8)
        pg = str(tmp_path / "gray.png")
        cv2.imwrite(pg, gray)
        got = native.imread_rgb(pg)
        assert got.shape == (20, 30, 3)
        np.testing.assert_array_equal(got, _cv2_rgb(pg))
        rgba = rng.integers(0, 255, (20, 30, 4), dtype=np.uint8)
        pa = str(tmp_path / "rgba.png")
        cv2.imwrite(pa, rgba)
        assert native.imread_rgb(pa).shape == (20, 30, 3)

    def test_probe_dims_no_decode(self, img_dir):
        assert native.probe_dims(img_dir[0]) == (48, 64)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native.imread_rgb(str(tmp_path / "nope.png"))

    def test_non_image_raises(self, tmp_path):
        p = str(tmp_path / "junk.png")
        with open(p, "wb") as f:
            f.write(b"definitely not an image")
        with pytest.raises(IOError):
            native.imread_rgb(p)

    def test_truncated_png_raises(self, img_dir, tmp_path):
        data = open(img_dir[0], "rb").read()
        p = str(tmp_path / "trunc.png")
        with open(p, "wb") as f:
            f.write(data[: len(data) // 2])
        with pytest.raises(IOError):
            native.imread_rgb(p)


class TestNativeLoader:
    def test_matches_prefetch_loader(self, img_dir):
        ref = list(PrefetchLoader(img_dir, batch_size=4))
        nat = native.NativeLoader(img_dir, batch_size=4, workers=3)
        got = list(nat)
        assert len(nat) == len(ref)
        assert nat.batch_sizes == [4, 4, 3]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_exact_batch_multiple(self, img_dir):
        nat = native.NativeLoader(img_dir[:8], batch_size=4)
        batches = list(nat)
        assert len(batches) == 2 and nat.batch_sizes == [4, 4]

    def test_small_window_preserves_order(self, img_dir):
        # window smaller than the path count forces slot recycling
        got = list(native.NativeLoader(img_dir, batch_size=2, workers=4,
                                       lookahead=1))
        ref = list(PrefetchLoader(img_dir, batch_size=2))
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_decode_failure_mid_stream_raises(self, img_dir, tmp_path):
        bad = str(tmp_path / "missing.png")
        with pytest.raises(IOError):
            list(native.NativeLoader(img_dir[:3] + [bad], batch_size=2))

    def test_codec_failure_falls_back_to_cv2(self, img_dir, tmp_path):
        """A .png file whose CONTENT the native codecs reject (here: BMP
        bytes) but cv2 decodes must not abort the run — the remaining
        frames are served by the cv2 pool, byte-identical."""
        import cv2
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        bmp = str(tmp_path / "real.bmp")
        cv2.imwrite(bmp, img)
        fake = str(tmp_path / "fake.png")
        os.rename(bmp, fake)
        paths = img_dir[:3] + [fake] + img_dir[3:5]
        ref = list(PrefetchLoader(paths, batch_size=2))
        got = list(native.NativeLoader(paths, batch_size=2))
        assert len(got) == len(ref)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_mixed_dims_raise(self, img_dir, tmp_path):
        import cv2
        p = str(tmp_path / "odd.png")
        cv2.imwrite(p, np.zeros((10, 10, 3), np.uint8))
        with pytest.raises(IOError):
            list(native.NativeLoader(img_dir[:2] + [p], batch_size=3))


class TestImreadDispatch:
    def test_loader_imread_matches_cv2_for_png(self, img_dir):
        from betapose_tpu.data.loader import imread_rgb
        np.testing.assert_array_equal(imread_rgb(img_dir[0]),
                                      _cv2_rgb(img_dir[0]))

    def test_loader_imread_falls_back_for_bmp(self, tmp_path):
        import cv2
        from betapose_tpu.data.loader import imread_rgb
        p = str(tmp_path / "f.bmp")
        cv2.imwrite(p, np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
        np.testing.assert_array_equal(imread_rgb(p), _cv2_rgb(p))

    def test_loader_imread_missing_raises_filenotfound(self, tmp_path):
        from betapose_tpu.data.loader import imread_rgb
        with pytest.raises(FileNotFoundError):
            imread_rgb(str(tmp_path / "absent.png"))


class TestMakeLoader:
    def test_auto_prefers_native_for_png(self, img_dir):
        assert isinstance(make_loader(img_dir, 4), native.NativeLoader)

    def test_auto_falls_back_on_foreign_ext(self, img_dir, tmp_path):
        import cv2
        p = str(tmp_path / "frame.bmp")
        cv2.imwrite(p, np.zeros((48, 64, 3), np.uint8))
        loader = make_loader(img_dir + [p], 4)
        assert isinstance(loader, PrefetchLoader)

    def test_explicit_modes(self, img_dir):
        assert isinstance(make_loader(img_dir, 4, mode="threads"),
                          PrefetchLoader)
        nat = make_loader(img_dir, 4, mode="native")
        assert isinstance(nat, native.NativeLoader)
        ref = list(PrefetchLoader(img_dir, batch_size=4))
        for r, g in zip(ref, nat):
            np.testing.assert_array_equal(r, g)

    def test_unknown_mode_rejected(self, img_dir):
        with pytest.raises(ValueError):
            make_loader(img_dir, 4, mode="warp")


class TestFeedScalingProbe:
    """tools/probe_feed.py — the host-feed worker-scaling measurement
    (VERDICT r4 #7; reference feeds from 16 pthreads, data.c:912-949)."""

    def test_measure_scaling_native(self, img_dir):
        from betapose_tpu.tools.probe_feed import measure_scaling
        pytest.importorskip("cv2")
        curve = measure_scaling(img_dir, 4, [1, 2], "native")
        assert set(curve) == {1, 2}
        assert all(v > 0 for v in curve.values())

    def test_measure_scaling_threads_and_unknown(self, img_dir):
        from betapose_tpu.tools.probe_feed import measure_scaling
        curve = measure_scaling(img_dir, 4, [1], "threads")
        assert curve[1] > 0
        with pytest.raises(ValueError):
            measure_scaling(img_dir, 4, [1], "warp")

    def test_run_probe_json_shape(self):
        from betapose_tpu.tools.probe_feed import run_probe
        import json
        res = run_probe(workers_list=(1, 2), frames=8, batch=4,
                        loaders=("native", "threads"))
        json.dumps(res)                       # strictly serializable
        assert res["host_cpus"] >= 1
        assert "threads" in res["curves"]
        assert res["best_fps"] > 0
        for curve in res["curves"].values():
            assert set(curve) == {"1", "2"}
