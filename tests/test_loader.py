"""Host feed path: PrefetchLoader (thread + process decode modes) and the
pre-decoded FrameCache — order, batching/tail-padding, and cross-mode
byte-identity (the feed must be a pure transport, VERDICT r2 'host feed')."""

import os

import numpy as np
import pytest

from betapose_tpu.data.loader import PrefetchLoader, FrameCache


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(11):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        p = str(d / f"{i:04d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _collect(loader):
    return list(loader)


class TestPrefetchLoader:
    def test_thread_mode_order_and_padding(self, png_dir):
        loader = PrefetchLoader(png_dir, batch_size=4)
        batches = _collect(loader)
        assert len(batches) == 3 == len(loader)
        assert all(b.shape == (4, 48, 64, 3) for b in batches)
        assert loader.batch_sizes == [4, 4, 3]
        # tail batch padded by repeating the final frame
        np.testing.assert_array_equal(batches[2][2], batches[2][3])

    @pytest.mark.parametrize("span", [1, 3, 8])
    def test_process_mode_matches_thread_mode(self, png_dir, span):
        ref = _collect(PrefetchLoader(png_dir, batch_size=4))
        got = _collect(PrefetchLoader(png_dir, batch_size=4, workers=3,
                                      use_processes=True, span=span))
        assert len(got) == len(ref)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_process_mode_exact_batch_multiple(self, png_dir):
        paths = png_dir[:8]
        ref = _collect(PrefetchLoader(paths, batch_size=4))
        got = _collect(PrefetchLoader(paths, batch_size=4,
                                      use_processes=True, span=5))
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)


class TestFrameCache:
    def test_build_and_serve(self, png_dir, tmp_path):
        cache_path = str(tmp_path / "frames.npy")
        cache = FrameCache(png_dir, cache_path)
        assert os.path.exists(cache_path)
        ref = _collect(PrefetchLoader(png_dir, batch_size=4))
        got = list(cache.batches(4))
        assert len(got) == len(ref)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_reload_skips_decode(self, png_dir, tmp_path, monkeypatch):
        cache_path = str(tmp_path / "frames.npy")
        FrameCache(png_dir, cache_path)
        import betapose_tpu.data.loader as loader_mod

        def boom(path):
            raise AssertionError("re-decoded despite cache")
        monkeypatch.setattr(loader_mod, "imread_rgb", boom)
        cache = FrameCache(png_dir, cache_path)  # must not decode
        assert len(list(cache.batches(6))) == 2

    def test_stale_cache_rejected(self, png_dir, tmp_path):
        cache_path = str(tmp_path / "frames.npy")
        FrameCache(png_dir, cache_path)
        with pytest.raises(ValueError, match="stale"):
            FrameCache(png_dir[:5], cache_path)

    def test_same_length_different_paths_rejected(self, png_dir, tmp_path):
        """A stale cache of the SAME length must not silently serve the
        wrong frames: the manifest pins the exact path list."""
        cache_path = str(tmp_path / "frames.npy")
        FrameCache(png_dir, cache_path)
        reordered = list(reversed(png_dir))
        with pytest.raises(ValueError, match="manifest"):
            FrameCache(reordered, cache_path)

    def test_missing_manifest_rejected(self, png_dir, tmp_path):
        cache_path = str(tmp_path / "frames.npy")
        cache = FrameCache(png_dir, cache_path)
        os.remove(cache._manifest_path())
        with pytest.raises(ValueError, match="manifest"):
            FrameCache(png_dir, cache_path)
