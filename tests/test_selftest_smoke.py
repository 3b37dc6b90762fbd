"""Smoke test for the full-system selftest entry point (tiny config):
guards the render->annotate->train->eval wiring and the params_dir
save/reload path the slow tier relies on."""

import numpy as np
import pytest

pytest.importorskip("cv2")


@pytest.mark.slow
def test_selftest_tiny_and_params_cache(tmp_path):
    from betapose_tpu.tools.selftest import run_selftest

    kw = dict(n_frames=6, n_eval=2, yolo_iters=2, kpd_iters=2,
              reso=96, inp_h=64, inp_w=32, n_kp=8,
              params_dir=str(tmp_path / "cache"), pnp_robust_rounds=1,
              left_keypoints=6, verbose=False)
    stats = run_selftest(**kw)
    assert stats["n_eval"] == 2
    assert np.isfinite(stats["diameter_m"])
    assert (tmp_path / "cache" / "yolo.weights").exists()
    assert (tmp_path / "cache" / "kpd.npz").exists()

    # second run loads the cached weights (no retraining) and must produce
    # the same eval scenes -> identical detection/metric structure
    stats2 = run_selftest(**kw)
    assert stats2["n_eval"] == 2
    assert stats2["n_detected"] == stats["n_detected"]
