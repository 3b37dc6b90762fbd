"""Pallas heatmap-decode kernel vs the vectorized XLA path (interpret mode
on CPU; the TPU path is validated bit-identical on hardware)."""

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.ops.pallas.heatmap_decode import decode_peaks
from betapose_tpu.ops import heatmap as hm_ops


class TestPallasDecode:
    def test_matches_vectorized(self):
        rng = np.random.default_rng(0)
        hms = jnp.asarray(rng.standard_normal((3, 7, 16, 128))
                          .astype(np.float32))
        pt1 = jnp.zeros((3, 2))
        pt2 = jnp.asarray(np.tile([256.0, 320.0], (3, 1)))
        out = decode_peaks(hms, interpret=True)
        preds, _, maxval = hm_ops.decode_heatmaps(
            hms, pt1, pt2, 320, 256, 16, 128)
        np.testing.assert_allclose(np.asarray(out[..., :2]),
                                   np.asarray(preds), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[..., 2]),
                                   np.asarray(maxval)[..., 0], atol=1e-6)

    def test_border_and_negative_peaks(self):
        hms = np.full((1, 2, 16, 128), -1.0, np.float32)
        hms[0, 0, 0, 0] = -0.5      # all-negative map: maxval < 0 path
        hms[0, 1, 15, 127] = 2.0    # corner peak: no refinement
        out = np.asarray(decode_peaks(jnp.asarray(hms), interpret=True))
        # reference zeroes coords when maxval <= 0, then +0.2
        np.testing.assert_allclose(out[0, 0, :2], [0.2, 0.2], atol=1e-6)
        np.testing.assert_allclose(out[0, 1, :2], [127.2, 15.2], atol=1e-6)
