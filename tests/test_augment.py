"""Augmentation + annot-h5 pipeline tests."""

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.train.augment import (AugmentConfig, augment_batch,
                                        transform_box, _rotate_image,
                                        rotate_image_shear, rotate_points)
from betapose_tpu.data import annot
from betapose_tpu.ops import image as image_ops


class TestTransformBox:
    def test_round_trip_with_invert(self):
        """transformBox then transformBoxInvert is identity up to rounding."""
        rng = np.random.default_rng(0)
        ul = jnp.asarray([40.0, 30.0])
        br = jnp.asarray([240.0, 220.0])
        pts = jnp.asarray(rng.uniform(60, 200, (10, 2)).astype(np.float32))
        hm = transform_box(pts, ul, br, 320, 256, 80, 64)
        back = image_ops.transform_box_invert_batch(
            hm[None], ul[None], br[None], 320, 256, 80, 64)[0]
        # rounding in heatmap space -> up to ~ (len_h/res_h)/2 px error
        len_h = max(240 - 40, (220 - 30) * 320 / 256)
        tol = len_h / 80 * 0.51 + 0.01
        assert np.abs(np.asarray(back) - np.asarray(pts)).max() < tol


class TestRotate:
    def test_zero_rotation_identity(self):
        img = jnp.asarray(np.random.default_rng(1).random((16, 12, 3)),
                          jnp.float32)
        out = _rotate_image(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)

    def test_rot180_flips(self):
        img = jnp.zeros((8, 8, 1)).at[1, 1, 0].set(1.0)
        out = np.asarray(_rotate_image(img, jnp.asarray(180.0)))
        assert out[6, 6, 0] > 0.9

    def test_shear_matches_gather_oracle(self):
        """rotate_image_shear (3x 1-D bilinear) vs _rotate_image (one 2-D
        bilinear) over the augmentation's angle range: identical zero-fill
        footprint, small interpolation blur in the interior."""
        rng = np.random.default_rng(3)
        # smooth image so the 1-D-vs-2-D kernel difference stays tiny
        base = rng.random((12, 10, 3)).astype(np.float32)
        img = jnp.asarray(np.kron(base, np.ones((4, 4, 1), np.float32)))
        # tolerance grows with |deg|: the x-pass minifies by 1/cos(theta),
        # so the unit-width hat kernel aliases slightly at rare large
        # angles (2.7% of draws exceed 45 deg); geometry stays exact.
        for deg, tol_mean, tol_max in ((-60.0, 0.05, 0.45), (-30.0, 0.01, 0.2),
                                       (7.5, 0.002, 0.08), (30.0, 0.01, 0.2),
                                       (60.0, 0.05, 0.45)):
            ref = np.asarray(_rotate_image(img, jnp.asarray(deg)))
            got = np.asarray(rotate_image_shear(img, jnp.asarray(deg)))
            assert np.abs(ref - got).mean() < tol_mean, deg
            assert np.abs(ref - got).max() < tol_max, deg

    def test_shear_zero_identity(self):
        img = jnp.asarray(np.random.default_rng(4).random((16, 12, 3)),
                          jnp.float32)
        out = rotate_image_shear(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)

    def test_rotate_points_tracks_rotated_impulse(self):
        """Drawing at rotate_points(center) must match rotating the drawn
        map: the peak of _rotate_image(impulse) sits at rotate_points(pt)."""
        h, w = 33, 29
        for deg in (-30.0, 12.0, 30.0):
            for pt in ((8.0, 6.0), (20.0, 14.0)):
                img = jnp.zeros((h, w, 1)).at[int(pt[1]), int(pt[0]), 0].set(1.0)
                out = np.asarray(_rotate_image(img, jnp.asarray(deg)))[..., 0]
                got = np.asarray(rotate_points(
                    jnp.asarray(pt), jnp.asarray(deg), h, w))
                py, px = np.unravel_index(np.argmax(out), out.shape)
                if out.max() < 0.05:      # rotated out of canvas
                    assert not (0 <= got[0] < w and 0 <= got[1] < h)
                    continue
                # bilinear mass spreads over 4 px; peak within 1 px
                assert abs(px - got[0]) <= 1.0 and abs(py - got[1]) <= 1.0, \
                    (deg, pt, (px, py), got)


class TestAugmentBatch:
    def _inputs(self, b=2, k=6, h=120, w=160):
        rng = np.random.default_rng(2)
        imgs = rng.random((b, h, w, 3)).astype(np.float32)
        bndbox = np.tile([30.0, 20.0, 130.0, 100.0], (b, 1)).astype(np.float32)
        part = rng.uniform(40, 95, (b, k, 2)).astype(np.float32)
        return imgs, bndbox, part

    def test_shapes_and_finite(self):
        imgs, bndbox, part = self._inputs()
        cfg = AugmentConfig(inp_h=64, inp_w=32, out_h=16, out_w=8,
                            add_dpg=True, train=True)
        out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                            jnp.asarray(bndbox), jnp.asarray(part), cfg)
        assert out["inps"].shape == (2, 64, 32, 3)
        assert out["labels"].shape == (2, 16, 8, 6)
        assert out["set_mask"].shape == (2, 16, 8, 6)
        assert np.all(np.isfinite(np.asarray(out["inps"])))
        assert np.asarray(out["labels"]).max() <= 1.0 + 1e-6
        assert np.all(np.asarray(out["set_mask"]) == 1.0)

    def test_eval_mode_deterministic(self):
        imgs, bndbox, part = self._inputs()
        cfg = AugmentConfig(inp_h=64, inp_w=32, out_h=16, out_w=8,
                            train=False)
        o1 = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                           jnp.asarray(bndbox), jnp.asarray(part), cfg)
        o2 = augment_batch(jax.random.PRNGKey(99), jnp.asarray(imgs),
                           jnp.asarray(bndbox), jnp.asarray(part), cfg)
        np.testing.assert_allclose(np.asarray(o1["inps"]),
                                   np.asarray(o2["inps"]))

    def test_labels_centered_on_visible_keypoints(self):
        """In eval mode (no jitter/flip/rot), each visible keypoint's label
        peak must sit at its transformBox position."""
        imgs, bndbox, part = self._inputs(b=1)
        cfg = AugmentConfig(inp_h=64, inp_w=32, out_h=16, out_w=8,
                            train=False, scale_min=0.2, scale_max=0.2)
        out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                            jnp.asarray(bndbox), jnp.asarray(part), cfg)
        labels = np.asarray(out["labels"])[0]          # [16,8,K]
        # recompute the crop box exactly as _augment_one does (rate=0.2)
        ul = np.floor(bndbox[0, :2])
        br = np.floor(bndbox[0, 2:])
        wd, ht = br - ul
        ul = np.maximum(0.0, ul - np.array([wd, ht]) * 0.1)
        br = np.minimum([160 - 1, 120 - 1], br + np.array([wd, ht]) * 0.1)
        hm_pts = np.asarray(transform_box(
            jnp.asarray(part[0]), jnp.asarray(ul), jnp.asarray(br),
            64, 32, 16, 8))
        for i in range(part.shape[1]):
            ch = labels[:, :, i]
            if ch.max() > 0.99:
                y, x = np.unravel_index(ch.argmax(), ch.shape)
                assert abs(x - hm_pts[i, 0]) <= 1
                assert abs(y - hm_pts[i, 1]) <= 1


class TestAnnotH5:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        names = ["0001.png", "0002.png", "x.png"]
        bnd = rng.random((3, 1, 4)) * 100
        part = rng.random((3, 5, 2)) * 100
        p = str(tmp_path / "annot_train.h5")
        annot.write_annot_h5(p, names, bnd, part)
        names2, bnd2, part2 = annot.read_annot_h5(p)
        assert names2 == names
        np.testing.assert_allclose(bnd2, bnd.reshape(3, 4), rtol=1e-6)
        np.testing.assert_allclose(part2, part, rtol=1e-6)


class TestKpVisibility:
    """Occlusion-aware supervision: kp_vis zeroes the heatmap TARGET for
    hidden keypoints (the network is taught low confidence there) while
    set_mask stays 1 so the zero target is actively supervised."""

    def test_hidden_kp_gets_zero_target(self):
        cfg = AugmentConfig(inp_h=64, inp_w=32, out_h=16, out_w=8,
                            train=False)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((2, 120, 160, 3)).astype(np.float32))
        bnd = jnp.asarray([[40, 30, 120, 100], [40, 30, 120, 100]],
                          dtype=jnp.float32)
        part = jnp.asarray(rng.uniform(50, 90, (2, 4, 2)).astype(np.float32))
        vis = np.ones((2, 4), np.float32)
        vis[0, 1] = 0.0
        out = augment_batch(jax.random.PRNGKey(0), imgs, bnd, part, cfg,
                            kp_vis=jnp.asarray(vis))
        labels = np.asarray(out["labels"])       # [B, oh, ow, K]
        assert labels[0, :, :, 1].max() == 0.0   # hidden -> zero target
        assert labels[0, :, :, 0].max() > 0.5    # visible -> gaussian
        assert labels[1, :, :, 1].max() > 0.5    # other frame unaffected
        assert np.asarray(out["set_mask"]).min() == 1.0

    def test_default_is_all_visible(self):
        cfg = AugmentConfig(inp_h=64, inp_w=32, out_h=16, out_w=8,
                            train=False)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.random((1, 120, 160, 3)).astype(np.float32))
        bnd = jnp.asarray([[40, 30, 120, 100]], dtype=jnp.float32)
        part = jnp.asarray(rng.uniform(50, 90, (1, 4, 2)).astype(np.float32))
        a = augment_batch(jax.random.PRNGKey(0), imgs, bnd, part, cfg)
        b = augment_batch(jax.random.PRNGKey(0), imgs, bnd, part, cfg,
                          kp_vis=jnp.ones((1, 4)))
        np.testing.assert_array_equal(np.asarray(a["labels"]),
                                      np.asarray(b["labels"]))
