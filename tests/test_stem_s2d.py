"""Exactness tests for the space-to-depth stem transform."""

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import stem_s2d
from betapose_tpu.models.darknet_cfg import make_yolov3_cfg


def _stem_params(key):
    rng = np.random.default_rng(0)
    p0 = {"w": jnp.asarray(rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.1),
          "b": jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.1)}
    p1 = {"w": jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32) * 0.1),
          "b": jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)}
    return p0, p1


class TestStemS2D:
    def test_exact_equivalence_small(self):
        """Packed stem == conv1+leaky+conv2+leaky on a small input."""
        p0, p1 = _stem_params(0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))

        def reference(x):
            y = jax.lax.conv_general_dilated(
                x, p0["w"], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p0["b"]
            y = jnp.where(y > 0, y, 0.1 * y)
            z = jax.lax.conv_general_dilated(
                y, p1["w"], (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p1["b"]
            return jnp.where(z > 0, z, 0.1 * z)

        packed = stem_s2d.pack_stem_params([p0, p1])
        ours = stem_s2d.stem_forward(packed, x)
        golden = reference(x)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden),
                                   rtol=1e-4, atol=1e-5)

    def test_full_network_equivalence(self):
        """Full YOLOv3 forward with and without the packed stem agree."""
        cfg = make_yolov3_cfg(num_classes=1, width=128, height=128)
        spec = yolo_mod.build_spec(cfg)
        assert stem_s2d.stem_applicable(spec)
        params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, 128, 128, 3)).astype(np.float32))
        # stem-level: float-exact (reassociation only)
        y_ref = yolo_mod._conv_layer(spec.layers[0], params[0], x)
        y_ref = yolo_mod._conv_layer(spec.layers[1], params[1], y_ref)
        packed = stem_s2d.pack_stem_params(params)
        y_fast = stem_s2d.stem_forward(packed, x)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   atol=5e-5)
        # deep network: a random 75-layer net amplifies 1e-6 reassociation
        # noise chaotically; require statistical agreement of the heads
        plain = yolo_mod.forward(spec, params, x, 128, decode=False)
        fast = stem_s2d.forward_with_s2d_stem(spec, params, x, 128,
                                              decode=False)
        for a, b in zip(fast, plain):
            a, b = np.asarray(a), np.asarray(b)
            bad = np.abs(a - b) > (1e-3 + 1e-2 * np.abs(b))
            assert bad.mean() < 0.005, bad.mean()

    def test_space_to_depth_layout(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        out = np.asarray(stem_s2d.space_to_depth2(x))[0]
        # channel 0 = phase (0,0): rows 0/2, cols 0/2
        np.testing.assert_allclose(out[:, :, 0], [[0, 2], [8, 10]])
        # channel 3 = phase (1,1)
        np.testing.assert_allclose(out[:, :, 3], [[5, 7], [13, 15]])


class TestStride2S2D:
    def test_conv7_stride2_exact(self):
        """s2d-domain 4x4/1 conv == 7x7/2 'same' conv, float-exact."""
        from betapose_tpu.models.stem_s2d import conv_stride2_via_s2d
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((7, 7, 3, 8)).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fast = conv_stride2_via_s2d(x, w)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_conv3_stride2_exact(self):
        from betapose_tpu.models.stem_s2d import conv_stride2_via_s2d
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fast = conv_stride2_via_s2d(x, w)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_kpd_forward_s2d_stem_equivalence(self):
        from betapose_tpu.models import kpd as kpd_mod
        params = kpd_mod.init_params(jax.random.PRNGKey(0), n_classes=4,
                                     arch="resnet50")
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, 64, 32, 3)).astype(np.float32))
        a = kpd_mod.forward(params, x)
        b = kpd_mod.forward(params, x, s2d_stem=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


class TestStageS2dRewrite:
    """probe_s2d_stage's exact 104²-stage rewrite (VERDICT r4 #3a): the
    grouped-1x1 + packed-3x3 s2d form must be float-exact vs the native
    two-block residual stage (same algebra as the stem rewrite)."""

    def test_stage_equivalence_f32(self):
        import numpy as np
        import jax.numpy as jnp
        from betapose_tpu.models.stem_s2d import space_to_depth2
        from betapose_tpu.tools.probe_s2d_stage import (stage_normal,
                                                        stage_s2d)
        rng = np.random.default_rng(0)
        c = 16
        x = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)
        mk = lambda kh, kw, ci, co: jnp.asarray(
            rng.standard_normal((kh, kw, ci, co)), jnp.float32) * 0.1
        ws = dict(w1a=mk(1, 1, c, c // 2), w2a=mk(3, 3, c // 2, c),
                  w1b=mk(1, 1, c, c // 2), w2b=mk(3, 3, c // 2, c))
        ref = np.asarray(space_to_depth2(stage_normal(x, **ws)))
        got = np.asarray(stage_s2d(space_to_depth2(x), **ws))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
