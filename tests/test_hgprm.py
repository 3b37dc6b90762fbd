"""hgPRM (PyraNet) model tests."""

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.models import hgprm


class TestHgPRM:
    def test_forward_shapes(self):
        # small variant for CPU test speed: nFeats 32, nStack 2
        params = hgprm.init_params(jax.random.PRNGKey(0), n_classes=6,
                                   n_feats=32, n_stack=2)
        x = jnp.zeros((1, 64, 64, 3))
        out = hgprm.forward(params, x)
        assert out.shape == (1, 16, 16, 6)
        outs = hgprm.forward(params, x, all_heads=True)
        assert len(outs) == 2
        assert all(o.shape == (1, 16, 16, 6) for o in outs)

    def test_adaptive_max_pool(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        out = np.asarray(hgprm.adaptive_max_pool(x, 2, 2))
        # bins {0,1},{2,3}: max of each 2x2 block
        np.testing.assert_allclose(out[0, :, :, 0], [[5, 7], [13, 15]])

    def test_bilinear_resize_ac_vs_torch(self):
        import pytest
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).random((1, 5, 7, 3)).astype(np.float32)
        ours = np.asarray(hgprm._bilinear_resize_ac(jnp.asarray(x), 10, 14))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        gold = torch.nn.functional.interpolate(
            xt, size=(10, 14), mode="bilinear", align_corners=True)
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2),
                                   gold.numpy(), rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        params = hgprm.init_params(jax.random.PRNGKey(1), n_classes=4,
                                   n_feats=16, n_stack=1)
        x = jnp.asarray(np.random.default_rng(2).random(
            (1, 64, 64, 3)).astype(np.float32))

        def loss(p):
            return jnp.mean(hgprm.forward(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves
                   if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))


class TestHgPRMTraining:
    def test_train_step_and_calibration(self):
        from betapose_tpu.train import kpd_train
        params = hgprm.init_params(jax.random.PRNGKey(0), n_classes=4,
                                   n_feats=16, n_stack=2)
        tx = kpd_train.make_optimizer("adam", lr=1e-3,
                                      params_example=params)
        opt_state = tx.init(params)
        fwd = lambda p, x, train=False, bn_stats=None: hgprm.forward(
            p, x, all_heads=True, train=train)
        step = kpd_train.make_train_step(tx, out_res_h=16, donate=False,
                                         forward_fn=fwd, apply_bn=False)
        rng = np.random.default_rng(0)
        from betapose_tpu.ops import heatmap as hm_ops
        h = w = 64
        pts = rng.random((2, 4, 2)).astype(np.float32) * [w // 4, h // 4]
        labels = np.asarray(hm_ops.draw_gaussian_batch(
            jnp.asarray(pts), h // 4, w // 4, sigma=1)).transpose(0, 2, 3, 1)
        batch = {"inps": jnp.asarray(rng.standard_normal(
                     (2, h, w, 3)).astype(np.float32)),
                 "labels": jnp.asarray(labels),
                 "set_mask": jnp.ones_like(jnp.asarray(labels))}
        losses = []
        for _ in range(4):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # post-hoc BN calibration writes batch stats into running stats
        calibrated = hgprm.calibrate_bn(params, batch["inps"])
        before = np.asarray(params["bn1"]["mean"])
        after = np.asarray(calibrated["bn1"]["mean"])
        assert not np.allclose(before, after)
        out = hgprm.forward(calibrated, batch["inps"])
        assert np.all(np.isfinite(np.asarray(out)))
