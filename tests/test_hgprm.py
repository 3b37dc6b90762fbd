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
