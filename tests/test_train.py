"""KPD training-step tests: loss decreases, BN running stats update,
data-parallel execution over the 8-device CPU mesh matches single-device."""

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.train import kpd_train
from betapose_tpu.parallel import mesh as mesh_mod
from betapose_tpu.ops import heatmap as hm_ops


def _tiny_params(key, n_classes=4):
    return kpd_mod.init_params(key, n_classes=n_classes, arch="resnet50")


def _batch(rng, b, n_classes=4, h=64, w=32):
    inps = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    pts = rng.random((b, n_classes, 2)).astype(np.float32) * [w // 4, h // 4]
    labels = np.asarray(hm_ops.draw_gaussian_batch(
        jnp.asarray(pts), h // 4, w // 4, sigma=1))      # [b,K,h/4,w/4]
    labels = labels.transpose(0, 2, 3, 1)                 # NHWC
    mask = np.ones_like(labels)
    return {"inps": jnp.asarray(inps), "labels": jnp.asarray(labels),
            "set_mask": jnp.asarray(mask)}


class TestTrainStep:
    def test_loss_decreases(self):
        rng = np.random.default_rng(0)
        params = _tiny_params(jax.random.PRNGKey(0))
        tx = kpd_train.make_optimizer("adam", lr=1e-3, params_example=params)
        opt_state = tx.init(params)
        step = kpd_train.make_train_step(tx, out_res_h=16, donate=False)
        batch = _batch(rng, b=4)
        losses = []
        for _ in range(5):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_bn_stats_updated(self):
        rng = np.random.default_rng(1)
        params = _tiny_params(jax.random.PRNGKey(0))
        before = np.asarray(params["bn1"]["mean"]).copy()
        tx = kpd_train.make_optimizer("rmsprop", params_example=params)
        opt_state = tx.init(params)
        step = kpd_train.make_train_step(tx, out_res_h=16, donate=False)
        params, _, _ = step(params, opt_state, _batch(rng, b=4))
        after = np.asarray(params["bn1"]["mean"])
        assert not np.allclose(before, after)

    def test_bn_buffers_not_optimized(self):
        """Optimizer must not touch running mean/var (only the BN-stat
        update path may)."""
        params = _tiny_params(jax.random.PRNGKey(0))
        mask = kpd_train._trainable_mask(params)
        assert mask["bn1"]["mean"] is False
        assert mask["bn1"]["var"] is False
        assert mask["bn1"]["scale"] is True
        assert mask["conv1"]["w"] is True


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """One DP step over the 8-device mesh == the same step on one device
        (same global batch)."""
        assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
        rng = np.random.default_rng(2)
        params = _tiny_params(jax.random.PRNGKey(3))
        tx = kpd_train.make_optimizer("sgd", lr=1e-2, params_example=params)
        opt_state = tx.init(params)
        step = kpd_train.make_train_step(tx, out_res_h=16, donate=False)
        batch = _batch(rng, b=8)

        # single device: two steps
        p1, o1, m1 = step(params, opt_state, batch)
        _, _, m1b = step(p1, o1, batch)

        # DP over mesh: batch sharded, params replicated
        mesh = mesh_mod.make_mesh(8)
        batch_sh = mesh_mod.shard_batch(mesh, batch)
        params_r = mesh_mod.replicate(mesh, params)
        opt_r = mesh_mod.replicate(mesh, tx.init(params))
        p2, o2, m2 = step(params_r, opt_r, batch_sh)
        _, _, m2b = step(p2, o2, batch_sh)

        # step-1 loss: identical computation, different layout
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        # step-2 loss reflects the applied step-1 gradients; a missing
        # all-reduce (e.g. per-shard-mean bug) would blow this apart
        np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                                   rtol=1e-3)
        # weights: conv-algorithm rounding differs per layout and is
        # amplified through 50 BN layers -> tolerate ~1e-3 absolute
        l1 = jax.tree_util.tree_leaves(p1)
        l2 = jax.tree_util.tree_leaves(p2)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    def test_flip_tta(self):
        params = _tiny_params(jax.random.PRNGKey(4))
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (2, 64, 32, 3)).astype(np.float32))
        out = kpd_train.flip_tta_step(params, x)
        assert out.shape == (2, 16, 8, 4)
