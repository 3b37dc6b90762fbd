"""KPD (FastPose) model tests: shapes, torch-layout golden checks for
pixel-shuffle/bottleneck/SE, and torch state_dict conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import kpd


class TestShapes:
    def test_forward_shape_resnet50(self):
        # resnet50 variant is cheaper to test; same code path as 101
        params = kpd.init_params(jax.random.PRNGKey(0), n_classes=50,
                                 arch="resnet50")
        x = jnp.zeros((1, 320, 256, 3))
        out = kpd.forward(params, x)
        assert out.shape == (1, 80, 64, 50)

    def test_param_counts_resnet101(self):
        params = kpd.init_params(jax.random.PRNGKey(0), n_classes=50)
        layers = [len(params[f"layer{i}"]) for i in range(1, 5)]
        assert layers == [3, 4, 23, 3]
        # SE only on the first (downsample) block of each stage
        for i in range(1, 5):
            assert "se" in params[f"layer{i}"][0]
            assert all("se" not in b for b in params[f"layer{i}"][1:])


class TestTorchGolden:
    def test_pixel_shuffle_vs_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).standard_normal((2, 4, 6, 8)).astype(np.float32)
        ours = np.asarray(kpd.pixel_shuffle(jnp.asarray(x), 2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        golden = torch.nn.functional.pixel_shuffle(xt, 2).numpy()
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), golden,
                                   rtol=1e-6)

    def test_maxpool_vs_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(1).standard_normal((1, 9, 9, 4)).astype(np.float32)
        ours = np.asarray(kpd._maxpool_3x3_s2_p1(jnp.asarray(x)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        golden = torch.nn.functional.max_pool2d(xt, 3, 2, 1).numpy()
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), golden,
                                   rtol=1e-6)

    def test_se_gate_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        c = 8
        x = rng.standard_normal((2, 4, 4, c)).astype(np.float32)
        w1 = rng.standard_normal((c, c)).astype(np.float32)  # (in, out) ours
        b1 = rng.standard_normal(c).astype(np.float32)
        w2 = rng.standard_normal((c, c)).astype(np.float32)
        b2 = rng.standard_normal(c).astype(np.float32)
        p = {"fc1": {"w": jnp.asarray(w1), "b": jnp.asarray(b1)},
             "fc2": {"w": jnp.asarray(w2), "b": jnp.asarray(b2)}}
        ours = np.asarray(kpd._se(jnp.asarray(x), p))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        s = torch.nn.functional.adaptive_avg_pool2d(xt, 1).flatten(1)
        s = torch.relu(torch.nn.functional.linear(
            s, torch.from_numpy(w1.T), torch.from_numpy(b1)))
        s = torch.sigmoid(torch.nn.functional.linear(
            s, torch.from_numpy(w2.T), torch.from_numpy(b2)))
        golden = (xt * s[:, :, None, None]).numpy()
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), golden,
                                   rtol=1e-5, atol=1e-6)


class TestStateDictConversion:
    def test_roundtrip_through_torch_names(self):
        """Export our params to torch-style names, convert back, compare."""
        params = kpd.init_params(jax.random.PRNGKey(3), n_classes=7,
                                 arch="resnet50")
        sd = {}

        def put_conv(name, w):
            sd[name + ".weight"] = np.asarray(w).transpose(3, 2, 0, 1)

        def put_bn(name, bn):
            sd[name + ".weight"] = np.asarray(bn["scale"])
            sd[name + ".bias"] = np.asarray(bn["bias"])
            sd[name + ".running_mean"] = np.asarray(bn["mean"])
            sd[name + ".running_var"] = np.asarray(bn["var"])

        put_conv("preact.conv1", params["conv1"]["w"])
        put_bn("preact.bn1", params["bn1"])
        for li in range(1, 5):
            for bi, blk in enumerate(params[f"layer{li}"]):
                base = f"preact.layer{li}.{bi}"
                for ci in (1, 2, 3):
                    put_conv(f"{base}.conv{ci}", blk[f"conv{ci}"]["w"])
                    put_bn(f"{base}.bn{ci}", blk[f"bn{ci}"])
                if "downsample" in blk:
                    put_conv(f"{base}.downsample.0", blk["downsample"]["conv"]["w"])
                    put_bn(f"{base}.downsample.1", blk["downsample"]["bn"])
                if "se" in blk:
                    sd[f"{base}.se.fc.0.weight"] = np.asarray(blk["se"]["fc1"]["w"]).T
                    sd[f"{base}.se.fc.0.bias"] = np.asarray(blk["se"]["fc1"]["b"])
                    sd[f"{base}.se.fc.2.weight"] = np.asarray(blk["se"]["fc2"]["w"]).T
                    sd[f"{base}.se.fc.2.bias"] = np.asarray(blk["se"]["fc2"]["b"])
        for d in ("duc1", "duc2"):
            put_conv(f"{d}.conv", params[d]["conv"]["w"])
            put_bn(f"{d}.bn", params[d]["bn"])
        sd["conv_out.weight"] = np.asarray(params["conv_out"]["w"]).transpose(3, 2, 0, 1)
        sd["conv_out.bias"] = np.asarray(params["conv_out"]["b"])

        back = kpd.torch_state_dict_to_params(sd, n_classes=7, arch="resnet50")
        flat1, _ = jax.tree_util.tree_flatten_with_path(params)
        flat2 = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        # tree_flatten_with_path returns list of (path, leaf)
        flat2 = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
        for path, leaf in flat1:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat2[key]), rtol=1e-6,
                err_msg=key)


class TestFoldBN:
    def test_fold_equivalence(self):
        params = kpd.init_params(jax.random.PRNGKey(5), n_classes=4,
                                 arch="resnet50")
        # randomize BN stats so folding is non-trivial
        def jiggle(tree, key):
            flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
            out = []
            for path, leaf in flat:
                keys = [getattr(p, "key", None) for p in path]
                key, k = jax.random.split(key)
                if keys and keys[-1] in ("mean",):
                    leaf = jax.random.normal(k, leaf.shape) * 0.1
                elif keys and keys[-1] in ("var",):
                    leaf = jnp.abs(jax.random.normal(k, leaf.shape)) + 0.5
                elif keys and keys[-1] in ("scale",):
                    leaf = 1.0 + jax.random.normal(k, leaf.shape) * 0.1
                out.append(leaf)
            return jax.tree_util.tree_unflatten(treedef, out)

        params = jiggle(params, jax.random.PRNGKey(6))
        x = jnp.asarray(np.random.default_rng(7).standard_normal(
            (1, 64, 32, 3)).astype(np.float32))
        a = np.asarray(kpd.forward(params, x))
        b = np.asarray(kpd.forward(kpd.fold_bn(params), x))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)
