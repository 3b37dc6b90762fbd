"""Softmax-tree (`tree.c`, `tree=`/`map=` on [region]/[softmax]) —
YOLO9000's hierarchical softmax on the TPU stack.

Oracles transcribe the reference FORMULAS:
- read_tree's group formation (new group per parent-index change between
  adjacent lines, tree.c:101-110)
- hierarchy_predictions / get_hierarchy_probability chain products
  (tree.c:27-50)
- hierarchy_top_prediction's greedy descent (tree.c:52-81; this fork's
  read_tree never fills t.child — the C path would NULL-deref — so the
  derived-child behavior is pinned against a hand-walked descent)
- delta_region_class's hier branch (region_layer.c:116-129): jax.grad of
  the hier CE must equal the C delta scale*(cond*sibling_mask - path)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.data.wordtree import (WordTree, group_softmax,
                                        group_log_softmax)


TREE_TEXT = """physical -1
animal 0
vehicle 0
dog 1
cat 1
car 2
bike 2
plane 2
"""


@pytest.fixture(scope="module")
def tree():
    return WordTree.read(TREE_TEXT)


class TestReadTree:
    def test_group_formation(self, tree):
        # groups: [physical], [animal, vehicle], [dog, cat],
        # [car, bike, plane] — one per parent-change (tree.c:101-110)
        assert tree.n == 8 and tree.groups == 4
        assert tree.group.tolist() == [0, 1, 1, 2, 2, 3, 3, 3]
        assert tree.group_offset.tolist() == [0, 1, 3, 5]
        assert tree.group_size.tolist() == [1, 2, 2, 3]

    def test_leaves_and_child(self, tree):
        assert tree.leaf.tolist() == [False, False, False,
                                      True, True, True, True, True]
        # child[i] = group of i's children (derived; the fork's read_tree
        # leaves the C field NULL)
        assert tree.child.tolist() == [1, 2, 3, -1, -1, -1, -1, -1]

    def test_scattered_siblings_split_groups(self):
        # the format contract: siblings must be contiguous or they
        # silently split (parent changes twice)
        t = WordTree.read("a -1\nb 0\nc -1\nd 0\n")
        assert t.groups == 4          # [a], [b], [c], [d 0] — each a group

    def test_change_leaves(self, tree):
        import copy
        t = copy.deepcopy(tree)
        assert t.change_leaves(["animal", "car"]) == 2
        assert t.leaf.tolist() == [False, True, False, False,
                                   False, True, False, False]


class TestHierarchyFormulas:
    def test_hierarchy_probability_chain(self, tree):
        rng = np.random.default_rng(0)
        x = rng.random(tree.n).astype(np.float32)
        # dog: dog * animal * physical (tree.c:27-34)
        want = x[3] * x[1] * x[0]
        assert abs(tree.hierarchy_probability(x, 3) - want) < 1e-6

    def test_hierarchy_predictions_matches_c_loop(self, tree):
        rng = np.random.default_rng(1)
        x = rng.random(tree.n).astype(np.float32)
        got = tree.hierarchy_predictions(x)
        # C loop transcription (in-place, parents first)
        want = x.copy()
        for j in range(tree.n):
            p = tree.parent[j]
            if p >= 0:
                want[j] *= want[p]
        np.testing.assert_allclose(got, want, rtol=1e-6)
        only = tree.hierarchy_predictions(x, only_leaves=True)
        assert (only[~tree.leaf] == 0).all()
        np.testing.assert_allclose(only[tree.leaf], want[tree.leaf],
                                   rtol=1e-6)

    def test_top_prediction_descends_and_backs_off(self, tree):
        p = np.zeros(tree.n, np.float32)
        p[0] = 1.0                      # physical
        p[1], p[2] = 0.9, 0.1           # animal wins
        p[3], p[4] = 0.8, 0.2           # dog wins
        assert tree.top_prediction(p, thresh=0.5) == 3      # leaf reached
        # chain prob at dog = 1*0.9*0.8 = .72 > .5; raise thresh so the
        # dog step fails -> returns the parent of the current group
        assert tree.top_prediction(p, thresh=0.75) == 1     # animal
        # root group failing the thresh returns its argmax
        p[0] = 0.1
        assert tree.top_prediction(p, thresh=0.5) == 0

    def test_ancestor_and_sibling_matrices(self, tree):
        a = tree.ancestor_matrix()
        assert a[3].tolist() == [1, 1, 0, 1, 0, 0, 0, 0]    # dog chain
        s = tree.sibling_matrix()
        # dog's delta support: [physical] + [animal, vehicle] + [dog, cat]
        assert s[3].tolist() == [1, 1, 1, 1, 1, 0, 0, 0]


class TestGroupSoftmax:
    def test_matches_per_group_numpy(self, tree):
        rng = np.random.default_rng(2)
        z = rng.standard_normal((5, tree.n)).astype(np.float32)
        got = np.asarray(group_softmax(jnp.asarray(z),
                                       tree.group_onehot()))
        for g in range(tree.groups):
            o, sz = tree.group_offset[g], tree.group_size[g]
            seg = z[:, o:o + sz]
            e = np.exp(seg - seg.max(axis=1, keepdims=True))
            np.testing.assert_allclose(got[:, o:o + sz],
                                       e / e.sum(axis=1, keepdims=True),
                                       rtol=1e-5, atol=1e-6)

    def test_log_consistency(self, tree):
        rng = np.random.default_rng(3)
        z = jnp.asarray(rng.standard_normal((3, tree.n)), jnp.float32)
        a = np.asarray(group_softmax(z, tree.group_onehot()))
        b = np.exp(np.asarray(group_log_softmax(z, tree.group_onehot())))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestHierClassDelta:
    def test_grad_matches_delta_region_class(self, tree):
        """jax.grad of the hier CE == the C delta (region_layer.c:116-129):
        within every ancestor group, (cond - onehot); zero elsewhere."""
        rng = np.random.default_rng(4)
        z = jnp.asarray(rng.standard_normal(tree.n), jnp.float32)
        c = 3                                        # dog

        def loss(zz):
            logp = group_log_softmax(zz, tree.group_onehot())
            path = jnp.asarray(tree.ancestor_matrix(), jnp.float32)[c]
            return -jnp.sum(path * logp)

        g = np.asarray(jax.grad(loss)(z))
        cond = np.asarray(group_softmax(z, tree.group_onehot()))
        path = tree.ancestor_matrix()[c]
        sib = tree.sibling_matrix()[c]
        np.testing.assert_allclose(g, cond * sib - path,
                                   rtol=1e-5, atol=1e-6)


class TestRegionIntegration:
    def _cfg(self, tmp_path, with_map=False):
        tp = tmp_path / "t.tree"
        tp.write_text(TREE_TEXT)
        extra = f"tree={tp}\n"
        if with_map:
            mp = tmp_path / "t.map"
            mp.write_text("3\n4\n5\n")       # truth ids 0..2 -> leaves
            extra += f"map={mp}\n"
        return f"""[net]
width=32
height=32
channels=3

[convolutional]
filters=65
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1,1, 2,2, 3,3, 4,4, 5,5
num=5
classes=8
{extra}coords=4
softmax=1
"""

    def test_spec_parses_tree_and_map(self, tmp_path):
        from betapose_tpu.models import yolov3 as ym
        spec = ym.build_spec(self._cfg(tmp_path, with_map=True))
        reg = spec.layers[-1]
        assert reg.tree is not None and reg.tree.n == 8
        assert reg.class_map == (3, 4, 5)

    def test_decode_keeps_deepest_confident_node(self, tmp_path):
        """get_region_boxes:399-408 filter: only the deepest node whose
        JOINT probability clears 0.5 survives."""
        from betapose_tpu.models import yolov3 as ym
        spec = ym.build_spec(self._cfg(tmp_path))
        reg = spec.layers[-1]
        # craft logits: strongly favor dog under animal under physical
        z = np.zeros((1, 4, 4, 5 * 13), np.float32)
        z[..., 5:13] = [0, 6, -6, 6, -6, 0, 0, 0]   # each anchor block 0
        for a in range(5):
            z[..., a * 13 + 5:a * 13 + 13] = [0, 6, -6, 6, -6, 0, 0, 0]
        out = np.asarray(ym.decode_region_head(
            jnp.asarray(z), reg.anchors, 8, 32, softmax=True,
            tree=reg.tree))
        cls = out[0, :, 5:]
        # exactly one nonzero class prob per row, at dog (=3), > 0.5
        nz = cls > 0
        assert (nz.sum(axis=1) == 1).all()
        assert nz[:, 3].all()
        assert (cls[:, 3] > 0.5).all()

    def test_region_tree_loss_trains(self, tmp_path):
        """The hier CE is wired into region_head_loss and decreases under
        gradient steps on the raw head (loss-decreases smoke)."""
        from betapose_tpu.models import yolov3 as ym
        from betapose_tpu.train.yolo_loss import region_head_loss
        spec = ym.build_spec(self._cfg(tmp_path, with_map=True))
        reg = spec.layers[-1]
        rng = np.random.default_rng(5)
        raw = jnp.asarray(rng.standard_normal((2, 4, 4, 65)) * 0.1,
                          jnp.float32)
        truths = np.zeros((2, 3, 5), np.float32)
        truths[0, 0] = [0.5, 0.5, 0.4, 0.4, 0]      # maps to dog (3)
        truths[1, 0] = [0.3, 0.6, 0.3, 0.3, 2]      # maps to car (5)
        truths = jnp.asarray(truths)

        def f(r):
            return region_head_loss(r, reg, truths, seen=20000)[0]

        l0 = float(f(raw))
        g = jax.grad(f)(raw)
        l1 = float(f(raw - 0.5 * g))
        assert np.isfinite([l0, l1]).all() and l1 < l0
