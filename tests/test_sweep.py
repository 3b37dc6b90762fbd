"""Multi-object sweep tier (VERDICT r3 top-next): object zoo invariants,
symmetry canonicalization, annotation consistency, and a tiny end-to-end
smoke of the sweep driver."""

import json

import numpy as np
import pytest

pytest.importorskip("cv2")

from betapose_tpu.tools import objects as objects_mod


class TestObjectZoo:
    def test_roster_is_thirteen(self):
        """The sweep roster mirrors the reference's 13-object LineMod
        protocol breadth (`annotate_keypoint.py:63`)."""
        assert len(objects_mod.OBJECT_BUILDERS) == 13

    def test_builders(self):
        for name, build in objects_mod.OBJECT_BUILDERS.items():
            o = build(26)
            assert o.name == name
            assert o.keypoints.shape == (26, 3)
            assert o.vertices.shape[1] == 3
            assert len(o.faces) >= 12
            assert 0.05 < o.diameter < 0.2
            # keypoints lie on the surface (not swallowed by the union)
            assert not any(o.contains_interior(k) for k in o.keypoints)
            # keypoints are spread: no two closer than 5 mm (thin bars
            # like the slab's 9 mm half-thickness bound the separation)
            d = np.linalg.norm(o.keypoints[None] - o.keypoints[:, None],
                               axis=-1)
            np.fill_diagonal(d, 1.0)
            assert d.min() > 0.005

    def test_tiny_is_the_small_diameter_row(self):
        ds = {n: b().diameter
              for n, b in objects_mod.OBJECT_BUILDERS.items()}
        assert min(ds, key=ds.get) == "tiny"
        assert ds["tiny"] < 0.08

    def test_vertex_set_symmetry(self):
        """Each symmetric object's vertex set maps to itself EXACTLY
        under every group element — the property ADD-S grading relies
        on."""
        for name in ("prism", "quad", "slab"):
            o = objects_mod.OBJECT_BUILDERS[name]()
            assert o.symmetries
            as_set = lambda a: set(map(tuple, np.round(a, 9)))
            for S in o.symmetries:
                assert as_set(o.vertices) == as_set(o.vertices @ S.T), name

    def test_appearance_symmetry_exact(self):
        """Rendering pose R and pose R·S produces the IDENTICAL image for
        every symmetry element of every symmetric object — paired faces
        share colors and the renderer shades by face normal only, so the
        ambiguity the symmetric tiers grade is real, not approximate."""
        from betapose_tpu.tools.selftest import CAM_K
        from betapose_tpu.geometry.renderer import Renderer
        rng = np.random.default_rng(3)
        for name in ("prism", "quad", "slab"):
            o = objects_mod.OBJECT_BUILDERS[name]()
            A = np.linalg.qr(rng.standard_normal((3, 3)))[0]
            if np.linalg.det(A) < 0:
                A[:, 0] *= -1
            for S in o.symmetries:
                imgs = []
                for R in (A, A @ S):
                    pose = np.eye(4)
                    pose[:3, :3] = R
                    pose[:3, 3] = [0.02, -0.01, 0.5]
                    r = Renderer(size=(640, 480), cam=CAM_K)
                    r.draw_model(o, pose)
                    rgb, depth = r.finish()
                    imgs.append((rgb, depth))
                np.testing.assert_allclose(imgs[0][0], imgs[1][0],
                                           atol=1e-6)
                np.testing.assert_allclose(imgs[0][1], imgs[1][1],
                                           atol=1e-6)

    def test_asymmetric_objects_not_flagged_symmetric(self):
        for name in ("cube", "lwedge", "tower", "tiny", "ring", "cross",
                     "steps", "tbar", "checker", "dumbbell"):
            assert objects_mod.OBJECT_BUILDERS[name]().symmetries == ()

    def test_quad_generator_closes_to_full_group(self):
        """quad is built from ONE 90° generator; MeshObject must close it
        to {90°, 180°, 270°} so canonicalization and the min-over-modes
        loss see every mode (the generator-only bug class)."""
        q = objects_mod.quad_object()
        assert len(q.symmetries) == 3
        assert len(q.symmetry_perms) == 3
        # the three elements are 90/180/270 about z, in some order
        angles = sorted(round(np.degrees(np.arctan2(S[1, 0], S[0, 0])))
                        % 360 for S in q.symmetries)
        assert angles == [90, 180, 270]
        for S, perm in zip(q.symmetries, q.symmetry_perms):
            assert sorted(perm.tolist()) == list(range(26))
            np.testing.assert_allclose(q.keypoints @ S.T,
                                       q.keypoints[perm], atol=1e-9)

    def test_quad_canonicalization_collapses_all_four_modes(self):
        rng = np.random.default_rng(7)
        q = objects_mod.quad_object()
        for _ in range(20):
            qv = rng.standard_normal(4)
            w, x, y, z = qv / np.linalg.norm(qv)
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]])
            pose = np.eye(4)
            pose[:3, :3] = R
            canon = [objects_mod.canonicalize_pose(pose, q.symmetries)]
            for S in q.symmetries:
                p2 = pose.copy()
                p2[:3, :3] = R @ S
                canon.append(objects_mod.canonicalize_pose(
                    p2, q.symmetries))
            for c in canon[1:]:
                np.testing.assert_allclose(c, canon[0], atol=1e-12)

    def test_checker_faces_carry_four_distinct_colors(self):
        """The textured variant subdivides each face into a 2x2 grid of
        four DISTINCT colors.  Distinctness is load-bearing: the first
        revision's 2-color diagonal checker was invariant under a 180°
        in-plane rotation of every face, and that appearance degeneracy
        collapsed KPD training to PCK 0.03 (the identically-shaped flat
        cube trains to 0.97) — a canonicalization-seam failure with no
        exact symmetry to hang min-over-modes supervision on."""
        c = objects_mod.checker_object()
        assert len(c.vertices) == 96          # 6 faces x 4 sub-quads x 4
        v = c.vertices.reshape(24, 4, 3)
        col = c.colors.reshape(24, 4, 3)
        for axis in range(3):
            for sign in (-1, 1):
                on_face = [i for i in range(24)
                           if np.allclose(v[i][:, axis],
                                          sign * 0.035)]
                assert len(on_face) == 4
                face_cols = {tuple(np.round(col[i][0], 6))
                             for i in on_face}
                assert len(face_cols) == 4    # all four cells distinct

    def test_two_color_checker_mesh_still_builds(self):
        """[6,2,3] face_colors (the legacy 2-color checker layout) stays
        a supported _box_mesh input: diagonal cells share a color."""
        pairs = np.tile(np.array([[[1.0, 0, 0], [0, 0, 1.0]]]), (6, 1, 1))
        o = objects_mod.MeshObject(
            "chk2", [((0, 0, 0), (0.03, 0.03, 0.03), pairs)], n_kp=8)
        col = o.colors.reshape(24, 4, 3)
        uniq = {tuple(np.round(col[i][0], 6)) for i in range(24)}
        assert uniq == {(1.0, 0.0, 0.0), (0.0, 0.0, 1.0)}

    def test_ring_has_a_through_hole(self):
        """Genus-1: the frame's center is empty (background visible
        through it), yet points on the bars are interior."""
        r = objects_mod.ring_object()
        assert not r.contains_interior(np.zeros(3))
        assert r.contains_interior(np.array([0.0, 0.0425, 0.0]))


class TestSymmetryPerms:
    def test_prism_perm_full_candidate_set(self):
        """n_kp=26 keeps every candidate; the 180°-about-z flip must act
        on them as an exact involutive permutation."""
        p = objects_mod.prism_object(26)
        (perm,) = p.symmetry_perms
        (S,) = p.symmetries
        assert sorted(perm.tolist()) == list(range(26))
        np.testing.assert_array_equal(perm[perm], np.arange(26))
        np.testing.assert_allclose(p.keypoints @ S.T, p.keypoints[perm],
                                   atol=1e-9)

    def test_prism_orbit_closed_designation_small(self):
        """With n_kp < the candidate pool, designation must still be
        symmetry-closed (whole orbits) so the permutation exists."""
        for n_kp in (8, 12, 20):
            p = objects_mod.prism_object(n_kp)
            assert p.keypoints.shape == (n_kp, 3)
            (perm,) = p.symmetry_perms          # raises if not closed
            np.testing.assert_array_equal(perm[perm], np.arange(n_kp))
            # still well-spread
            d = np.linalg.norm(p.keypoints[None] - p.keypoints[:, None],
                               axis=-1)
            np.fill_diagonal(d, 1.0)
            assert d.min() > 0.01

    def test_open_perm_rejects_non_closed_set(self):
        with pytest.raises(ValueError):
            objects_mod.symmetry_keypoint_perms(
                np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
                (np.diag([-1.0, -1.0, 1.0]),))

    def test_asymmetric_objects_have_no_perms(self):
        assert objects_mod.cube_object().symmetry_perms == ()
        assert objects_mod.lwedge_object().symmetry_perms == ()


class TestSymmetryAwareLoss:
    """kpd_train.make_loss_fn(sym_perms=...): min-over-modes semantics."""

    def _batch(self, rng, perm, b=3, h=8, w=6, k=4):
        labels = rng.random((b, h, w, k)).astype(np.float32)
        mask = np.ones_like(labels)
        return labels, mask

    def test_flipped_mode_prediction_scores_zero(self):
        """A prediction equal to the PERMUTED labels has zero symmetry-
        aware loss but nonzero plain loss — supervision no longer punishes
        the equivalent mode."""
        import jax.numpy as jnp
        from betapose_tpu.train import kpd_train
        rng = np.random.default_rng(0)
        perm = np.array([1, 0, 3, 2], np.int32)
        labels, mask = self._batch(rng, perm)
        pred = labels[..., perm]
        batch = {"labels": jnp.asarray(labels), "set_mask": jnp.asarray(mask)}
        fwd = lambda params, inps, train=False, bn_stats=None: jnp.asarray(
            pred)
        loss_sym = kpd_train.make_loss_fn(
            8, forward_fn=fwd, sym_perms=(perm,))(
                {}, dict(batch, inps=jnp.zeros((3, 1))))
        loss_plain = kpd_train.make_loss_fn(8, forward_fn=fwd)(
            {}, dict(batch, inps=jnp.zeros((3, 1))))
        assert float(loss_sym[0]) < 1e-12
        assert float(loss_plain[0]) > 1e-3

    def test_mode_choice_is_per_sample(self):
        """Sample 0 predicts canonical, sample 1 predicts flipped — both
        must contribute ~zero (the min is per sample, not per batch)."""
        import jax.numpy as jnp
        from betapose_tpu.train import kpd_train
        rng = np.random.default_rng(1)
        perm = np.array([1, 0, 3, 2], np.int32)
        labels, mask = self._batch(rng, perm, b=2)
        pred = np.stack([labels[0], labels[1][..., perm]])
        batch = {"labels": jnp.asarray(labels), "set_mask": jnp.asarray(mask),
                 "inps": jnp.zeros((2, 1))}
        fwd = lambda params, inps, train=False, bn_stats=None: jnp.asarray(
            pred)
        loss, (acc, _) = kpd_train.make_loss_fn(
            8, forward_fn=fwd, sym_perms=(perm,))({}, batch)
        assert float(loss) < 1e-12
        assert float(acc) == 1.0

    def test_matches_plain_loss_for_identity_perm_free_case(self):
        """Without sym_perms the loss is the original masked MSE (the
        asymmetric-object path is bit-identical to before)."""
        import jax.numpy as jnp
        from betapose_tpu.train import kpd_train
        rng = np.random.default_rng(2)
        labels, mask = self._batch(rng, None)
        pred = rng.random(labels.shape).astype(np.float32)
        batch = {"labels": jnp.asarray(labels), "set_mask": jnp.asarray(mask),
                 "inps": jnp.zeros((3, 1))}
        fwd = lambda params, inps, train=False, bn_stats=None: jnp.asarray(
            pred)
        l0, _ = kpd_train.make_loss_fn(8, forward_fn=fwd)({}, batch)
        expect = kpd_train.masked_mse_loss(
            jnp.asarray(pred), batch["labels"], batch["set_mask"])
        np.testing.assert_allclose(float(l0), float(expect), rtol=1e-6)

    def test_eval_step_symmetry_aware(self):
        import jax.numpy as jnp
        from betapose_tpu.train import kpd_train
        rng = np.random.default_rng(3)
        perm = np.array([1, 0, 3, 2], np.int32)
        labels, mask = self._batch(rng, perm, b=2)
        pred = labels[..., perm]
        fwd = lambda params, inps: jnp.asarray(pred)
        step = kpd_train.make_eval_step(8, forward_fn=fwd,
                                        sym_perms=(perm,))
        out = step({}, {"labels": jnp.asarray(labels),
                        "set_mask": jnp.asarray(mask),
                        "inps": jnp.zeros((2, 1))})
        assert float(out["loss"]) < 1e-12
        assert float(out["acc"]) == 1.0


class TestCanonicalization:
    def _rand_rot(self, rng):
        """Uniform SO(3) via unit quaternion (numpy's Householder QR is
        sign-biased: Q[0,0] < 0 almost surely — not a fair sampler)."""
        q = rng.standard_normal(4)
        w, x, y, z = q / np.linalg.norm(q)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])

    def test_orbit_consistency(self):
        """canonicalize(R) == canonicalize(R·S): identical-looking views
        get the identical annotation pose."""
        p = objects_mod.prism_object()
        (S,) = p.symmetries
        rng = np.random.default_rng(0)
        for _ in range(50):
            pose = np.eye(4)
            pose[:3, :3] = self._rand_rot(rng)
            pose2 = pose.copy()
            pose2[:3, :3] = pose[:3, :3] @ S
            c1 = objects_mod.canonicalize_pose(pose, p.symmetries)
            c2 = objects_mod.canonicalize_pose(pose2, p.symmetries)
            np.testing.assert_allclose(c1, c2, atol=1e-12)

    def test_representative_is_in_orbit_and_half_are_flipped(self):
        p = objects_mod.prism_object()
        (S,) = p.symmetries
        rng = np.random.default_rng(1)
        flipped = 0
        for _ in range(200):
            pose = np.eye(4)
            pose[:3, :3] = self._rand_rot(rng)
            c = objects_mod.canonicalize_pose(pose, p.symmetries)
            same = np.allclose(c[:3, :3], pose[:3, :3])
            is_flip = np.allclose(c[:3, :3], pose[:3, :3] @ S)
            assert same or is_flip
            flipped += int(is_flip)
        # the rule picks the flip for ~half of random rotations
        assert 60 <= flipped <= 140

    def test_asymmetric_identity(self):
        pose = np.eye(4)
        out = objects_mod.canonicalize_pose(pose, ())
        np.testing.assert_array_equal(out, pose)

    def test_translation_untouched(self):
        p = objects_mod.prism_object()
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        pose[:3, :3] = self._rand_rot(np.random.default_rng(2))
        c = objects_mod.canonicalize_pose(pose, p.symmetries)
        np.testing.assert_array_equal(c[:3, 3], pose[:3, 3])
        np.testing.assert_array_equal(c[3], pose[3])


class TestRenderSequence:
    def test_canonical_annotation_consistency(self):
        """Two GT poses in the same symmetry orbit annotate to the same
        keypoint pixels (the property that makes heatmap training on the
        symmetric object well-posed)."""
        from betapose_tpu.tools.selftest import CAM_K
        from betapose_tpu.tools.annotator import annotate_frame
        p = objects_mod.prism_object(8)
        (S,) = p.symmetries
        rng = np.random.default_rng(4)
        A = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(A) < 0:
            A[:, 0] *= -1
        bbox = [200, 150, 380, 330]
        kps = []
        for R in (A, A @ S):
            pose = np.eye(4)
            pose[:3, :3] = R
            pose[:3, 3] = [0.0, 0.0, 0.55]
            cpose = objects_mod.canonicalize_pose(pose, p.symmetries)
            _, kp_img = annotate_frame(cpose, bbox, p.vertices,
                                       p.keypoints, CAM_K)
            kps.append(kp_img)
        np.testing.assert_allclose(kps[0], kps[1], atol=1e-9)


def test_json_sanitize_strips_non_finite():
    """--out_json must emit strict JSON: float('inf') sentinels (object
    never detected) become null, not the non-standard `Infinity`."""
    import json
    from betapose_tpu.tools.sweep import json_sanitize
    out = json_sanitize({"rows": [{"mean_add_m": float("inf"),
                                   "acc": 0.5,
                                   "nested": (float("nan"), 1)}]})
    s = json.dumps(out)
    assert "Infinity" not in s and "NaN" not in s
    assert json.loads(s)["rows"][0]["mean_add_m"] is None
    assert json.loads(s)["rows"][0]["nested"] == [None, 1]


@pytest.mark.slow
def test_sweep_tiny_smoke(tmp_path):
    """Wiring smoke at toy scale: 3 objects, shared 3-class detector,
    per-object KPD, per-seq rows, weight caching."""
    from betapose_tpu.tools.sweep import run_sweep

    out_json = tmp_path / "sweep.json"
    partials = []

    def snoop():
        # beat() fires right after each row's incremental dump — record
        # what an outage at that instant would leave on disk
        if out_json.exists():
            partials.append(json.loads(out_json.read_text()))

    kw = dict(object_names=("cube", "prism", "lwedge"), n_frames=6,
              n_eval=2, yolo_iters=2, kpd_iters=2, kpd_finetune_iters=0,
              kpd_batch=4, yolo_batch=4, reso=96, inp_h=64, inp_w=32,
              n_kp=8, num_classes=3, left_keypoints=6, yolo_frames=4,
              params_dir=str(tmp_path / "cache"), verbose=False,
              out_json=str(out_json), beat=snoop)
    out = run_sweep(**kw)
    # incremental rows: the first post-row snapshot is a valid partial
    # table with 1 row; the last has all 3 and partial=False
    row_snaps = [p for p in partials if p.get("per_object")]
    assert row_snaps[0]["partial"] is True
    assert len(row_snaps[0]["per_object"]) == 1
    assert row_snaps[-1]["partial"] is False
    assert len(row_snaps[-1]["per_object"]) == 3
    rows = out["per_object"]
    assert [r["object"] for r in rows] == ["cube", "prism", "lwedge"]
    assert [r["symmetric"] for r in rows] == [False, True, False]
    assert all(r["n_eval"] == 2 for r in rows)
    assert (tmp_path / "cache" / "yolo.weights").exists()
    for name in ("cube", "prism", "lwedge"):
        assert (tmp_path / "cache" / f"kpd_{name}.npz").exists()
    # rerun reloads the cache (same structure back)
    out2 = run_sweep(**kw)
    assert [r["object"] for r in out2["per_object"]] == \
        [r["object"] for r in rows]
