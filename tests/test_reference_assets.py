"""Exercise the REAL designator keypoint assets shipped with the reference.

The 13 pre-computed 50-keypoint clouds at
`/root/reference/1_keypoint_designator/assets/sifts/{1,2,4,5,6,8..15}.ply`
(the actual LineMod keypoint geometry used by `betapose_evaluate.py:80-81`
and `annotate_keypoint.py:73-74`) are free real-data fixtures: these tests
drive the ascii PLY reader/writer, `Model3D.refine`, the annotator
projection, and the PnP solver on them, so the geometry stack is validated
on real keypoint distributions rather than synthetic ones only.
"""

import glob
import os

import numpy as np
import pytest

ASSETS = sorted(
    glob.glob("/root/reference/1_keypoint_designator/assets/sifts/*.ply"),
    key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))

pytestmark = pytest.mark.skipif(not ASSETS, reason="reference assets absent")

# LineMod intrinsics (hardcoded in the reference, betapose_evaluate.py:59).
CAM_K = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]], np.float64)


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def test_all_13_assets_parse():
    """Every shipped asset parses; note obj 10 genuinely has only 17
    keypoints (3D SIFT found fewer on that object) — all others have 50."""
    assert len(ASSETS) == 13
    for path in ASSETS:
        from betapose_tpu.data import ply as plyio
        v = plyio.read_vertices(path)
        expected = 17 if os.path.basename(path) == "10.ply" else 50
        assert v.shape == (expected, 3), path
        assert np.isfinite(v).all(), path
        # LineMod meshes are mm-scale objects; keypoints must be too.
        extent = v.max(axis=0) - v.min(axis=0)
        assert (extent > 5).all() and (extent < 500).all(), (path, extent)


def test_ascii_writer_roundtrip_on_real_file(tmp_path):
    """write_vertices_ascii(read(x)) must reparse to bit-identical float64
    values for every real asset (the `save=True` path of Model3D.refine,
    reference `utils/model.py:44-47`)."""
    from betapose_tpu.data import ply as plyio

    for path in ASSETS:
        v = plyio.read_vertices(path)
        out = str(tmp_path / os.path.basename(path))
        plyio.write_vertices_ascii(out, v)
        v2 = plyio.read_vertices(out)
        np.testing.assert_array_equal(v, v2, err_msg=path)
        with open(out) as f:
            head = [next(f) for _ in range(3)]
        assert head[0].strip() == "ply"
        assert f"element vertex {len(v)}" in head[2]


def test_refine_real_keypoints_to_nclasses():
    """Model3D.refine on the real obj_01 keypoints: the surviving 30 must be
    a subset of the originals with a strictly larger minimum pairwise
    distance (the greedy closest-pair deletion, utils/model.py:29-48)."""
    from betapose_tpu.geometry.model3d import Model3D

    m = Model3D(ASSETS[0])
    orig = np.array(m.vertices)

    def min_pair_dist(v):
        d = np.linalg.norm(v[:, None] - v[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    d0 = min_pair_dist(orig)
    m.refine(total_kp=30)
    v = np.asarray(m.vertices)
    assert v.shape == (30, 3)
    # subset check
    for row in v:
        assert np.any(np.all(np.isclose(orig, row), axis=1))
    assert min_pair_dist(v) > d0


@pytest.mark.parametrize("path", ASSETS, ids=[os.path.basename(p)
                                              for p in ASSETS])
def test_pnp_pose_recovery_on_real_keypoints(path):
    """Project each object's real 50 keypoints through a synthetic pose and
    recover it with the JAX PnP solver; pose comparison is metric-space
    (rotation angle + translation + ADD on the keypoints themselves), per
    the small-FOV twin-pose caveat.  Matches the eval chain
    `betapose_evaluate.py:80-81` -> `utils/utils.py:17`."""
    from betapose_tpu.data import ply as plyio
    from betapose_tpu.geometry import metrics
    from betapose_tpu.ops.pnp import pnp
    from betapose_tpu.tools.annotator import project_points

    kp = plyio.read_vertices(path)  # mm, like the sixd GT chain uses
    obj_id = int(os.path.splitext(os.path.basename(path))[0])
    R = _rot([0.3, 1.0, -0.2], 25.0 + 7.0 * obj_id) @ _rot([1, 0, 0], 110.0)
    t = np.array([15.0, -25.0, 850.0])

    kp_cam = kp @ R.T + t
    assert (kp_cam[:, 2] > 0).all()
    pts2d = project_points(kp_cam, CAM_K)

    R_est, t_est = pnp(kp.astype(np.float32), pts2d.astype(np.float32),
                       CAM_K.astype(np.float32))
    gt_pose = np.eye(4)
    gt_pose[:3, :3], gt_pose[:3, 3] = R, t
    est_pose = np.eye(4)
    est_pose[:3, :3], est_pose[:3, 3] = R_est, t_est.ravel()

    add = metrics.add_err(gt_pose, est_pose, kp)
    rot_deg = metrics.rot_error(gt_pose, est_pose)
    trans_norm, _ = metrics.trans_error(gt_pose, est_pose)
    diam = np.linalg.norm(kp.max(0) - kp.min(0))
    assert add < 0.01 * diam, (add, diam)
    assert rot_deg < 1.0, rot_deg
    assert trans_norm < 2.0, trans_norm


def test_annotator_projection_chain_on_real_keypoints():
    """Full annotator-step geometry on real obj_05 keypoints: the ratio
    remap is identity when the GT box equals the mask box, and keypoints
    reprojected through the annotator land inside the model's mask bbox
    margin (annotate_keypoint.py:151-186)."""
    from betapose_tpu.data import ply as plyio
    from betapose_tpu.tools.annotator import (annotate_frame,
                                              mask_bbox_of_model)

    kp = plyio.read_vertices(ASSETS[4])  # 5.ply
    R = _rot([0.1, 0.9, 0.4], 140.0)
    t = np.array([-10.0, 5.0, 700.0])
    pose = np.eye(4)
    pose[:3, :3], pose[:3, 3] = R, t

    # Use the keypoints themselves as the 'model' — the mask bbox then bounds
    # their projections, so the identity-remap property is exact.
    verts_cam = kp @ R.T + t
    xmin, xmax, ymin, ymax = mask_bbox_of_model(verts_cam, CAM_K)
    assert xmax > xmin and ymax > ymin

    bbox, kp_img = annotate_frame(pose, (xmin, ymin, xmax, ymax),
                                  kp, kp, CAM_K)
    assert kp_img.shape == (50, 2)
    # Strict-interior pixel test truncates to int; allow 1 px slack.
    assert (kp_img[:, 0] >= xmin - 1).all() and (kp_img[:, 0] <= xmax + 1).all()
    assert (kp_img[:, 1] >= ymin - 1).all() and (kp_img[:, 1] <= ymax + 1).all()
