"""Golden tests for the geometry/data substrate: PLY IO, Model3D refine,
pose metrics.  Reference formulas: utils/model.py, utils/metrics.py."""

import numpy as np
import pytest

from betapose_tpu.data import ply as plyio
from betapose_tpu.geometry.model3d import Model3D
from betapose_tpu.geometry import metrics


def _random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4)
    pose[:3, :3] = q
    pose[:3, 3] = rng.standard_normal(3) * 0.1
    return pose


class TestPly:
    def test_ascii_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((50, 3))
        path = tmp_path / "kp.ply"
        plyio.write_vertices_ascii(path, pts)
        back = plyio.read_vertices(path)
        # properties are declared 'float' (f32), so roundtrip is f32-exact
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_binary_le(self, tmp_path):
        # hand-craft a small binary ply
        pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype="<f4")
        path = tmp_path / "b.ply"
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex 2\n")
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            f.write(pts.tobytes())
        back = plyio.read_vertices(path)
        np.testing.assert_allclose(back, pts.astype(np.float64))

    def test_faces(self, tmp_path):
        path = tmp_path / "m.ply"
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    "element vertex 3\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "element face 1\n"
                    "property list uchar int vertex_indices\n"
                    "end_header\n"
                    "0 0 0\n1 0 0\n0 1 0\n"
                    "3 0 1 2\n")
        verts, faces = plyio.read_mesh(path)
        assert verts.shape == (3, 3)
        np.testing.assert_array_equal(faces, [[0, 1, 2]])


def _reference_refine(vertices, total_kp):
    """Direct transcription of the reference O(N^3) greedy loop semantics
    (utils/model.py:29-48) used as the golden oracle."""
    vertices = vertices.copy()
    for _ in range(len(vertices) - total_kp):
        min_dist = 100.0
        min_index = 0
        for i, vi in enumerate(vertices):
            for j, vj in enumerate(vertices):
                if i == j:
                    continue
                d = np.sqrt(np.sum(np.square(vi - vj)))
                if d < min_dist:
                    min_index = i
                    min_dist = d
        vertices = np.delete(vertices, min_index, 0)
    return vertices


class TestRefine:
    def test_matches_reference_greedy(self):
        rng = np.random.default_rng(42)
        pts = rng.standard_normal((20, 3))
        golden = _reference_refine(pts, 8)
        m = Model3D()
        m.vertices = pts.copy()
        m.refine(total_kp=8)
        np.testing.assert_allclose(m.vertices, golden, rtol=1e-12)

    def test_noop_when_small(self):
        m = Model3D()
        m.vertices = np.zeros((5, 3))
        m.refine(total_kp=10)
        assert len(m.vertices) == 5


class TestMetrics:
    def test_add_zero_for_same_pose(self):
        rng = np.random.default_rng(1)
        model = rng.standard_normal((30, 3))
        pose = _random_pose(rng)
        assert metrics.add_err(pose, pose, model) < 1e-12

    def test_add_translation_only(self):
        rng = np.random.default_rng(2)
        model = rng.standard_normal((30, 3))
        p1 = _random_pose(rng)
        p2 = p1.copy()
        p2[:3, 3] += [0.003, 0.004, 0.0]
        assert abs(metrics.add_err(p1, p2, model) - 0.005) < 1e-9

    def test_rot_error_known_angle(self):
        rng = np.random.default_rng(3)
        p1 = np.eye(4)
        ang = np.deg2rad(17.0)
        p2 = np.eye(4)
        p2[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                               [np.sin(ang), np.cos(ang), 0],
                               [0, 0, 1]])
        assert abs(metrics.rot_error(p1, p2) - 17.0) < 1e-6

    def test_iou(self):
        assert metrics.iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
        assert metrics.iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
        assert abs(metrics.iou([0, 0, 10, 10], [5, 0, 15, 10]) - 1 / 3) < 1e-9

    def test_projection_error_zero(self):
        rng = np.random.default_rng(4)
        model = rng.standard_normal((30, 3)) * 0.05
        pose = _random_pose(rng)
        pose[:3, 3] = [0, 0, 1.0]
        cam = np.array([[572.4, 0, 325.0], [0, 573.5, 242.0], [0, 0, 1]])
        assert metrics.projection_error_2d(pose, pose, model, cam) < 1e-9

    def test_trans_error(self):
        p1, p2 = np.eye(4), np.eye(4)
        p2[:3, 3] = [3, 4, 0]
        norm, single = metrics.trans_error(p1, p2)
        assert abs(norm - 5) < 1e-12
        np.testing.assert_allclose(single, [3, 4, 0])
