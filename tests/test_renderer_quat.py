"""Renderer + quaternion + video source tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from betapose_tpu.geometry.renderer import (Renderer, render_depth_points,
                                            build_projection)
from betapose_tpu.geometry.quaternion import Quaternion
from betapose_tpu.geometry.model3d import Model3D

CAM_K = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]])


class TestRenderer:
    def _tri_model(self):
        m = Model3D()
        m.vertices = np.array([[-0.05, -0.05, 0.0], [0.05, -0.05, 0.0],
                               [0.0, 0.05, 0.0]])
        m.faces = np.array([[0, 1, 2]])
        return m

    def test_triangle_depth(self):
        r = Renderer(size=(640, 480), cam=CAM_K)
        pose = np.eye(4)
        pose[2, 3] = 0.7
        r.draw_model(self._tri_model(), pose)
        rgb, depth = r.finish()
        # triangle projects around the principal point; depth = 0.7 there
        assert depth[242, 325] == pytest.approx(0.7, rel=1e-3)
        assert depth[0, 0] == 0.0
        assert rgb[242, 325].sum() > 0

    def test_zbuffer_ordering(self):
        r = Renderer(size=(640, 480), cam=CAM_K)
        near, far = np.eye(4), np.eye(4)
        near[2, 3] = 0.5
        far[2, 3] = 1.0
        m = self._tri_model()
        m.colors = np.tile([1.0, 0.0, 0.0], (3, 1))
        r.draw_model(m, far)
        m2 = self._tri_model()
        m2.colors = np.tile([0.0, 1.0, 0.0], (3, 1))
        r.draw_model(m2, near)
        rgb, depth = r.finish()
        assert depth[242, 325] == pytest.approx(0.5, rel=1e-3)
        assert rgb[242, 325, 1] > rgb[242, 325, 0]  # near (green) wins

    def test_bbox_wireframe(self):
        r = Renderer(size=(640, 480), cam=CAM_K)
        pose = np.eye(4)
        pose[2, 3] = 0.7
        m = self._tri_model()
        r.draw_boundingbox(m, pose, color=(0, 1, 0))
        rgb, _ = r.finish()
        assert rgb[..., 1].sum() > 0

    def test_point_splat_device(self):
        rng = np.random.default_rng(0)
        verts = rng.uniform(-0.04, 0.04, (500, 3))
        verts[:, 2] += 0.7
        depth = np.asarray(render_depth_points(
            jnp.asarray(verts), jnp.asarray(CAM_K)))
        assert depth.shape == (480, 640)
        occupied = depth > 0
        assert occupied.sum() > 50
        assert abs(depth[occupied].mean() - 0.7) < 0.05
        # scatter-min: the recorded depth at each pixel is the minimum
        ys, xs = np.where(occupied)
        i = 0
        xi = np.floor(verts[:, 0] * CAM_K[0, 0] / verts[:, 2]
                      + CAM_K[0, 2]).astype(int)
        yi = np.floor(verts[:, 1] * CAM_K[1, 1] / verts[:, 2]
                      + CAM_K[1, 2]).astype(int)
        same = (xi == xs[i]) & (yi == ys[i])
        assert depth[ys[i], xs[i]] == pytest.approx(
            verts[same, 2].min(), rel=1e-6)

    def test_build_projection_shape(self):
        p = build_projection(CAM_K, 0, 0, 640, 480, 0.1, 10.0)
        assert p.shape == (4, 4)


class TestQuaternion:
    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            q0, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q0) < 0:
                q0[:, 0] *= -1
            q = Quaternion(matrix=q0)
            np.testing.assert_allclose(q.rotation_matrix, q0, atol=1e-10)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.default_rng(1)
        a, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        b, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(a) < 0:
            a[:, 0] *= -1
        if np.linalg.det(b) < 0:
            b[:, 0] *= -1
        qa, qb = Quaternion(matrix=a), Quaternion(matrix=b)
        np.testing.assert_allclose((qa * qb).rotation_matrix, a @ b,
                                   atol=1e-10)

    def test_angle_degrees(self):
        q = Quaternion(axis=[0, 0, 1], angle=np.deg2rad(30))
        assert q.degrees == pytest.approx(30.0, abs=1e-9)
        assert (q * q.inverse).degrees == pytest.approx(0.0, abs=1e-6)

    def test_rotate(self):
        q = Quaternion(axis=[0, 0, 1], angle=np.pi / 2)
        out = q.rotate([1, 0, 0])
        np.testing.assert_allclose(out, [0, 1, 0], atol=1e-12)

    def test_slerp_endpoints(self):
        a = Quaternion(axis=[0, 0, 1], angle=0.0)
        b = Quaternion(axis=[0, 0, 1], angle=np.pi / 2)
        np.testing.assert_allclose(Quaternion.slerp(a, b, 0.0).q, a.q,
                                   atol=1e-9)
        half = Quaternion.slerp(a, b, 0.5)
        assert half.degrees == pytest.approx(45.0, abs=1e-6)


class TestVideoOverlay:
    def test_draw_overlay(self):
        from betapose_tpu.data.video import draw_pose_overlay
        frame = np.zeros((100, 120, 3), np.uint8)
        out = draw_pose_overlay(frame, box=[10, 10, 60, 70],
                                keypoints=[[30, 30], [40, 50]],
                                kp_scores=[0.9, 0.1])
        assert out.sum() > 0
        assert out.shape == frame.shape


class TestTexturedRendering:
    """UV-textured rasterization (reference textured GLSL program,
    `utils/renderer.py:50-85`, + the texcoord loading conventions of
    `utils/model.py:97-129`)."""

    @staticmethod
    def _quad_model(texcoord):
        class M:
            pass
        m = M()
        # unit quad facing the camera at z=0.5m
        m.vertices = np.array([[-0.05, -0.05, 0.0], [0.05, -0.05, 0.0],
                               [0.05, 0.05, 0.0], [-0.05, 0.05, 0.0]])
        m.faces = np.array([[0, 1, 2], [0, 2, 3]])
        m.colors = np.full((4, 3), 0.5)
        m.texcoord = np.asarray(texcoord, np.float64)
        # left half red, right half green
        tex = np.zeros((8, 8, 3))
        tex[:, :4] = [1.0, 0.0, 0.0]
        tex[:, 4:] = [0.0, 1.0, 0.0]
        m.texture = tex
        return m

    def test_texture_sampled_left_right(self):
        from betapose_tpu.geometry.renderer import Renderer
        cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        # u: 0 at left vertex, 1 at right
        model = self._quad_model([[0, 0], [1, 0], [1, 1], [0, 1]])
        pose = np.eye(4)
        pose[2, 3] = 0.5
        r = Renderer(size=(640, 480), cam=cam)
        r.draw_model(model, pose, ambient_weight=1.0)  # no shading falloff
        rgb, depth = r.finish()
        assert (depth > 0).sum() > 500
        left = rgb[240, 290]   # left of center -> u < 0.5 -> red
        right = rgb[240, 350]  # right of center -> green
        assert left[0] > 0.9 and left[1] < 0.1
        assert right[1] > 0.9 and right[0] < 0.1

    def test_untextured_model_unaffected(self):
        from betapose_tpu.geometry.renderer import Renderer
        cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        model = self._quad_model([[0, 0], [1, 0], [1, 1], [0, 1]])
        model.texture = None
        pose = np.eye(4)
        pose[2, 3] = 0.5
        r = Renderer(size=(640, 480), cam=cam)
        r.draw_model(model, pose, ambient_weight=1.0)
        rgb, depth = r.finish()
        center = rgb[240, 320]
        np.testing.assert_allclose(center, 0.5, atol=0.05)  # vertex colors


class TestTexcoordLoading:
    def test_vertex_wise_uv_and_texture_png(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from betapose_tpu.geometry.model3d import Model3D
        ply = tmp_path / "obj.ply"
        ply.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float texture_u\nproperty float texture_v\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0 0.0 0.0\n1 0 0 1.0 0.0\n0 1 0 0.0 1.0\n"
            "3 0 1 2\n")
        tex = np.zeros((4, 4, 3), np.uint8)
        tex[..., 2] = 255  # BGR blue png -> RGB [0,0,1]
        cv2.imwrite(str(tmp_path / "obj.png"), tex)
        m = Model3D(str(ply))
        assert m.texcoord is not None and m.texcoord.shape == (3, 2)
        np.testing.assert_allclose(m.texcoord[1], [1.0, 0.0])
        assert m.texture is not None
        np.testing.assert_allclose(m.texture[0, 0], [1.0, 0.0, 0.0])

    def test_face_wise_texcoord_scatter(self, tmp_path):
        from betapose_tpu.data import ply as plyio
        ply = tmp_path / "obj.ply"
        ply.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "property list uchar float texcoord\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2 6 0.1 0.2 0.3 0.4 0.5 0.6\n")
        tc = plyio.read_texcoords(str(ply))
        assert tc.shape == (3, 2)
        np.testing.assert_allclose(tc[0], [0.1, 0.2])
        np.testing.assert_allclose(tc[2], [0.5, 0.6])

    def test_no_texture_files_is_fine(self, tmp_path):
        from betapose_tpu.geometry.model3d import Model3D
        ply = tmp_path / "plain.ply"
        ply.write_text(
            "ply\nformat ascii 1.0\nelement vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n0 0 0\n")
        m = Model3D(str(ply))
        assert m.texture is None and m.texcoord is None
