"""Tests for geometry/utils.py parity helpers."""

import numpy as np

from betapose_tpu.geometry import utils as gu


class TestGeomUtils:
    def test_trans_vertices(self):
        pose = np.eye(4)
        pose[:3, 3] = [1, 2, 3]
        out = gu.trans_vertices_by_pose([[0, 0, 0], [1, 1, 1]], pose)
        np.testing.assert_allclose(out, [[1, 2, 3], [2, 3, 4]])

    def test_bbox_from_mask(self):
        mask = np.zeros((10, 12))
        mask[3:6, 4:9] = 1
        assert gu.get_bbox_from_mask(mask) == (4, 8, 3, 5)
        assert gu.get_bbox_from_mask(np.zeros((4, 4))) == (-1, -1, -1, -1)

    def test_jitter_bbox_bounds(self):
        rng = np.random.default_rng(0)
        bb = [10, 10, 50, 60]
        out = gu.jitter_bbox(bb, 0.1, rng)
        assert abs(out[0] - 10) <= 4 and abs(out[3] - 60) <= 5

    def test_handle_occlusion(self):
        kd = np.zeros((4, 4, 3))
        kl = np.zeros((4, 4, 3))
        ad = np.zeros((4, 4, 3))
        kd[1, 1] = [5, 0, 0]
        kl[1, 1] = [3, 3, 3]
        ad[1, 1] = [1, 0, 0]    # occluded marker
        kd2, kl2 = gu.handle_occlusion(kd, kl, ad)
        assert kd2[1, 1, 0] == 0
        assert kl2[1, 1, 0] == 69  # 3 + 66

    def test_local_top_visibility(self):
        depth = np.zeros((20, 20))
        depth[5:15, 5:15] = 100.0   # surface at depth 100
        kp_xy = np.array([[10, 10], [2, 2]])
        kp_z = np.array([100.0, 100.0])
        vis = gu.local_top_visibility(kp_xy, kp_z, depth, radius=2,
                                      threshold=15)
        assert vis[0] and vis[1]
        # a keypoint far behind the surface is occluded
        vis2 = gu.local_top_visibility(np.array([[10, 10]]),
                                       np.array([200.0]), depth,
                                       radius=2, threshold=15)
        assert not vis2[0]

    def test_output_pointcloud(self, tmp_path):
        from betapose_tpu.data import ply as plyio
        p = str(tmp_path / "c.ply")
        gu.output_pointcloud(np.zeros((5, 3)), p)
        assert plyio.read_vertices(p).shape == (5, 3)

    def test_generate_mask_img(self):
        d = np.zeros((4, 4))
        d[1, 2] = 7.0
        img = gu.generate_mask_img(d)
        assert img[1, 2, 0] == 255
        assert img[0, 0, 0] == 0
