"""End-to-end pipeline tests.

1. Fused-graph smoke: tiny YOLO + tiny-input KPD, random weights — compiles
   under jit, produces well-formed outputs.
2. Geometric end-to-end: plant a known 6D pose, synthesize crop-space
   heatmaps at the projected keypoints, run decode -> invert -> PnP and
   recover the planted pose (validates the whole post-network math chain).
3. Results JSON writer schema.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig
from betapose_tpu.eval import results as results_mod
from betapose_tpu.ops import image as image_ops
from betapose_tpu.ops import heatmap as hm_ops
from betapose_tpu.ops import pnp as pnp_ops

TINY_YOLO_CFG = """
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=1
num=3
ignore_thresh = .7
"""

CAM_K = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]])


class TestFusedSmoke:
    def test_pipeline_runs(self):
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16, out_w=12,
                             n_kp=6, confidence=0.01,
                             left_keypoints=6, compute_dtype="float32")
        pipe = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
        frames = np.random.default_rng(1).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        out = pipe(frames)
        assert out["boxes"].shape == (2, 4)
        assert out["keypoints"].shape == (2, 6, 2)
        assert out["cam_R"].shape == (2, 3, 3)
        assert out["cam_t"].shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(out["proposal_score"])))

    def test_pipeline_runs_hgprm(self):
        """net_type='hgPRM' swaps the pose backbone for PyraNet inside the
        same fused graph (the reference's intended-but-broken eval path,
        hgPRM.py:144 PyraNet_Inference).  Heatmap dims (inp/4) must divide
        by 16 for the depth-4 hourglass: 128x64 -> 32x16."""
        from betapose_tpu.models import hgprm
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        hg_params = hgprm.init_params(jax.random.PRNGKey(1), n_classes=6,
                                      n_feats=16, n_stack=2, base_width=4,
                                      cardinality=2)
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        cfg = PipelineConfig(reso=96, inp_h=128, inp_w=64, out_h=32,
                             out_w=16, n_kp=6, confidence=0.01,
                             left_keypoints=6, compute_dtype="float32",
                             net_type="hgPRM")
        pipe = PosePipeline(spec, yolo_params, hg_params, kp3d, CAM_K, cfg)
        frames = np.random.default_rng(1).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        out = pipe(frames)
        assert out["keypoints"].shape == (2, 6, 2)
        assert out["cam_R"].shape == (2, 3, 3)
        assert np.all(np.isfinite(np.asarray(out["cam_t"])))

    def test_hgprm_checkpoint_roundtrip(self, tmp_path):
        """load_kpd_checkpoint(arch='hgPRM') restores the exact tree our
        trainer saves (save_pytree_npz)."""
        from betapose_tpu.core import checkpoint as ckpt
        from betapose_tpu.models import hgprm
        kwargs = dict(n_feats=16, n_stack=2, base_width=4, cardinality=2)
        params = hgprm.init_params(jax.random.PRNGKey(7), n_classes=6,
                                   **kwargs)
        path = str(tmp_path / "hg.npz")
        ckpt.save_pytree_npz(path, params)
        loaded = ckpt.load_kpd_checkpoint(path, n_classes=6, arch="hgPRM",
                                          **kwargs)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(loaded)[0]):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flip_tta_averages_mirrored_forward(self):
        """flip_tta=True (--fast_inference False) must equal the InferenNet
        semantics: (f(x) + unflip(f(flip(x)))) / 2 on the heatmap stage."""
        from betapose_tpu.eval.pipeline import make_pose_stage
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        base = PipelineConfig(inp_h=64, inp_w=48, out_h=16, out_w=12, n_kp=6,
                              compute_dtype="float32")
        import dataclasses as dc
        crops = jnp.asarray(np.random.default_rng(4).random(
            (2, 64, 48, 3), np.float32))
        plain = make_pose_stage(base)(kpd_params, crops)
        tta = make_pose_stage(dc.replace(base, flip_tta=True))(
            kpd_params, crops)
        mirrored = make_pose_stage(base)(kpd_params, crops[:, :, ::-1, :])
        expect = (plain + mirrored[:, :, :, ::-1]) / 2.0  # [B,K,H,W]
        np.testing.assert_allclose(np.asarray(tta), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)
        # and it is a real change, not a no-op
        assert not np.allclose(np.asarray(tta), np.asarray(plain))

    def test_pnp_score_power_is_live_both_modes(self):
        """pnp_score_power must reach the PnP stage in BOTH post-stage
        modes (capacity-1 and fused multi-candidate): keypoints/scores are
        untouched, the solved pose changes (weighted DLT/LM)."""
        import dataclasses as dc
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        frames = np.random.default_rng(1).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        for cap in (1, 3):
            cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16,
                                 out_w=12, n_kp=6, confidence=0.0,
                                 left_keypoints=6, compute_dtype="float32",
                                 det_capacity=cap, pnp_robust_rounds=1)
            plain = PosePipeline(spec, yolo_params, kpd_params, kp3d,
                                 CAM_K, cfg)(frames)
            wcfg = dc.replace(cfg, pnp_score_power=4.0)
            weighted = PosePipeline(spec, yolo_params, kpd_params, kp3d,
                                    CAM_K, wcfg)(frames)
            np.testing.assert_array_equal(np.asarray(plain["keypoints"]),
                                          np.asarray(weighted["keypoints"]))
            assert np.all(np.isfinite(np.asarray(weighted["cam_R"])))
            assert not np.allclose(np.asarray(plain["cam_R"]),
                                   np.asarray(weighted["cam_R"]))

    def test_run_batches_pipelining(self):
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.zeros((6, 3))
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16, out_w=12,
                             n_kp=6, left_keypoints=6,
                             compute_dtype="float32")
        pipe = PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)
        batches = [np.zeros((1, 120, 160, 3), np.uint8) for _ in range(3)]
        results = pipe.run_batches(iter(batches))
        assert len(results) == 3


class TestOomBatchSplit:
    """The RESOURCE_EXHAUSTED batch-halving fallback (PosePipeline.
    _run_device — the TPU analog of the reference's CUDA-OOM retry,
    train_KPD/src/evaluation.py:95-106) and the _is_oom guard that keeps
    tunnel/compile errors which merely MENTION the token from triggering it."""

    def _pipe(self):
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16, out_w=12,
                             n_kp=6, confidence=0.01, left_keypoints=6,
                             compute_dtype="float32")
        return PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)

    @staticmethod
    def _xla_error(msg):
        from jaxlib.xla_client import XlaRuntimeError
        return XlaRuntimeError(msg)

    def test_oom_splits_and_matches_unsplit(self):
        pipe = self._pipe()
        frames = np.random.default_rng(2).integers(
            0, 255, (4, 120, 160, 3), dtype=np.uint8)
        want = {k: np.asarray(v) for k, v in pipe(frames).items()}

        real_step, calls = pipe._step, []

        def oom_over_2(yp, kp, fr, *args):
            calls.append(fr.shape[0])
            if fr.shape[0] > 2:
                raise self._xla_error(
                    "RESOURCE_EXHAUSTED: out of memory allocating "
                    "123456 bytes")
            return real_step(yp, kp, fr, *args)

        pipe._step = oom_over_2
        got = {k: np.asarray(v) for k, v in pipe(frames).items()}
        assert calls == [4, 2, 2]  # one failed full batch, two halves
        for k in want:
            np.testing.assert_allclose(want[k], got[k], rtol=1e-5,
                                        atol=1e-5, err_msg=k)

    def test_oom_at_batch_1_propagates(self):
        pipe = self._pipe()

        def always_oom(*args):
            raise self._xla_error("RESOURCE_EXHAUSTED: out of memory")

        pipe._step = always_oom
        with pytest.raises(Exception, match="RESOURCE_EXHAUSTED"):
            pipe(np.zeros((1, 120, 160, 3), np.uint8))

    def test_mention_in_forwarded_log_is_not_oom(self):
        """An XlaRuntimeError whose message only MENTIONS the token (a
        forwarded remote-compile log line) must propagate, not halve."""
        pipe = self._pipe()
        calls = []

        def tunnel_error(yp, kp, fr, *args):
            calls.append(fr.shape[0])
            raise self._xla_error(
                "INTERNAL: remote compile server log said "
                "RESOURCE_EXHAUSTED somewhere upstream")

        pipe._step = tunnel_error
        with pytest.raises(Exception, match="INTERNAL"):
            pipe(np.zeros((4, 120, 160, 3), np.uint8))
        assert calls == [4]  # no retry at smaller batches

    def test_status_chain_position_is_oom(self):
        assert PosePipeline._is_oom(self._xla_error(
            "INTERNAL: RESOURCE_EXHAUSTED: while allocating tuple"))
        assert not PosePipeline._is_oom(ValueError(
            "RESOURCE_EXHAUSTED: not an XLA error type"))


class TestGeometricChain:
    def test_planted_pose_recovered(self):
        """Project keypoints under a known pose, paint heatmaps in crop
        space, then decode -> invert -> PnP must recover the pose."""
        rng = np.random.default_rng(7)
        n_kp = 50
        kp3d = rng.standard_normal((n_kp, 3)) * 0.04
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = np.array([0.02, -0.01, 0.8])
        pc = kp3d @ q.T + t
        uv = (CAM_K @ pc.T).T
        uv = uv[:, :2] / uv[:, 2:3]                      # image-space kp

        # box around the keypoints, expanded like the pipeline would
        x1, y1 = uv.min(axis=0) - 10
        x2, y2 = uv.max(axis=0) + 10
        ul, br = image_ops.expand_boxes(
            jnp.asarray([[x1, y1, x2, y2]]), 480, 640)

        inp_h, inp_w, out_h, out_w = 320, 256, 80, 64
        # forward transform: image -> heatmap coords (inverse of
        # transform_box_invert); derive from the same geometry
        uln = np.asarray(ul[0])
        brn = np.asarray(br[0])
        center = (brn - 1 - uln) / 2
        size_h = max(brn[1] - uln[1], (brn[0] - uln[0]) * inp_h / inp_w)
        len_w = size_h * inp_w / inp_h
        off_x = max(0.0, (len_w - 1) / 2 - center[0])
        off_y = max(0.0, (size_h - 1) / 2 - center[1])
        hm_xy = np.stack([
            (uv[:, 0] - uln[0] + off_x) * out_h / size_h,
            (uv[:, 1] - uln[1] + off_y) * out_h / size_h], axis=1)

        hms = np.asarray(hm_ops.draw_gaussian_batch(
            jnp.asarray(hm_xy[None]), out_h, out_w, sigma=1))

        preds, preds_img, maxval = hm_ops.decode_heatmaps(
            jnp.asarray(hms), ul, br, inp_h, inp_w, out_h, out_w)
        kp2d = np.asarray(preds_img[0])

        # peak quantization ~ size_h/out_h px; keep only in-map keypoints
        vis = np.asarray(maxval[0, :, 0]) > 0.5
        assert vis.sum() >= 20
        R_est, t_est = pnp_ops.solve_pnp(
            jnp.asarray(kp3d[vis]), jnp.asarray(kp2d[vis]),
            jnp.asarray(CAM_K))
        from betapose_tpu.geometry import metrics
        pose_gt = np.eye(4)
        pose_gt[:3, :3] = q
        pose_gt[:3, 3] = t
        pose_est = np.eye(4)
        pose_est[:3, :3] = np.asarray(R_est)
        pose_est[:3, 3] = np.asarray(t_est)
        add_mm = metrics.add_err(pose_gt, pose_est, kp3d) * 1000
        # quantization-limited; LineMod ADD threshold is diameter/10 (~10mm)
        assert add_mm < 8.0, add_mm


class TestResultsJson:
    def test_schema(self, tmp_path):
        rng = np.random.default_rng(0)
        frame = results_mod.make_frame_result(
            "0001.png",
            [{"bbox": np.array([1.0, 2, 3, 4]),
              "keypoints": rng.random((50, 2)),
              "kp_score": rng.random((50, 1)),
              "proposal_score": 2.5}],
            rng.random((3, 3)), rng.random((3, 1)))
        out = results_mod.write_json([frame], str(tmp_path))
        data = json.load(open(out))
        assert len(data) == 1
        r = data[0]
        assert r["image_id"] == "0001.png"
        assert len(r["cam_R"]) == 9
        assert len(r["cam_t"]) == 3
        assert len(r["keypoints"]) == 150
        assert abs(r["score"] - 2.5) < 1e-9

    def test_cmu_format(self, tmp_path):
        rng = np.random.default_rng(1)
        frame = results_mod.make_frame_result(
            "0002.png",
            [{"bbox": np.zeros(4), "keypoints": rng.random((50, 2)),
              "kp_score": rng.random((50, 1)), "proposal_score": 1.0}],
            rng.random((3, 3)), rng.random((3, 1)))
        out = results_mod.write_json([frame], str(tmp_path), form="cmu")
        data = json.load(open(out))
        assert "0002.png" in data
        assert data["0002.png"]["version"] == "Betapose v1.0"
        assert len(data["0002.png"]["bodies"][0]["joints"]) == 18 * 3
        assert os.path.exists(tmp_path / "sep-json" / "0002.json")


class TestMultiCandidate:
    """Capacity-N detection feeding the FULL parametric pose-NMS
    (`pPose_nms.py:24-122`): the `while human_scores` clustering loop runs
    with n>1 inside an eval-shaped flow (VERDICT: candidate clusters in
    crowded/occlusion scenes)."""

    def _pipe(self, capacity, host=True):
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16, out_w=12,
                             n_kp=6, confidence=0.0,  # every box passes
                             left_keypoints=6, compute_dtype="float32",
                             det_capacity=capacity, host_pose_nms=host)
        return PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)

    def test_device_matches_host_clustering(self):
        """The fused on-device pose-NMS path (default) must produce the
        same winning proposals/poses as the reference-style host clustering
        loop over the same candidate sets."""
        host = self._pipe(capacity=3, host=True)
        dev = self._pipe(capacity=3, host=False)
        frames = np.random.default_rng(3).integers(
            0, 255, (4, 120, 160, 3), dtype=np.uint8)
        oh = {k: np.asarray(v) for k, v in host(frames).items()}
        od = {k: np.asarray(v) for k, v in dev(frames).items()}
        assert oh["pose_valid"].shape == od["pose_valid"].shape
        np.testing.assert_array_equal(oh["pose_valid"], od["pose_valid"])
        np.testing.assert_array_equal(oh["det_valid"], od["det_valid"])
        for k, atol in [("keypoints", 1e-2), ("kp_scores", 1e-4),
                        ("proposal_score", 1e-3), ("boxes", 1e-2),
                        ("obj_score", 1e-4)]:
            np.testing.assert_allclose(oh[k], od[k], rtol=1e-3, atol=atol,
                                       err_msg=k)
        # poses from the same selected keypoints: compare in metric space
        for i in range(len(frames)):
            if oh["pose_valid"][i]:
                np.testing.assert_allclose(oh["cam_t"][i], od["cam_t"][i],
                                           rtol=1e-2, atol=1e-3)

    def test_cluster_loop_runs_with_n_gt_1(self, monkeypatch):
        from betapose_tpu.ops import pose_nms as pnms
        seen_n = []
        real = pnms.pose_nms

        def spy(bboxes, bbox_scores, pose_preds, pose_scores, **kw):
            seen_n.append(len(np.asarray(bboxes)))
            return real(bboxes, bbox_scores, pose_preds, pose_scores, **kw)

        import betapose_tpu.eval.pipeline as pipe_mod
        monkeypatch.setattr(pipe_mod.pnms, "pose_nms", spy)

        pipe = self._pipe(capacity=3)
        frames = np.random.default_rng(2).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        out = pipe(frames)
        # confidence=0 + single class -> all 3 candidate slots valid
        assert seen_n and max(seen_n) > 1
        assert out["boxes"].shape == (2, 4)
        assert out["keypoints"].shape == (2, 6, 2)
        assert out["kp_scores"].shape == (2, 6)
        assert out["cam_R"].shape == (2, 3, 3)
        assert out["cam_t"].shape == (2, 3)
        assert np.asarray(out["det_valid"]).all()

    def test_identical_cluster_merges_to_candidate(self):
        """Three identical high-score candidates must merge to the candidate
        pose itself (+ the reference -0.3 offset) with one proposal."""
        pipe = self._pipe(capacity=3)
        rng = np.random.default_rng(5)
        kp = rng.uniform(20, 90, (6, 2)).astype(np.float32)
        cand = {
            "boxes": np.tile(np.array([10, 10, 110, 120], np.float32),
                             (1, 3, 1)),
            "obj_score": np.full((1, 3), 0.7, np.float32),
            "det_valid": np.ones((1, 3), bool),
            "kp2d": np.tile(kp[None, None], (1, 3, 1, 1)),
            "kp_scores": np.full((1, 3, 6), 0.9, np.float32),
        }
        out = pipe._host_pose_nms(cand)
        assert bool(np.asarray(out["pose_valid"])[0])
        np.testing.assert_allclose(np.asarray(out["keypoints"][0]),
                                   kp - 0.3, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["kp_scores"][0]), 0.9,
                                   rtol=1e-5)
        # proposal = mean + bbox + 1.25*max (pPose_nms.py:111-115)
        np.testing.assert_allclose(float(out["proposal_score"][0]),
                                   0.9 + 0.7 + 1.25 * 0.9, rtol=1e-5)

    def test_low_scores_yield_invalid_pose(self):
        pipe = self._pipe(capacity=2)
        cand = {
            "boxes": np.tile(np.array([10, 10, 110, 120], np.float32),
                             (1, 2, 1)),
            "obj_score": np.full((1, 2), 0.7, np.float32),
            "det_valid": np.ones((1, 2), bool),
            "kp2d": np.zeros((1, 2, 6, 2), np.float32),
            "kp_scores": np.full((1, 2, 6), 0.1, np.float32),  # < scoreThreds
        }
        out = pipe._host_pose_nms(cand)
        assert not bool(np.asarray(out["pose_valid"])[0])


class TestPreprocParity:
    """The letterbox-vs-stretch question (VERDICT r4 #6), pinned at the
    pipeline level.

    Reference facts (file:line):
    - the detector TRAINS on plain stretch: `train_YOLO/src/data.c:850`
      resize_image(cropped, w, h) — no letterbox at train time;
    - the eval IMAGE path letterboxes the input (`yolo/preprocess.py:19-44`
      prep_image -> letterbox_image) but back-maps boxes with STRETCH
      ratios w/reso, h/reso (`dataloader.py:355-364`) — the correct
      letterbox inverse sits commented out directly below (:366-379);
    - the VIDEO path uses the correct letterbox inverse
      (`dataloader.py:552-558`).

    So the reference's headline eval path is geometrically inconsistent
    (letterbox in, stretch out) — a train/test mismatch whose error
    cancels exactly at the image center and grows linearly off-center.
    This framework's `preproc` modes are each SELF-consistent; `stretch`
    (the default) matches both the training geometry and what the live
    back-mapping assumes.  These tests pin all three statements.
    """

    def _det_stage(self, preproc):
        from betapose_tpu.eval.pipeline import make_det_stage, PipelineConfig
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16,
                             out_w=12, n_kp=6, confidence=0.0,
                             preproc=preproc, compute_dtype="float32")
        return spec, params, jax.jit(make_det_stage(spec, cfg)), cfg

    def test_letterbox_path_self_consistent(self):
        """Feeding the pipeline an anisotropic frame under
        preproc='letterbox' must equal hand-letterboxing the frame,
        detecting on the square canvas, and applying the reference's
        CORRECT inverse (the dataloader.py:552-558 video formula),
        transcribed here independently."""
        spec, params, det_lb, cfg = self._det_stage("letterbox")
        _, _, det_sq, _ = self._det_stage("stretch")
        rng = np.random.default_rng(3)
        frame = rng.integers(0, 255, (1, 60, 96, 3), dtype=np.uint8)

        out_lb = det_lb(params, jnp.asarray(frame))
        box_lb = np.asarray(out_lb["boxes"])[0]

        # hand path: letterbox to the square canvas, detect with the
        # stretch stage (resize reso->reso is identity), map back
        canvas = np.asarray(image_ops.letterbox(
            jnp.asarray(frame, jnp.float32), cfg.reso, cfg.reso))
        out_sq = det_sq(params, jnp.asarray(canvas))
        box_sq = np.asarray(out_sq["boxes"])[0]
        # boxes from the square canvas come back scaled by w0/reso = 1
        w0, h0 = 96, 60
        scale = min(cfg.reso / w0, cfg.reso / h0)
        off_x = (cfg.reso - np.floor(w0 * scale)) // 2
        off_y = (cfg.reso - np.floor(h0 * scale)) // 2
        want = np.array([(box_sq[0] - off_x) / scale,
                         (box_sq[1] - off_y) / scale,
                         (box_sq[2] - off_x) / scale,
                         (box_sq[3] - off_y) / scale])
        np.testing.assert_allclose(box_lb, want, rtol=1e-4, atol=1e-3)

    def test_stretch_path_self_consistent(self):
        """Stretch in -> stretch ratios out: a box at canvas coords maps
        back by w0/reso, h0/reso exactly (the reference's live
        dataloader.py:355-364 mapping, correct when the input really was
        stretched)."""
        spec, params, det_st, cfg = self._det_stage("stretch")
        _, _, det_sq, _ = self._det_stage("stretch")
        rng = np.random.default_rng(4)
        frame = rng.integers(0, 255, (1, 60, 96, 3), dtype=np.uint8)
        out_st = det_st(params, jnp.asarray(frame))
        box_st = np.asarray(out_st["boxes"])[0]

        canvas = np.asarray(image_ops.resize_bilinear_matmul(
            jnp.asarray(frame, jnp.float32), cfg.reso, cfg.reso))
        out_sq = det_sq(params, jnp.asarray(canvas))
        box_sq = np.asarray(out_sq["boxes"])[0]
        want = box_sq * np.array([96 / cfg.reso, 60 / cfg.reso,
                                  96 / cfg.reso, 60 / cfg.reso])
        np.testing.assert_allclose(box_st, want, rtol=1e-4, atol=1e-3)

    def test_reference_image_path_combination_distorts_off_center(self):
        """The reference combination (letterbox in, stretch map out) as
        pure geometry: a ground-truth point at original-image y maps to
        y' = (off_y + scale*y) * h0/reso.  At the vertical center the
        error is ~0 (the cancellation that lets the reference work);
        off-center it grows linearly.  640x480 @ reso 416: center error
        < 1 px, y=100 error = +35 px.  This is why `stretch` (train-time
        geometry, data.c:850) is this framework's default rather than a
        faithful transcription of the eval path's mismatch."""
        w0, h0, reso = 640.0, 480.0, 416.0
        scale = min(reso / w0, reso / h0)
        off_y = (reso - np.floor(h0 * scale)) // 2

        def ref_roundtrip(y):
            return (off_y + scale * y) * h0 / reso

        assert abs(ref_roundtrip(240.0) - 240.0) < 1.0
        assert abs(ref_roundtrip(100.0) - 100.0) > 30.0
        assert abs(ref_roundtrip(380.0) - 380.0) > 30.0


class TestPnpLeverKnobs:
    """pnp_spread_power / pnp_depth_prior plumbed through both post
    stages (capacity-1 and the fused multi-candidate device path)."""

    def _pipe(self, **kw):
        spec = yolo_mod.build_spec(TINY_YOLO_CFG)
        yolo_params = yolo_mod.fold_bn(
            spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
        kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=6,
                                         arch="resnet50")
        kp3d = np.random.default_rng(0).standard_normal((6, 3)) * 0.05
        cfg = PipelineConfig(reso=96, inp_h=64, inp_w=48, out_h=16,
                             out_w=12, n_kp=6, confidence=0.01,
                             compute_dtype="float32", **kw)
        return PosePipeline(spec, yolo_params, kpd_params, kp3d, CAM_K, cfg)

    @pytest.mark.parametrize("cap", [1, 3])
    def test_knobs_run_and_stay_finite(self, cap):
        pipe = self._pipe(det_capacity=cap, pnp_robust_rounds=1,
                          pnp_score_power=4.0, pnp_spread_power=1.0,
                          pnp_depth_prior=0.5, left_keypoints=5)
        frames = np.random.default_rng(2).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        out = pipe(frames)
        assert np.isfinite(np.asarray(out["cam_t"])).all()
        assert np.isfinite(np.asarray(out["cam_R"])).all()
        assert out["keypoints"].shape == (2, 6, 2)

    def test_zero_knobs_match_previous_defaults(self):
        """spread_power=0 / depth_prior=0 must not change the default
        path's outputs (the zeros are never consumed)."""
        frames = np.random.default_rng(3).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        a = self._pipe(det_capacity=3, pnp_robust_rounds=1,
                       pnp_score_power=4.0)(frames)
        b = self._pipe(det_capacity=3, pnp_robust_rounds=1,
                       pnp_score_power=4.0, pnp_spread_power=0.0,
                       pnp_depth_prior=0.0)(frames)
        for k in ("cam_R", "cam_t", "keypoints", "kp_scores"):
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))

    def test_host_mode_rejects_spread_but_takes_depth_prior(self):
        frames = np.random.default_rng(5).integers(
            0, 255, (2, 120, 160, 3), dtype=np.uint8)
        pipe = self._pipe(det_capacity=3, host_pose_nms=True,
                          pnp_spread_power=1.0)
        with pytest.raises(ValueError, match="host_pose_nms"):
            pipe(frames)
        out = self._pipe(det_capacity=3, host_pose_nms=True,
                         pnp_depth_prior=0.5)(frames)
        assert np.isfinite(np.asarray(out["cam_t"])).all()
