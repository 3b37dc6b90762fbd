"""Device pose-NMS (`ops.pnms.pose_nms_device`) parity vs the host
clustering loop (`ops.pose_nms.pose_nms`, the transcription of reference
`pPose_nms.py:24-122`): same winning proposal, keypoints, scores, and
candidate attribution on random crowded candidate sets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from betapose_tpu.ops import pose_nms as pnms


def _host_best(bboxes, bscores, preds, scores, valid):
    """What the pipeline's host path computes per frame: full pose_nms over
    the valid candidates, then the max-proposal survivor."""
    v = np.asarray(valid, bool)
    if not v.any():
        return None
    results = pnms.pose_nms(
        np.asarray(bboxes)[v], np.asarray(bscores)[v],
        np.asarray(preds)[v], np.asarray(scores)[v][..., None])
    if not results:
        return None
    return max(results, key=lambda r: r["proposal_score"])


def _random_candidates(rng, n, k, n_valid=None, cluster=True):
    """Candidate set shaped like real detections: clustered poses around a
    few modes so the NMS delete/merge logic actually fires."""
    n_valid = n if n_valid is None else n_valid
    centers = rng.uniform(100, 500, (2, 2))
    preds = np.zeros((n, k, 2), np.float32)
    base_kp = rng.uniform(-40, 40, (k, 2))
    for i in range(n):
        c = centers[i % 2] if cluster else rng.uniform(100, 500, 2)
        jitter = rng.normal(0, 2.0, (k, 2))
        preds[i] = c + base_kp + jitter
    scores = rng.uniform(0.05, 0.95, (n, k)).astype(np.float32)
    bboxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        lo = preds[i].min(0) - rng.uniform(5, 20, 2)
        hi = preds[i].max(0) + rng.uniform(5, 20, 2)
        bboxes[i] = [lo[0], lo[1], hi[0], hi[1]]
    bscores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return bboxes, bscores, preds, scores, valid


class TestPoseNmsDevice:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("n,k", [(4, 50), (8, 50), (3, 26)])
    def test_matches_host_loop(self, seed, n, k):
        rng = np.random.default_rng(seed)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, n, k, cluster=seed % 2 == 0)
        kp, sc, prop, pbox, pobj, ok = jax.jit(pnms.pose_nms_device)(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        best = _host_best(bboxes, bscores, preds, scores, valid)
        assert best is not None and bool(ok)
        np.testing.assert_allclose(np.asarray(kp), best["keypoints"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sc), best["kp_score"][:, 0],
                                   rtol=1e-4, atol=1e-4)
        assert float(prop) == pytest.approx(best["proposal_score"], rel=1e-4)
        np.testing.assert_allclose(np.asarray(pbox), best["pick_bbox"],
                                   rtol=1e-5)
        assert float(pobj) == pytest.approx(best["bbox_score"], rel=1e-5)

    def test_invalid_slots_excluded(self):
        """Padded detection slots must not be picked, merged into the
        cluster, or affect attribution."""
        rng = np.random.default_rng(7)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, 6, 50, n_valid=3)
        # give an INVALID slot the best scores — it must still be ignored
        scores[4] = 0.99
        bscores[4] = 1.0
        kp, sc, prop, pbox, pobj, ok = pnms.pose_nms_device(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        best = _host_best(bboxes, bscores, preds, scores, valid)
        assert best is not None and bool(ok)
        np.testing.assert_allclose(np.asarray(kp), best["keypoints"],
                                   rtol=1e-4, atol=1e-3)
        assert float(prop) == pytest.approx(best["proposal_score"], rel=1e-4)

    def test_all_invalid(self):
        rng = np.random.default_rng(8)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, 4, 50, n_valid=0)
        *_, ok = pnms.pose_nms_device(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        assert not bool(ok)

    def test_all_below_score_thresh(self):
        """scoreThreds=0.3 filter (pPose_nms.py:102): every candidate's max
        kp score below 0.3 -> no surviving proposal, same as host."""
        rng = np.random.default_rng(9)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, 4, 50)
        scores[:] = rng.uniform(0.01, 0.25, scores.shape)
        *_, ok = pnms.pose_nms_device(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        assert _host_best(bboxes, bscores, preds, scores, valid) is None
        assert not bool(ok)

    def test_zero_scores_replaced(self):
        """pose_scores==0 -> 1e-5 replacement (pPose_nms.py:40) must match."""
        rng = np.random.default_rng(10)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, 4, 50)
        scores[:, ::3] = 0.0
        kp, sc, prop, *_rest, ok = pnms.pose_nms_device(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        best = _host_best(bboxes, bscores, preds, scores, valid)
        assert best is not None and bool(ok)
        np.testing.assert_allclose(np.asarray(sc), best["kp_score"][:, 0],
                                   rtol=1e-4, atol=1e-4)
        assert float(prop) == pytest.approx(best["proposal_score"], rel=1e-4)

    def test_far_apart_candidates_both_survive(self):
        """Two distinct far-apart poses: NMS keeps both picks; device
        returns the higher-proposal one — must equal the host's best."""
        rng = np.random.default_rng(11)
        bboxes, bscores, preds, scores, valid = _random_candidates(
            rng, 4, 50, cluster=False)
        kp, sc, prop, pbox, pobj, ok = pnms.pose_nms_device(
            jnp.asarray(bboxes), jnp.asarray(bscores), jnp.asarray(preds),
            jnp.asarray(scores), jnp.asarray(valid))
        # sanity: the host loop really produced >1 surviving proposal
        results = pnms.pose_nms(bboxes, bscores, preds, scores[..., None])
        assert len(results) > 1
        best = max(results, key=lambda r: r["proposal_score"])
        assert bool(ok)
        assert float(prop) == pytest.approx(best["proposal_score"], rel=1e-4)
        np.testing.assert_allclose(np.asarray(pbox), best["pick_bbox"],
                                   rtol=1e-5)

    def test_vmap_batch(self):
        """vmaps cleanly over a frame batch (how the pipeline uses it)."""
        rng = np.random.default_rng(12)
        frames = [_random_candidates(rng, 4, 26) for _ in range(3)]
        stack = [jnp.asarray(np.stack([f[i] for f in frames]))
                 for i in range(5)]
        kp, sc, prop, pbox, pobj, ok = jax.vmap(pnms.pose_nms_device)(*stack)
        assert kp.shape == (3, 26, 2) and prop.shape == (3,)
        for b in range(3):
            best = _host_best(*frames[b])
            assert best is not None and bool(ok[b])
            assert float(prop[b]) == pytest.approx(
                best["proposal_score"], rel=1e-4)


class TestExtraMerge:
    """The optional per-keypoint `extra` channel rides the identical
    score-weighted merge as the coordinates (used to carry heatmap
    concentration to the PnP weighting)."""

    def _rand_candidates(self, seed=0, n=5, k=8):
        rng = np.random.default_rng(seed)
        base = rng.uniform(40, 80, (1, k, 2)).astype(np.float32)
        preds = base + rng.normal(0, 2.0, (n, k, 2)).astype(np.float32)
        scores = rng.uniform(0.3, 0.9, (n, k)).astype(np.float32)
        boxes = np.tile(np.array([30, 30, 95, 95], np.float32), (n, 1))
        boxes += rng.normal(0, 1.5, (n, 4)).astype(np.float32)
        bscores = rng.uniform(0.5, 1.0, n).astype(np.float32)
        valid = np.ones(n, bool)
        return boxes, bscores, preds, scores, valid

    def test_default_path_unchanged(self):
        import jax.numpy as jnp
        args = tuple(jnp.asarray(a) for a in self._rand_candidates())
        out = pnms.pose_nms_device(*args)
        assert len(out) == 6

    def test_extra_equal_scores_merges_to_kp_score(self):
        """With extra == scores, the merged extra must equal the merged
        kp_score (both reduce to sum(mask*s^2)/sum(mask*s) since the
        merge mask is 0/1)."""
        import jax.numpy as jnp
        args = tuple(jnp.asarray(a) for a in self._rand_candidates(3))
        out = pnms.pose_nms_device(*args, extra=args[3])
        assert len(out) == 7
        kp_score, merged_extra = np.asarray(out[1]), np.asarray(out[6])
        np.testing.assert_allclose(merged_extra, kp_score,
                                   rtol=1e-5, atol=1e-6)
        # and the first six outputs are identical to the default path
        base = pnms.pose_nms_device(*args)
        for a, b in zip(base, out[:6]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_constant_extra_survives_merge(self):
        """A constant statistic must come out constant (the merge weights
        normalize to 1 wherever any candidate merges)."""
        import jax.numpy as jnp
        args = tuple(jnp.asarray(a) for a in self._rand_candidates(7))
        const = jnp.full(args[3].shape, 0.37)
        out = pnms.pose_nms_device(*args, extra=const)
        np.testing.assert_allclose(np.asarray(out[6]), 0.37, rtol=1e-5)
