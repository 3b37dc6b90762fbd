"""Fused 6D-pose inference pipeline.

The reference runs a 4-process host pipeline with CPU<->GPU round-trips
between every stage (ImageLoader -> DetectionLoader -> DetectionProcessor ->
main loop -> DataWriter, `dataloader.py:90-763`).  Here the ENTIRE chain

    frames(uint8) -> resize -> YOLOv3 -> best-box -> expand -> affine-crop
    -> KPD heatmaps -> peak decode+refine -> pose score/offsets -> top-k
    keypoint selection -> batched PnP -> (R, t)

is ONE jit'd XLA computation per batch: no host round-trips, static shapes
(capacity-1 detection per frame — the reference's best-box postprocessing
keeps at most one box per frame anyway, `yolo/util.py:210-211`), bfloat16 on
the conv paths with float32 decode/PnP.  Host code only decodes PNGs and
feeds batches (double-buffered via JAX async dispatch).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.ops import boxes as box_ops
from betapose_tpu.ops import image as image_ops
from betapose_tpu.ops import heatmap as hm_ops
from betapose_tpu.ops import pose_nms as pnms
from betapose_tpu.ops import pnp as pnp_ops


@dataclasses.dataclass
class PipelineConfig:
    reso: int = 416                 # YOLO input
    inp_h: int = 320                # KPD crop
    inp_w: int = 256
    out_h: int = 80                 # KPD heatmap
    out_w: int = 64
    n_kp: int = 50
    confidence: float = 0.01        # objectness threshold (opt.py:126)
    left_keypoints: int = 50        # keypoints fed to PnP (dataloader.py:718)
    preproc: str = "stretch"        # 'stretch' | 'letterbox'
    target_class: int = 0
    compute_dtype: str = "bfloat16"  # conv-path dtype
    s2d_stem: bool = True           # exact space-to-depth stem rewrite
    pnp_iters: int = 12             # LM refinement steps
    pnp_robust_rounds: int = 0      # >0: trimmed-IRLS robust PnP (extension;
    #                               # 0 = cv2.solvePnP-parity least squares)
    pnp_score_power: float = 0.0    # >0: weight each PnP correspondence by
    #                               # clip(kp_score,0)**power (soft down-
    #                               # weighting of low-confidence keypoints;
    #                               # extension beyond the reference's hard
    #                               # top-k pruning, dataloader.py:718-724 —
    #                               # on the occlusion selftest tier power=4
    #                               # lifts ADD<0.1d from 0.69 to 0.88)
    pnp_spread_power: float = 0.0   # >0: multiply PnP weights by
    #                               # heatmap_concentration**power — a
    #                               # peak-SHAPE confidence (a hedging /
    #                               # multimodal response is down-weighted
    #                               # even when its peak VALUE is high);
    #                               # rides the pose-NMS merge like the
    #                               # coordinates do
    pnp_depth_prior: float = 0.0    # >0: soft LM prior pulling t_z toward
    #                               # f * kp-cloud diameter / max(box_w,
    #                               # box_h) with this weight (relative-
    #                               # depth residual; see ops/pnp.py)
    pallas_decode: bool | None = None  # None = auto (TPU backend only)
    det_capacity: int = 1           # boxes/frame; >1 = multi-candidate mode
    nms_thresh: float = 0.4         # greedy-NMS IoU (multi-candidate only)
    host_pose_nms: bool = False     # multi-candidate only: True = reference-
    #                               # style host clustering loop; False =
    #                               # fused fixed-trip device pose-NMS
    flip_tta: bool = False          # --fast_inference False: average KPD
    #                               # heatmaps with the horizontal mirror
    #                               # (reference InferenNet semantics —
    #                               # betapose_evaluate.py:125-130; its own
    #                               # class never shipped)
    net_type: str = "resnet101"     # pose backbone: FastPose resnet50/101
    #                               # (arch lives in the param tree) or
    #                               # 'hgPRM' — the PyraNet the reference
    #                               # intended to serve (--netType hgPRM,
    #                               # PyraNet_Inference hgPRM.py:144) but
    #                               # shipped broken; served for real here


def make_det_stage(yolo_spec, cfg: PipelineConfig):
    """Stage 1 — detection + crop: frames -> boxes + KPD crops.

    Covers the reference's DetectionLoader + DetectionProcessor (the 'dt'
    profiling bucket, `betapose_evaluate.py:132-136`)."""
    cdtype = jnp.dtype(cfg.compute_dtype)

    def det_stage(yolo_params, frames):
        _, h0, w0, _ = frames.shape
        # the resampled PIXELS feed bfloat16 convs, so cast uint8 straight
        # to the compute dtype (0..255 are exactly representable in bf16;
        # skips a full-res f32 materialization) — box/crop COORDINATES
        # stay float32 throughout (imgs_c only carries image data)
        imgs_c = frames.astype(cdtype) / jnp.asarray(255.0, cdtype)

        if cfg.preproc == "stretch":
            yolo_in = image_ops.resize_bilinear_matmul(
                imgs_c, cfg.reso, cfg.reso)
        else:
            imgs = frames.astype(jnp.float32) / 255.0      # RGB [0,1]
            yolo_in = image_ops.letterbox(
                imgs * 255.0, cfg.reso, cfg.reso).astype(cdtype) / 255.0
        if cfg.s2d_stem:
            from betapose_tpu.models.stem_s2d import forward_with_s2d_stem
            dets = forward_with_s2d_stem(
                yolo_spec, yolo_params, yolo_in, cfg.reso)
        else:
            dets = yolo_mod.forward(
                yolo_spec, yolo_params, yolo_in, cfg.reso)
        if cfg.det_capacity > 1:
            # ---- multi-candidate: up to N greedy-NMS'd boxes per frame ----
            cand = box_ops.top_boxes(
                dets, cfg.confidence, cfg.target_class,
                capacity=cfg.det_capacity, nms_thresh=cfg.nms_thresh,
                prefilter=max(64, cfg.det_capacity * 8))
            if cfg.preproc == "stretch":
                boxes = box_ops.rescale_boxes(cand["boxes"], w0, h0, cfg.reso)
            else:
                boxes = box_ops.unletterbox_boxes(
                    cand["boxes"], w0, h0, cfg.reso)

            def crop_frame(img, fboxes):
                return image_ops.crop_from_dets(
                    img, fboxes, cfg.inp_h, cfg.inp_w)

            crops, pt1, pt2 = jax.vmap(crop_frame)(imgs_c, boxes)  # [B,N,..]
            bn = crops.shape[0] * crops.shape[1]
            return {"boxes": boxes, "obj_score": cand["obj_score"],
                    "det_valid": cand["valid"],
                    "crops": crops.reshape((bn,) + crops.shape[2:]),
                    "pt1": pt1.reshape(bn, 2), "pt2": pt2.reshape(bn, 2)}

        best = box_ops.best_box(dets, cfg.confidence, cfg.target_class)
        if cfg.preproc == "stretch":
            boxes = box_ops.rescale_boxes(best["boxes"], w0, h0, cfg.reso)
        else:
            boxes = box_ops.unletterbox_boxes(best["boxes"], w0, h0, cfg.reso)

        # ---- crop (capacity 1 box/frame) ----
        def crop_one(img, box):
            crops, pt1, pt2 = image_ops.crop_from_dets(
                img, box[None, :], cfg.inp_h, cfg.inp_w)
            return crops[0], pt1[0], pt2[0]

        crops, pt1, pt2 = jax.vmap(crop_one)(imgs_c, boxes)
        return {"boxes": boxes, "obj_score": best["obj_score"],
                "det_valid": best["valid"], "crops": crops,
                "pt1": pt1, "pt2": pt2}

    return det_stage


def make_pose_stage(cfg: PipelineConfig):
    """Stage 2 — KPD heatmap inference (the 'pt' bucket)."""
    cdtype = jnp.dtype(cfg.compute_dtype)

    if cfg.net_type == "hgPRM":
        from betapose_tpu.models import hgprm

        def net_fwd(kpd_params, x):
            # PyraNet runs float32 (its BN/pyramid pooling chain was never
            # bf16-tuned; FastPose is the perf path — hgPRM is capability)
            return hgprm.forward(kpd_params, x.astype(jnp.float32))
    else:
        def net_fwd(kpd_params, x):
            # (KPD's 7x7/2 stem measured no faster via s2d — XLA already
            # handles it; the transform stays available in models/kpd.py)
            return kpd_mod.forward(kpd_params, x.astype(cdtype))

    def pose_stage(kpd_params, crops):
        hm_nhwc = net_fwd(kpd_params, crops)
        if cfg.flip_tta:
            # InferenNet flip-TTA inside the same fused graph: mirrored
            # forward, un-mirror, average.  LineMod keypoints carry no
            # left/right channel semantics (flipRef is empty,
            # `dataloader.py:790`), so no channel shuffle.
            hm_f = net_fwd(kpd_params, crops[:, :, ::-1, :])
            hm_nhwc = (hm_nhwc + hm_f[:, :, ::-1, :]) / 2.0
        return hm_nhwc.astype(jnp.float32).transpose(0, 3, 1, 2)  # [B,K,H,W]

    return pose_stage


def _pnp_one(cfg: PipelineConfig, p3, p2, cam_K, sc=None, spread=None,
             box=None, diameter=None):
    """PnP for one frame per cfg: least-squares (reference cv2.solvePnP
    semantics), the trimmed-IRLS robust extension, keypoint-score and/or
    peak-shape confidence weighting (cfg.pnp_score_power /
    cfg.pnp_spread_power), and the bbox-scale depth prior
    (cfg.pnp_depth_prior)."""
    w = None
    if cfg.pnp_score_power > 0 and sc is not None:
        w = jnp.clip(sc, 0.0) ** cfg.pnp_score_power
    if cfg.pnp_spread_power > 0 and spread is not None:
        ws = jnp.clip(spread, 0.0) ** cfg.pnp_spread_power
        w = ws if w is None else w * ws
    z_prior, z_lambda = None, 0.0
    if cfg.pnp_depth_prior > 0 and box is not None and diameter is not None:
        size_px = jnp.maximum(box[2] - box[0], box[3] - box[1])
        f = (cam_K[0, 0] + cam_K[1, 1]) * 0.5
        z_prior = f * diameter / jnp.maximum(size_px, 1.0)
        z_lambda = cfg.pnp_depth_prior
    if w is not None or z_prior is not None:
        return pnp_ops.solve_pnp_robust(p3, p2, cam_K, iters=cfg.pnp_iters,
                                        rounds=cfg.pnp_robust_rounds, w=w,
                                        z_prior=z_prior, z_lambda=z_lambda)
    if cfg.pnp_robust_rounds > 0:
        return pnp_ops.solve_pnp_robust(p3, p2, cam_K, iters=cfg.pnp_iters,
                                        rounds=cfg.pnp_robust_rounds)
    return pnp_ops.solve_pnp(p3, p2, cam_K, iters=cfg.pnp_iters)


def _kp_cloud_diameter(kp3d):
    """Max pairwise distance of the keypoint model cloud — the scale the
    bbox-size depth prior converts pixels to meters with (K^2 elementwise,
    K <= 50)."""
    d2 = jnp.sum((kp3d[:, None] - kp3d[None]) ** 2, axis=-1)
    return jnp.sqrt(jnp.max(d2))


def _decode_crops(cfg: PipelineConfig, hm, pt1, pt2):
    """Shared heatmap-peak decode (crop -> image coords), with the
    pallas auto-gate resolved in ONE place for both pipeline modes."""
    use_pallas = cfg.pallas_decode
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return hm_ops.decode_heatmaps(
        hm, pt1, pt2, cfg.inp_h, cfg.inp_w, cfg.out_h, cfg.out_w,
        use_pallas=use_pallas)


def make_post_stage(cfg: PipelineConfig):
    """Stage 3 — decode + pose-NMS + keypoint pruning + PnP (the 'pn'
    bucket; the reference's DataWriter.update chain)."""

    def post_stage(hm, det, kp3d, cam_K):
        b = hm.shape[0]
        preds_hm, preds_img, maxval = _decode_crops(
            cfg, hm, det["pt1"], det["pt2"])

        def nms_one(box, obj_score, kp, sc):
            return pnms.pose_nms_single(box, obj_score, kp, sc)

        keypoints, kp_scores, proposal, nms_valid = jax.vmap(nms_one)(
            det["boxes"], det["obj_score"], preds_img, maxval)
        spread = (hm_ops.heatmap_concentration(hm)
                  if cfg.pnp_spread_power > 0 else jnp.zeros_like(kp_scores))

        # ---- keypoint pruning to left_keypoints (dataloader.py:718-724) ----
        if cfg.left_keypoints < cfg.n_kp:
            top_sc, top_idx = jax.lax.top_k(kp_scores, cfg.left_keypoints)
            kp2d_sel = jnp.take_along_axis(
                keypoints, top_idx[..., None], axis=1)
            kp3d_sel = kp3d[top_idx]                      # [B, L, 3]
            sc_sel = top_sc
            spread_sel = jnp.take_along_axis(spread, top_idx, axis=1)
        else:
            kp2d_sel = keypoints
            kp3d_sel = jnp.broadcast_to(
                kp3d[None], (b,) + kp3d.shape)
            sc_sel = kp_scores
            spread_sel = spread

        # ---- PnP ----
        diam = _kp_cloud_diameter(kp3d)
        R, t = jax.vmap(
            lambda p3, p2, s, sp, bx: _pnp_one(cfg, p3, p2, cam_K, s,
                                               sp, bx, diam))(
            kp3d_sel, kp2d_sel, sc_sel, spread_sel, det["boxes"])

        return {
            "boxes": det["boxes"],                # [B,4] xyxy image coords
            "obj_score": det["obj_score"],        # [B]
            "det_valid": det["det_valid"],        # [B]
            "keypoints": keypoints,               # [B,K,2] (-0.3 offset applied)
            "kp_scores": kp_scores,               # [B,K]
            "proposal_score": proposal,           # [B]
            "pose_valid": det["det_valid"] & nms_valid,
            "cam_R": R,                           # [B,3,3]
            "cam_t": t,                           # [B,3]
        }

    return post_stage


def make_multi_post_stage(cfg: PipelineConfig):
    """Stage 3 for det_capacity > 1 fused mode: decode + DEVICE pose-NMS +
    keypoint pruning + PnP in one graph.  The reference's dynamic
    clustering loop (`pPose_nms.py:58-83`) is bounded by the candidate
    capacity, so it runs as a fixed-trip `lax.fori_loop`
    (`ops.pose_nms.pose_nms_device`) instead of per-frame host Python —
    same output schema as the capacity-1 `make_post_stage`."""

    decode_stage = make_candidates_decode_stage(cfg)

    def post_stage(hm, det, kp3d, cam_K):
        cand = decode_stage(hm, det)
        b, n = cand["boxes"].shape[:2]

        if cfg.pnp_spread_power > 0:
            cand_spread = hm_ops.heatmap_concentration(hm) \
                .reshape(b, n, cfg.n_kp)
            kp, sc, proposal, pick_box, pick_obj, nms_valid, spread = \
                jax.vmap(lambda bx, ob, k2, ks, v, ex: pnms.pose_nms_device(
                    bx, ob, k2, ks, v, extra=ex))(
                    cand["boxes"], cand["obj_score"], cand["kp2d"],
                    cand["kp_scores"], cand["det_valid"], cand_spread)
        else:
            kp, sc, proposal, pick_box, pick_obj, nms_valid = jax.vmap(
                lambda bx, ob, k2, ks, v: pnms.pose_nms_device(
                    bx, ob, k2, ks, v)
            )(cand["boxes"], cand["obj_score"], cand["kp2d"],
              cand["kp_scores"], cand["det_valid"])
            spread = jnp.zeros_like(sc)

        if cfg.left_keypoints < cfg.n_kp:
            top_sc, top_idx = jax.lax.top_k(sc, cfg.left_keypoints)
            kp2d_sel = jnp.take_along_axis(kp, top_idx[..., None], axis=1)
            kp3d_sel = kp3d[top_idx]
            sc_sel = top_sc
            spread_sel = jnp.take_along_axis(spread, top_idx, axis=1)
        else:
            kp2d_sel = kp
            kp3d_sel = jnp.broadcast_to(kp3d[None], (b,) + kp3d.shape)
            sc_sel = sc
            spread_sel = spread

        diam = _kp_cloud_diameter(kp3d)
        R, t = jax.vmap(
            lambda p3, p2, s, sp, bx: _pnp_one(cfg, p3, p2, cam_K, s,
                                               sp, bx, diam))(
            kp3d_sel, kp2d_sel, sc_sel, spread_sel, pick_box)
        det_any = cand["det_valid"].any(axis=1)
        return {
            "boxes": pick_box,                    # winning candidate's box
            "obj_score": pick_obj,
            "det_valid": det_any,
            "keypoints": kp,
            "kp_scores": sc,
            "proposal_score": proposal,
            "pose_valid": det_any & nms_valid,
            "cam_R": R,
            "cam_t": t,
        }

    return post_stage


def make_pose_step(yolo_spec, cfg: PipelineConfig):
    """Build the fused step fn (det -> pose -> post in ONE XLA graph):

    step(yolo_params, kpd_params, frames_u8 [B,H0,W0,3] RGB, kp3d [K,3],
         cam_K [3,3]) -> dict of per-frame outputs.  With det_capacity > 1
    the post stage runs the device pose-NMS over the candidate set; the
    graph stays fused either way.
    """
    det_stage = make_det_stage(yolo_spec, cfg)
    pose_stage = make_pose_stage(cfg)
    post_stage = (make_multi_post_stage(cfg) if cfg.det_capacity > 1
                  else make_post_stage(cfg))

    def step(yolo_params, kpd_params, frames, kp3d, cam_K):
        det = det_stage(yolo_params, frames)
        hm = pose_stage(kpd_params, det["crops"])
        return post_stage(hm, det, kp3d, cam_K)

    return step


def make_candidates_step(yolo_spec, cfg: PipelineConfig):
    """Multi-candidate device graph (cfg.det_capacity > 1): frames ->
    per-candidate decoded keypoints, [B, N, ...].  Stops before pose-NMS —
    the dynamic clustering loop (`pPose_nms.py:24-122`) runs host-side on
    these candidates (ops.pose_nms.pose_nms), mirroring the reference's
    DataWriter flow for crowded/occlusion scenes."""
    det_stage = make_det_stage(yolo_spec, cfg)
    pose_stage = make_pose_stage(cfg)
    decode_stage = make_candidates_decode_stage(cfg)

    def step(yolo_params, kpd_params, frames):
        det = det_stage(yolo_params, frames)
        hm = pose_stage(kpd_params, det["crops"])
        return decode_stage(hm, det)

    return step


def make_candidates_decode_stage(cfg: PipelineConfig):
    """Decode sub-stage of the multi-candidate graph: heatmaps + det ->
    per-candidate keypoint candidates [B, N, ...]."""

    def decode_stage(hm, det):
        _, preds_img, maxval = _decode_crops(cfg, hm, det["pt1"], det["pt2"])
        b, n = det["boxes"].shape[:2]
        return {
            "boxes": det["boxes"],                        # [B,N,4]
            "obj_score": det["obj_score"],                # [B,N]
            "det_valid": det["det_valid"],                # [B,N]
            "kp2d": preds_img.reshape(b, n, cfg.n_kp, 2),
            "kp_scores": maxval.reshape(b, n, cfg.n_kp),
        }

    return decode_stage


class PosePipeline:
    """Host-side wrapper: owns weights, jits the fused step, feeds batches.

    Mirrors the role of the reference's DetectionLoader+DetectionProcessor+
    DataWriter combination, minus the queues — batching and async dispatch
    provide the overlap instead.
    """

    def __init__(self, yolo_cfg, yolo_params, kpd_params, kp3d, cam_K,
                 cfg: PipelineConfig | None = None,
                 left_keypoints: int | None = None):
        """left_keypoints: overrides cfg.left_keypoints — the occlusion eval's
        `--left_keypoints` PnP pruning knob (`occlusion_betapose_evaluate.py:
        139`, reference `dataloader.py:718-724`)."""
        self.cfg = cfg or PipelineConfig()
        if left_keypoints is not None:
            self.cfg = dataclasses.replace(
                self.cfg, left_keypoints=min(left_keypoints, self.cfg.n_kp))
        self.spec = (yolo_cfg if isinstance(yolo_cfg, yolo_mod.NetworkSpec)
                     else yolo_mod.build_spec(yolo_cfg))
        self.yolo_params = yolo_params
        self.kpd_params = kpd_params
        self.kp3d = jnp.asarray(kp3d, jnp.float32)
        self.cam_K = jnp.asarray(cam_K, jnp.float32)
        if self.cfg.det_capacity > 1 and self.cfg.host_pose_nms:
            self._step = jax.jit(make_candidates_step(self.spec, self.cfg))
        else:
            # capacity-1 AND fused multi-candidate both run one full graph
            self._step = jax.jit(make_pose_step(self.spec, self.cfg))
        self._stages = None  # lazily jitted per-stage fns for --profile
        self._pnp_fn = None  # lazily jitted batched PnP (multi-candidate)

    @staticmethod
    def _is_oom(e: Exception) -> bool:
        """True only for a real XLA out-of-memory: the XLA runtime error
        TYPE whose message carries RESOURCE_EXHAUSTED in status-code
        position ('RESOURCE_EXHAUSTED: ...' at the start or after a
        status-chain separator).  Both checks matter: the type check keeps
        non-XLA tunnel HTTP errors out, and the positional match keeps an
        XlaRuntimeError that merely *mentions* the token (e.g. a forwarded
        remote compile-server log line) from triggering the batch-halving
        fallback."""
        import re
        try:
            from jaxlib.xla_client import XlaRuntimeError
        except ImportError:  # pragma: no cover - jaxlib layout drift
            from jax.errors import JaxRuntimeError as XlaRuntimeError
        return (isinstance(e, XlaRuntimeError)
                and re.search(r"(^|:\s)RESOURCE_EXHAUSTED:", str(e))
                is not None)

    def __call__(self, frames_u8: np.ndarray):
        """frames_u8: [B, H, W, 3] RGB uint8. Returns dict of host arrays.

        On RESOURCE_EXHAUSTED the batch is split in half and retried — the
        TPU analog of the reference's CUDA-OOM fallback
        (`train_KPD/src/evaluation.py:95-106`).

        The explicit device_put matters: letting jit transfer a host numpy
        arg implicitly is ~70x slower through the remote-compile TPU tunnel
        (measured 3.1 s vs 45 ms for a 59 MB batch)."""
        return self._post_device(self._run_device(frames_u8))

    def _post_device(self, out):
        """Host-side completion of a dispatched device step (identity unless
        the reference-style host clustering mode is on)."""
        if self.cfg.det_capacity > 1 and self.cfg.host_pose_nms:
            return self._host_pose_nms(out)
        return out

    def _run_device(self, frames_u8):
        args = ((self.kp3d, self.cam_K)
                if not (self.cfg.det_capacity > 1 and self.cfg.host_pose_nms)
                else ())
        try:
            return self._step(self.yolo_params, self.kpd_params,
                              jax.device_put(jnp.asarray(frames_u8)), *args)
        except Exception as e:
            if not self._is_oom(e) or len(frames_u8) < 2:
                raise
            half = len(frames_u8) // 2
            out1 = self._run_device(frames_u8[:half])
            out2 = self._run_device(frames_u8[half:])
            return {k: jnp.concatenate([out1[k], out2[k]], axis=0)
                    for k in out1}

    def _host_pose_nms(self, cand):
        """Multi-candidate post: host-side parametric pose-NMS per frame over
        the N candidates (the reference's pPose_nms.py flow through
        DataWriter.update), best surviving proposal per frame, keypoint
        pruning, then one batched jitted PnP.  Output schema matches the
        fused capacity-1 step."""
        cand = {k: np.asarray(v) for k, v in jax.device_get(cand).items()}
        b = cand["boxes"].shape[0]
        k_all = self.cfg.n_kp
        left = min(self.cfg.left_keypoints, k_all)
        kp3d = np.asarray(self.kp3d)

        boxes = np.zeros((b, 4), np.float32)
        obj_score = np.zeros((b,), np.float32)
        keypoints = np.zeros((b, k_all, 2), np.float32)
        kp_scores = np.zeros((b, k_all), np.float32)
        proposal = np.zeros((b,), np.float32)
        valid = np.zeros((b,), bool)
        kp2d_sel = np.zeros((b, left, 2), np.float32)
        kp3d_sel = np.tile(kp3d[None, :left], (b, 1, 1)).astype(np.float32)
        sc_sel = np.ones((b, left), np.float32)

        for i in range(b):
            v = cand["det_valid"][i]
            if not v.any():
                continue
            results = pnms.pose_nms(
                cand["boxes"][i][v], cand["obj_score"][i][v],
                cand["kp2d"][i][v], cand["kp_scores"][i][v][..., None])
            if not results:
                continue
            best = max(results, key=lambda r: r["proposal_score"])
            kp = np.asarray(best["keypoints"], np.float32)
            sc = np.asarray(best["kp_score"], np.float32)[:, 0]
            # the picked candidate's own box + objectness (NOT the
            # reference's bboxes[0] quirk, and not the max over candidates
            # — outputs must be attributed to the winning detection)
            boxes[i] = best["pick_bbox"]
            obj_score[i] = best["bbox_score"]
            keypoints[i], kp_scores[i] = kp, sc
            proposal[i] = best["proposal_score"]
            valid[i] = True
            top = np.argsort(-sc, kind="stable")[:left]
            kp2d_sel[i] = kp[top]
            kp3d_sel[i] = kp3d[top]
            sc_sel[i] = sc[top]

        if self.cfg.pnp_spread_power > 0:
            # the host clustering path doesn't carry heatmaps off-device;
            # refuse rather than silently dropping the requested weighting
            raise ValueError(
                "pnp_spread_power requires the fused device pose-NMS "
                "(drop --host_pose_nms)")
        if self._pnp_fn is None:
            diam = _kp_cloud_diameter(self.kp3d)
            self._pnp_fn = jax.jit(jax.vmap(
                lambda p3, p2, s, bx: _pnp_one(self.cfg, p3, p2, self.cam_K,
                                               s, None, bx, diam)))
        R, t = self._pnp_fn(jnp.asarray(kp3d_sel), jnp.asarray(kp2d_sel),
                            jnp.asarray(sc_sel), jnp.asarray(boxes))
        return {
            "boxes": jnp.asarray(boxes),
            "obj_score": jnp.asarray(obj_score),
            "det_valid": jnp.asarray(cand["det_valid"].any(axis=1)),
            "keypoints": jnp.asarray(keypoints),
            "kp_scores": jnp.asarray(kp_scores),
            "proposal_score": jnp.asarray(proposal),
            "pose_valid": jnp.asarray(valid),
            "cam_R": R,
            "cam_t": t,
        }

    def profiled_call(self, frames_u8: np.ndarray, prof):
        """Like __call__ but runs the three jitted sub-stages separately,
        blocking between them to fill `prof`'s dt/pt/pn buckets (the
        reference's per-stage readout, `betapose_evaluate.py:132-136`).
        Slightly slower than the fused step (three dispatches + syncs)."""
        host_mode = self.cfg.det_capacity > 1 and self.cfg.host_pose_nms
        if self._stages is None:
            if host_mode:
                post = jax.jit(make_candidates_decode_stage(self.cfg))
            elif self.cfg.det_capacity > 1:
                post = jax.jit(make_multi_post_stage(self.cfg))
            else:
                post = jax.jit(make_post_stage(self.cfg))
            self._stages = (
                jax.jit(make_det_stage(self.spec, self.cfg)),
                jax.jit(make_pose_stage(self.cfg)),
                post,
            )
        det_fn, pose_fn, post_fn = self._stages
        frames = jax.device_put(jnp.asarray(frames_u8))
        with prof.bucket("dt"):
            det = jax.block_until_ready(det_fn(self.yolo_params, frames))
        with prof.bucket("pt"):
            hm = jax.block_until_ready(pose_fn(self.kpd_params, det["crops"]))
        with prof.bucket("pn"):
            if host_mode:
                # decode on device, then the host pose-NMS + batched PnP —
                # all of it is the reference's 'post processing' bucket
                cand = jax.block_until_ready(post_fn(hm, det))
                out = self._host_pose_nms(cand)
                jax.block_until_ready((out["cam_R"], out["cam_t"]))
            else:
                out = jax.block_until_ready(
                    post_fn(hm, det, self.kp3d, self.cam_K))
        return out

    def run_batches(self, frame_iter, progress=None):
        """Run over an iterator of uint8 frame batches with software
        pipelining: dispatch batch i+1's DEVICE work before finalizing
        batch i.  In host-clustering mode the host pose-NMS of batch i
        therefore overlaps the device compute of batch i+1 instead of
        serializing behind it."""
        results = []
        pending = None
        for batch in frame_iter:
            out = self._run_device(batch)          # async dispatch
            if pending is not None:
                results.append(jax.device_get(self._post_device(pending)))
            pending = out
            if progress is not None:
                progress()
        if pending is not None:
            results.append(jax.device_get(self._post_device(pending)))
        return results
