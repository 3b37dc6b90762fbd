"""Full-system self-test: synthetic scenes -> annotate -> train YOLO + KPD
-> fused pipeline -> pose metrics.

Exercises every stage of the framework end-to-end with no external data:
1. render a colored cube at random poses into LineMod-sized frames
   (geometry/renderer.py);
2. designate keypoints (cube surface points) and annotate 2D labels via the
   annotator math;
3. train a small YOLO on the rendered frames (darknet-semantics loss) and a
   FastPose-resnet50 KPD on the crops (masked-MSE, on-device augmentation);
4. run the fused detect->crop->KPD->decode->PnP pipeline on held-out frames
   and report ADD / 2D keypoint error vs the known ground-truth poses.

Run: python -m betapose_tpu.tools.selftest [--frames 60] [--iters 300]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.data import sixd as sixd_mod
from betapose_tpu.geometry.renderer import Renderer
from betapose_tpu.geometry import metrics
from betapose_tpu.geometry.utils import get_bbox_from_mask
from betapose_tpu.tools.annotator import annotate_frame_exact
from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.train import yolo_train, kpd_train
from betapose_tpu.train.augment import AugmentConfig, augment_batch
from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig

CAM_K = sixd_mod.LINEMOD_CAM_K

# Cache epoch: bump whenever a CODE change alters training semantics
# without moving any fingerprint knob (the round-3 bf16 train-precision
# default flip was exactly such a change — it silently invalidated caches
# whose manifests still matched).  Caches stamped with an older epoch (or
# none) hard-refuse to reload instead of producing a stale-weights number.
#   v2: round-4 epoch (post bf16-default + augment refactor).
#   v3: exact-identity KPD annotation (annotate_frame_exact) — labels are
#       now exact sub-pixel projections; v2 caches were trained on labels
#       carrying the mask-bbox ratio-trick scale noise (~1cm ADD floor).
CACHE_VERSION = 3

YOLO_CFG = """
[net]
width={reso}
height={reso}

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
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
anchors = 24,24,  40,40,  64,64
classes=1
num=3
ignore_thresh = .7
"""


class CubeModel:
    """Solid cube with distinctly-colored faces (each face split into a
    bright and a dark triangle so in-plane orientation is also readable) —
    a pose-learnable toy object for the self-test."""

    def __init__(self, half=0.04, seed=0, face_colors=None):
        rng = np.random.default_rng(seed)
        c = np.array([[x, y, z] for x in (-half, half)
                      for y in (-half, half) for z in (-half, half)])
        # faces as corner-index quads (x-, x+, y-, y+, z-, z+)
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        if face_colors is None:
            face_colors = np.array([
                [0.9, 0.2, 0.2], [0.2, 0.9, 0.2], [0.2, 0.3, 0.9],
                [0.9, 0.9, 0.2], [0.9, 0.3, 0.9], [0.2, 0.9, 0.9]])
        face_colors = np.asarray(face_colors)
        verts, cols, tris = [], [], []
        for qi, q in enumerate(quads):
            base = len(verts)
            for vi in q:
                verts.append(c[vi])
            col = face_colors[qi]
            cols.extend([col, col, col, col])
            tris.append([base, base + 1, base + 2])       # bright tri
            tris.append([base, base + 2, base + 3])       # (shading differs)
        self.vertices = np.asarray(verts)
        self.colors = np.asarray(cols)
        self.faces = np.asarray(tris, int)
        self.half = half


def distractor_model():
    """Occluder for the occlusion tier: a smaller cube in drab gray/brown
    tones (visually distinct from every target face color) — the synthetic
    analog of Occlusion-LineMod's foreground clutter."""
    drab = np.array([[0.45, 0.40, 0.35], [0.35, 0.30, 0.28],
                     [0.50, 0.45, 0.38], [0.30, 0.28, 0.25],
                     [0.42, 0.38, 0.33], [0.38, 0.33, 0.30]])
    return CubeModel(half=0.028, seed=1, face_colors=drab)


def make_scene(rng, model, z_range=(0.55, 0.8), occluder=None,
               occl_frac=(0.15, 0.5), kp3d=None):
    """kp3d: when given, ALSO return a (K,) per-keypoint visibility array
    (1 = visible, 0 = hidden behind the occluder) — the training signal
    for occlusion-aware KPD supervision (train/augment.py kp_vis)."""
    # LineMod-like viewpoint coverage: full in-plane rotation, limited tilt
    # (the real benchmark's views live on the upper hemisphere; a toy
    # training set can't cover all of SO(3))
    ang = np.array([rng.uniform(-0.8, 0.8), rng.uniform(-0.8, 0.8),
                    rng.uniform(0, 2 * np.pi)])

    def rot(a, axis):
        c, s = np.cos(a), np.sin(a)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i], m[i, j], m[j, i], m[j, j] = c, -s, s, c
        return m

    R = rot(ang[0], 0) @ rot(ang[1], 1) @ rot(ang[2], 2)
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.08, 0.08),
                  rng.uniform(*z_range)])
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = t

    r = Renderer(size=(640, 480), cam=CAM_K)
    r.draw_model(model, pose)
    rgb, depth = r.finish()
    mask = depth > 0
    xmin, xmax, ymin, ymax = get_bbox_from_mask(mask)
    frame = (rng.random((480, 640, 3)) * 0.25 * 255).astype(np.uint8)
    frame[mask] = np.clip(rgb[mask] * 255, 0, 255).astype(np.uint8)
    bbox = [xmin, ymin, xmax, ymax]

    kp_vis = None if kp3d is None else np.ones(len(kp3d), np.float32)
    if occluder is not None:
        # foreground distractor rendered into its OWN z-buffer, composed by
        # depth comparison (no re-render per retry); retry offsets until
        # it hides occl_frac of the target's visible pixels — the
        # Occlusion-LineMod regime.  GT bbox/keypoints stay those of the
        # FULL object (reference trains/evals with full GT under occlusion)
        tgt_area = max(int(mask.sum()), 1)
        for _ in range(10):
            o_pose = np.eye(4)
            o_ang = rng.uniform(0, 2 * np.pi, 3)
            o_pose[:3, :3] = (rot(o_ang[0], 0) @ rot(o_ang[1], 1)
                              @ rot(o_ang[2], 2))
            side = rng.uniform(0, 2 * np.pi)
            off = rng.uniform(0.25, 0.8) * model.half
            o_pose[:3, 3] = t + [np.cos(side) * (model.half + off) * 0.9,
                                 np.sin(side) * (model.half + off) * 0.9,
                                 -rng.uniform(0.06, 0.12)]
            ro = Renderer(size=(640, 480), cam=CAM_K)
            ro.draw_model(occluder, o_pose)
            rgb_o, depth_o = ro.finish()
            omask = depth_o > 0
            wins = omask & (~mask | (depth_o < depth))
            frac = float((wins & mask).sum()) / tgt_area
            if occl_frac[0] <= frac <= occl_frac[1]:
                frame[wins] = np.clip(rgb_o[wins] * 255, 0,
                                      255).astype(np.uint8)
                if kp3d is not None:
                    # keypoint hidden iff the occluder's depth at its
                    # projected pixel is in front of the keypoint
                    kc = kp3d @ pose[:3, :3].T + pose[:3, 3]
                    u = np.clip((CAM_K[0, 0] * kc[:, 0] / kc[:, 2]
                                 + CAM_K[0, 2]).round().astype(int),
                                0, 639)
                    v = np.clip((CAM_K[1, 1] * kc[:, 1] / kc[:, 2]
                                 + CAM_K[1, 2]).round().astype(int),
                                0, 479)
                    hidden = omask[v, u] & (depth_o[v, u]
                                            < kc[:, 2] - 1e-4)
                    kp_vis = (~hidden).astype(np.float32)
                break
    if kp3d is not None:
        return frame, pose, bbox, kp_vis
    return frame, pose, bbox


def run_selftest(n_frames=60, n_eval=8, yolo_iters=250, kpd_iters=1500,
                 reso=192, inp_h=128, inp_w=96, n_kp=12, seed=0,
                 add_dpg=False, kpd_finetune_iters=0, kpd_batch=8,
                 z_range=(0.55, 0.8), left_keypoints=None, params_dir=None,
                 pnp_robust_rounds=0, occlusion=False, det_capacity=1,
                 pnp_score_power=0.0, train_precision=None,
                 net_type="resnet50", verbose=True):
    """params_dir: when set, trained weights are saved there
    (yolo.weights darknet-format + kpd.npz pytree) and reloaded on the
    next run instead of retraining — fast iteration on the eval side.
    left_keypoints: PnP pruning (defaults to all n_kp).

    occlusion=True is the Occlusion-LineMod-shaped hard tier
    (`occlusion_betapose_evaluate.py:86-273` capability): a drab
    foreground distractor hides 15-50% of the target in EVERY eval frame
    (and half the train frames, as real occlusion-scene training data
    would); pair with det_capacity>1 so the multi-candidate pose-NMS path
    sees real learned heatmaps under clutter.

    net_type: KPD backbone to train AND grade — FastPose 'resnet50' (the
    default tier) or 'hgPRM' (PyraNet, intermediate supervision +
    post-hoc BN calibration; heatmap dims inp/4 must divide by 16, so
    pass e.g. inp 64x64 fast / 320x256 slow)."""
    import os
    rng = np.random.default_rng(seed)
    model = CubeModel()
    occluder = distractor_model() if occlusion else None
    # designated keypoints: the 8 unique corners, 6 face centers, then the
    # 12 edge midpoints (well-spread distinct 3D points, as a SIFT
    # designator would produce); more keypoints average down PnP noise
    h = model.half
    corners = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                        for z in (-h, h)])
    centers = np.array([[-h, 0, 0], [h, 0, 0], [0, -h, 0], [0, h, 0],
                        [0, 0, -h], [0, 0, h]])
    edge_mids = []
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(np.abs(corners[i] - corners[j]) > 1e-9) == 1:
                edge_mids.append((corners[i] + corners[j]) / 2)
    kp3d = np.concatenate([corners, centers, np.asarray(edge_mids)])[:n_kp]

    ypath = os.path.join(params_dir, "yolo.weights") if params_dir else None
    kpath = os.path.join(params_dir, "kpd.npz") if params_dir else None
    if params_dir:
        import json
        os.makedirs(params_dir, exist_ok=True)
        # cache fingerprint: a cache written under one tier/config must not
        # be silently misloaded under another (shapes may even coincide)
        fp = {"cache_version": CACHE_VERSION,
              "n_frames": n_frames, "reso": reso, "inp_h": inp_h,
              "inp_w": inp_w, "n_kp": n_kp, "seed": seed,
              "z_range": list(z_range),
              # training-affecting knobs: stale weights trained under
              # different iteration counts / augmentation must not reload
              "yolo_iters": yolo_iters, "kpd_iters": kpd_iters,
              "kpd_finetune_iters": kpd_finetune_iters,
              "kpd_batch": kpd_batch, "add_dpg": add_dpg,
              "occlusion": occlusion}
        # non-default MXU precision changes training numerics -> distinct
        # cache; omitted for float32 so pre-existing caches stay valid
        resolved_precision = (train_precision
                              or kpd_train.DEFAULT_TRAIN_PRECISION)
        if resolved_precision != "float32":
            fp["train_precision"] = resolved_precision
        if net_type != "resnet50":
            fp["net_type"] = net_type
        fp_path = os.path.join(params_dir, "config.json")
        if os.path.exists(fp_path):
            on_disk = json.load(open(fp_path))
            if on_disk.get("cache_version") != CACHE_VERSION:
                raise ValueError(
                    f"params_dir {params_dir} was trained under cache "
                    f"epoch {on_disk.get('cache_version', 1)} but the "
                    f"code is at epoch {CACHE_VERSION}: training "
                    "semantics changed since these weights were written "
                    "— delete the cache (or use a fresh --params_dir)")
            if on_disk != fp:
                raise ValueError(
                    f"params_dir {params_dir} was trained with a different "
                    f"config: cached {on_disk} vs requested {fp} — use a "
                    "fresh --params_dir or delete the cache")
        else:
            with open(fp_path, "w") as f:
                json.dump(fp, f)

    # ---- stage 2: render + annotate ----
    frames, poses, bboxes, parts = [], [], [], []
    for i in range(n_frames + n_eval):
        occ = occluder if occlusion and (i >= n_frames
                                         or rng.random() < 0.5) else None
        frame, pose, bbox = make_scene(rng, model, z_range, occluder=occ)
        _, kp_img = annotate_frame_exact(pose, model.vertices, kp3d, CAM_K)
        frames.append(frame)
        poses.append(pose)
        bboxes.append(bbox)
        parts.append(kp_img)
    frames = np.stack(frames)
    bboxes_np = np.asarray(bboxes, np.float32)
    parts_np = np.stack(parts).astype(np.float32)
    if verbose:
        print(f"rendered {len(frames)} scenes")

    # ---- stage 3a: train YOLO ----
    cfg_text = YOLO_CFG.format(reso=reso)
    spec = yolo_mod.build_spec(cfg_text)
    out_h, out_w = inp_h // 4, inp_w // 4
    if ypath and os.path.exists(ypath):
        yparams, _ = yolo_mod.load_darknet_weights(spec, ypath,
                                                   allow_partial=False)
        if verbose:
            print(f"yolo weights loaded from {ypath}")
    else:
        yparams = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
        ycfg = yolo_train.YoloTrainConfig(lr=1e-3, burn_in=200,
                                          steps=(10 ** 6,),
                                          scales=(0.1,), decay=5e-4)
        ytx = yolo_train.make_optimizer(ycfg)
        yopt = ytx.init(yparams)
        ystep = yolo_train.make_train_step(
            spec, ytx, reso, reso, donate=False,
            matmul_precision=train_precision
            or yolo_train.DEFAULT_TRAIN_PRECISION)

        truths = np.zeros((n_frames, 4, 5), np.float32)
        for i, bb in enumerate(bboxes[:n_frames]):
            truths[i, 0] = [(bb[0] + bb[2]) / 2 / 640,
                            (bb[1] + bb[3]) / 2 / 480,
                            (bb[2] - bb[0]) / 640, (bb[3] - bb[1]) / 480, 0]
        # u8-resident frame pool, exact per-batch f32 convert (see the
        # KPD stage note: the f32 pool was 4x the HBM)
        full_u8 = jnp.asarray(frames[:n_frames])
        truths_j = jnp.asarray(truths)
        t0 = time.time()
        B = 16
        ykey = jax.random.PRNGKey(3)
        for it in range(yolo_iters):
            sel = rng.integers(0, n_frames, B)
            ykey, k1 = jax.random.split(ykey)
            aug_imgs, aug_truths = yolo_train.augment_detection_batch(
                k1, full_u8[sel].astype(jnp.float32) / 255.0,
                truths_j[sel], ycfg, reso, reso)
            yparams, yopt, ym = ystep(yparams, yopt, aug_imgs, aug_truths)
        if verbose:
            print(f"yolo trained {yolo_iters} iters "
                  f"(loss {float(ym['loss']):.3f}, "
                  f"iou {float(ym['head0/avg_iou']):.3f}, "
                  f"{time.time() - t0:.0f}s)")
        if ypath:
            yolo_mod.save_darknet_weights(spec, jax.device_get(yparams),
                                          ypath)

    # ---- stage 3b: train KPD ----
    if net_type == "hgPRM":
        # PyraNet: intermediate supervision (loss over all nStack heads)
        # + post-hoc BN calibration before inference-mode use — the same
        # recipe the trainer CLI runs (train_kpd_main.py:90-115)
        from betapose_tpu.models import hgprm
        kparams = hgprm.init_params(jax.random.PRNGKey(1), n_classes=n_kp)

        def kpd_forward_fn(p, x, train=False, bn_stats=None):
            return hgprm.forward(p, x, all_heads=train, train=train,
                                 bn_stats=bn_stats)
    elif net_type == "resnet50":
        kparams = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=n_kp,
                                      arch="resnet50")
        kpd_forward_fn = None
    else:
        raise ValueError(f"unsupported selftest net_type {net_type!r}")
    if kpath and os.path.exists(kpath):
        from betapose_tpu.core import checkpoint as ckpt
        kparams = ckpt.load_pytree_npz(kpath, kparams)
        if verbose:
            print(f"kpd weights loaded from {kpath}")
    else:
        ktx = kpd_train.make_optimizer("adam", lr=1e-3,
                                       params_example=kparams)
        kopt = ktx.init(kparams)
        kstep = kpd_train.make_train_step(
            ktx, out_res_h=out_h, donate=False, forward_fn=kpd_forward_fn,
            matmul_precision=train_precision
            or kpd_train.DEFAULT_TRAIN_PRECISION)
        # gentle augmentation for the toy task: the cube's mirror image
        # never occurs, and the tiny training budget can't absorb
        # flip/rotate noise
        aug_cfg = AugmentConfig(inp_h=inp_h, inp_w=inp_w, out_h=out_h,
                                out_w=out_w, rotate=0.0, train=True,
                                flip=False, add_dpg=add_dpg)
        # resident pool stays u8 (1600 occlusion-tier frames are 1.5 GB
        # u8 vs 5.9 GB f32 — the f32 copy OOMed hgPRM training); the
        # per-batch u8->f32 convert is exact, so the math is unchanged
        imgs_u8 = jnp.asarray(frames[:n_frames])
        key = jax.random.PRNGKey(2)
        t0 = time.time()
        # NOTE: kp_vis (occlusion-aware zero targets) is deliberately NOT
        # used here — measured on the occlusion tier it HURT (ADD<0.1d
        # 0.25 vs 0.62): for a rigid object the network hallucinates
        # occluded keypoints consistently from visible context, and those
        # hallucinations are good PnP correspondences, while zero-target
        # suppression leaves garbage argmax positions among the pruned
        # survivors.  The mechanism stays available in train/augment.py
        # (the reference's setMask capability) for non-rigid uses.
        for it in range(kpd_iters):
            sel = rng.integers(0, n_frames, kpd_batch)
            key, k1 = jax.random.split(key)
            batch = augment_batch(k1,
                                  imgs_u8[sel].astype(jnp.float32) / 255.0,
                                  jnp.asarray(bboxes_np[sel]),
                                  jnp.asarray(parts_np[sel]), aug_cfg)
            kparams, kopt, km = kstep(kparams, kopt, batch)
        if verbose:
            print(f"kpd trained {kpd_iters} iters "
                  f"(loss {float(km['loss']):.5f}, "
                  f"acc {float(km['acc']):.3f}, {time.time() - t0:.0f}s)")
        if kpd_finetune_iters:
            # low-LR convergence phase: the subpixel localization that PnP
            # depth accuracy needs never falls out of a constant 1e-3 Adam
            ktx2 = kpd_train.make_optimizer("adam", lr=1e-4,
                                            params_example=kparams)
            kopt2 = ktx2.init(kparams)
            kstep2 = kpd_train.make_train_step(
                ktx2, out_res_h=out_h, donate=False,
                forward_fn=kpd_forward_fn,
                matmul_precision=train_precision
                or kpd_train.DEFAULT_TRAIN_PRECISION)
            t0 = time.time()
            for it in range(kpd_finetune_iters):
                sel = rng.integers(0, n_frames, kpd_batch)
                key, k1 = jax.random.split(key)
                batch = augment_batch(
                    k1, imgs_u8[sel].astype(jnp.float32) / 255.0,
                    jnp.asarray(bboxes_np[sel]),
                    jnp.asarray(parts_np[sel]), aug_cfg)
                kparams, kopt2, km = kstep2(kparams, kopt2, batch)
            if verbose:
                print(f"kpd finetuned {kpd_finetune_iters} iters @1e-4 "
                      f"(loss {float(km['loss']):.5f}, "
                      f"acc {float(km['acc']):.3f}, "
                      f"{time.time() - t0:.0f}s)")
        if net_type == "hgPRM":
            # batch-stat training leaves running stats at init identity;
            # calibrate on the last augmented batch before inference use
            from betapose_tpu.models import hgprm
            kparams = hgprm.calibrate_bn(kparams, batch["inps"])
        if kpath:
            from betapose_tpu.core import checkpoint as ckpt
            ckpt.save_pytree_npz(kpath, jax.device_get(kparams))

    # ---- stage 3c: fused eval on held-out frames ----
    pcfg = PipelineConfig(
        reso=reso, inp_h=inp_h, inp_w=inp_w, out_h=out_h, out_w=out_w,
        n_kp=n_kp, left_keypoints=left_keypoints or n_kp, confidence=0.005,
        compute_dtype="float32", pallas_decode=None,
        pnp_robust_rounds=pnp_robust_rounds,
        pnp_score_power=pnp_score_power,
        det_capacity=det_capacity, net_type=net_type)
    pipe = PosePipeline(spec, yolo_mod.fold_bn(spec, yparams), kparams,
                        kp3d, CAM_K, pcfg)
    eval_frames = frames[n_frames:]
    out = {k: np.asarray(v) for k, v in pipe(eval_frames).items()}

    # object diameter (max vertex-pair distance) — the reference's success
    # bar is ADD < 0.1 * diameter (`betapose_evaluate.py:249,263`)
    vd = model.vertices
    diameter = float(np.sqrt(
        ((vd[None] - vd[:, None]) ** 2).sum(-1)).max())

    adds, errs2d, ious = [], [], []
    for j in range(n_eval):
        gt_pose = poses[n_frames + j]
        if not out["det_valid"][j]:
            continue
        pred = np.eye(4)
        pred[:3, :3] = out["cam_R"][j]
        pred[:3, 3] = out["cam_t"][j]
        adds.append(metrics.add_err(gt_pose, pred, model.vertices))
        errs2d.append(metrics.projection_error_2d(
            gt_pose, pred, model.vertices, CAM_K))
        gb = bboxes[n_frames + j]
        ious.append(metrics.iou(gb, out["boxes"][j].tolist()))
    ok_01d = [a < 0.1 * diameter for a in adds]
    stats = {
        "n_detected": len(adds),
        "n_eval": n_eval,
        "diameter_m": diameter,
        "mean_add_m": float(np.mean(adds)) if adds else float("inf"),
        "median_add_m": float(np.median(adds)) if adds else float("inf"),
        "add_01d_acc": float(np.sum(ok_01d)) / max(n_eval, 1),
        "mean_2d_px": float(np.mean(errs2d)) if errs2d else float("inf"),
        "median_2d_px": float(np.median(errs2d)) if errs2d else float("inf"),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
    }
    if verbose:
        print(f"eval: detected {stats['n_detected']}/{n_eval}, "
              f"ADD {stats['mean_add_m'] * 100:.2f} cm "
              f"(median {stats['median_add_m'] * 100:.2f}), "
              f"ADD<0.1d acc {stats['add_01d_acc']:.2f} "
              f"(0.1d = {0.1 * diameter * 1000:.1f} mm), "
              f"2D {stats['mean_2d_px']:.1f} px "
              f"(median {stats['median_2d_px']:.1f}), "
              f"IoU {stats['mean_iou']:.3f}")
        print("per-frame ADD (mm):",
              np.round(np.sort(np.asarray(adds)) * 1000, 1).tolist())
    return stats


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--yolo_iters", type=int, default=250)
    p.add_argument("--kpd_iters", type=int, default=1500)
    p.add_argument("--eval_frames", type=int, default=None)
    p.add_argument("--params_dir", type=str, default=None,
                   help="cache trained weights here; reruns skip training")
    p.add_argument("--left_kp", type=int, default=None,
                   help="PnP keypoint pruning (default: all)")
    p.add_argument("--pnp_robust", type=int, default=None,
                   help="trimmed-IRLS robust-PnP rounds (default: 0 fast "
                        "tier, 2 slow tier)")
    p.add_argument("--slow", action="store_true",
                   help="accuracy tier: more scenes/iters and full "
                        "LineMod-sized KPD crops, targeting the reference's "
                        "ADD<0.1*diameter success metric")
    p.add_argument("--occlusion", action="store_true",
                   help="hard tier (implies --slow settings): every eval "
                        "frame has a foreground distractor hiding 15-50% "
                        "of the target; eval runs det_capacity=4 through "
                        "the multi-candidate pose-NMS path + robust PnP "
                        "(the occlusion_betapose_evaluate.py capability)")
    p.add_argument("--det_capacity", type=int, default=None)
    p.add_argument("--train_precision", type=str, default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"],
                   help="MXU mode for both train steps (default: "
                        "kpd_train.DEFAULT_TRAIN_PRECISION)")
    p.add_argument("--netType", type=str, default="resnet50",
                   choices=["resnet50", "hgPRM"],
                   help="KPD backbone to train+grade (hgPRM: heatmap dims "
                        "inp/4 must divide by 16 — the slow-tier 320x256 "
                        "qualifies, the fast-tier 128x96 does not)")
    p.add_argument("--pnp_score_power", type=float, default=None,
                   help="PnP keypoint-score weighting exponent (default: "
                        "4 on the occlusion tier — measured ADD<0.1d 0.88 "
                        "vs 0.69 with hard top-13 pruning; 0 elsewhere)")
    args = p.parse_args(argv)
    if args.slow or args.occlusion:
        # occlusion tier trains at 2x scale (scenes + KPD iters): the
        # multi-candidate eval path only pays off once the heatmaps are
        # good enough under clutter (0.88 recipe; 800/8k plateaus ~0.66)
        stats = run_selftest(
            n_frames=max(args.frames, 1600 if args.occlusion else 800),
            n_eval=args.eval_frames or 16,
            yolo_iters=max(args.yolo_iters, 1000 if args.occlusion else 500),
            kpd_iters=max(args.kpd_iters, 16000 if args.occlusion else 8000),
            kpd_finetune_iters=3000, kpd_batch=16,
            inp_h=320, inp_w=256, n_kp=26, add_dpg=True,
            z_range=(0.45, 0.65),
            # occlusion: keep ALL keypoints and let score**4 weighting do
            # the (soft) pruning inside PnP; clean tier: hard top-20
            left_keypoints=args.left_kp
            or (None if args.occlusion else 20),
            params_dir=args.params_dir,
            occlusion=args.occlusion,
            det_capacity=args.det_capacity
            or (4 if args.occlusion else 1),
            pnp_robust_rounds=2 if args.pnp_robust is None
            else args.pnp_robust,
            pnp_score_power=(4.0 if args.occlusion else 0.0)
            if args.pnp_score_power is None else args.pnp_score_power,
            train_precision=args.train_precision, net_type=args.netType)
    else:
        stats = run_selftest(n_frames=args.frames,
                             yolo_iters=args.yolo_iters,
                             kpd_iters=args.kpd_iters,
                             n_eval=args.eval_frames or 8,
                             left_keypoints=args.left_kp,
                             params_dir=args.params_dir,
                             det_capacity=args.det_capacity or 1,
                             pnp_robust_rounds=args.pnp_robust or 0,
                             pnp_score_power=args.pnp_score_power or 0.0,
                             train_precision=args.train_precision,
                             net_type=args.netType)
    return stats


if __name__ == "__main__":
    main()
