"""Multi-object accuracy sweep: the reference's all-objects evaluation
loop (BASELINE config #3) on THIRTEEN distinct synthetic geometries —
the breadth of the reference's 13-object LineMod protocol
(`annotate_keypoint.py:63` object list {1,2,4,5,6,8..15}).

The reference evaluates LineMod one sequence per object with per-object
YOLO/KPD weights and prints a per-seq accuracy block
(`betapose_evaluate.py:86-266`; per-object weight table
`KPD/src/main_fast_inference.py:29-36`; 15-class detector cfg
`cfg/yolo-linemod.cfg:689-696`).  This driver reproduces that shape
end-to-end on synthetic data nothing else in the repo trains on:

1. thirteen objects (see `tools/objects.py`: three symmetric — 2-fold
   prism, 4-fold quad, flat slab — plus non-convex, thin, small, holed,
   textured, multi-part geometries), each with designated keypoints;
2. ONE shared multi-class detector at the production 416² shape —
   `make_yolov3_cfg(num_classes=15)` (the full 75-conv yolov3-linemod
   architecture; 13 of the 15 class slots are populated, as the
   reference trains its 15-class cfg on however many objects have data);
3. per-object KPD weights (FastPose-resnet50, 320x256 crops — the slow
   selftest recipe);
4. per-object fused eval with `target_class` routing, graded ADD<0.1d —
   or ADD-S for symmetric objects (`--sym_objects` semantics of the
   eval CLIs) — printed as the reference-style per-seq table.  For
   symmetric rows the table's 2D-reprojection column is SYMMETRY-AWARE
   (min over modes): the raw number grades a legitimately-flipped mode
   with an asymmetric metric and is reported separately in the JSON.

Memory phasing (one 16 GB v5e chip): the detector trains from a device
pool of the first `yolo_frames` frames per object; KPD pools upload one
object at a time and are freed after training.

Run: python -m betapose_tpu.tools.sweep --params_dir exp/sweep13 \\
       --yolo_iters 6000 --yolo_frames 300 --out_json SWEEP_r05.json
(first run trains 1 detector + 13 KPDs, ~3.5 h through the tunnel;
reruns reload the per-object weight caches and re-grade in minutes)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from betapose_tpu.geometry import metrics
from betapose_tpu.models import yolov3 as yolo_mod
from betapose_tpu.models import kpd as kpd_mod
from betapose_tpu.models.darknet_cfg import make_yolov3_cfg
from betapose_tpu.train import yolo_train, kpd_train
from betapose_tpu.train.augment import AugmentConfig, augment_batch
from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig
from betapose_tpu.tools.annotator import annotate_frame_exact
from betapose_tpu.tools.selftest import CAM_K, CACHE_VERSION, make_scene
from betapose_tpu.tools import objects as objects_mod


def render_sequence(rng, obj, n, z_range, canonical=True):
    """Render n single-object scenes; annotate keypoints through the
    SYMMETRY-CANONICALIZED pose (objects.canonicalize_pose) so identical-
    looking views get identical labels.  Returns (frames u8 [N,480,640,3],
    raw GT poses [N,4,4], bboxes [N,4] xyxy, kp_img [N,K,2])."""
    frames, poses, bboxes, parts = [], [], [], []
    for _ in range(n):
        frame, pose, bbox = make_scene(rng, obj, z_range)
        ann_pose = (objects_mod.canonicalize_pose(pose, obj.symmetries)
                    if canonical else pose)
        # exact-identity annotation (annotate_frame_exact docstring): the
        # mask-bbox ratio trick costs ~1% constellation scale == ~1cm ADD
        _, kp_img = annotate_frame_exact(ann_pose, obj.vertices,
                                         obj.keypoints, CAM_K)
        frames.append(frame)
        poses.append(pose)
        bboxes.append(bbox)
        parts.append(kp_img)
    return (np.stack(frames), np.stack(poses),
            np.asarray(bboxes, np.float32), np.stack(parts).astype(np.float32))


def train_detector(spec, frames_u8_dev, truths, iters, batch, reso,
                   precision, seed=0, verbose=True, beat=None):
    """Shared multi-class detector at the production shape (darknet
    random-init training, burn-in LR, on-device crop-jitter/flip/HSV
    augmentation — `detector.c:38-226` semantics)."""
    ycfg = yolo_train.YoloTrainConfig(lr=1e-3, burn_in=min(400, iters // 4),
                                      steps=(int(iters * 0.8),),
                                      scales=(0.1,), decay=5e-4)
    tx = yolo_train.make_optimizer(ycfg)
    params = yolo_mod.init_params(jax.random.PRNGKey(seed), spec)
    opt = tx.init(params)
    step = yolo_train.make_train_step(
        spec, tx, reso, reso, donate=False,
        matmul_precision=precision or yolo_train.DEFAULT_TRAIN_PRECISION)
    truths_j = jax.device_put(jnp.asarray(truths))
    n = frames_u8_dev.shape[0]
    rng = np.random.default_rng(seed + 1)
    key = jax.random.PRNGKey(seed + 2)
    t0 = time.time()
    for it in range(iters):
        sel = jnp.asarray(rng.integers(0, n, batch))
        key, k1 = jax.random.split(key)
        imgs = frames_u8_dev[sel].astype(jnp.float32) / 255.0
        aug_i, aug_t = yolo_train.augment_detection_batch(
            k1, imgs, truths_j[sel], ycfg, reso, reso)
        params, opt, m = step(params, opt, aug_i, aug_t)
        if beat is not None:
            beat()
        if verbose and (it + 1) % 500 == 0:
            print(f"  yolo iter {it + 1}/{iters} "
                  f"loss {float(m['loss']):.3f} "
                  f"iou {float(m['head0/avg_iou']):.3f} "
                  f"({time.time() - t0:.0f}s)")
    if verbose:
        print(f"  yolo trained {iters} iters (loss {float(m['loss']):.3f}, "
              f"{time.time() - t0:.0f}s)")
    return params


def train_kpd(frames_u8_dev, bboxes, parts, n_kp, iters, finetune_iters,
              batch, inp_h, inp_w, precision, seed=1, verbose=True,
              sym_perms=None, beat=None):
    """Per-object KPD (FastPose-resnet50) — the slow selftest recipe:
    Adam 1e-3 then a 1e-4 subpixel-convergence phase, on-device DPG
    augmentation, masked-MSE heatmap loss.  For symmetric objects,
    sym_perms switches the loss to the symmetry-aware min-over-modes form
    (`kpd_train.make_loss_fn`): a fixed canonicalization alone leaves a
    label seam in SO(3) that plain MSE blurs across (measured PCK 0.40 on
    the prism vs 0.94+ on its asymmetric twins)."""
    out_h, out_w = inp_h // 4, inp_w // 4
    params = kpd_mod.init_params(jax.random.PRNGKey(seed), n_classes=n_kp,
                                 arch="resnet50")
    aug_cfg = AugmentConfig(inp_h=inp_h, inp_w=inp_w, out_h=out_h,
                            out_w=out_w, rotate=0.0, train=True,
                            flip=False, add_dpg=True)
    bboxes_j = jax.device_put(jnp.asarray(bboxes))
    parts_j = jax.device_put(jnp.asarray(parts))
    n = frames_u8_dev.shape[0]
    rng = np.random.default_rng(seed + 10)
    key = jax.random.PRNGKey(seed + 11)
    for phase, (lr, n_iters) in enumerate(
            [(1e-3, iters), (1e-4, finetune_iters)]):
        if n_iters <= 0:
            continue
        tx = kpd_train.make_optimizer("adam", lr=lr, params_example=params)
        opt = tx.init(params)
        step = kpd_train.make_train_step(
            tx, out_res_h=out_h, donate=False,
            matmul_precision=precision or kpd_train.DEFAULT_TRAIN_PRECISION,
            sym_perms=sym_perms)
        t0 = time.time()
        for it in range(n_iters):
            sel = jnp.asarray(rng.integers(0, n, batch))
            key, k1 = jax.random.split(key)
            imgs01 = frames_u8_dev[sel].astype(jnp.float32) / 255.0
            b = augment_batch(k1, imgs01, bboxes_j[sel], parts_j[sel],
                              aug_cfg)
            params, opt, m = step(params, opt, b)
            if beat is not None:
                beat()
        if verbose:
            print(f"  kpd phase {phase} ({n_iters} iters @{lr:g}): "
                  f"loss {float(m['loss']):.5f} acc {float(m['acc']):.3f} "
                  f"({time.time() - t0:.0f}s)")
    return params


def evaluate_object(pipe, eval_frames, eval_poses, eval_bboxes, obj,
                    pixel_thresh=5.0):
    """Fused-pipeline eval of one object's held-out frames; grades BOTH
    plain ADD and ADD-S so the symmetric object's table row shows the
    metric divergence explicitly (`betapose_evaluate.py:249-266` loop
    semantics: IoU>=0.5 gate, ADD < diameter/10)."""
    out = {k: np.asarray(v) for k, v in pipe(eval_frames).items()}
    n_eval = len(eval_frames)
    add_ok, adds_ok, add_errs, adds_errs, proj, proj_sym, ious, detected = \
        [], [], [], [], [], [], [], 0
    # symmetry modes as 4x4 right-multipliers of the GT pose: projecting
    # the (self-mapping) vertex set under R·S is the symmetric twin of
    # the GT view, so min-over-modes reprojection grades a legitimately-
    # flipped prediction fairly (plain 2D reproj treats it as tens of px)
    sym_poses = [np.eye(4)]
    for S in obj.symmetries:
        M = np.eye(4)
        M[:3, :3] = np.asarray(S)
        sym_poses.append(M)
    for j in range(n_eval):
        if not out["det_valid"][j]:
            continue
        detected += 1
        gt_pose = eval_poses[j]
        pred = np.eye(4)
        pred[:3, :3] = out["cam_R"][j]
        pred[:3, 3] = out["cam_t"][j]
        gb = eval_bboxes[j]
        iou = metrics.iou(gb.tolist(), out["boxes"][j].tolist())
        ious.append(iou)
        if iou < 0.5:
            continue
        a = metrics.add_err(gt_pose, pred, obj.vertices)
        s = metrics.adds_err(gt_pose, pred, obj.vertices)
        add_errs.append(a)
        adds_errs.append(s)
        add_ok.append(a < 0.1 * obj.diameter)
        adds_ok.append(s < 0.1 * obj.diameter)
        proj.append(metrics.projection_error_2d(
            gt_pose, pred, obj.vertices, CAM_K))
        proj_sym.append(min(
            metrics.projection_error_2d(gt_pose @ M, pred, obj.vertices,
                                        CAM_K) for M in sym_poses))
    return {
        "object": obj.name,
        "symmetric": bool(obj.symmetries),
        "n_eval": n_eval,
        "n_detected": detected,
        "diameter_m": obj.diameter,
        "add_acc": float(np.sum(add_ok)) / max(n_eval, 1),
        "adds_acc": float(np.sum(adds_ok)) / max(n_eval, 1),
        "mean_add_m": float(np.mean(add_errs)) if add_errs else float("inf"),
        "mean_adds_m": (float(np.mean(adds_errs)) if adds_errs
                        else float("inf")),
        "mean_2d_px": float(np.mean(proj)) if proj else float("inf"),
        "mean_2d_px_sym": (float(np.mean(proj_sym)) if proj_sym
                           else float("inf")),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
    }


def run_sweep(object_names=None, n_frames=800,
              n_eval=16, yolo_iters=3000, kpd_iters=8000,
              kpd_finetune_iters=3000, kpd_batch=16, yolo_batch=8,
              reso=416, inp_h=320, inp_w=256, n_kp=26, num_classes=15,
              seed=0, z_range=(0.45, 0.65), params_dir=None,
              train_precision=None, left_keypoints=20, verbose=True,
              yolo_frames=None, pnp_score_power=0.0, pnp_spread_power=0.0,
              pnp_depth_prior=0.0, det_capacity=1, beat=None,
              out_json=None):
    """Returns {"per_object": [row...], "all_pass_085": bool}.

    out_json: if set, the per-object table is (re)written to this file
    after EVERY completed row with "partial": true until the sweep
    finishes — a tunnel outage mid-run (the 13-object first run is
    ~3.5 h) still leaves the completed rows on disk, and the rerun that
    resumes from the --params_dir caches overwrites it with the full
    table.

    beat: optional zero-arg liveness callback (core.watchdog) invoked
    after every training step / render / eval so a CLI-armed stall
    watchdog can distinguish a wedged tunnel RPC from slow progress.

    yolo_frames: detector training uses the first yolo_frames frames of
    each object (default: all n_frames).  13 objects x 800 frames as a
    device-resident u8 pool is ~9.6 GB — more than a 16 GB chip can
    spare next to the training step — so the 13-object run caps the
    detector pool (e.g. 300/object = 3.6 GB) while KPD still trains on
    the full per-object set (uploaded one object at a time)."""
    if object_names is None:
        object_names = tuple(objects_mod.OBJECT_BUILDERS)
    objs = [objects_mod.OBJECT_BUILDERS[n](n_kp) for n in object_names]
    yolo_n = min(yolo_frames or n_frames, n_frames)

    ypath = kpaths = None
    if params_dir:
        os.makedirs(params_dir, exist_ok=True)
        fp = {"cache_version": CACHE_VERSION, "objects": list(object_names),
              "n_frames": n_frames, "reso": reso, "inp_h": inp_h,
              "inp_w": inp_w, "n_kp": n_kp, "num_classes": num_classes,
              "seed": seed, "z_range": list(z_range),
              "yolo_iters": yolo_iters, "kpd_iters": kpd_iters,
              "kpd_finetune_iters": kpd_finetune_iters,
              "kpd_batch": kpd_batch, "yolo_batch": yolo_batch,
              # symmetric objects train with the min-over-modes loss;
              # caches trained under plain canonicalized MSE must refuse
              "sym_loss": True,
              # per-sequence render streams (rng keyed by [seed, ci]) —
              # caches from the shared-stream era saw different frames
              "render_rng": "per-seq"}
        if yolo_n != n_frames:
            fp["yolo_frames"] = yolo_n
        resolved = train_precision or kpd_train.DEFAULT_TRAIN_PRECISION
        if resolved != "float32":
            fp["train_precision"] = resolved
        fp_path = os.path.join(params_dir, "config.json")
        if os.path.exists(fp_path):
            on_disk = json.load(open(fp_path))
            if on_disk != fp:
                raise ValueError(
                    f"sweep params_dir {params_dir} was trained with a "
                    f"different config: cached {on_disk} vs requested {fp}"
                    " — use a fresh --params_dir or delete the cache")
        else:
            json.dump(fp, open(fp_path, "w"))
        ypath = os.path.join(params_dir, "yolo.weights")
        kpaths = {o.name: os.path.join(params_dir, f"kpd_{o.name}.npz")
                  for o in objs}

    # ---- render + annotate every sequence ----
    # rng keyed per sequence so a crashed/resumed run re-renders the
    # identical streams regardless of which objects are cached
    seqs = []
    for ci, obj in enumerate(objs):
        t0 = time.time()
        rng = np.random.default_rng([seed, 101 + ci])
        fr, po, bb, pa = render_sequence(rng, obj, n_frames + n_eval,
                                         z_range)
        seqs.append({"obj": obj, "class_id": ci,
                     "frames": fr[:n_frames], "bboxes": bb[:n_frames],
                     "parts": pa[:n_frames],
                     "eval_frames": fr[n_frames:],
                     "eval_poses": po[n_frames:],
                     "eval_bboxes": bb[n_frames:]})
        if verbose:
            print(f"rendered seq {ci + 1:02d} ({obj.name}): "
                  f"{n_frames}+{n_eval} scenes ({time.time() - t0:.0f}s)")
        if beat is not None:
            beat()

    # ---- shared production-shape detector ----
    spec = yolo_mod.build_spec(make_yolov3_cfg(
        num_classes=num_classes, width=reso, height=reso))
    need_yolo = not (ypath and os.path.exists(ypath))
    if need_yolo:
        # device-resident uint8 detector pool: first yolo_n frames per
        # object (one upload through the 36 MB/s tunnel instead of
        # per-batch feeds); freed before the KPD phase
        all_dev = jnp.concatenate([
            jax.device_put(jnp.asarray(s["frames"][:yolo_n]))
            for s in seqs])
        truths = np.zeros((len(seqs) * yolo_n, 4, 5), np.float32)
        for si, s in enumerate(seqs):
            for i, bb in enumerate(s["bboxes"][:yolo_n]):
                truths[si * yolo_n + i, 0] = [
                    (bb[0] + bb[2]) / 2 / 640, (bb[1] + bb[3]) / 2 / 480,
                    (bb[2] - bb[0]) / 640, (bb[3] - bb[1]) / 480,
                    s["class_id"]]
        if verbose:
            print(f"training shared detector: {num_classes}-class yolov3 "
                  f"@{reso}² on {len(truths)} frames")
        yparams = train_detector(spec, all_dev, truths, yolo_iters,
                                 yolo_batch, reso, train_precision,
                                 seed=seed, verbose=verbose, beat=beat)
        del all_dev
        if ypath:
            yolo_mod.save_darknet_weights(spec, jax.device_get(yparams),
                                          ypath)
    else:
        yparams, _ = yolo_mod.load_darknet_weights(spec, ypath,
                                                   allow_partial=False)
        if verbose:
            print(f"yolo weights loaded from {ypath}")
    yfolded = yolo_mod.fold_bn(spec, yparams)

    # ---- per-object KPD + eval ----
    rows = []
    for s in seqs:
        obj = s["obj"]
        kpath = kpaths[obj.name] if kpaths else None
        if kpath and os.path.exists(kpath):
            from betapose_tpu.core import checkpoint as ckpt
            kparams = kpd_mod.init_params(jax.random.PRNGKey(1),
                                          n_classes=n_kp, arch="resnet50")
            kparams = ckpt.load_pytree_npz(kpath, kparams)
            if verbose:
                print(f"kpd[{obj.name}] loaded from {kpath}")
        else:
            if verbose:
                print(f"training kpd[{obj.name}]")
            pool_dev = jax.device_put(jnp.asarray(s["frames"]))
            kparams = train_kpd(pool_dev, s["bboxes"],
                                s["parts"], n_kp, kpd_iters,
                                kpd_finetune_iters, kpd_batch, inp_h, inp_w,
                                train_precision, seed=seed + s["class_id"],
                                verbose=verbose,
                                sym_perms=obj.symmetry_perms or None,
                                beat=beat)
            del pool_dev
            if kpath:
                from betapose_tpu.core import checkpoint as ckpt
                ckpt.save_pytree_npz(kpath, jax.device_get(kparams))
        pcfg = PipelineConfig(
            reso=reso, inp_h=inp_h, inp_w=inp_w,
            out_h=inp_h // 4, out_w=inp_w // 4, n_kp=n_kp,
            left_keypoints=left_keypoints, confidence=0.005,
            compute_dtype="float32", pallas_decode=None,
            pnp_robust_rounds=2, target_class=s["class_id"],
            pnp_score_power=pnp_score_power,
            pnp_spread_power=pnp_spread_power,
            pnp_depth_prior=pnp_depth_prior,
            det_capacity=det_capacity)
        pipe = PosePipeline(spec, yfolded, kparams, obj.keypoints, CAM_K,
                            pcfg)
        row = evaluate_object(pipe, s["eval_frames"], s["eval_poses"],
                              s["eval_bboxes"], obj)
        row["seq"] = s["class_id"] + 1
        rows.append(row)
        if out_json:
            json.dump(json_sanitize({"per_object": rows, "partial":
                                     len(rows) < len(seqs)}),
                      open(out_json, "w"), indent=1)
        if beat is not None:
            beat()
        if verbose:
            metric = "ADD-S" if row["symmetric"] else "ADD"
            acc = row["adds_acc"] if row["symmetric"] else row["add_acc"]
            print(f"Mean add{'(-S)' if row['symmetric'] else ''} accuracy "
                  f"for seq {row['seq']:02d} is: {acc:.3f}")

    # ---- per-seq table (the reference's per-object readout as a block) --
    # symmetric rows show the symmetry-aware (min over modes) 2D reproj,
    # marked "*": the plain number grades a legitimately-flipped mode
    # with an asymmetric metric (mean_2d_px keeps it in the JSON)
    if verbose:
        print("\nseq  object   metric  acc    add_acc  adds_acc  "
              "err_cm   2d_px   iou    det")
        for r in rows:
            metric = "ADD-S" if r["symmetric"] else "ADD"
            acc = r["adds_acc"] if r["symmetric"] else r["add_acc"]
            err = r["mean_adds_m"] if r["symmetric"] else r["mean_add_m"]
            px = (r["mean_2d_px_sym"] if r["symmetric"]
                  else r["mean_2d_px"])
            px_s = f"{px:.1f}{'*' if r['symmetric'] else ' '}"
            print(f"{r['seq']:02d}   {r['object']:<8} {metric:<7} "
                  f"{acc:<6.2f} {r['add_acc']:<8.2f} {r['adds_acc']:<9.2f} "
                  f"{err * 100:<8.2f} {px_s:<7} "
                  f"{r['mean_iou']:<6.3f} "
                  f"{r['n_detected']}/{r['n_eval']}")
    graded = [r["adds_acc"] if r["symmetric"] else r["add_acc"]
              for r in rows]
    return {"per_object": rows,
            "all_pass_085": bool(all(a >= 0.85 for a in graded))}


def json_sanitize(x):
    """Replace non-finite floats with None so --out_json emits strict
    JSON (json.dump would write the non-standard `Infinity` token for
    the no-detection sentinel float('inf'))."""
    if isinstance(x, dict):
        return {k: json_sanitize(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [json_sanitize(v) for v in x]
    if isinstance(x, float) and not np.isfinite(x):
        return None
    return x


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--objects", type=str, default="all",
                   help="comma list of objects.OBJECT_BUILDERS names, or "
                        "'all' for the full 13-object roster")
    p.add_argument("--frames", type=int, default=800)
    p.add_argument("--eval_frames", type=int, default=16)
    p.add_argument("--yolo_iters", type=int, default=3000)
    p.add_argument("--yolo_frames", type=int, default=None,
                   help="detector pool size per object (default: all "
                        "--frames; cap it for the 13-object run — see "
                        "run_sweep)")
    p.add_argument("--kpd_iters", type=int, default=8000)
    p.add_argument("--kpd_finetune", type=int, default=3000)
    p.add_argument("--num_classes", type=int, default=15,
                   help="detector head width (production yolo-linemod.cfg "
                        "= 15; only len(--objects) slots get data)")
    p.add_argument("--reso", type=int, default=416)
    p.add_argument("--params_dir", type=str, default=None)
    p.add_argument("--train_precision", type=str, default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"])
    p.add_argument("--out_json", type=str, default=None,
                   help="write the per-object result table to this file")
    p.add_argument("--left_keypoints", type=int, default=20)
    p.add_argument("--det_capacity", type=int, default=1)
    p.add_argument("--pnp_score_power", type=float, default=0.0)
    p.add_argument("--pnp_spread_power", type=float, default=0.0)
    p.add_argument("--pnp_depth_prior", type=float, default=0.0)
    p.add_argument("--stall_timeout", type=float, default=900.0,
                   help="hard-exit (code 3) if no step/render/eval "
                        "completes for this many seconds — a wedged "
                        "tunnel RPC cannot be interrupted from Python, "
                        "only escaped; rerun to resume from --params_dir "
                        "caches.  0 disables")
    args = p.parse_args(argv)
    names = (tuple(objects_mod.OBJECT_BUILDERS) if args.objects == "all"
             else tuple(args.objects.split(",")))
    from betapose_tpu.core.watchdog import CHIP_CLAIM_PATH, StallWatchdog
    with StallWatchdog(args.stall_timeout, label="sweep",
                       yield_to=CHIP_CLAIM_PATH) as wd:
        out = run_sweep(object_names=names,
                        n_frames=args.frames, n_eval=args.eval_frames,
                        yolo_iters=args.yolo_iters,
                        kpd_iters=args.kpd_iters,
                        kpd_finetune_iters=args.kpd_finetune,
                        num_classes=args.num_classes, reso=args.reso,
                        params_dir=args.params_dir,
                        train_precision=args.train_precision,
                        yolo_frames=args.yolo_frames,
                        left_keypoints=args.left_keypoints,
                        det_capacity=args.det_capacity,
                        pnp_score_power=args.pnp_score_power,
                        pnp_spread_power=args.pnp_spread_power,
                        pnp_depth_prior=args.pnp_depth_prior,
                        beat=wd.beat if wd.enabled else None,
                        out_json=args.out_json)
    if args.out_json:
        json.dump(json_sanitize(out), open(args.out_json, "w"), indent=1)
    return out


if __name__ == "__main__":
    main()
