"""Per-stage device-time + FLOPs profile of the fused pose pipeline
(VERDICT r2 #2: publish where the time goes).

Measures, on the current backend (run it on the TPU):
- fused single-graph step time (the production path);
- per-stage wall time with device sync between stages (det / pose / post —
  the reference's dt/pt/pn buckets) via PosePipeline.profiled_call;
- a finer decomposition of the det stage (resize matmul, YOLO conv stack,
  crop gather-matmuls) and the post stage (heatmap decode, PnP) from
  separately jitted sub-graphs;
- XLA cost-analysis FLOPs per stage -> per-stage MFU at the measured rate.

Prints one JSON document.  Usage:
    python -m betapose_tpu.tools.profile_pipeline [--batch 64] [--iters 10]
Optionally --trace <logdir> captures a jax.profiler trace around the fused
step for TensorBoard/xprof.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed(fn, args, iters, get):
    import jax
    out = fn(*args)
    jax.device_get(get(out))          # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(get(out))
    return (time.perf_counter() - t0) / iters


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--det_capacity", type=int, default=1)
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace logdir (optional)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.models import kpd as kpd_mod
    from betapose_tpu.models.darknet_cfg import make_yolov3_cfg
    from betapose_tpu.eval import pipeline as pipe_mod
    from betapose_tpu.eval.pipeline import PosePipeline, PipelineConfig
    from betapose_tpu.core.profiling import RuntimeProfile, device_trace
    from betapose_tpu.ops import image as image_ops

    spec = yolo_mod.build_spec(make_yolov3_cfg(num_classes=1))
    yolo_params = yolo_mod.fold_bn(
        spec, yolo_mod.init_params(jax.random.PRNGKey(0), spec))
    kpd_params = kpd_mod.init_params(jax.random.PRNGKey(1), n_classes=50,
                                     arch="resnet101")
    rng = np.random.default_rng(0)
    kp3d = rng.standard_normal((50, 3)) * 0.05
    cam_K = np.array([[572.4114, 0.0, 325.2611],
                      [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]])
    cfg = PipelineConfig(det_capacity=args.det_capacity)
    pipe = PosePipeline(spec, yolo_params, kpd_params, kp3d, cam_K, cfg)

    b = args.batch
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (b, 480, 640, 3), dtype=np.uint8)))

    # ---- fused step ----
    fused_s = _timed(lambda f: pipe(f), (frames,), args.iters,
                     lambda o: o["cam_t"])
    fused_flops = _flops(pipe._step, pipe.yolo_params, pipe.kpd_params,
                         frames, pipe.kp3d, pipe.cam_K)

    if args.trace:
        with device_trace(args.trace):
            jax.device_get(pipe(frames)["cam_t"])

    # ---- dt/pt/pn via profiled_call ----
    prof = RuntimeProfile()
    pipe.profiled_call(frames, RuntimeProfile())     # compile stages
    for _ in range(args.iters):
        pipe.profiled_call(frames, prof)
    det_fn, pose_fn, post_fn = pipe._stages
    crops = det_fn(pipe.yolo_params, frames)["crops"]
    det_flops = _flops(det_fn, pipe.yolo_params, frames)
    pose_flops = _flops(pose_fn, pipe.kpd_params, crops)

    # ---- finer decomposition ----
    sub = {}
    imgs = frames.astype(jnp.float32) / 255.0
    resize = jax.jit(lambda x: image_ops.resize_bilinear_matmul(
        x, cfg.reso, cfg.reso))
    sub["resize_ms"] = _timed(resize, (imgs,), args.iters,
                              lambda o: o[0, 0, 0]) * 1e3
    yolo_in = resize(imgs)
    from betapose_tpu.models.stem_s2d import forward_with_s2d_stem
    yolo_fwd = jax.jit(lambda p, x: forward_with_s2d_stem(
        spec, p, x.astype(jnp.bfloat16), cfg.reso))
    sub["yolo_fwd_ms"] = _timed(yolo_fwd, (pipe.yolo_params, yolo_in),
                                args.iters, lambda o: o[0, 0, 0]) * 1e3
    kpd_fwd = jax.jit(lambda p, x: kpd_mod.forward(
        p, x.astype(jnp.bfloat16)))
    sub["kpd_fwd_ms"] = _timed(kpd_fwd, (pipe.kpd_params, crops),
                               args.iters, lambda o: o[0, 0, 0, 0]) * 1e3

    det_out0 = jax.block_until_ready(det_fn(pipe.yolo_params, frames))
    boxes = det_out0["boxes"] if args.det_capacity == 1 else \
        det_out0["boxes"][:, 0]

    def crop_all(img, bx):
        crops_, p1, p2 = image_ops.crop_from_dets(
            img, bx[None, :], cfg.inp_h, cfg.inp_w)
        return crops_[0]
    crop_fn = jax.jit(lambda im, bx: jax.vmap(crop_all)(im, bx))
    sub["crop_ms"] = _timed(crop_fn, (imgs, boxes), args.iters,
                            lambda o: o[0, 0, 0, 0]) * 1e3

    hm = pose_fn(pipe.kpd_params, crops)
    det_out = det_fn(pipe.yolo_params, frames)
    decode = jax.jit(lambda h, p1, p2: pipe_mod._decode_crops(
        cfg, h, p1, p2))
    sub["decode_ms"] = _timed(decode, (hm, det_out["pt1"], det_out["pt2"]),
                              args.iters, lambda o: o[1][0, 0]) * 1e3
    from betapose_tpu.ops import pnp as pnp_ops
    kp3d_b = jnp.broadcast_to(pipe.kp3d[None], (b,) + pipe.kp3d.shape)
    kp2d = decode(hm, det_out["pt1"], det_out["pt2"])[1][:b]
    pnp = jax.jit(jax.vmap(lambda p3, p2: pnp_ops.solve_pnp(
        p3, p2, pipe.cam_K, iters=cfg.pnp_iters)))
    sub["pnp_ms"] = _timed(pnp, (kp3d_b[:b], kp2d), args.iters,
                           lambda o: o[1]) * 1e3

    dev = jax.devices()[0].device_kind
    peak = 394e12 if "v5" in dev.lower() else None
    fps = b / fused_s
    out = {
        "device": dev,
        "batch": b,
        "det_capacity": args.det_capacity,
        "fused_ms_per_batch": round(fused_s * 1e3, 2),
        "fused_fps": round(fps, 1),
        "stage_ms": {k: round(prof.mean(k) * 1e3, 2)
                     for k in ("dt", "pt", "pn")},
        "sub_ms": {k: round(v, 2) for k, v in sub.items()},
        "flops_per_batch": {
            "fused": fused_flops, "det": det_flops, "pose": pose_flops},
        "mfu_fused": (round(fused_flops / fused_s / peak, 4)
                      if fused_flops and peak else None),
        "note": ("stage_ms has per-stage sync overhead vs the fused step; "
                 "sub_ms are separately jitted sub-graphs (no cross-stage "
                 "fusion), so sums can exceed fused_ms_per_batch"),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
