"""Video / webcam 6D-pose demo CLI.

Capability parity with the reference video paths (`video_demo.py`,
`cam_demo.py`, `--video/--webcam/--save_video` flags): run the fused pose
pipeline on a video file or webcam stream, optionally writing an overlay
video.

Usage:
  python -m betapose_tpu.eval.video_demo --video in.mp4 --obj_id 1 \
      --sixd_base <sixd> --outdir out/ --save_video
  python -m betapose_tpu.eval.video_demo --webcam 0 ...
"""

from __future__ import annotations

import os

import numpy as np

from betapose_tpu.core.config import make_parser, Config
from betapose_tpu.data.video import (VideoLoader, WebcamLoader, VideoWriter,
                                     draw_pose_overlay)
from betapose_tpu.eval.betapose_evaluate import load_sixd_models, build_pipeline


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = make_parser("Betapose-TPU video demo")
    args = parser.parse_args(argv)
    cfg = Config.from_args(args)

    bench = load_sixd_models(args.sixd_base, cfg.obj_id)
    kp_vertices = bench.kpmodels["{:02d}".format(cfg.obj_id)].vertices
    pipeline = build_pipeline(cfg, args, kp_vertices, bench.cam)
    os.makedirs(cfg.runtime.output_path, exist_ok=True)

    writer = None
    results = []
    if cfg.runtime.video:
        loader = VideoLoader(cfg.runtime.video,
                             batch_size=max(cfg.detection.det_batch, 1))
        if cfg.runtime.save_video:
            _, fps, size = loader.videoinfo()
            writer = VideoWriter(
                os.path.join(cfg.runtime.output_path, "render.avi"),
                fps or 25, size)
        for frames in loader:
            out = {k: np.asarray(v) for k, v in pipeline(frames).items()}
            for j in range(frames.shape[0]):
                results.append({k: out[k][j] for k in
                                ("boxes", "pose_valid", "cam_R", "cam_t")})
                if writer is not None:
                    overlay = draw_pose_overlay(
                        frames[j],
                        out["boxes"][j] if out["det_valid"][j] else None,
                        out["keypoints"][j] if out["pose_valid"][j] else None,
                        out["kp_scores"][j])
                    writer.write_rgb(overlay)
        if writer is not None:
            writer.release()
    else:
        cam = WebcamLoader(cfg.runtime.webcam)
        import itertools
        try:
            for _ in itertools.count():
                frame = cam.read()
                out = {k: np.asarray(v)
                       for k, v in pipeline(frame[None]).items()}
                results.append({k: out[k][0] for k in
                                ("boxes", "pose_valid", "cam_R", "cam_t")})
                print("pose_valid:", bool(out["pose_valid"][0]),
                      "t:", out["cam_t"][0])
        except KeyboardInterrupt:
            cam.stop()
    print(f"processed {len(results)} frames")
    return results


if __name__ == "__main__":
    main()
