"""darknet-compatible detector CLI.

Counterpart of the vendored darknet's command surface
(`train_YOLO/src/darknet.c:351` main -> `detector.c:1225` run_detector):

  python -m betapose_tpu.tools.darknet_cli detector train  <data> <cfg> [weights] [-clear] [-gpus 0,1] [-resize_buckets 3] [-precision bfloat16|tensorfloat32|float32]
  python -m betapose_tpu.tools.darknet_cli detector test   <data> <cfg> <weights> <image> [-thresh .24]
  python -m betapose_tpu.tools.darknet_cli detector valid  <data> <cfg> <weights>
  python -m betapose_tpu.tools.darknet_cli detector recall <data> <cfg> <weights>
  python -m betapose_tpu.tools.darknet_cli detector map    <data> <cfg> <weights> [-iou_thresh .25]
  python -m betapose_tpu.tools.darknet_cli detector demo   <data> <cfg> <weights> [video] [-out_filename o.avi] [-c 0] [-max_frames N] [-http_port 8090]
  python -m betapose_tpu.tools.darknet_cli detector calc_anchors <data> -num_of_clusters 9 -width 416 -height 416
  python -m betapose_tpu.tools.darknet_cli partial <cfg> <weights> <out> <cutoff>
  python -m betapose_tpu.tools.darknet_cli average <cfg> <out> <w1> <w2> [...]
  python -m betapose_tpu.tools.darknet_cli rescale|rgbgr|reset|denormalize|normalize|oneoff <cfg> <weights> <out>
  python -m betapose_tpu.tools.darknet_cli statistics <cfg> <weights>
  python -m betapose_tpu.tools.darknet_cli speed <cfg> [tics]
  python -m betapose_tpu.tools.darknet_cli ops <cfg>
  python -m betapose_tpu.tools.darknet_cli classifier train   <data> <cfg> [weights] [-clear] [-gpus 0,1]
  python -m betapose_tpu.tools.darknet_cli classifier predict <data> <cfg> <weights> <image> [-t N]
  python -m betapose_tpu.tools.darknet_cli classifier valid   <data> <cfg> <weights> [-t N]

.data files are the same key=value format (`option_list.c read_data_cfg`):
classes/train/valid/names/backup.  .cfg files are stock darknet network
descriptions; .weights files are byte-compatible with darknet's
(models/yolov3.py).  `-gpus` maps to the device-mesh data-parallel size.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def read_data_cfg(path):
    """key=value parser (option_list.c:read_data_cfg)."""
    opts = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                opts[k.strip()] = v.strip()
    return opts


class CliError(int):
    """Error exit status distinguishable from DATA returns (frame counts,
    ratios) that happen to equal 1 — the __main__ shim maps only CliError
    to a nonzero process exit."""


def _load_model(cfg_path, weights_path=None, require=False):
    """An EXPLICIT weights path that doesn't resolve is ALWAYS a hard
    error — a typo'd path must never silently evaluate random init and
    emit a plausible-looking readout (same convention as the eval CLI's
    explicit-weights check).  require=True additionally makes weights
    mandatory (surgery/statistics verbs); omitting the path on other
    verbs still runs random-init smoke mode, like darknet."""
    import jax
    from betapose_tpu.models import yolov3 as yolo_mod
    with open(cfg_path) as f:
        cfg_text = f.read()
    spec = yolo_mod.build_spec(cfg_text)
    if weights_path and os.path.exists(weights_path):
        params, _ = yolo_mod.load_darknet_weights(spec, weights_path)
        print(f"Loaded weights from {weights_path}")
    else:
        if require or weights_path:
            raise FileNotFoundError(
                f"weights {weights_path} not found (required by this verb)")
        params = yolo_mod.init_params(jax.random.PRNGKey(0), spec)
    net = spec.net_info
    reso = int(net.get("width", 416))
    return spec, params, reso


def _detect_images(spec, params, reso, paths, thresh, nms_thresh=0.45,
                   batch=16):
    """Run detection over images; returns per-image list of
    (x1,y1,x2,y2,score,cls) in original-image pixels (host NMS)."""
    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.data.loader import imread_rgb

    folded = yolo_mod.fold_bn(spec, params)

    @jax.jit
    def infer(x):
        return yolo_mod.forward(spec, folded, x.astype(jnp.bfloat16), reso)

    results = []
    for start in range(0, len(paths), batch):
        chunk = paths[start:start + batch]
        imgs, dims = [], []
        for p in chunk:
            im = imread_rgb(p)
            dims.append(im.shape[:2])
            import cv2
            imgs.append(cv2.resize(im, (reso, reso)).astype(np.float32) / 255)
        x = jnp.asarray(np.stack(imgs))
        preds = np.asarray(infer(x))
        results.extend(
            _postprocess_dets(preds, dims, reso, thresh, nms_thresh))
    return results


def _postprocess_dets(preds, dims, reso, thresh, nms_thresh):
    """Decoded predictions [B,rows,5+nC] -> per-image (x1,y1,x2,y2,score,
    cls) arrays in original-image pixels (confidence gate + host NMS)."""
    out = []
    for bi, (h0, w0) in enumerate(dims):
        p = preds[bi]
        obj = p[:, 4]
        keep = obj > thresh
        dets = p[keep]
        if len(dets) == 0:
            out.append(np.zeros((0, 6)))
            continue
        cls_score = dets[:, 5:].max(axis=1) * dets[:, 4]
        cls_id = dets[:, 5:].argmax(axis=1)
        boxes = np.stack([
            (dets[:, 0] - dets[:, 2] / 2) * w0 / reso,
            (dets[:, 1] - dets[:, 3] / 2) * h0 / reso,
            (dets[:, 0] + dets[:, 2] / 2) * w0 / reso,
            (dets[:, 1] + dets[:, 3] / 2) * h0 / reso], axis=1)
        order = np.argsort(-cls_score)
        boxes, cls_score, cls_id = boxes[order], cls_score[order], cls_id[order]
        keep_idx = _greedy_nms(boxes, cls_score, cls_id, nms_thresh)
        out.append(np.concatenate(
            [boxes[keep_idx], cls_score[keep_idx, None],
             cls_id[keep_idx, None].astype(np.float64)], axis=1))
    return out


def _greedy_nms(boxes, scores, cls_id, thresh):
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in range(len(boxes)):
        if not alive[i]:
            continue
        keep.append(i)
        for j in range(i + 1, len(boxes)):
            if alive[j] and cls_id[j] == cls_id[i]:
                if _iou_xyxy(boxes[i], boxes[j]) > thresh:
                    alive[j] = False
    return np.asarray(keep, int)


def _iou_xyxy(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    if x2 <= x1 or y2 <= y1:
        return 0.0
    inter = (x2 - x1) * (y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def _load_gt(paths):
    """Ground truth from sibling .txt label files, in pixels per image."""
    from betapose_tpu.train.yolo_train import load_darknet_labels
    import cv2
    gts = []
    for p in paths:
        txt = os.path.splitext(p)[0] + ".txt"
        if not os.path.exists(txt):
            txt = p.replace("images", "labels").rsplit(".", 1)[0] + ".txt"
        im = cv2.imread(p)
        h0, w0 = im.shape[:2]
        rows = []
        if os.path.exists(txt):
            for ln in open(txt):
                v = ln.split()
                if len(v) >= 5:
                    cls, cx, cy, w, h = (float(t) for t in v[:5])
                    rows.append([(cx - w / 2) * w0, (cy - h / 2) * h0,
                                 (cx + w / 2) * w0, (cy + h / 2) * h0, cls])
        gts.append(np.asarray(rows).reshape(-1, 5))
    return gts


def cmd_map(data, cfg, weights, iou_thresh=0.25, thresh=0.005):
    """validate_detector_map equivalent (`detector.c:556`): VOC-style AP per
    class at the given IoU threshold over the valid list."""
    opts = read_data_cfg(data)
    paths = [ln.strip() for ln in open(opts["valid"]) if ln.strip()]
    n_classes = int(opts.get("classes", 1))
    spec, params, reso = _load_model(cfg, weights)
    dets = _detect_images(spec, params, reso, paths, thresh)
    gts = _load_gt(paths)

    aps = []
    for c in range(n_classes):
        records = []  # (score, is_tp)
        n_gt = 0
        for di, (det, gt) in enumerate(zip(dets, gts)):
            gt_c = gt[gt[:, 4] == c]
            n_gt += len(gt_c)
            used = np.zeros(len(gt_c), bool)
            det_c = det[det[:, 5] == c]
            for d in det_c:
                best, bi = 0.0, -1
                for gi, g in enumerate(gt_c):
                    i = _iou_xyxy(d[:4], g[:4])
                    if i > best:
                        best, bi = i, gi
                tp = best > iou_thresh and bi >= 0 and not used[bi]
                if tp:
                    used[bi] = True
                records.append((d[4], tp))
        if n_gt == 0:
            continue
        records.sort(key=lambda r: -r[0])
        tps = np.cumsum([r[1] for r in records]) if records else np.array([])
        fps = np.cumsum([not r[1] for r in records]) if records else np.array([])
        rec = tps / n_gt if len(tps) else np.array([0.0])
        prec = tps / np.maximum(tps + fps, 1e-12) if len(tps) else np.array([0.0])
        ap = 0.0
        for t in np.arange(0, 1.01, 0.1):  # 11-point VOC AP
            p = prec[rec >= t].max() if np.any(rec >= t) else 0.0
            ap += p / 11
        aps.append(ap)
        print(f"class {c}: ap = {ap * 100:.2f}%")
    mean_ap = float(np.mean(aps)) if aps else 0.0
    print(f"mean average precision (mAP@{iou_thresh:.2f}) = {mean_ap:.6f}, "
          f"or {mean_ap * 100:.2f}%")
    return mean_ap


def cmd_recall(data, cfg, weights, thresh=0.001, iou_thresh=0.5):
    """validate_detector_recall equivalent (`detector.c:461`): proposals,
    avg IoU, recall over the valid list."""
    opts = read_data_cfg(data)
    paths = [ln.strip() for ln in open(opts["valid"]) if ln.strip()]
    spec, params, reso = _load_model(cfg, weights)
    dets = _detect_images(spec, params, reso, paths, thresh)
    gts = _load_gt(paths)
    total, correct, proposals, iou_sum = 0, 0, 0, 0.0
    for i, (det, gt) in enumerate(zip(dets, gts)):
        proposals += len(det)
        for g in gt:
            total += 1
            best = max((_iou_xyxy(d[:4], g[:4]) for d in det), default=0.0)
            iou_sum += best
            if best > iou_thresh:
                correct += 1
        print(f"{i:5d} {correct:5d} {total:5d}\tRPs/Img: "
              f"{proposals / (i + 1):.2f}\tIOU: "
              f"{iou_sum / max(total, 1) * 100:.2f}%\tRecall:"
              f"{correct / max(total, 1) * 100:.2f}%")
    return correct / max(total, 1)


def cmd_demo(data, cfg, weights, video=None, thresh=0.24, nms_thresh=0.45,
             out_filename=None, batch=8, webcam="0", max_frames=None,
             http_port=None):
    """`detector demo` equivalent (`detector.c:1287-1297` -> demo.c): run
    the detector continuously over a video file (or webcam when no file is
    given), print per-frame detections, and optionally write an overlay
    video (darknet's `-out_filename`).  max_frames bounds the webcam loop
    (darknet runs until keypress; a CLI flag is the non-interactive
    analog).  http_port serves the overlay frames as an MJPEG HTTP stream
    (darknet's `-http_port`, `detector.c:1230` -> http_stream.cpp)."""
    import cv2
    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.data.video import VideoLoader, WebcamLoader, VideoWriter

    opts = read_data_cfg(data)
    names = ([ln.strip() for ln in open(opts["names"])]
             if "names" in opts and os.path.exists(opts.get("names", ""))
             else [])
    spec, params, reso = _load_model(cfg, weights)
    folded = yolo_mod.fold_bn(spec, params)

    @jax.jit
    def infer(x):
        return yolo_mod.forward(spec, folded, x.astype(jnp.bfloat16), reso)

    def detect_batch(frames_rgb):
        x = jnp.asarray(np.stack(
            [cv2.resize(f, (reso, reso)) for f in frames_rgb]
        ).astype(np.float32) / 255.0)
        preds = np.asarray(infer(x))
        dims = [f.shape[:2] for f in frames_rgb]
        return _postprocess_dets(preds, dims, reso, thresh, nms_thresh)

    writer = None
    streamer = None
    if http_port is not None:
        from betapose_tpu.tools.http_stream import MjpegStreamer
        streamer = MjpegStreamer(int(http_port))
        print(f"MJPEG stream on http://0.0.0.0:{streamer.port}/")
    n_frames = 0
    n_dets = 0

    def emit(frame_rgb, dets):
        nonlocal n_frames, n_dets
        n_frames += 1
        n_dets += len(dets)
        for d in dets:
            cname = (names[int(d[5])] if int(d[5]) < len(names)
                     else str(int(d[5])))
            print(f"frame {n_frames}: {cname} {d[4]:.3f} "
                  f"[{d[0]:.0f},{d[1]:.0f},{d[2]:.0f},{d[3]:.0f}]")
        if writer is not None or streamer is not None:
            img = frame_rgb.copy()
            for d in dets:
                cv2.rectangle(img, (int(d[0]), int(d[1])),
                              (int(d[2]), int(d[3])), (60, 255, 120), 2)
            if writer is not None:
                writer.write_rgb(img)
            if streamer is not None:
                streamer.write_rgb(img)

    if video:
        loader = VideoLoader(video, batch_size=batch)
        if out_filename:
            _, fps, size = loader.videoinfo()
            writer = VideoWriter(out_filename, fps or 25, size)
        for frames in loader:
            for f, dets in zip(frames, detect_batch(list(frames))):
                emit(f, dets)
                if max_frames and n_frames >= max_frames:
                    break
            if max_frames and n_frames >= max_frames:
                break
    else:
        cam = WebcamLoader(webcam)
        try:
            while max_frames is None or n_frames < max_frames:
                frame = cam.read()
                emit(frame, detect_batch([frame])[0])
        finally:
            cam.stop()
    if writer is not None:
        writer.release()
    if streamer is not None:
        streamer.close()
    print(f"demo: {n_frames} frames, {n_dets} detections")
    return n_frames


def cmd_test(data, cfg, weights, image, thresh=0.24):
    """test_detector equivalent (`detector.c:1100`): print detections for
    one image."""
    opts = read_data_cfg(data)
    names = []
    if "names" in opts and os.path.exists(opts["names"]):
        names = [ln.strip() for ln in open(opts["names"])]
    spec, params, reso = _load_model(cfg, weights)
    dets = _detect_images(spec, params, reso, [image], thresh)[0]
    for d in dets:
        cname = names[int(d[5])] if int(d[5]) < len(names) else str(int(d[5]))
        print(f"{cname}: {d[4] * 100:.0f}%  box "
              f"[{d[0]:.0f}, {d[1]:.0f}, {d[2]:.0f}, {d[3]:.0f}]")
    return dets


def cmd_valid(data, cfg, weights, thresh=0.005, out_dir="results"):
    """validate_detector equivalent: dump detections for the valid list in
    comp4-style text files under `out_dir` (darknet writes results/)."""
    opts = read_data_cfg(data)
    paths = [ln.strip() for ln in open(opts["valid"]) if ln.strip()]
    names = ([ln.strip() for ln in open(opts["names"])]
             if "names" in opts and os.path.exists(opts.get("names", ""))
             else [str(i) for i in range(int(opts.get("classes", 1)))])
    spec, params, reso = _load_model(cfg, weights)
    dets = _detect_images(spec, params, reso, paths, thresh)
    os.makedirs(out_dir, exist_ok=True)
    files = {c: open(os.path.join(
        out_dir, f"comp4_det_test_{names[c]}.txt"), "w")
        for c in range(len(names))}
    for p, det in zip(paths, dets):
        image_id = os.path.splitext(os.path.basename(p))[0]
        for d in det:
            c = int(d[5])
            files[c].write(f"{image_id} {d[4]:.6f} {d[0] + 1:.6f} "
                           f"{d[1] + 1:.6f} {d[2] + 1:.6f} {d[3] + 1:.6f}\n")
    for f in files.values():
        f.close()
    print(f"{out_dir}/ written")


def cmd_classifier_predict(data, cfg, weights, image, top=0):
    """predict_classifier (`classifier.c:715-770`): letterbox the image to
    net dims (fill .5, image.c letterbox_image), forward, print the top-k
    `name: prob` lines."""
    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.ops.image import letterbox
    from betapose_tpu.data.loader import imread_rgb

    opts = read_data_cfg(data)
    names_path = opts.get("names") or opts.get("labels", "")
    names = ([ln.strip() for ln in open(names_path)]
             if names_path and os.path.exists(names_path) else [])
    classes = int(opts.get("classes", len(names) or 2))
    if top == 0:
        top = int(opts.get("top", 1))
    top = min(top, classes)

    spec, params, reso = _load_model(cfg, weights)
    folded = yolo_mod.fold_bn(spec, params)
    im = imread_rgb(image).astype(np.float32) / 255.0
    x = letterbox(jnp.asarray(im), reso, reso, fill=0.5)[None]
    pred = np.asarray(jax.jit(
        lambda v: yolo_mod.forward(spec, folded, v, reso))(x)).reshape(-1)
    order = np.argsort(-pred)[:top]
    for idx in order:
        name = names[idx] if idx < len(names) else str(idx)
        print(f"{name}: {pred[idx]:f}")
    return [(int(i), float(pred[i])) for i in order]


def cmd_classifier_valid(data, cfg, weights, top=None):
    """validate_classifier_single (`classifier.c:504-565`): resize_min to
    net width, center-crop net.w x net.h, forward, running top-1/top-k
    accuracy prints; class id from the first substring-matching label."""
    import cv2
    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    from betapose_tpu.train.classifier_train import path_class_id
    from betapose_tpu.data.loader import imread_rgb

    opts = read_data_cfg(data)
    labels = [ln.strip() for ln in open(opts["labels"]) if ln.strip()]
    paths = [ln.strip()
             for ln in open(opts.get("valid", opts.get("train")))
             if ln.strip()]
    classes = int(opts.get("classes", len(labels)))
    topk = top if top else int(opts.get("top", 1))
    topk = min(topk, classes)

    spec, params, reso = _load_model(cfg, weights)
    folded = yolo_mod.fold_bn(spec, params)
    infer = jax.jit(lambda v: yolo_mod.forward(spec, folded, v, reso))

    avg_acc = avg_topk = 0.0
    for i, p in enumerate(paths):
        class_id = path_class_id(p, labels)
        im = imread_rgb(p).astype(np.float32) / 255.0
        h, w = im.shape[:2]
        # resize_min (image.c:1430): short side -> net.w, int arithmetic
        if w < h:
            nw, nh = reso, (h * reso) // w
        else:
            nw, nh = (w * reso) // h, reso
        im = cv2.resize(im, (nw, nh))
        t0, l0 = (nh - reso) // 2, (nw - reso) // 2
        crop = im[t0:t0 + reso, l0:l0 + reso]
        pred = np.asarray(infer(jnp.asarray(crop)[None])).reshape(-1)
        order = np.argsort(-pred)[:topk]
        if order[0] == class_id:
            avg_acc += 1
        if class_id in order:
            avg_topk += 1
        print(f"{i}: top 1: {avg_acc / (i + 1):f}, top {topk}: "
              f"{avg_topk / (i + 1):f}")
    return avg_acc / max(len(paths), 1)


def cmd_partial(cfg, weights, out, cutoff: int):
    """darknet weight surgery `partial` (darknet.c): write the first
    `cutoff` layers to a new .weights file (backbone extraction)."""
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    yolo_mod.save_partial_weights(spec, params, out, int(cutoff))
    print(f"Saved first {cutoff} layers to {out}")


def cmd_calc_anchors(data, num_of_clusters=5, width=-1, height=-1,
                     out_file="anchors.txt"):
    """`detector calc_anchors` (detector.c calc_anchors():905): k-means++
    (10 attempts, the cvKMeans2 call transcribed to cv2.kmeans) over every
    GT box's (w*width, h*height) in network-input pixels; centers sorted
    ascending by area (anchors_comparator:895); prints the avg IoU of each
    box against its nearest-by-Euclidean anchor and writes `anchors.txt`
    as 'w,h, w,h, ...' ready to paste into a cfg.  The reference's -show
    scatter window is GUI-only and omitted."""
    import cv2
    print(f"\n num_of_clusters = {num_of_clusters}, width = {width}, "
          f"height = {height} ")
    if width < 0 or height < 0:
        print("Usage: darknet detector calc_anchors data/voc.data "
              "-num_of_clusters 9 -width 416 -height 416 \n"
              "Error: set width and height ")
        return CliError(1)
    opts = read_data_cfg(data)
    paths = [ln.strip() for ln in open(opts["train"]) if ln.strip()]
    print(f" read labels from {len(paths)} images ")
    wh = []
    for p in paths:
        # replace_image_to_label (utils.c:225): sibling .txt, with the
        # images/->labels/ convention as fallback
        txt = os.path.splitext(p)[0] + ".txt"
        if not os.path.exists(txt):
            txt = p.replace("images", "labels").rsplit(".", 1)[0] + ".txt"
        if not os.path.exists(txt):
            continue
        for j, ln in enumerate(open(txt)):
            vals = ln.split()
            if len(vals) < 5:
                continue
            _, x, y, w, h = (float(v) for v in vals[:5])
            if not (0 < x <= 1 and 0 < y <= 1 and 0 < w <= 1 and 0 < h <= 1):
                print(f"\n\nWrong label: {txt} - j = {j}, x = {x:f}, "
                      f"y = {y:f}, width = {w:f}, height = {h:f} ")
                continue
            wh.append((w * width, h * height))
    n_boxes = len(wh)
    print(" all loaded. ")
    if n_boxes < num_of_clusters:
        print(f"Error: only {n_boxes} boxes for {num_of_clusters} clusters")
        return CliError(1)
    points = np.asarray(wh, np.float32)
    print("\n calculating k-means++ ...")
    cv2.setRNGSeed(12345)
    _, _, centers = cv2.kmeans(
        points, num_of_clusters, None,
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10000, 0.0),
        attempts=10, flags=cv2.KMEANS_PP_CENTERS)
    centers = centers[np.argsort(centers[:, 0] * centers[:, 1])]

    # avg IoU readout: nearest center by EUCLIDEAN distance (the
    # reference's deliberate quirk — the comment at detector.c:980 admits
    # 1-IoU would be the right metric but ships Euclidean)
    d2 = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    nearest = centers[np.argmin(d2, axis=1)]
    mins = np.minimum(points, nearest)
    inter = mins[:, 0] * mins[:, 1]
    union = (points[:, 0] * points[:, 1]
             + nearest[:, 0] * nearest[:, 1] - inter)
    avg_iou = 100.0 * float((inter / union).mean())
    print(f"\n avg IoU = {avg_iou:2.2f} % ")
    anchors = ", ".join(f"{w:2.4f},{h:2.4f}" for w, h in centers)
    with open(out_file, "w") as f:
        f.write(anchors)
    print(f"\nSaving anchors to the file: {out_file} ")
    print(f"anchors = {anchors}")
    return 0


# ---- weight-surgery family (darknet.c:384-449) --------------------------
# Same verbs, same math, applied to the params pytree instead of in-place
# C arrays.  Each formula cites its darknet source.

def cmd_average(cfg, out, weight_files):
    """`darknet average <cfg> <out> <w1> <w2> ...` (darknet.c average():35):
    elementwise mean over N weight files.  darknet averages CONVOLUTIONAL
    (biases, weights, + BN scales/rolling stats) and CONNECTED (biases and
    weights ONLY — a BN connected layer's scales/rolling stats keep the
    FIRST file's values); every other layer kind keeps the first file's
    params.  Transcribed exactly, quirk included."""
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, acc, _ = _load_model(cfg, weight_files[0], require=True)
    acc = [dict(p) for p in acc]
    conn_avg_keys = ("b", "bn_bias", "w")   # l.biases maps to bn_bias when BN
    for wf in weight_files[1:]:
        params, _ = yolo_mod.load_darknet_weights(spec, wf,
                                                  allow_partial=False)
        for li, l in enumerate(spec.layers):
            if l.kind == "conv":
                for k in acc[li]:
                    acc[li][k] = acc[li][k] + params[li][k]
            elif l.kind == "connected":
                for k in acc[li]:
                    if k in conn_avg_keys:
                        acc[li][k] = acc[li][k] + params[li][k]
    n = len(weight_files)
    for li, l in enumerate(spec.layers):
        if l.kind == "conv":
            acc[li] = {k: v / n for k, v in acc[li].items()}
        elif l.kind == "connected":
            acc[li] = {k: (v / n if k in conn_avg_keys else v)
                       for k, v in acc[li].items()}
    yolo_mod.save_darknet_weights(spec, acc, out)
    print(f"Averaged {n} weight files -> {out}")


def _first_conv(spec):
    for li, l in enumerate(spec.layers):
        if l.kind == "conv":
            return li, l
    raise SystemExit("cfg has no convolutional layer")


def cmd_rescale(cfg, weights, out):
    """`darknet rescale` (darknet.c rescale_net():165 ->
    convolutional_layer.c rescale_weights(l, 2, -.5):947): on the FIRST
    conv layer, and only when it sees 3 input channels: w *= 2, then
    b[o] += sum(w_scaled[..., o]) * -0.5  (input-range remap surgery)."""
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    li, l = _first_conv(spec)
    p = dict(params[li])
    if l.in_channels == 3:
        w = p["w"] * 2.0                             # scale_image(im, 2)
        bias_key = "bn_bias" if l.batch_normalize else "b"
        p[bias_key] = p[bias_key] + jnp.sum(
            w, axis=(0, 1, 2)) * -0.5                # sum*trans per filter
        p["w"] = w
        params = list(params)
        params[li] = p
    yolo_mod.save_darknet_weights(spec, params, out)
    print(f"Rescaled first conv layer -> {out}")


def cmd_rgbgr(cfg, weights, out):
    """`darknet rgbgr` (darknet.c rgbgr_net():183 -> rgbgr_weights():936):
    swap the R and B input-channel planes of the first conv layer's
    filters (convert weights trained on BGR input to RGB or back)."""
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    li, l = _first_conv(spec)
    if l.in_channels == 3:
        params = list(params)
        p = dict(params[li])
        p["w"] = p["w"][:, :, ::-1, :]               # HWIO: flip I axis
        params[li] = p
    yolo_mod.save_darknet_weights(spec, params, out)
    print(f"RGB<->BGR swapped first conv layer -> {out}")


def _denorm_conv(p, eps=1e-5):
    """denormalize_convolutional_layer (convolutional_layer.c:416): fold
    rolling stats into w/bias, reset BN arrays to identity (var -> 1, the
    forward's +eps then leaves a ~1e-5 residual — darknet's exact move)."""
    import jax.numpy as jnp
    scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + eps)
    return {"w": p["w"] * scale[None, None, None, :],
            "bn_bias": p["bn_bias"] - p["bn_mean"] * scale,
            "bn_scale": jnp.ones_like(scale),
            "bn_mean": jnp.zeros_like(scale),
            "bn_var": jnp.ones_like(scale)}


def _denorm_connected(p, eps=1e-6):
    """denormalize_connected_layer (connected_layer.c:200); w is [in, out]
    here, darknet's row-major [out, in] scales rows = our columns."""
    import jax.numpy as jnp
    scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + eps)
    return {"w": p["w"] * scale[None, :],
            "bn_bias": p["bn_bias"] - p["bn_mean"] * scale,
            "bn_scale": jnp.ones_like(scale),
            "bn_mean": jnp.zeros_like(scale),
            "bn_var": jnp.ones_like(scale)}


def cmd_reset(cfg, weights, out):
    """`darknet reset` (darknet.c reset_normalize_net():202): fold BN
    rolling stats into the weights of every batch-normalized conv /
    connected / GRU-sublayer, leaving identity BN arrays IN PLACE (the
    layers stay batch-normalized; contrast `denormalize`)."""
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    params = list(params)
    for li, l in enumerate(spec.layers):
        if not l.batch_normalize:
            continue
        if l.kind == "conv":
            params[li] = _denorm_conv(params[li])
        elif l.kind == "connected":
            params[li] = _denorm_connected(params[li])
        elif l.kind == "gru":
            params[li] = {k: _denorm_connected(sub)
                          for k, sub in params[li].items()}
    yolo_mod.save_darknet_weights(spec, params, out)
    print(f"Folded BN stats (layers stay batch-normalized) -> {out}")


def cmd_denormalize(cfg, weights, out):
    """`darknet denormalize` (darknet.c denormalize_net():303): fold BN
    stats into weights AND clear batch_normalize, so the file is written
    in the bias-only layout (darknet's save_weights honors the cleared
    flag the same way).  Reloading needs a cfg with batch_normalize
    removed — darknet shares that caveat."""
    import dataclasses as _dc
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    params = list(params)
    layers = list(spec.layers)
    for li, l in enumerate(layers):
        if not l.batch_normalize or l.kind not in ("conv", "connected",
                                                   "gru"):
            continue
        if l.kind == "conv":
            f = _denorm_conv(params[li])
            params[li] = {"w": f["w"], "b": f["bn_bias"]}
        elif l.kind == "connected":
            f = _denorm_connected(params[li])
            params[li] = {"w": f["w"], "b": f["bn_bias"]}
        else:   # gru: sublayers lose their BN arrays too
            params[li] = {
                k: {"w": f["w"], "b": f["bn_bias"]}
                for k, f in ((k, _denorm_connected(sub))
                             for k, sub in params[li].items())}
        layers[li] = _dc.replace(l, batch_normalize=False)
    new_spec = yolo_mod.NetworkSpec(tuple(layers), spec.cache_idxs,
                                    spec.net_info, spec.dims)
    yolo_mod.save_darknet_weights(new_spec, params, out)
    print(f"Denormalized (BN folded + flags cleared) -> {out}\n"
          "note: reload with a cfg whose batch_normalize= lines are "
          "removed (same caveat as darknet's denormalize)")


def cmd_normalize(cfg, weights, out):
    """`darknet normalize` (darknet.c normalize_net():240): the inverse
    surgery of `denormalize` — give every NON-batch-normalized conv /
    connected layer identity BN arrays (scale=1, rolling mean=0, rolling
    var=0 — darknet callocs the variance to ZERO, not one: normalize_layer
    darknet.c:225-236) and set batch_normalize, so the file is written in
    the BN layout.  A batch-normalized GRU gets its six sublayers' BN
    arrays RESET to the same identity (darknet.c:256-264 re-runs
    normalize_layer on already-BN sublayers — quirk transcribed).
    Reloading needs a cfg with batch_normalize=1 added (the mirror of
    denormalize's caveat)."""
    import dataclasses as _dc
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)

    def identity_bn(p):
        n = np.asarray(p["bn_bias"] if "bn_bias" in p else p["b"]).size
        return {"bn_scale": jnp.ones((n,), jnp.float32),
                "bn_mean": jnp.zeros((n,), jnp.float32),
                "bn_var": jnp.zeros((n,), jnp.float32)}

    params = list(params)
    layers = list(spec.layers)
    for li, l in enumerate(layers):
        if l.kind in ("conv", "connected") and not l.batch_normalize:
            p = dict(params[li])
            p["bn_bias"] = p.pop("b")
            p.update(identity_bn(p))
            params[li] = p
            layers[li] = _dc.replace(l, batch_normalize=True)
        elif l.kind == "gru" and l.batch_normalize:
            params[li] = {k: {**sub, **identity_bn(sub)}
                          for k, sub in params[li].items()}
    new_spec = yolo_mod.NetworkSpec(tuple(layers), spec.cache_idxs,
                                    spec.net_info, spec.dims)
    yolo_mod.save_darknet_weights(new_spec, params, out)
    print(f"Normalized (identity BN arrays added) -> {out}\n"
          "note: reload with a cfg whose conv/connected blocks carry "
          "batch_normalize=1 (mirror of denormalize's caveat)")


def cmd_oneoff(cfg, weights, out):
    """`darknet oneoff` (darknet.c oneoff():126): YOLO9000-era head
    surgery on the SECOND-TO-LAST layer (a 1x1 conv in the intended
    cfg): tile the first n/3 biases into thirds two and three, and the
    first n/3*c WEIGHT FLOATS likewise (darknet copies n/3*c floats of
    the row-major [n,c,h,w] array regardless of kernel size — exact for
    1x1, a fractional-filter copy otherwise; quirk transcribed on the
    flattened OIHW stream), then zero `seen` and save.  Deviation noted:
    darknet also pointer-bumps the layer to 9372 filters offset by 5
    while LOADING (darknet.c:129-137) — undefined behavior targeting one
    historical ImageNet9k weight file; here the weights must match the
    cfg (load_darknet_weights is shape-checked)."""
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, _ = _load_model(cfg, weights, require=True)
    li = len(spec.layers) - 2
    l = spec.layers[li]
    if l.kind != "conv":
        raise SystemExit("oneoff expects the second-to-last layer to be "
                         f"convolutional (got {l.kind})")
    n, c = l.out_channels, l.in_channels
    print(n)                                   # darknet.c:141 printf("%d")
    p = dict(params[li])
    bias_key = "bn_bias" if l.batch_normalize else "b"
    b = np.asarray(p[bias_key]).copy()
    b[n // 3: 2 * (n // 3)] = b[: n // 3]
    b[2 * (n // 3): 3 * (n // 3)] = b[: n // 3]
    # darknet's weights are row-major [n, c, size, size]; ours HWIO
    w = np.asarray(p["w"]).transpose(3, 2, 0, 1).ravel().copy()
    span = (n // 3) * c
    w[span: 2 * span] = w[:span]
    w[2 * span: 3 * span] = w[:span]
    p[bias_key] = jnp.asarray(b)
    p["w"] = jnp.asarray(
        w.reshape(n, c, l.size, l.size).transpose(2, 3, 1, 0))
    params = list(params)
    params[li] = p
    yolo_mod.save_darknet_weights(spec, params, out)   # seen=0, darknet.c:147
    print(f"Tiled head thirds -> {out}")


def _print_statistics(a, label):
    """print_statistics (utils.c:531): MSE here is sqrt(mean(a^2))."""
    a = np.asarray(a, np.float64).reshape(-1)
    mse = float(np.sqrt(np.mean(a * a)))
    m = float(np.mean(a))
    v = float(np.mean((a - m) ** 2))
    print(f"{label}MSE: {mse:.6f}, Mean: {m:.6f}, Variance: {v:.6f}")


def cmd_statistics(cfg, weights):
    """`darknet statistics` (darknet.c statistics_net():272): per
    batch-normalized CONNECTED / GRU layer, print scale/bias/weight
    stats.  darknet's weights line reads only the first `outputs` floats
    of the row-major [out, in] weight matrix — quirk transcribed (our w
    is [in, out], so that's w.T.ravel()[:outputs])."""
    spec, params, _ = _load_model(cfg, weights, require=True)
    for li, l in enumerate(spec.layers):
        if l.kind == "connected" and l.batch_normalize:
            print(f"Connected Layer {li}")
            _stats_connected(params[li], l.out_channels)
        elif l.kind == "gru" and l.batch_normalize:
            print(f"GRU Layer {li}")
            for name, title in (("input_z", "Input Z"),
                                ("input_r", "Input R"),
                                ("input_h", "Input H"),
                                ("state_z", "State Z"),
                                ("state_r", "State R"),
                                ("state_h", "State H")):
                print(title)
                _stats_connected(params[li][name],
                                 np.asarray(params[li][name]["bn_bias"]).size)
        print()


def _stats_connected(p, outputs):
    """statistics_connected_layer (connected_layer.c:216)."""
    if "bn_scale" in p:
        _print_statistics(p["bn_scale"], "Scales ")
    _print_statistics(p.get("bn_bias", p.get("b")), "Biases ")
    w = np.asarray(p["w"], np.float32).T.reshape(-1)[:outputs]
    _print_statistics(w, "Weights ")


def _save_png_01(path, img01):
    """save_image_png: float [0,1] (H,W,3 or H,W) -> PNG."""
    import cv2
    import numpy as np
    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    if arr.ndim == 3:
        arr = arr[..., ::-1]                      # RGB -> BGR for cv2
    cv2.imwrite(path, arr)


def cmd_visualize(cfg, weights=None, out_dir="."):
    """`darknet visualize <cfg> [weights]` (darknet.c:339-349 ->
    visualize_network, network.c:512): per conv layer, the filter-weight
    collage — darknet's show_images both DISPLAYS and SAVES the
    normalized collage as "<window>.png" (image.c:1988-2004), so the
    headless analog keeps the save half: "Layer <i>.png" per conv layer.
    Documented deviation: filters tile into a near-square grid (darknet
    stacks them vertically via collapse_images_vert); 3-channel filters
    render in color, deeper ones as the channel mean."""
    import os
    import numpy as np
    spec, params, _ = _load_model(cfg, weights)
    saved = []
    for i, l in enumerate(spec.layers):
        if l.kind != "conv":
            continue
        w = np.asarray(params[i]["w"], np.float32)     # HWIO
        k, _, cin, n = w.shape
        if cin == 3:
            tiles = w.transpose(3, 0, 1, 2)            # [n,k,k,3]
        else:
            tiles = w.mean(axis=2).transpose(2, 0, 1)[..., None] \
                .repeat(3, -1)                         # [n,k,k,3]
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        grid = np.zeros((rows * (k + 1) + 1, cols * (k + 1) + 1, 3),
                        np.float32)
        for f in range(n):
            r, c = divmod(f, cols)
            grid[1 + r * (k + 1):1 + r * (k + 1) + k,
                 1 + c * (k + 1):1 + c * (k + 1) + k] = tiles[f]
        lo, hi = grid.min(), grid.max()                # normalize_image
        grid = (grid - lo) / max(hi - lo, 1e-12)
        path = os.path.join(out_dir, f"Layer {i}.png")
        _save_png_01(path, grid)
        saved.append(path)
        print(f"Layer {i}: {n} {k}x{k}x{cin} filters -> {path}")
    return saved


def cmd_imtest(image_path, out_dir="."):
    """`darknet imtest <image>` (darknet.c:455 -> image.c test_resize):
    prints the L2 norm and shows Original / Gray / four fixed HSV
    distortions (hue, sat, exp) = (.1,1.5,1.5), (-.1,.667,.667),
    (.1,1.5,.667), (.1,.667,1.5) — saved as PNGs headlessly (the
    interactive random-augment loop after them is display-only)."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from betapose_tpu.data.loader import imread_rgb
    from betapose_tpu.train.yolo_train import _rgb_to_hsv, _hsv_to_rgb
    im = imread_rgb(image_path).astype(np.float32) / 255.0
    print(f"L2 Norm: {float(np.sqrt((im ** 2).sum())):f}")
    gray = im @ np.array([0.299, 0.587, 0.114], np.float32)

    def distort(dhue, dsat, dexp):
        hsv = _rgb_to_hsv(jnp.asarray(im))
        h = (hsv[..., 0] + dhue) % 1.0
        s = jnp.clip(hsv[..., 1] * dsat, 0.0, 1.0)
        v = jnp.clip(hsv[..., 2] * dexp, 0.0, 1.0)
        return np.asarray(_hsv_to_rgb(jnp.stack([h, s, v], axis=-1)))

    out = {"Original": im, "Gray": gray,
           "C1": distort(0.1, 1.5, 1.5),
           "C2": distort(-0.1, 2 / 3, 2 / 3),
           "C3": distort(0.1, 1.5, 2 / 3),
           "C4": distort(0.1, 2 / 3, 1.5)}
    saved = []
    for name, img in out.items():
        path = os.path.join(out_dir, f"{name}.png")
        _save_png_01(path, img)
        saved.append(path)
        print(f"saved {path}")
    return saved


def cmd_speed(cfg, tics=1000):
    """`darknet speed <cfg> [tics]` (darknet.c speed():93): batch-1
    forward timing over `tics` evals of a blank net-sized image."""
    import time
    import jax
    import jax.numpy as jnp
    from betapose_tpu.models import yolov3 as yolo_mod
    spec, params, reso = _load_model(cfg, None)
    folded = yolo_mod.fold_bn(spec, params)
    h = int(spec.net_info.get("height", reso))
    fwd = jax.jit(lambda v: yolo_mod.forward(spec, folded, v, reso))
    im = jnp.zeros((1, h, reso, 3), jnp.float32)
    jax.block_until_ready(fwd(im))                   # compile outside timing
    start = time.perf_counter()
    for _ in range(int(tics)):
        out = fwd(im)
    jax.block_until_ready(out)
    t = time.perf_counter() - start
    print(f"\n{tics} evals, {t:f} Seconds")
    print(f"Speed: {t / tics:f} sec/eval")
    print(f"Speed: {tics / t:f} Hz")


def cmd_ops(cfg):
    """`darknet ops <cfg>` (darknet.c operations():110): MAC-pair count —
    conv: 2*n*size^2*c*out_h*out_w, connected: 2*in*out; other layers
    free, exactly as darknet counts it."""
    from betapose_tpu.models import yolov3 as yolo_mod
    with open(cfg) as f:
        spec = yolo_mod.build_spec(f.read())
    ops = 0
    for l, (oh, ow) in zip(spec.layers, spec.dims):
        if l.kind == "conv":
            if oh is None or ow is None:
                raise SystemExit(
                    "ops needs width/height in the [net] block")
            ops += 2 * l.out_channels * l.size * l.size * l.in_channels \
                * oh * ow
        elif l.kind == "connected":
            ops += 2 * l.in_features * l.out_channels
    print(f"Floating Point Operations: {ops}")
    print(f"Floating Point Operations: {ops / 1e9:.2f} Bn")
    return ops


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "partial":
        return cmd_partial(argv[1], argv[2], argv[3], int(argv[4]))
    if argv and argv[0] == "average":
        return cmd_average(argv[1], argv[2], argv[3:])
    if argv and argv[0] in ("rescale", "rgbgr", "reset", "denormalize",
                            "normalize", "oneoff"):
        fn = {"rescale": cmd_rescale, "rgbgr": cmd_rgbgr,
              "reset": cmd_reset, "denormalize": cmd_denormalize,
              "normalize": cmd_normalize, "oneoff": cmd_oneoff}[argv[0]]
        return fn(argv[1], argv[2], argv[3])
    if argv and argv[0] == "visualize":
        return cmd_visualize(argv[1], argv[2] if len(argv) > 2 else None)
    if argv and argv[0] == "imtest":
        return cmd_imtest(argv[1])
    if argv and argv[0] == "mkimg":
        # not in this fork's dispatch (darknet.c:453-460 has only
        # visualize/imtest) — fall through to the reference's own error
        print("Not an option: mkimg")
        return CliError(1)
    if argv and argv[0] == "statistics":
        return cmd_statistics(argv[1], argv[2])
    if argv and argv[0] == "speed":
        return cmd_speed(argv[1], int(argv[2]) if len(argv) > 2 else 1000)
    if argv and argv[0] == "ops":
        return cmd_ops(argv[1])
    if argv and argv[0] == "nightmare":
        from betapose_tpu.tools.nightmare import run_nightmare
        return run_nightmare(argv[1:])
    if len(argv) < 2 or argv[0] not in ("detector", "classifier", "rnn"):
        print(__doc__)
        return CliError(1)
    family = argv[0]
    verb = argv[1]
    # boolean flags take no value (darknet find_arg vs find_char_arg,
    # utils.c) — '-clear' mid-line must not swallow a positional, and a
    # value flag's argument must not leak into the positional list
    BOOL_FLAGS = {"clear", "dont_show", "show", "tokenized"}
    pos = []
    flags = {}
    i = 0
    rest = argv[2:]
    while i < len(rest):
        if rest[i].startswith("-"):
            name = rest[i].lstrip("-")
            if name in BOOL_FLAGS or i + 1 >= len(rest):
                flags[name] = ""
                i += 1
            else:
                flags[name] = rest[i + 1]
                i += 2
        else:
            pos.append(rest[i])
            i += 1

    if family == "rnn":
        # run_char_rnn (rnn.c:469-493) live sub-verbs; the Go-tactics
        # variants (validtactic/generatetactic/vec) are scope-cut with
        # the go.c family (PARITY.md §2.7)
        from betapose_tpu.tools import char_rnn
        cfg = pos[0] if pos else None
        weights = pos[1] if len(pos) > 1 else None
        if verb == "train":
            return char_rnn.train_char_rnn(
                cfg, weights,
                filename=flags.get("file", "data/shakespeare.txt"),
                clear="clear" in flags,
                tokenized="tokenized" in flags,
                backup=flags.get("backup", "backup"))
        if verb == "generate":
            return char_rnn.generate_char_rnn(
                cfg, weights, num=int(flags.get("len", 1000)),
                seed_text=flags.get("seed", "\n\n"),
                temp=float(flags.get("temp", 0.7)),
                rseed=int(flags.get("srand", 0)),
                token_file=flags.get("tokens"))
        if verb == "valid":
            import sys as _sys
            return char_rnn.valid_char_rnn(
                cfg, weights, _sys.stdin.read(),
                seed_text=flags.get("seed", "\n\n"))
        if verb in ("validtactic", "generatetactic", "vec"):
            print(f"rnn {verb}: Go-tactics data path — scope-cut with the "
                  "go.c family (PARITY.md §2.7)")
            return CliError(1)
        print(f"unknown rnn verb {verb}")
        return CliError(1)

    if family == "classifier":
        # run_classifier (classifier.c:1182-1235), live sub-verbs
        if verb == "train":
            from betapose_tpu.train.classifier_train import \
                train_from_data_cfg as train_cls
            n_dev = len(flags.get("gpus", "0").split(","))
            return train_cls(pos[0], pos[1],
                             pos[2] if len(pos) > 2 else None,
                             clear="clear" in flags, n_devices=n_dev)
        if verb == "predict":
            return cmd_classifier_predict(
                pos[0], pos[1], pos[2], pos[3],
                top=int(flags.get("t", 0)))
        if verb == "valid":
            return cmd_classifier_valid(
                pos[0], pos[1], pos[2],
                top=int(flags["t"]) if "t" in flags else None)
        print(f"unknown classifier verb {verb}")
        return CliError(1)

    if verb == "train":
        from betapose_tpu.train.train_yolo_main import train_from_data_cfg
        n_dev = len(flags.get("gpus", "0").split(","))
        return train_from_data_cfg(
            pos[0], pos[1], pos[2] if len(pos) > 2 else None,
            clear="clear" in flags, n_devices=n_dev,
            # static analog of darknet's per-10-iter random resize
            # (detector.c:131-161, ~10 sizes); more buckets = finer
            # distribution but one XLA compile each (PARITY deviation d7)
            resize_buckets=int(flags.get("resize_buckets", 3)),
            # MXU mode for the train step (-precision bfloat16|
            # tensorfloat32|float32); default yolo_train.DEFAULT_TRAIN_PRECISION
            precision=flags.get("precision"))
    if verb == "calc_anchors":
        return cmd_calc_anchors(
            pos[0],
            num_of_clusters=int(flags.get("num_of_clusters", 5)),
            width=int(flags.get("width", -1)),
            height=int(flags.get("height", -1)))
    if verb == "map":
        return cmd_map(pos[0], pos[1], pos[2],
                       iou_thresh=float(flags.get("iou_thresh", 0.25)))
    if verb == "recall":
        return cmd_recall(pos[0], pos[1], pos[2])
    if verb == "valid":
        return cmd_valid(pos[0], pos[1], pos[2])
    if verb == "test":
        return cmd_test(pos[0], pos[1], pos[2], pos[3],
                        thresh=float(flags.get("thresh", 0.24)))
    if verb == "demo":
        return cmd_demo(pos[0], pos[1], pos[2],
                        video=pos[3] if len(pos) > 3 else None,
                        thresh=float(flags.get("thresh", 0.24)),
                        out_filename=flags.get("out_filename"),
                        webcam=flags.get("c", "0"),
                        max_frames=int(flags["max_frames"])
                        if "max_frames" in flags else None,
                        http_port=int(flags["http_port"])
                        if "http_port" in flags else None)
    print(f"unknown verb {verb}")
    return CliError(1)


if __name__ == "__main__":
    # main() returns exit codes (0/1) for usage/validation paths but DATA
    # for verbs whose value is useful to Python callers (demo frame count,
    # recall ratio, ops count).  The darknet binary always exits 0 on a
    # completed verb — map data returns to exit 0 so shell `&&` chains
    # behave (a demo that processed N frames must not exit N).
    out = main()
    raise SystemExit(1 if isinstance(out, CliError) else 0)
