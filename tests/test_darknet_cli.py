"""darknet-compatible CLI tests: .data parsing, data prep from a synthetic
SIXD tree, a few training iterations end-to-end, map/recall/test verbs."""

import os

import numpy as np
import pytest
import yaml

from betapose_tpu.tools import darknet_cli, yolo_data_prep

cv2 = pytest.importorskip("cv2")

TINY_NET_CFG = """
[net]
batch=4
subdivisions=1
width=64
height=64
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
burn_in=0
max_batches=3
policy=steps
steps=100
scales=.1
random=0

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
jitter=.3
ignore_thresh = .7
random=0
"""


@pytest.fixture
def tiny_dataset(tmp_path):
    """6 images with a bright square at a known box + darknet labels."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.integers(0, 60, (64, 64, 3), dtype=np.uint8)
        x, y = 16 + 4 * i % 20, 20 + 3 * i % 18
        img[y:y + 20, x:x + 20] = 220
        p = str(img_dir / f"{i:04d}.png")
        cv2.imwrite(p, img)
        cx, cy, w, h = (x + 10) / 64, (y + 10) / 64, 20 / 64, 20 / 64
        with open(str(img_dir / f"{i:04d}.txt"), "w") as f:
            f.write(f"0 {cx} {cy} {w} {h}\n")
        paths.append(p)
    lst = tmp_path / "all.txt"
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p in paths)
    names = tmp_path / "obj.names"
    names.write_text("thing\n")
    data = tmp_path / "obj.data"
    data.write_text(
        f"classes = 1\ntrain = {lst}\nvalid = {lst}\n"
        f"names = {names}\nbackup = {tmp_path / 'backup'}\n")
    cfg = tmp_path / "net.cfg"
    cfg.write_text(TINY_NET_CFG)
    return {"data": str(data), "cfg": str(cfg), "dir": tmp_path,
            "paths": paths}


class TestDataCfg:
    def test_read_data_cfg(self, tiny_dataset):
        opts = darknet_cli.read_data_cfg(tiny_dataset["data"])
        assert opts["classes"] == "1"
        assert os.path.exists(opts["train"])


class TestTrainVerb:
    def test_train_snapshot_resume(self, tiny_dataset):
        from betapose_tpu.train.train_yolo_main import train_from_data_cfg
        train_from_data_cfg(
            tiny_dataset["data"], tiny_dataset["cfg"], None,
            snapshot_every=2, max_batches=3, batch=4, n_devices=1)
        backup = tiny_dataset["dir"] / "backup"
        weights = sorted(os.listdir(backup))
        assert "net_final.weights" in weights
        assert "net_2.weights" in weights
        # resume from the snapshot
        train_from_data_cfg(
            tiny_dataset["data"], tiny_dataset["cfg"],
            str(backup / "net_final.weights"),
            snapshot_every=0, max_batches=3, batch=4, n_devices=1,
            clear=True)


class TestEvalVerbs:
    def test_map_recall_test(self, tiny_dataset, capsys):
        # random weights: mAP near 0 but the whole path must run
        mp = darknet_cli.cmd_map(tiny_dataset["data"], tiny_dataset["cfg"],
                                 None, iou_thresh=0.25, thresh=0.3)
        assert 0.0 <= mp <= 1.0
        rec = darknet_cli.cmd_recall(tiny_dataset["data"],
                                     tiny_dataset["cfg"], None, thresh=0.3)
        assert 0.0 <= rec <= 1.0
        darknet_cli.cmd_test(tiny_dataset["data"], tiny_dataset["cfg"],
                             None, tiny_dataset["paths"][0], thresh=0.3)
        darknet_cli.cmd_valid(tiny_dataset["data"], tiny_dataset["cfg"],
                              None, thresh=0.3,
                              out_dir=str(tiny_dataset["dir"] / "results"))


@pytest.fixture
def synthetic_sixd_test(tmp_path):
    """Minimal <sixd>/test tree for data prep."""
    base = tmp_path / "test"
    for seq in (1, 2):
        seq_s = "%02d" % seq
        (base / seq_s / "rgb").mkdir(parents=True)
        gts = {}
        for i in range(5):
            img = np.zeros((480, 640, 3), np.uint8)
            cv2.imwrite(str(base / seq_s / "rgb" / f"{i:04d}.png"), img)
            gts[i] = [{"obj_id": seq, "obj_bb": [100, 120, 200, 150],
                       "cam_R_m2c": [float(v) for v in np.eye(3).reshape(-1)],
                       "cam_t_m2c": [[0.0], [0.0], [600.0]]}]
        with open(base / seq_s / "gt.yml", "w") as f:
            yaml.safe_dump(gts, f)
    return str(base)


class TestDataPrep:
    def test_single(self, synthetic_sixd_test, tmp_path):
        out = str(tmp_path / "dk")
        yolo_data_prep.prep_single(synthetic_sixd_test, out, ratio=1.0)
        assert os.path.exists(os.path.join(out, "01", "ape.data"))
        lst = open(os.path.join(out, "01", "all.txt")).read().splitlines()
        assert len(lst) == 5
        lab = open(os.path.splitext(lst[0])[0] + ".txt").read().split()
        assert lab[0] == "0"
        cx = float(lab[1])
        assert abs(cx - (100 + 100) / 640) < 1e-6

    def test_multi(self, synthetic_sixd_test, tmp_path):
        out = str(tmp_path / "dkm")
        yolo_data_prep.prep_multi(synthetic_sixd_test, out, ratio=1.0)
        opts = darknet_cli.read_data_cfg(os.path.join(out, "linemod.data"))
        assert opts["classes"] == "15"
        lst = open(opts["train"]).read().splitlines()
        assert len(lst) == 10
        # class id is obj_id - 1
        lab2 = [p for p in lst if "/02/" in p or os.sep + "02" + os.sep in p]
        lab = open(os.path.splitext(lab2[0])[0] + ".txt").read().split()
        assert lab[0] == "1"


class TestDemoVerb:
    def test_video_demo(self, tiny_dataset, tmp_path):
        """`detector demo` over a tiny synthetic video: runs the detection
        loop, bounds at max_frames, writes the overlay video
        (detector.c:1287-1297 demo dispatch)."""
        video = str(tmp_path / "in.avi")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"XVID"), 10,
                             (64, 64))
        rng = np.random.default_rng(1)
        for _ in range(6):
            frame = rng.integers(0, 60, (64, 64, 3), dtype=np.uint8)
            frame[20:40, 16:36] = 220
            wr.write(frame)
        wr.release()

        out_video = str(tmp_path / "render.avi")
        n = darknet_cli.cmd_demo(
            tiny_dataset["data"], tiny_dataset["cfg"], None,
            video=video, thresh=0.3, out_filename=out_video, batch=3,
            max_frames=5, http_port=0)   # -http_port plumbed; 0 = ephemeral
        assert n == 5
        assert os.path.exists(out_video) and os.path.getsize(out_video) > 0


class TestMjpegStream:
    def test_protocol_and_frames(self):
        """MJPEG push server speaks the reference's exact wire format
        (http_stream.cpp:167-182): multipart/x-mixed-replace with boundary
        'mjpegstream', per-part Content-Length, decodable JPEG payloads."""
        import socket
        from betapose_tpu.tools.http_stream import MjpegStreamer

        streamer = MjpegStreamer(0, quality=90)
        client = socket.create_connection(("127.0.0.1", streamer.port),
                                          timeout=5)
        client.sendall(b"GET / HTTP/1.0\r\n\r\n")
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
                  for _ in range(2)]
        for f in frames:
            streamer.write_rgb(f)

        client.settimeout(5)
        buf = b""
        while buf.count(b"--mjpegstream") < 2:
            chunk = client.recv(65536)
            if not chunk:
                break
            buf = buf + chunk
        client.close()
        streamer.close()

        head, _, rest = buf.partition(b"\r\n\r\n")
        assert b"HTTP/1.0 200 OK" in head
        assert (b"Content-Type: multipart/x-mixed-replace; "
                b"boundary=mjpegstream") in head
        parts = rest.split(b"--mjpegstream")
        decoded = 0
        for part in parts:
            if b"Content-Length:" not in part:
                continue
            ph, _, body = part.partition(b"\r\n\r\n")
            n = int(ph.split(b"Content-Length:")[1].split(b"\r\n")[0])
            assert b"Content-Type: image/jpeg" in ph
            jpg = body[:n]
            assert len(jpg) == n
            img = cv2.imdecode(np.frombuffer(jpg, np.uint8),
                               cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (32, 48, 3)
            decoded += 1
        assert decoded == 2

    def test_dead_client_dropped(self):
        import socket
        from betapose_tpu.tools.http_stream import MjpegStreamer

        streamer = MjpegStreamer(0)
        client = socket.create_connection(("127.0.0.1", streamer.port),
                                          timeout=5)
        frame = np.zeros((16, 16, 3), np.uint8)
        streamer.write_rgb(frame)
        assert len(streamer._clients) == 1
        client.close()
        # a couple of writes into the closed socket surface the error and
        # the client is dropped (reference 'kill client' path)
        streamer.write_rgb(frame)
        streamer.write_rgb(frame)
        streamer.write_rgb(frame)
        assert len(streamer._clients) == 0

    def test_stalled_client_does_not_block_writes(self):
        """A viewer that stops reading (full TCP receive window) must not
        freeze the demo loop: writes stay bounded and the stalled client
        is eventually dropped (reference MJPGWriter select()+drop)."""
        import socket
        import time as _t
        from betapose_tpu.tools.http_stream import MjpegStreamer

        streamer = MjpegStreamer(0, quality=95)
        client = socket.create_connection(("127.0.0.1", streamer.port),
                                          timeout=5)
        # shrink both buffers so the window fills fast; never recv()
        client.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        streamer.write_rgb(frame)          # accepts the client
        assert len(streamer._clients) == 1
        # cap the SERVER-side send buffer too — loopback defaults absorb
        # megabytes, hiding the stall this test exists to create
        streamer._clients[0].setsockopt(
            socket.SOL_SOCKET, socket.SO_SNDBUF, 4096)
        t0 = _t.monotonic()
        for _ in range(40):
            streamer.write_rgb(frame)
            if not streamer._clients:
                break
        elapsed = _t.monotonic() - t0
        # 40 writes x 0.25 s deadline is the absolute worst case (10 s);
        # in practice the first full-buffer write drops the client.  The
        # old blocking sendall would hang forever here.
        assert elapsed < 12.0
        assert len(streamer._clients) == 0
        client.close()
        streamer.close()
        streamer.close()
