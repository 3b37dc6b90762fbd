"""ctypes bindings for the native frame loader (loader.cpp).

Built on demand with g++ (same pattern as `tools/designator`), linked
against the system libpng16/libjpeg.  `available()` gates every caller:
when the toolchain or the codec libraries are missing the Python
cv2-based `data.loader.PrefetchLoader` remains the feed path, so the
native engine is an acceleration, never a requirement.

Replaces the reference's native loader stack (`darknet/src/data.c`
load_threads + `dataloader.py` multi-process queues) — see loader.cpp's
header for the design rationale.
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LIB = os.path.join(_DIR, "libbploader.so")

_lib = None
_build_failed = False

BP_ERRORS = {
    -1: "cannot open file",
    -2: "not a PNG or JPEG",
    -3: "codec failure",
    -4: "buffer too small or frame dims mismatch",
}


def build_native(force: bool = False) -> str | None:
    """Compile loader.cpp to libbploader.so. Returns lib path or None."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    import shutil
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return None
    # compile to a per-process temp path and rename into place: concurrent
    # builders (process-pool workers racing on first use) must never CDLL a
    # half-written .so; os.rename is atomic within the directory
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC,
           "-lpng16", "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.rename(tmp, _LIB)
    except subprocess.CalledProcessError as e:
        sys.stderr.write(e.stderr.decode())
        return None
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return _LIB


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    path = build_native()
    if path is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.bp_imread_rgb.restype = ctypes.c_int
    lib.bp_imread_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.bp_loader_create.restype = ctypes.c_void_p
    lib.bp_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.bp_loader_next.restype = ctypes.c_int
    lib.bp_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bp_loader_error.restype = ctypes.c_int
    lib.bp_loader_error.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.bp_loader_destroy.restype = None
    lib.bp_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe_dims(path: str) -> tuple[int, int]:
    """(height, width) from the image header, no pixel decode."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.bp_imread_rgb(path.encode(), None, 0,
                           ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"{BP_ERRORS.get(rc, rc)}: {path}")
    return h.value, w.value


def imread_rgb(path: str) -> np.ndarray:
    """Decode one PNG/JPEG to RGB uint8 HWC via the native codecs."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = probe_dims(path)
    out = np.empty((h, w, 3), np.uint8)
    hh = ctypes.c_int()
    ww = ctypes.c_int()
    rc = lib.bp_imread_rgb(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
        ctypes.byref(hh), ctypes.byref(ww))
    if rc != 0:
        raise IOError(f"{BP_ERRORS.get(rc, rc)}: {path}")
    return out


def _parse_rc(msg: str) -> int:
    """Extract the BP_ERR code from a worker error message
    ('decode failed (rc=-3): path'); 0 when absent."""
    m = re.search(r"rc=(-?\d+)", msg)
    return int(m.group(1)) if m else 0


class NativeLoader:
    """Drop-in for `data.loader.PrefetchLoader`: iterate [B,H,W,3] uint8
    batches in path order, tail batch padded by repeating the last frame,
    `batch_sizes` recording true counts.

    All decode work happens on C++ threads writing into a bounded ring;
    Python does ONE ctypes call + buffer alloc per batch.  Frame dims are
    probed from the first file and enforced for all frames (mixed-size
    inputs raise, mirroring what np.stack would do in the Python loader).
    """

    def __init__(self, paths, batch_size: int, workers: int = 8,
                 lookahead: int = 3):
        self.paths = [os.fspath(p) for p in paths]
        self.batch_size = batch_size
        self.workers = workers
        self.lookahead = lookahead
        n = len(self.paths)
        self.num_batches = (n + batch_size - 1) // batch_size
        self.batch_sizes = [
            min(batch_size, n - i * batch_size) for i in range(self.num_batches)]
        if n == 0:
            raise ValueError("NativeLoader needs at least one path")
        self.height, self.width = probe_dims(self.paths[0])

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        lib = _load()
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        window = max(2, self.lookahead) * self.batch_size
        handle = lib.bp_loader_create(arr, len(self.paths), self.height,
                                      self.width, self.workers, window)
        if not handle:
            raise RuntimeError("bp_loader_create failed")
        fail_msg = None
        fail_batch = 0
        try:
            for bi in range(self.num_batches):
                out = np.empty(
                    (self.batch_size, self.height, self.width, 3), np.uint8)
                got = lib.bp_loader_next(
                    handle, out.ctypes.data_as(ctypes.c_void_p),
                    self.batch_size)
                if got < 0:
                    buf = ctypes.create_string_buffer(512)
                    lib.bp_loader_error(handle, buf, 512)
                    msg = buf.value.decode() or "native decode failed"
                    rc = _parse_rc(msg)
                    if rc in (-2, -3):   # codec-class failure: cv2 may
                        fail_msg = msg   # still decode the subformat
                        fail_batch = bi
                        break
                    raise IOError(msg)   # missing file / dims mismatch:
                                         # cv2 can't fix those either
                if got != self.batch_sizes[bi]:
                    raise RuntimeError(
                        f"loader returned {got} frames, expected "
                        f"{self.batch_sizes[bi]}")
                yield out
        finally:
            lib.bp_loader_destroy(handle)
        if fail_msg is not None:
            # A subformat the native codecs reject (CMYK JPEG, 16-bit or
            # palette-exotic PNG, ...) can still be cv2-decodable: an
            # input set that worked before the native loader existed must
            # keep working, so hand the REMAINING frames to the cv2 pool
            # instead of aborting the run.  Genuinely unreadable files
            # still raise — from cv2's decode this time.
            sys.stderr.write(
                f"WARNING: native loader failed ({fail_msg}); falling "
                "back to the cv2 loader for the remaining frames\n")
            from betapose_tpu.data.loader import PrefetchLoader
            tail = PrefetchLoader(
                self.paths[fail_batch * self.batch_size:],
                self.batch_size, self.workers, self.lookahead)
            yield from tail
