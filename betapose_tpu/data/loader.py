"""Host-side frame loading with background prefetch.

Replaces the reference's thread/process queue pipeline (`dataloader.py`
ImageLoader et al., SURVEY.md 2.9 'Pipeline parallelism') with a simple
deterministic prefetching iterator: a thread pool decodes PNGs ahead of the
accelerator while JAX's async dispatch overlaps device compute — no
check-then-put races, no bounded-queue stalls.
"""

from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np


def imread_rgb(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 HWC.

    cv2.cvtColor, not a fancy-index flip: the SIMD conversion is ~20x
    faster per 480x640 frame (0.13 ms vs 2.6 ms), which matters on
    single-core eval hosts where decode is the e2e bottleneck."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def list_images(input_path: str = "", input_list: str = ""):
    """Reference entry semantics (`betapose_evaluate.py:105-113`): either an
    image directory (os.walk, files only) or a newline list file."""
    if input_list:
        with open(input_list) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        return names
    if input_path and input_path != "/":
        names = []
        for root, _dirs, files in os.walk(input_path):
            names = [os.path.join(root, f) for f in sorted(files)]
            break
        return names
    raise IOError("Error: must contain either --indir/--list")


class PrefetchLoader:
    """Iterate fixed-size uint8 frame batches [B,H,W,3] with lookahead.

    The last batch is padded by repeating the final frame; `batch_sizes`
    records the true count so the consumer can trim.
    """

    def __init__(self, paths, batch_size: int, workers: int = 8,
                 lookahead: int = 3):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.workers = workers
        self.lookahead = lookahead
        n = len(self.paths)
        self.num_batches = (n + batch_size - 1) // batch_size
        self.batch_sizes = [
            min(batch_size, n - i * batch_size) for i in range(self.num_batches)]

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        """Per-FRAME decode futures (cv2.imread releases the GIL, so all
        `workers` threads decode concurrently) assembled into batches in
        order, with a `lookahead`-batches submission window."""
        n = len(self.paths)
        window = max(1, self.lookahead) * self.batch_size
        with cf.ThreadPoolExecutor(self.workers) as pool:
            futures = {}
            submitted = 0

            def fill(upto):
                nonlocal submitted
                while submitted < min(upto, n):
                    futures[submitted] = pool.submit(
                        imread_rgb, self.paths[submitted])
                    submitted += 1

            fill(window)
            for bi in range(self.num_batches):
                start = bi * self.batch_size
                count = self.batch_sizes[bi]
                fill(start + count + window)
                frames = [futures.pop(start + j).result()
                          for j in range(count)]
                while len(frames) < self.batch_size:   # pad tail batch
                    frames.append(frames[-1])
                yield np.stack(frames)
