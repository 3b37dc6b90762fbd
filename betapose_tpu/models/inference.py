"""KPD inference wrappers — parity with `KPD/src/main_fast_inference.py`.

`InferenNetFast` mirrors `InferenNet_fast:26-46`: load the per-object
checkpoint via the hardcoded name table, run FastPose, narrow the output to
the first nClasses channels.  `InferenNet` is the flip-TTA variant the
reference references but never ships (betapose_evaluate.py:128 imports a
class that does not exist — `--fast_inference True` masks the dead path);
here it is actually implemented: averaged predictions of the image and its
horizontal mirror (LineMod keypoints carry no left/right semantics, so no
channel swap — flipRef is empty, `dataloader.py:790`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from betapose_tpu.core import checkpoint as ckpt
from betapose_tpu.models import kpd as kpd_mod


class InferenNetFast:
    def __init__(self, kernel_size=None, obj_id: int = 1, dataset=None,
                 n_classes: int = 50, weights_path: str | None = None,
                 model_base: str = "./exp/final_model"):
        path = weights_path or ckpt.default_kpd_path(obj_id, model_base)
        if os.path.exists(path):
            print("Loading KPD Model from", path)
            self.params = ckpt.load_kpd_checkpoint(path, n_classes)
        else:
            print(f"WARNING: KPD checkpoint {path} missing; random init")
            self.params = kpd_mod.init_params(
                jax.random.PRNGKey(0), n_classes)
        self.n_classes = n_classes
        self._fwd = jax.jit(lambda p, x: kpd_mod.forward(p, x))

    def __call__(self, x):
        """x: [B,H,W,3] normalized crops -> [B,h,w,nClasses] heatmaps."""
        out = self._fwd(self.params, x)
        return out[..., :self.n_classes]


class InferenNet(InferenNetFast):
    """Flip test-time-augmented variant."""

    def __call__(self, x):
        out = self._fwd(self.params, x)
        out_f = self._fwd(self.params, x[:, :, ::-1, :])[:, :, ::-1, :]
        out = (out + out_f) / 2.0
        return out[..., :self.n_classes]
