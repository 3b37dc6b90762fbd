"""Checkpoint IO for param pytrees.

Two families, matching the reference contracts (SURVEY.md 5.4):
- darknet `.weights` for YOLO — handled in `models/yolov3.py` (byte-exact).
- KPD checkpoints: the reference stores torch `state_dict` pickles
  (`train_KPD/src/train.py:192-197`); we read those via `torch.load` and
  convert (`models/kpd.torch_state_dict_to_params`), and natively use a flat
  .npz of keystr-pathed arrays for our own saves (dependency-light, fast).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_pytree_npz(path, params):
    np.savez(path, **_flatten(params))


def load_pytree_npz(path, like):
    """Load arrays saved by save_pytree_npz into the structure of `like`."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        leaves.append(jax.numpy.asarray(data[key], np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def load_kpd_checkpoint(path, n_classes: int = 50, arch: str = "resnet101",
                        **net_kwargs):
    """Load a pose-net checkpoint: torch .pkl/.pth state_dict or our .npz.

    arch selects the backbone family: FastPose ('resnet50'/'resnet101') or
    'hgPRM' (PyraNet); net_kwargs (n_feats/n_stack/...) size the hgPRM
    tree and must match how the checkpoint was trained."""
    if arch == "hgPRM":
        from betapose_tpu.models import hgprm as net_mod

        def make_like(key):
            return net_mod.init_params(key, n_classes, **net_kwargs)

        def from_torch(sd):
            return net_mod.torch_state_dict_to_params(sd, n_classes,
                                                      **net_kwargs)
    else:
        from betapose_tpu.models import kpd as kpd_mod

        def make_like(key):
            return kpd_mod.init_params(key, n_classes, arch)

        def from_torch(sd):
            return kpd_mod.torch_state_dict_to_params(sd, n_classes, arch)

    if path.endswith(".npz"):
        import jax.random as jr
        return load_pytree_npz(path, make_like(jr.PRNGKey(0)))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return from_torch(obj)


# Per-object KPD checkpoint name table (reference
# KPD/src/main_fast_inference.py:29-36 hardcodes these .pkl names).
KPD_MODEL_NAMES = {
    1: "seq1_model", 2: "seq2_model", 4: "seq4_model", 5: "seq5_model",
    6: "seq6_model", 8: "seq8_model", 9: "seq9_model", 10: "seq10_model",
    11: "seq11_model", 12: "seq12_model", 13: "seq13_model",
    14: "seq14_model", 15: "seq15_model",
}


def default_kpd_path(obj_id: int, base: str = "./exp/final_model"):
    name = KPD_MODEL_NAMES.get(obj_id, f"seq{obj_id}_model")
    for ext in (".pkl", ".pth", ".npz"):
        p = os.path.join(base, name + ext)
        if os.path.exists(p):
            return p
    return os.path.join(base, name + ".pkl")


def default_yolo_path(obj_id: int, base: str = "models/yolo"):
    """Reference DetectionLoader weight path (`dataloader.py:289`)."""
    return os.path.join(base, "{:02d}.weights".format(obj_id))
