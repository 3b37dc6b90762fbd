"""KPD (FastPose) training: masked-MSE heatmap loss, RMSprop/Adam, data
parallelism over a device mesh.

Reference semantics (`train_KPD/src/train.py`):
- loss = MSE(out * setMask, labels) (`train.py:33`) — setMask zeroes the
  channels of invisible keypoints;
- optimizers: rmsprop (torch defaults alpha=0.99 eps=1e-8) or adam, LR
  2.5e-4 (`train.py:133-143`);
- PCK accuracy with norm = outputResH/10 and threshold 0.5
  (`KPD/src/utils/eval.py:36-53`);
- multi-GPU via nn.DataParallel (`train.py:162`) -> here: pjit-style DP, the
  batch sharded over the mesh 'data' axis, params replicated, gradient
  all-reduce inserted by XLA over ICI.

The train step takes batch-stat BN into account: batch statistics are used
for normalization and the running stats are updated with torch momentum 0.1
(matching nn.BatchNorm2d defaults used by the reference model).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from betapose_tpu.models import kpd as kpd_mod

BN_MOMENTUM = 0.1  # torch BatchNorm2d default

# MXU mode for train-step convs/matmuls (see make_loss_fn).  bfloat16 is
# the measured default: KPD step 168 -> 86 ms/batch-28, YOLO 598 -> 263
# ms/batch-64 on v5e, with the slow-tier accuracy gate unchanged
# (ADD<0.1d acc 0.94 for both bf16 and f32).  'float32' restores the
# exact 6-pass math; activations/BN/loss/optimizer are f32 in EVERY mode.
DEFAULT_TRAIN_PRECISION = "bfloat16"


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int


def _trainable_mask(params):
    """BN running mean/var are buffers, not parameters (torch semantics) —
    exclude them from optimizer updates."""
    def mask_leaf(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return not (keys and keys[-1] in ("mean", "var"))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [mask_leaf(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_optimizer(method: str = "rmsprop", lr: float = 2.5e-4,
                   momentum: float = 0.0, weight_decay: float = 0.0,
                   params_example=None):
    if method == "rmsprop":
        tx = optax.rmsprop(lr, decay=0.99, eps=1e-8, momentum=momentum)
    elif method == "adam":
        tx = optax.adam(lr)
    elif method == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {method}")
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if params_example is not None:
        tx = optax.masked(tx, _trainable_mask(params_example))
    return tx


def masked_mse_loss(out, labels, set_mask):
    """MSE over all elements with torch 'mean' reduction semantics."""
    diff = out * set_mask - labels
    return jnp.mean(diff * diff)


def pck_accuracy(out, labels, out_res_h: int):
    """Heatmap PCK@0.5 with norm outputResH/10 (eval.py:36-53).
    out/labels: [B, H, W, K] (NHWC).  Keypoints with non-positive label-peak
    coords are ignored; returns (acc, n_valid)."""
    def peaks(hm):
        b, h, w, k = hm.shape
        flat = hm.transpose(0, 3, 1, 2).reshape(b, k, h * w)
        idx = jnp.argmax(flat, axis=2)
        x = (idx % w).astype(jnp.float32)
        y = jnp.floor(idx.astype(jnp.float32) / w)
        return jnp.stack([x, y], axis=-1)   # [b,k,2]

    p = peaks(out)
    g = peaks(labels)
    norm = out_res_h / 10.0
    dist = jnp.linalg.norm(p - g, axis=-1) / norm
    valid = (g[..., 0] > 0) & (g[..., 1] > 0)
    correct = (dist <= 0.5) & valid
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(correct) / n_valid, jnp.sum(valid)


def _per_sample_mse(outs, labels, set_mask):
    """Summed-over-stacks masked MSE per batch element: [B]."""
    total = 0.0
    for o in outs:
        diff = o * set_mask - labels
        total = total + jnp.mean(diff * diff, axis=(1, 2, 3))
    return total


def make_loss_fn(out_res_h: int, forward_fn=None,
                 matmul_precision: str = DEFAULT_TRAIN_PRECISION,
                 sym_perms=None):
    """forward_fn(params, inps, train, bn_stats) -> heatmaps or a LIST of
    per-stack heatmaps (hgPRM intermediate supervision: the loss is summed
    over stacks, accuracy uses the final stack — reference train.py applies
    MSE per stack for stacked-hourglass models).

    matmul_precision sets the conv/matmul MXU mode for forward+backward:
    'bfloat16' (1-pass bf16 multiplies, f32 accumulation — the measured
    default, ~2x the step rate of 'float32' with selftest-verified
    accuracy), 'tensorfloat32' (3-pass), 'float32' (6-pass exact).
    Activations, BN statistics, the loss, and the optimizer stay f32 in
    every mode (mixed precision, not low-precision training).

    sym_perms: optional sequence of keypoint-channel permutations, one per
    non-identity symmetry element of the object
    (`objects.symmetry_keypoint_perms`).  When given, the loss becomes
    SYMMETRY-AWARE: each sample is scored against every symmetry mode of
    its label (labels[..., perm] IS the label set of the symmetry-
    equivalent pose) and trained on the per-sample minimum.  Any fixed
    pose canonicalization of a finite symmetry has a seam in SO(3) where
    labels of near-identical views jump by ~the object diameter; a plain
    MSE forces the net to average the modes across that seam (measured:
    heatmap PCK 0.40 vs 0.94+ for asymmetric twins under the identical
    recipe).  The min-over-modes loss lets the net place its own mode
    boundary where it costs nothing — the standard symmetric-object
    training treatment; eval then grades with ADD-S
    (`utils/metrics.py:23-33`), which accepts any mode."""
    perms = (tuple(jnp.asarray(p, jnp.int32) for p in sym_perms)
             if sym_perms else ())

    def loss_fn(params, batch):
        bn_stats = {}
        with jax.default_matmul_precision(matmul_precision):
            if forward_fn is None:
                out = kpd_mod.forward(params, batch["inps"], train=True,
                                      bn_stats=bn_stats)
            else:
                out = forward_fn(params, batch["inps"], train=True,
                                 bn_stats=bn_stats)
        outs = out if isinstance(out, (list, tuple)) else [out]
        outs = [o.astype(jnp.float32) for o in outs]   # loss math in f32
        labels, set_mask = batch["labels"], batch["set_mask"]
        if not perms:
            loss = sum(masked_mse_loss(o, labels, set_mask) for o in outs)
            acc, _ = pck_accuracy(outs[-1] * set_mask, labels, out_res_h)
            return loss, (acc, bn_stats)
        # mode 0 = canonical labels, then one mode per symmetry element
        mode_losses = [_per_sample_mse(outs, labels, set_mask)]
        mode_labels = [labels]
        mode_masks = [set_mask]
        for p in perms:
            lab_p, mask_p = labels[..., p], set_mask[..., p]
            mode_losses.append(_per_sample_mse(outs, lab_p, mask_p))
            mode_labels.append(lab_p)
            mode_masks.append(mask_p)
        stacked = jnp.stack(mode_losses)               # [M, B]
        loss = jnp.mean(jnp.min(stacked, axis=0))
        # accuracy against each sample's chosen mode
        pick = jnp.argmin(stacked, axis=0)             # [B]
        sel = pick[:, None, None, None]
        lab_sel = jnp.select(
            [sel == m for m in range(len(mode_labels))], mode_labels)
        mask_sel = jnp.select(
            [sel == m for m in range(len(mode_masks))], mode_masks)
        acc, _ = pck_accuracy(outs[-1] * mask_sel, lab_sel, out_res_h)
        return loss, (acc, bn_stats)
    return loss_fn


def make_train_step(tx, out_res_h: int = 80, donate: bool = True,
                    forward_fn=None, apply_bn=True,
                    matmul_precision: str = DEFAULT_TRAIN_PRECISION,
                    sym_perms=None):
    """Returns jitted train_step(params, opt_state, batch) ->
    (new_params, new_opt_state, metrics).  Call under a Mesh context with a
    'data'-sharded batch for DP — XLA inserts the gradient all-reduce.
    sym_perms: see make_loss_fn (symmetry-aware min-over-modes loss)."""
    loss_fn = make_loss_fn(out_res_h, forward_fn, matmul_precision,
                           sym_perms=sym_perms)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, batch):
        (loss, (acc, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if apply_bn and bn_stats:
            params = kpd_mod.apply_bn_updates(
                params, jax.lax.stop_gradient(bn_stats), BN_MOMENTUM)
        return params, opt_state, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(out_res_h: int = 80, forward_fn=None, sym_perms=None):
    fwd = kpd_mod.forward if forward_fn is None else forward_fn
    perms = (tuple(jnp.asarray(p, jnp.int32) for p in sym_perms)
             if sym_perms else ())

    @jax.jit
    def eval_step(params, batch):
        out = fwd(params, batch["inps"])
        if isinstance(out, (list, tuple)):
            out = out[-1]
        out = out.astype(jnp.float32)
        labels, set_mask = batch["labels"], batch["set_mask"]
        if not perms:
            loss = masked_mse_loss(out, labels, set_mask)
            acc, n = pck_accuracy(out * set_mask, labels, out_res_h)
            return {"loss": loss, "acc": acc, "n": n}
        # symmetry-aware: score against the best mode per sample
        mode_losses = [_per_sample_mse([out], labels, set_mask)]
        mode_labels, mode_masks = [labels], [set_mask]
        for p in perms:
            mode_losses.append(
                _per_sample_mse([out], labels[..., p], set_mask[..., p]))
            mode_labels.append(labels[..., p])
            mode_masks.append(set_mask[..., p])
        stacked = jnp.stack(mode_losses)
        loss = jnp.mean(jnp.min(stacked, axis=0))
        sel = jnp.argmin(stacked, axis=0)[:, None, None, None]
        lab_sel = jnp.select(
            [sel == m for m in range(len(mode_labels))], mode_labels)
        mask_sel = jnp.select(
            [sel == m for m in range(len(mode_masks))], mode_masks)
        acc, n = pck_accuracy(out * mask_sel, lab_sel, out_res_h)
        return {"loss": loss, "acc": acc, "n": n}
    return eval_step


def flip_tta_step(params, inps, flip_pairs=None):
    """Flip test-time augmentation (valid path, train.py:80-84): average
    predictions of the image and its horizontal flip.  LineMod keypoints have
    no left/right semantics (flipRef is empty, dataloader.py:790), so no
    channel swapping — only the spatial un-flip."""
    out = kpd_mod.forward(params, inps)
    out_f = kpd_mod.forward(params, inps[:, :, ::-1, :])
    out_f = out_f[:, :, ::-1, :]
    return (out + out_f) / 2.0
