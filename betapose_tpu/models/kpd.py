"""KPD — the Key-Point Detector network (FastPose: SE-ResNet101 + DUC).

Functional NHWC reimplementation of the reference architecture
(`KPD/src/models/FastPose.py:13-35`, `layers/SE_Resnet.py`, `layers/DUC.py`,
`layers/SE_module.py`):

  input [B, 320, 256, 3]
  -> conv7x7/2 + BN + ReLU -> maxpool3x3/2          (64,  H/4)
  -> layer1 3x bottleneck                            (256, H/4)
  -> layer2 4x bottleneck /2                         (512, H/8)
  -> layer3 23x bottleneck /2                        (1024,H/16)
  -> layer4 3x bottleneck /2                         (2048,H/32)
  -> pixel_shuffle(2)                                (512, H/16)
  -> DUC(512->1024)+shuffle                          (256, H/8)
  -> DUC(256->512)+shuffle                           (128, H/4)
  -> conv3x3 -> nClasses heatmaps [B, 80, 64, K]

Bottlenecks: 1x1 -> 3x3(stride) -> 1x1(x4), SE gate (reduction=1) only on
blocks that carry a downsample projection (`SE_Resnet.py:92-95`).

Params are a nested dict whose keys mirror the torch module names so that a
torch `state_dict` converts mechanically (see `torch_state_dict_to_params`).
Batch norm uses torch eps=1e-5; inference uses running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
RESNET_LAYERS = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}


# ---------------------------------------------------------------------------
# Param init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = cin * kh * kw
    bound = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * bound


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _linear_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin)
    return {"w": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def init_params(key, n_classes: int = 50, arch: str = "resnet101",
                dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4096))
    p = {}
    p["conv1"] = {"w": _conv_init(next(keys), 7, 7, 3, 64, dtype)}
    p["bn1"] = _bn_init(64, dtype)

    inplanes = 64
    for li, (planes, blocks) in enumerate(
            zip([64, 128, 256, 512], RESNET_LAYERS[arch]), start=1):
        stride = 1 if li == 1 else 2
        layer = []
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            need_down = (s != 1 or inplanes != planes * 4)
            blk = {
                "conv1": {"w": _conv_init(next(keys), 1, 1, inplanes, planes, dtype)},
                "bn1": _bn_init(planes, dtype),
                "conv2": {"w": _conv_init(next(keys), 3, 3, planes, planes, dtype)},
                "bn2": _bn_init(planes, dtype),
                "conv3": {"w": _conv_init(next(keys), 1, 1, planes, planes * 4, dtype)},
                "bn3": _bn_init(planes * 4, dtype),
            }
            if need_down:
                blk["downsample"] = {
                    "conv": {"w": _conv_init(next(keys), 1, 1, inplanes,
                                             planes * 4, dtype)},
                    "bn": _bn_init(planes * 4, dtype),
                }
                # SE gate only on downsample blocks (SE_Resnet.py:92)
                blk["se"] = {
                    "fc1": _linear_init(next(keys), planes * 4, planes * 4, dtype),
                    "fc2": _linear_init(next(keys), planes * 4, planes * 4, dtype),
                }
            layer.append(blk)
            inplanes = planes * 4
        p[f"layer{li}"] = layer

    # head: shuffle(2048->512) -> duc1(512->1024,/4=256) -> duc2(256->512,/4=128)
    p["duc1"] = {"conv": {"w": _conv_init(next(keys), 3, 3, 512, 1024, dtype)},
                 "bn": _bn_init(1024, dtype)}
    p["duc2"] = {"conv": {"w": _conv_init(next(keys), 3, 3, 256, 512, dtype)},
                 "bn": _bn_init(512, dtype)}
    k1, k2 = jax.random.split(next(keys))
    fan_in = 128 * 9
    bound = 1.0 / np.sqrt(fan_in)
    p["conv_out"] = {
        "w": jax.random.uniform(k1, (3, 3, 128, n_classes), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (n_classes,), dtype, -bound, bound)}
    return p


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn(x, p, train=False, stats=None, path=None):
    """BatchNorm.  Inference: running stats.  Training: batch stats for the
    normalization, and (batch_mean, batch_var_unbiased, count) recorded into
    `stats[path]` so the train step can update running stats with torch
    momentum semantics."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
        if stats is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            stats[path] = (mean, var * n / max(n - 1, 1))
        return y.astype(x.dtype)
    scale = p["scale"] / jnp.sqrt(p["var"] + BN_EPS)
    y = x.astype(jnp.float32) * scale + (p["bias"] - p["mean"] * scale)
    return y.astype(x.dtype)


def pixel_shuffle(x, r: int = 2):
    """NHWC pixel shuffle with torch channel semantics:
    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


def _se(x, p):
    """Squeeze-excitation channel gate (SE_module.py:4-19, reduction=1)."""
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # [B,C]
    s = jax.nn.relu(s @ p["fc1"]["w"] + p["fc1"]["b"])
    s = jax.nn.sigmoid(s @ p["fc2"]["w"] + p["fc2"]["b"])
    return x * s[:, None, None, :].astype(x.dtype)


def _bottleneck(x, p, stride, train=False, stats=None, path=""):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["w"]), p["bn1"], train,
                          stats, path + ".bn1"))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]["w"], stride, 1), p["bn2"],
                          train, stats, path + ".bn2"))
    out = _bn(_conv(out, p["conv3"]["w"]), p["bn3"], train,
              stats, path + ".bn3")
    if "se" in p:
        out = _se(out, p["se"])
    if "downsample" in p:
        residual = _bn(_conv(x, p["downsample"]["conv"]["w"], stride),
                       p["downsample"]["bn"], train,
                       stats, path + ".downsample.bn")
    else:
        residual = x
    return jax.nn.relu(out + residual)


def _maxpool_3x3_s2_p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else 0,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _duc(x, p, train=False, stats=None, path=""):
    x = jax.nn.relu(_bn(_conv(x, p["conv"]["w"], 1, 1), p["bn"], train,
                        stats, path + ".bn"))
    return pixel_shuffle(x, 2)


def forward(params, x, train=False, bn_stats=None, s2d_stem=False):
    """x: [B, H, W, 3] normalized RGB. Returns [B, H/4, W/4, K] heatmaps.

    train=True normalizes with batch statistics; pass a dict as `bn_stats`
    to collect (batch_mean, unbiased_var) per BN path for running-stat
    updates (see `apply_bn_updates`).  s2d_stem=True computes the 7x7/2
    stem conv exactly via space-to-depth (models/stem_s2d.py) — the 3-input-
    channel full-res conv is MXU-starved otherwise."""
    st = bn_stats
    if s2d_stem:
        from betapose_tpu.models.stem_s2d import conv_stride2_via_s2d
        y1 = conv_stride2_via_s2d(x, params["conv1"]["w"])
    else:
        y1 = _conv(x, params["conv1"]["w"], 2, 3)
    x = jax.nn.relu(_bn(y1, params["bn1"], train, st, "bn1"))
    x = _maxpool_3x3_s2_p1(x)
    for li in range(1, 5):
        stride = 1 if li == 1 else 2
        for bi, blk in enumerate(params[f"layer{li}"]):
            x = _bottleneck(x, blk, stride if bi == 0 else 1, train, st,
                            f"layer{li}.{bi}")
    x = pixel_shuffle(x, 2)
    x = _duc(x, params["duc1"], train, st, "duc1")
    x = _duc(x, params["duc2"], train, st, "duc2")
    x = _conv(x, params["conv_out"]["w"], 1, 1) + params["conv_out"]["b"].astype(x.dtype)
    return x


def _bn_dict_at(params, path):
    cur = params
    for part in path.split("."):
        cur = cur[int(part)] if part.isdigit() else cur[part]
    return cur


def apply_bn_updates(params, bn_stats, momentum: float = 0.1):
    """Update running mean/var with torch momentum semantics:
    running = (1 - m) * running + m * batch.  Returns new params tree."""
    import copy
    new = copy.copy(params)  # shallow; rebuild touched paths

    def set_path(tree, path_parts, value):
        part = path_parts[0]
        key = int(part) if part.isdigit() else part
        if isinstance(tree, list):
            tree = list(tree)
        else:
            tree = dict(tree)
        if len(path_parts) == 1:
            tree[key] = value
        else:
            tree[key] = set_path(tree[key], path_parts[1:], value)
        return tree

    for path, (mean, var) in bn_stats.items():
        bn = _bn_dict_at(params, path)
        new_bn = dict(bn)
        new_bn["mean"] = (1 - momentum) * bn["mean"] + momentum * mean
        new_bn["var"] = (1 - momentum) * bn["var"] + momentum * var
        new = set_path(new, path.split("."), new_bn)
        params = new
    return new


def fold_bn(params):
    """Fold BN running stats into conv weights for inference (same tree
    structure: the BN dicts become identity transforms carrying the folded
    bias, so `forward` needs no changes).  Do NOT train on folded params."""
    import copy

    def fold_pair(conv, bn):
        scale = bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)
        new_conv = dict(conv)
        new_conv["w"] = conv["w"] * scale[None, None, None, :]
        new_bn = {"scale": jnp.ones_like(bn["scale"]),
                  "bias": bn["bias"] - bn["mean"] * scale,
                  "mean": jnp.zeros_like(bn["mean"]),
                  "var": jnp.ones_like(bn["var"]) - BN_EPS}
        return new_conv, new_bn

    p = copy.deepcopy(jax.device_get(params))
    p = jax.tree_util.tree_map(jnp.asarray, p)
    p["conv1"], p["bn1"] = fold_pair(p["conv1"], p["bn1"])
    for li in range(1, 5):
        for blk in p[f"layer{li}"]:
            for ci in (1, 2, 3):
                blk[f"conv{ci}"], blk[f"bn{ci}"] = fold_pair(
                    blk[f"conv{ci}"], blk[f"bn{ci}"])
            if "downsample" in blk:
                blk["downsample"]["conv"], blk["downsample"]["bn"] = \
                    fold_pair(blk["downsample"]["conv"],
                              blk["downsample"]["bn"])
    for d in ("duc1", "duc2"):
        p[d]["conv"], p[d]["bn"] = fold_pair(p[d]["conv"], p[d]["bn"])
    return p


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (KPD .pkl state_dicts,
# KPD/src/main_fast_inference.py:38-41)
# ---------------------------------------------------------------------------

def _assign(tree, path, value):
    cur = tree
    for k in path[:-1]:
        cur = cur[k]
    cur[path[-1]] = value


def torch_state_dict_to_params(state_dict, n_classes: int = 50,
                               arch: str = "resnet101", dtype=jnp.float32):
    """Convert a torch FastPose state_dict (tensor or ndarray values) into
    this module's param tree.  Conv weights OIHW -> HWIO; linear weights
    transposed.  Accepts 'module.'-prefixed (DataParallel) keys."""
    # Mutable host copy of the init tree to overwrite in place
    import copy
    params = copy.deepcopy(jax.device_get(
        init_params(jax.random.PRNGKey(0), n_classes, arch)))

    def np_of(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v)

    bn_map = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue  # torch>=1.0 BN step counter; no JAX equivalent
        v = np_of(val)
        k = key
        for pref in ("module.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
        parts = k.split(".")
        if parts[0] == "preact":
            parts = parts[1:]
        if parts[0] in ("conv1",) and parts[-1] == "weight" and v.ndim == 4:
            params["conv1"]["w"] = v.transpose(2, 3, 1, 0)
        elif parts[0] == "bn1":
            params["bn1"][bn_map[parts[1]]] = v
        elif parts[0].startswith("layer"):
            li = parts[0]
            bi = int(parts[1])
            blk = params[li][bi]
            sub = parts[2]
            if sub.startswith("conv"):
                blk[sub]["w"] = v.transpose(2, 3, 1, 0)
            elif sub.startswith("bn"):
                blk[sub][bn_map[parts[3]]] = v
            elif sub == "downsample":
                idx = parts[3]
                if idx == "0":
                    blk["downsample"]["conv"]["w"] = v.transpose(2, 3, 1, 0)
                else:
                    blk["downsample"]["bn"][bn_map[parts[4]]] = v
            elif sub == "se":
                # torch: se.fc.0 (linear) se.fc.2 (linear)
                idx = parts[4]
                fc = "fc1" if idx == "0" else "fc2"
                if parts[-1] == "weight":
                    blk["se"][fc]["w"] = v.T
                else:
                    blk["se"][fc]["b"] = v
        elif parts[0] in ("duc1", "duc2"):
            if parts[1] == "conv":
                params[parts[0]]["conv"]["w"] = v.transpose(2, 3, 1, 0)
            elif parts[1] == "bn":
                params[parts[0]]["bn"][bn_map[parts[2]]] = v
        elif parts[0] == "conv_out":
            if parts[1] == "weight":
                params["conv_out"]["w"] = v.transpose(2, 3, 1, 0)
            else:
                params["conv_out"]["b"] = v
        # suffle1 (PixelShuffle) has no params; ignore unknown buffers
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
