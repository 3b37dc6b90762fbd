"""YOLOv3 — TPU-native functional implementation built from a darknet .cfg.

Design (vs reference `yolo/darknet.py` + darknet C engine):
- Pure functional: `params` is a list-of-dicts pytree aligned with the cfg
  layer list; `forward` is a Python loop over the *static* layer spec, so jit
  unrolls it into one fused XLA graph (NHWC layout, bf16-friendly).
- Only layer outputs actually referenced by route/shortcut blocks are cached
  (static analysis at spec-build time) — keeps live memory minimal.
- Detection decode matches `yolo/darknet.py:129-169` (DetectionLayer):
  bx = sigma(tx)+cx, by = sigma(ty)+cy, bw = pw*exp(tw), bh = ph*exp(th),
  all scaled by stride; obj/class sigmoid; rows ordered anchor-major then
  row-major over the grid, heads concatenated in cfg order.
- Weights IO speaks the darknet .weights byte format exactly — the
  trainer<->runtime contract (reference `yolo/darknet.py:365-432`, writer
  `train_YOLO/src/parser.c:962-1019`): int32 header x4 then float32 stream,
  per conv layer [bn_bias, bn_scale, bn_mean, bn_var] or [conv_bias], then
  conv weights in OIHW order.
- BatchNorm can be folded into conv weights for inference (`fold_bn`).
"""

from __future__ import annotations

import dataclasses
import io

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.models.darknet_cfg import parse_cfg


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: str                   # conv | shortcut | route | upsample | maxpool
    #                           # | yolo | avgpool | softmax | dropout | cost
    #                           # | connected
    out_channels: int
    # conv
    size: int = 0
    stride: int = 0
    pad: int = 0
    batch_normalize: bool = False
    activation: str = "linear"
    in_channels: int = 0
    # shortcut / route
    from_idx: int = -1          # absolute layer index (shortcut)
    route_idxs: tuple = ()      # absolute layer indices (route)
    # yolo
    anchors: tuple = ()         # ((w,h),...) for this head (mask applied)
    num_classes: int = 0
    ignore_thresh: float = 0.7
    # connected
    in_features: int = 0        # flattened h*w*c feeding the matmul
    # detection (YOLOv1 head, detection_layer.c)
    side: int = 0               # SxS grid
    num: int = 0                # boxes per cell
    coords: int = 4
    det_softmax: bool = False   # per-cell softmax over classes
    det_sqrt: bool = False      # w,h predicted as sqrt


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    layers: tuple               # tuple[LayerSpec]
    cache_idxs: frozenset       # layer outputs needed later
    net_info: dict              # [net] block options (may be empty)

    @property
    def yolo_idxs(self):
        return tuple(i for i, l in enumerate(self.layers) if l.kind == "yolo")


def build_spec(cfg) -> NetworkSpec:
    """cfg: path or cfg text. Returns the static network spec."""
    blocks = parse_cfg(cfg)
    net_info = {}
    if blocks and blocks[0]["type"] == "net":
        net_info = blocks[0]
        blocks = blocks[1:]

    layers = []
    out_channels = [3]  # out_channels[i+1] = channels of layer i
    # static spatial tracking (parser.c propagates net w/h the same way);
    # only required when a [connected] layer needs its flattened input size
    try:
        cur_h = int(net_info.get("height", 0)) or None
        cur_w = int(net_info.get("width", 0)) or None
    except (TypeError, ValueError):
        cur_h = cur_w = None
    dims = [(cur_h, cur_w)]  # dims[i+1] = (h, w) of layer i's output
    needed = set()
    for i, b in enumerate(blocks):
        t = b["type"]
        cin = out_channels[-1]
        cur_h, cur_w = dims[-1]

        def _next_dim(d, size, stride, pad):
            return None if d is None else (d + 2 * pad - size) // stride + 1

        if t == "convolutional":
            bn = int(b.get("batch_normalize", 0)) != 0
            filters = int(b["filters"])
            size = int(b["size"])
            stride = int(b["stride"])
            pad = (size - 1) // 2 if int(b.get("pad", 0)) else 0
            layers.append(LayerSpec(
                "conv", filters, size=size, stride=stride, pad=pad,
                batch_normalize=bn, activation=b.get("activation", "linear"),
                in_channels=cin))
            out_channels.append(filters)
            dims.append((_next_dim(cur_h, size, stride, pad),
                         _next_dim(cur_w, size, stride, pad)))
        elif t == "shortcut":
            frm = int(b["from"])
            abs_from = i + frm if frm < 0 else frm
            needed.add(abs_from)
            needed.add(i - 1)
            layers.append(LayerSpec("shortcut", cin, from_idx=abs_from))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "route":
            idxs = [int(x) for x in str(b["layers"]).split(",")]
            abs_idxs = tuple(i + x if x < 0 else x for x in idxs)
            for a in abs_idxs:
                needed.add(a)
            ch = sum(out_channels[a + 1] for a in abs_idxs)
            layers.append(LayerSpec("route", ch, route_idxs=abs_idxs))
            out_channels.append(ch)
            dims.append(dims[abs_idxs[0] + 1])
        elif t == "upsample":
            stride = int(b["stride"])
            layers.append(LayerSpec("upsample", cin, stride=stride))
            out_channels.append(cin)
            dims.append((None if cur_h is None else cur_h * stride,
                         None if cur_w is None else cur_w * stride))
        elif t == "maxpool":
            # darknet parser.c parse_maxpool: stride default 1, size default
            # stride, padding default size-1; out = (w+pad-size)/stride + 1
            # (maxpool_layer.c make_maxpool_layer), window offset -pad/2.
            stride = int(b.get("stride", 1))
            size = int(b.get("size", stride))
            pad = int(b.get("padding", size - 1))
            layers.append(LayerSpec(
                "maxpool", cin, size=size, stride=stride, pad=pad))
            out_channels.append(cin)

            def _pool_dim(d):
                return None if d is None else (d + pad - size) // stride + 1
            dims.append((_pool_dim(cur_h), _pool_dim(cur_w)))
        elif t == "avgpool":
            # darknet avgpool_layer.c: GLOBAL average pool to 1x1xC
            layers.append(LayerSpec("avgpool", cin))
            out_channels.append(cin)
            dims.append((1, 1))
        elif t == "connected":
            # parser.c parse_connected: fully-connected over the flattened
            # input (inputs = h*w*c), optional batch_normalize
            outputs = int(b["output"])
            if cur_h is None or cur_w is None:
                raise ValueError(
                    "[connected] layer needs width/height in the [net] block"
                    " to size its input statically")
            bn = int(b.get("batch_normalize", 0)) != 0
            layers.append(LayerSpec(
                "connected", outputs, batch_normalize=bn,
                activation=b.get("activation", "linear"),
                in_features=cur_h * cur_w * cin))
            out_channels.append(outputs)
            dims.append((1, 1))
        elif t == "dropout":
            # inference is a no-op (forward_dropout_layer only acts when
            # net.train); training dropout is not plumbed — documented
            layers.append(LayerSpec("dropout", cin))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "softmax":
            layers.append(LayerSpec("softmax", cin))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "cost":
            # training-only objective bookkeeping; identity at inference
            layers.append(LayerSpec("cost", cin))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "reorg":
            # YOLOv2 space-to-depth (reorg_layer.c): (h,w,c) ->
            # (h/s, w/s, c*s^2) with darknet's channel interleave
            stride = int(b.get("stride", 1))
            layers.append(LayerSpec("reorg", cin * stride * stride,
                                    stride=stride, in_channels=cin))
            out_channels.append(cin * stride * stride)
            dims.append((None if cur_h is None else cur_h // stride,
                         None if cur_w is None else cur_w // stride))
        elif t == "region":
            # YOLOv2 detection head (region_layer.c): all `num` anchors in
            # GRID units (no mask), classes softmaxed
            flat = [float(x)
                    for x in b["anchors"].replace(" ", "").split(",")]
            anchors = tuple((flat[j], flat[j + 1])
                            for j in range(0, len(flat), 2))
            needed.add(i - 1)
            layers.append(LayerSpec(
                "region", cin, anchors=anchors,
                num_classes=int(b["classes"])))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "yolo":
            mask = [int(x) for x in b["mask"].split(",")]
            flat = [int(float(x)) for x in b["anchors"].replace(" ", "").split(",")]
            all_anchors = [(flat[j], flat[j + 1]) for j in range(0, len(flat), 2)]
            anchors = tuple(all_anchors[m] for m in mask)
            needed.add(i - 1)  # reference keeps previous output (darknet.py:361)
            layers.append(LayerSpec(
                "yolo", cin, anchors=anchors,
                num_classes=int(b["classes"]),
                ignore_thresh=float(b.get("ignore_thresh", 0.7))))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "detection":
            # YOLOv1 head (parser.c parse_detection:367-387): a flat
            # [connected] output laid out [S*S*classes | S*S*num |
            # S*S*num*coords]; parameterless
            coords = int(b.get("coords", 1))
            if coords != 4:
                raise ValueError(
                    f"[detection] coords={coords} unsupported (only the "
                    "standard coords=4 box layout)")
            needed.add(i - 1)
            layers.append(LayerSpec(
                "detection", cin,
                side=int(b.get("side", 7)), num=int(b.get("num", 1)),
                num_classes=int(b.get("classes", 1)), coords=coords,
                det_softmax=bool(int(b.get("softmax", 0))),
                det_sqrt=bool(int(b.get("sqrt", 0)))))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        else:
            raise ValueError(
                f"unsupported block type: {t} (supported: convolutional,"
                " shortcut, route, upsample, maxpool, avgpool, connected,"
                " dropout, softmax, cost, reorg, region, yolo, detection)")
    return NetworkSpec(tuple(layers), frozenset(needed), net_info)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def _bn_init_params(c, dtype):
    return {"bn_scale": jnp.ones((c,), dtype),
            "bn_bias": jnp.zeros((c,), dtype),
            "bn_mean": jnp.zeros((c,), dtype),
            "bn_var": jnp.ones((c,), dtype)}


def init_params(key, spec: NetworkSpec, dtype=jnp.float32):
    """He-style init for convs; BN starts at identity."""
    params = []
    for l in spec.layers:
        if l.kind == "conv":
            key, k1 = jax.random.split(key)
            fan_in = l.in_channels * l.size * l.size
            w = jax.random.normal(
                k1, (l.size, l.size, l.in_channels, l.out_channels), dtype
            ) * jnp.sqrt(2.0 / fan_in)
            p = {"w": w}
            if l.batch_normalize:
                p.update(_bn_init_params(l.out_channels, dtype))
            else:
                p["b"] = jnp.zeros((l.out_channels,), dtype)
            params.append(p)
        elif l.kind == "connected":
            key, k1 = jax.random.split(key)
            # connected_layer.c: scale = sqrt(2./inputs)
            w = jax.random.normal(
                k1, (l.in_features, l.out_channels), dtype
            ) * jnp.sqrt(2.0 / l.in_features)
            p = {"w": w}
            if l.batch_normalize:
                # the on-disk bias array is BN's beta (forward_batchnorm_layer
                # applies scales then biases) — no separate bias
                p.update(_bn_init_params(l.out_channels, dtype))
            else:
                p["b"] = jnp.zeros((l.out_channels,), dtype)
            params.append(p)
        else:
            params.append({})
    return params


BN_EPS = 1e-5  # torch BatchNorm2d default, matches reference inference


def fold_bn(spec: NetworkSpec, params):
    """Fold batchnorm into conv weight/bias for inference speed."""
    folded = []
    for l, p in zip(spec.layers, params):
        if l.kind != "conv" or not l.batch_normalize:
            folded.append(dict(p))
            continue
        scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + BN_EPS)
        w = p["w"] * scale[None, None, None, :]
        b = p["bn_bias"] - p["bn_mean"] * scale
        folded.append({"w": w, "b": b})
    return folded


# ---------------------------------------------------------------------------
# darknet .weights IO
# ---------------------------------------------------------------------------

def load_darknet_weights(spec: NetworkSpec, path, dtype=jnp.float32,
                         allow_partial: bool = True, init_key=None):
    """Read a darknet .weights file into the params pytree.

    Byte layout per `parser.c load_weights_upto:1155-1180` / `save_weights:
    973-979`: int32 [major, minor, revision], then `seen` — a uint64 when
    (major*10+minor) >= 2 (official pjreddie/AlexeyAB release files, e.g.
    yolov3.weights / darknet53.conv.74 carry minor=2), else an int32 (what
    this repo's writer emits, matching the vendored fork) — then a float32
    stream; for each conv layer (in cfg order): if batch_normalize:
    [bias(beta), scale(gamma), running_mean, running_var] each of len C_out,
    else [conv_bias]; then conv weights, C_out*C_in*k*k floats in OIHW order.

    allow_partial: darknet semantics — a truncated file (e.g. a pretrained
    backbone like darknet53.conv.74) fills the leading layers and leaves the
    rest at their initialization (`parser.c load_weights` stops at EOF).

    Returns (params, header) with header = int64[4] [major, minor, revision,
    seen] regardless of on-disk seen width.
    """
    with open(path, "rb") as f:
        major, minor, revision = np.fromfile(f, dtype=np.int32, count=3)
        if major * 10 + minor >= 2 and major < 1000 and minor < 1000:
            seen = int(np.fromfile(f, dtype=np.uint64, count=1)[0])
        else:
            seen = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        header = np.array([major, minor, revision, seen], dtype=np.int64)
        stream = np.fromfile(f, dtype=np.float32)
    init = init_params(init_key if init_key is not None
                       else jax.random.PRNGKey(0), spec, dtype)
    params = []
    ptr = 0
    exhausted = False

    def take(n):
        nonlocal ptr, exhausted
        out = stream[ptr:ptr + n]
        if len(out) != n:
            if allow_partial:
                exhausted = True
                return None
            raise ValueError(f"weights file too short at offset {ptr}")
        ptr += n
        return out

    for li, l in enumerate(spec.layers):
        if l.kind == "connected":
            # parser.c load_connected_weights: biases, weights [out, in]
            # row-major, then (if BN) scales, rolling_mean, rolling_var
            if exhausted:
                params.append(init[li])
                continue
            c = l.out_channels
            vals, ok = {}, True
            for name, n in (("b", c), ("w_oi", c * l.in_features)):
                v = take(n)
                if v is None:
                    ok = False
                    break
                vals[name] = v
            if ok and l.batch_normalize:
                for k in ("bn_scale", "bn_mean", "bn_var"):
                    v = take(c)
                    if v is None:
                        ok = False
                        break
                    vals[k] = v
            if not ok:
                params.append(init[li])
                continue
            p = {"b": jnp.asarray(vals.pop("b"), dtype),
                 "w": jnp.asarray(
                     vals.pop("w_oi").reshape(c, l.in_features).T, dtype)}
            for k, v in vals.items():
                p[k] = jnp.asarray(v, dtype)
            if l.batch_normalize:
                # connected BN has no separate beta on disk; the bias slot
                # plays that role (connected_layer.c uses biases as beta)
                p["bn_bias"] = p.pop("b")
            params.append(p)
            continue
        if l.kind != "conv":
            params.append({})
            continue
        if exhausted:
            params.append(init[li])
            continue
        c = l.out_channels
        p = {}
        vals = {}
        ok = True
        if l.batch_normalize:
            for k in ("bn_bias", "bn_scale", "bn_mean", "bn_var"):
                v = take(c)
                if v is None:
                    ok = False
                    break
                vals[k] = v
        else:
            v = take(c)
            if v is None:
                ok = False
            else:
                vals["b"] = v
        if ok:
            n_w = c * l.in_channels * l.size * l.size
            w = take(n_w)
            if w is None:
                ok = False
            else:
                vals["w_oihw"] = w.reshape(c, l.in_channels, l.size, l.size)
        if not ok:
            params.append(init[li])
            continue
        for k, v in vals.items():
            if k == "w_oihw":
                p["w"] = jnp.asarray(np.transpose(v, (2, 3, 1, 0)), dtype)
            else:
                p[k] = jnp.asarray(v, dtype)
        params.append(p)
    return params, header


BN_ROLLING_MOMENTUM = 0.01  # darknet: rolling = .99*rolling + .01*batch


def apply_bn_updates(params, bn_stats, momentum: float = BN_ROLLING_MOMENTUM):
    """Update rolling BN stats with darknet momentum semantics
    (blas.c: scal .99 + axpy .01).  Returns a new params list."""
    new = list(params)
    for idx, (mean, var) in bn_stats.items():
        p = dict(new[idx])
        p["bn_mean"] = (1 - momentum) * p["bn_mean"] + momentum * mean
        p["bn_var"] = (1 - momentum) * p["bn_var"] + momentum * var
        new[idx] = p
    return new


def save_partial_weights(spec: NetworkSpec, params, path, cutoff: int,
                         seen: int = 0):
    """darknet's weight surgery `partial` (`darknet.c` partial()): write only
    the first `cutoff` layers' weights — e.g. extracting a pretrained
    backbone (darknet53.conv.74 has cutoff 74)."""
    sub_layers = spec.layers[:cutoff]
    sub_spec = NetworkSpec(tuple(sub_layers), spec.cache_idxs, spec.net_info)
    save_darknet_weights(sub_spec, params[:cutoff], path, seen)


def save_darknet_weights(spec: NetworkSpec, params, path, seen: int = 0):
    """Write params in the exact darknet .weights layout (header then floats)."""
    buf = io.BytesIO()
    buf.write(np.array([0, 1, 0, seen], dtype=np.int32).tobytes())
    for l, p in zip(spec.layers, params):
        if l.kind == "connected":
            # save_connected_weights: biases, weights [out, in], then BN
            # scales/rolling_mean/rolling_var
            bias = p["bn_bias"] if l.batch_normalize else p["b"]
            buf.write(np.ascontiguousarray(bias, dtype=np.float32).tobytes())
            w_oi = np.asarray(p["w"], dtype=np.float32).T
            buf.write(np.ascontiguousarray(w_oi).tobytes())
            if l.batch_normalize:
                for k in ("bn_scale", "bn_mean", "bn_var"):
                    buf.write(np.ascontiguousarray(
                        p[k], dtype=np.float32).tobytes())
            continue
        if l.kind != "conv":
            continue
        if l.batch_normalize:
            for k in ("bn_bias", "bn_scale", "bn_mean", "bn_var"):
                buf.write(np.ascontiguousarray(p[k], dtype=np.float32).tobytes())
        else:
            buf.write(np.ascontiguousarray(p["b"], dtype=np.float32).tobytes())
        w_oihw = np.transpose(np.asarray(p["w"], dtype=np.float32),
                              (3, 2, 0, 1))
        buf.write(np.ascontiguousarray(w_oihw).tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv_layer(l: LayerSpec, p, x, train=False, bn_stats=None, path=None):
    """Conv + BN + activation.  train=True normalizes with BATCH statistics
    (darknet's forward_batchnorm_layer semantics) and records
    (batch_mean, batch_var) into bn_stats[path] for rolling-stat updates;
    inference uses running stats (or folded weights)."""
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(l.stride, l.stride),
        padding=((l.pad, l.pad), (l.pad, l.pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if l.batch_normalize and "bn_scale" in p:
        if train:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.var(yf, axis=(0, 1, 2))
            if bn_stats is not None:
                bn_stats[path] = (mean, var)
            y = (yf - mean) * jax.lax.rsqrt(var + BN_EPS) * p["bn_scale"] \
                + p["bn_bias"]
        else:
            scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + BN_EPS)
            y = y * scale + (p["bn_bias"] - p["bn_mean"] * scale)
    elif "b" in p:
        y = y + p["b"]
    return _activate(y, l.activation).astype(x.dtype)


def _activate(y, activation):
    """darknet activations.c subset used by the supported layer zoo."""
    if activation == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if activation == "relu":
        return jax.nn.relu(y)
    if activation == "logistic":
        return jax.nn.sigmoid(y)
    return y  # linear


def _connected_layer(l: LayerSpec, p, x, train=False, bn_stats=None,
                     path=None):
    """Fully-connected layer (connected_layer.c): flatten -> matmul ->
    BN (batch stats in training, running stats at inference; the bias array
    is BN's beta) or bias -> activation.  Returns [B, 1, 1, out]."""
    b = x.shape[0]
    xf = x.reshape(b, -1).astype(jnp.float32)
    y = xf @ p["w"].astype(jnp.float32)
    if l.batch_normalize and "bn_scale" in p:
        if train:
            mean = jnp.mean(y, axis=0)
            var = jnp.var(y, axis=0)
            if bn_stats is not None:
                bn_stats[path] = (mean, var)
            y = (y - mean) * jax.lax.rsqrt(var + BN_EPS) * p["bn_scale"] \
                + p["bn_bias"]
        else:
            scale = p["bn_scale"] / jnp.sqrt(p["bn_var"] + BN_EPS)
            y = y * scale + (p["bn_bias"] - p["bn_mean"] * scale)
    else:
        y = y + p["b"]
    y = _activate(y, l.activation)
    return y.reshape(b, 1, 1, l.out_channels).astype(x.dtype)


def _upsample_nearest(x, stride):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, stride, w, stride, c))
    return x.reshape(b, h * stride, w * stride, c)


def _maxpool(x, size, stride, pad):
    """darknet maxpool (maxpool_layer.c:88-120): window origin at -pad/2
    (C integer division), out-of-bounds reads are -FLT_MAX, so the total
    `pad` splits pad//2 before and the remainder after with a -inf fill.
    Output dims = (w + pad - size)//stride + 1, which reduce_window's floor
    semantics reproduce exactly."""
    pb = pad // 2
    padding = ((pb, pad - pb), (pb, pad - pb))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
        (1, stride, stride, 1),
        ((0, 0),) + padding + ((0, 0),))


def _reorg(x, stride):
    """darknet reorg (blas.c reorg_cpu, forward path): NHWC
    [B,H,W,C] -> [B,H/s,W/s,C*s^2] with the darknet interleave —
    output channel k = off*C + c2 takes input channel c2 at spatial
    offset (off//s, off%s) on the stride-s grid:
        out[b, j, i, off*C + c2] = in[b, j*s + off//s, i*s + off%s, c2].
    Static python loop over the s^2 offsets: pure slices, no gathers."""
    blocks = [x[:, off // stride::stride, off % stride::stride, :]
              for off in range(stride * stride)]
    return jnp.concatenate(blocks, axis=-1)


def decode_region_head(x_nhwc, anchors, num_classes, reso):
    """Decode a YOLOv2 [region] head (region_layer.c forward +
    get_region_box with DOABS=1, region_layer.c:78-90,179-210):
      bx = (cx + sigmoid(tx)) / gs,  bw = exp(tw) * anchor_w / gs
    (anchors in grid units, everything normalized to [0,1] then scaled to
    input-resolution pixels here to match `decode_head`'s convention);
    objectness sigmoid; classes SOFTMAXed (v3 uses per-class sigmoid).
    Rows are emitted anchor-major like `decode_head` (ordering is not a
    contract — downstream selection is order-free)."""
    b, gs, _, _ = x_nhwc.shape
    na = len(anchors)
    attrs = 5 + num_classes
    x = x_nhwc.reshape(b, gs, gs, na, attrs)
    x = x.transpose(0, 3, 1, 2, 4).astype(jnp.float32)  # [B,nA,gs,gs,attrs]

    grid = jnp.arange(gs, dtype=jnp.float32)
    cx = grid[None, None, None, :]
    cy = grid[None, None, :, None]
    anchors_arr = jnp.asarray(anchors, jnp.float32)     # grid units
    aw = anchors_arr[:, 0][None, :, None, None]
    ah = anchors_arr[:, 1][None, :, None, None]

    scale = reso / gs
    bx = (jax.nn.sigmoid(x[..., 0]) + cx) * scale
    by = (jax.nn.sigmoid(x[..., 1]) + cy) * scale
    bw = jnp.exp(x[..., 2]) * aw * scale
    bh = jnp.exp(x[..., 3]) * ah * scale
    obj = jax.nn.sigmoid(x[..., 4])
    cls = jax.nn.softmax(x[..., 5:], axis=-1)
    out = jnp.concatenate(
        [bx[..., None], by[..., None], bw[..., None], bh[..., None],
         obj[..., None], cls], axis=-1)
    return out.reshape(b, na * gs * gs, attrs)


def decode_detection_head(x_flat, l: LayerSpec, reso):
    """Decode a YOLOv1 [detection] head (detection_layer.c
    forward_detection_layer softmax pass + get_detection_boxes:532-558):
    flat layout [S*S*classes | S*S*num obj | S*S*num*4 boxes], with
      bx = (px + col)/S,  by = (py + row)/S,  bw = pw^(sqrt?2:1)
    normalized then scaled to input-resolution pixels (decode_head's
    convention).  Class probabilities are per CELL (shared by that cell's
    `num` boxes); optional per-cell softmax.  Parameterless layer."""
    s, n, nc = l.side, l.num, l.num_classes
    sc = s * s
    b = x_flat.shape[0]
    x = x_flat.reshape(b, -1).astype(jnp.float32)
    cls = x[:, :sc * nc].reshape(b, sc, nc)
    if l.det_softmax:
        cls = jax.nn.softmax(cls, axis=-1)
    obj = x[:, sc * nc:sc * (nc + n)].reshape(b, sc, n)
    boxes = x[:, sc * (nc + n):sc * (nc + n) + sc * n * 4]
    boxes = boxes.reshape(b, sc, n, 4)

    cell = jnp.arange(sc, dtype=jnp.float32)
    col = (cell % s)[None, :, None]
    row = (cell // s)[None, :, None]
    bx = (boxes[..., 0] + col) / s * reso
    by = (boxes[..., 1] + row) / s * reso
    wh_pow = 2 if l.det_sqrt else 1
    bw = boxes[..., 2] ** wh_pow * reso
    bh = boxes[..., 3] ** wh_pow * reso
    cls_b = jnp.broadcast_to(cls[:, :, None, :], (b, sc, n, nc))
    out = jnp.concatenate(
        [bx[..., None], by[..., None], bw[..., None], bh[..., None],
         obj[..., None], cls_b], axis=-1)          # [B, sc, n, 5+nc]
    return out.reshape(b, sc * n, 5 + nc)


def decode_head(x_nhwc, anchors, num_classes, reso):
    """Decode one yolo head's raw conv output to boxes.

    x_nhwc: [B, gs, gs, nA*(5+nC)].  Returns [B, nA*gs*gs, 5+nC] with
    (cx, cy, w, h) in input-resolution pixels, then sigmoid(obj),
    sigmoid(class...).  Row order: anchor-major, then grid-row, grid-col —
    identical to `yolo/darknet.py:157-169`.
    """
    b, gs, _, _ = x_nhwc.shape
    na = len(anchors)
    attrs = 5 + num_classes
    stride = reso // gs
    x = x_nhwc.reshape(b, gs, gs, na, attrs)
    x = x.transpose(0, 3, 1, 2, 4)  # [B, nA, gs, gs, attrs]
    x = x.astype(jnp.float32)

    grid = jnp.arange(gs, dtype=jnp.float32)
    cx = grid[None, None, None, :]       # broadcast over rows
    cy = grid[None, None, :, None]
    anchors_arr = jnp.asarray(anchors, jnp.float32) / stride  # (nA, 2)
    aw = anchors_arr[:, 0][None, :, None, None]
    ah = anchors_arr[:, 1][None, :, None, None]

    bx = (jax.nn.sigmoid(x[..., 0]) + cx) * stride
    by = (jax.nn.sigmoid(x[..., 1]) + cy) * stride
    bw = jnp.exp(x[..., 2]) * aw * stride
    bh = jnp.exp(x[..., 3]) * ah * stride
    obj = jax.nn.sigmoid(x[..., 4])
    cls = jax.nn.sigmoid(x[..., 5:])
    out = jnp.concatenate(
        [bx[..., None], by[..., None], bw[..., None], bh[..., None],
         obj[..., None], cls], axis=-1)
    return out.reshape(b, na * gs * gs, attrs)


def forward(spec: NetworkSpec, params, x, reso: int, decode: bool = True,
            train: bool = False, bn_stats=None):
    """Run the network. x: [B, H, W, 3] (H == W == reso).

    Returns decoded detections [B, nBoxes, 5+nC] if decode else the list of
    raw yolo-head feature maps (for the training loss).  train=True uses
    batch-stat BN and records per-layer stats into `bn_stats` (dict keyed by
    layer index) for rolling updates (see `apply_bn_updates`).
    """
    cache = {}
    raw_heads = []
    decoded = []
    for i, l in enumerate(spec.layers):
        p = params[i]
        if l.kind == "conv":
            x = _conv_layer(l, p, x, train=train, bn_stats=bn_stats, path=i)
        elif l.kind == "shortcut":
            x = cache[i - 1] + cache[l.from_idx]
        elif l.kind == "route":
            if len(l.route_idxs) == 1:
                x = cache[l.route_idxs[0]]
            else:
                x = jnp.concatenate([cache[a] for a in l.route_idxs], axis=-1)
        elif l.kind == "upsample":
            x = _upsample_nearest(x, l.stride)
        elif l.kind == "maxpool":
            x = _maxpool(x, l.size, l.stride, l.pad)
        elif l.kind == "avgpool":
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
        elif l.kind == "connected":
            x = _connected_layer(l, p, x, train=train, bn_stats=bn_stats,
                                 path=i)
        elif l.kind == "softmax":
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)
        elif l.kind in ("dropout", "cost"):
            pass  # identity at inference (forward_dropout/cost gate on train)
        elif l.kind == "reorg":
            x = _reorg(x, l.stride)
        elif l.kind == "region":
            raw_heads.append(x)
            if decode:
                decoded.append(
                    decode_region_head(x, l.anchors, l.num_classes, reso))
            x = cache[i - 1]
        elif l.kind == "detection":
            raw_heads.append(x)
            if decode:
                decoded.append(decode_detection_head(x, l, reso))
            x = cache[i - 1]
        elif l.kind == "yolo":
            raw_heads.append(x)
            if decode:
                decoded.append(
                    decode_head(x, l.anchors, l.num_classes, reso))
            x = cache[i - 1]  # pass-through, as reference darknet.py:363
        if i in spec.cache_idxs:
            cache[i] = x
    if decode:
        if not decoded:
            # no yolo heads (classifier cfgs): the final layer IS the output
            return x
        return jnp.concatenate(decoded, axis=1)
    return raw_heads


class YoloV3:
    """Convenience wrapper bundling spec + params (mirrors the reference
    `Darknet(cfg, reso)` object API, `yolo/darknet.py:319-363`)."""

    def __init__(self, cfg, reso: int = 416, params=None, key=None,
                 dtype=jnp.float32):
        self.spec = build_spec(cfg)
        self.reso = int(reso)
        if params is not None:
            self.params = params
        else:
            key = key if key is not None else jax.random.PRNGKey(0)
            self.params = init_params(key, self.spec, dtype)

    def load_weights(self, path):
        self.params, self.header = load_darknet_weights(self.spec, path)
        return self

    def save_weights(self, path, seen: int = 0):
        save_darknet_weights(self.spec, self.params, path, seen)

    def fold(self):
        self.params = fold_bn(self.spec, self.params)
        return self

    def __call__(self, x, decode=True):
        return forward(self.spec, self.params, x, self.reso, decode=decode)
