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
    #                           # | connected | crop | normalization | local
    #                           # | rnn | crnn | gru | activation | batchnorm
    #                           # | reorg_old
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
    focal_loss: bool = False    # [yolo] focal class deltas (parser.c:284,
    #                           # delta_yolo_class yolo_layer.c:121-138)
    # connected
    in_features: int = 0        # flattened h*w*c feeding the matmul
    # detection (YOLOv1 head, detection_layer.c)
    side: int = 0               # SxS grid
    num: int = 0                # boxes per cell
    coords: int = 4
    det_softmax: bool = False   # per-cell softmax over classes ([region] too)
    det_sqrt: bool = False      # w,h predicted as sqrt
    # v1/v2 training-loss knobs (parse_region:310-344, parse_detection:
    # 367-388); v3 [yolo] heads don't use these (fixed scales = 1)
    coord_scale: float = 1.0
    object_scale: float = 1.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    bias_match: bool = False    # region anchor match on priors vs pred w/h
    rescore: bool = False       # objectness target = IoU instead of 1
    # crop (crop_layer.c; inference = deterministic center crop)
    crop_h: int = 0
    crop_w: int = 0
    noadjust: bool = False      # skip the x*2-1 range shift
    # normalization (LRN, normalization_layer.c)
    lrn_alpha: float = 1e-4
    lrn_beta: float = 0.75
    lrn_kappa: float = 1.0
    # local (locally-connected conv, local_layer.c); out dims are static
    loc_h: int = 0
    loc_w: int = 0
    # recurrent family (rnn/crnn/gru_layer.c); steps = net time_steps
    hidden: int = 0             # rnn hidden size / crnn hidden_filters
    steps: int = 1
    rnn_shortcut: bool = False  # state += old state instead of reset
    rnn_logistic: int = 0       # self-layer activation: 1=LOGISTIC 2=LOGGY
    # reorg_old (reorg_old_layer.c)
    reverse: bool = False
    # dropout (dropout_layer.c; parse_dropout probability default .5)
    dropout_p: float = 0.5
    # cost (cost_layer.c; parse_cost: type default "sse", scale default 1;
    # scale multiplies only the backward delta, never the reported cost)
    cost_type: str = "sse"
    cost_scale: float = 1.0
    # softmax-tree (tree.c; `tree=` on [region]/[softmax], parser.c:
    # 239-240,346-347) + the class-id remap file (`map=`, parser.c:
    # 290-291, utils.c read_map).  `tree` holds a data.wordtree.WordTree;
    # compare=False keeps the frozen dataclass usable (WordTree has no
    # value equality)
    tree: object = dataclasses.field(default=None, compare=False)
    class_map: tuple = None


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    layers: tuple               # tuple[LayerSpec]
    cache_idxs: frozenset       # layer outputs needed later
    net_info: dict              # [net] block options (may be empty)
    dims: tuple = ()            # per-layer output (h, w) at the cfg's
    #                           # [net] width/height ((None, None) when the
    #                           # cfg omits them); parallels `layers`

    @property
    def yolo_idxs(self):
        return tuple(i for i, l in enumerate(self.layers) if l.kind == "yolo")


# parser.c string_to_layer_type:44-79 — the section-name alias table
_CFG_ALIASES = {"conv": "convolutional", "conn": "connected",
                "max": "maxpool", "avg": "avgpool", "lrn": "normalization",
                "soft": "softmax", "network": "net"}


def build_spec(cfg) -> NetworkSpec:
    """cfg: path or cfg text. Returns the static network spec."""
    blocks = parse_cfg(cfg)
    blocks = [dict(b, type=_CFG_ALIASES.get(b["type"], b["type"]))
              for b in blocks]
    net_info = {}
    if blocks and blocks[0]["type"] == "net":
        net_info = blocks[0]
        blocks = blocks[1:]

    layers = []
    # out_channels[i+1] = channels of layer i; input from [net] channels=
    try:
        in_ch = int(net_info.get("channels", 3))
    except (TypeError, ValueError):
        in_ch = 3
    out_channels = [in_ch]
    # static spatial tracking (parser.c propagates net w/h the same way);
    # only required when a [connected] layer needs its flattened input size
    try:
        cur_h = int(net_info.get("height", 0)) or None
        cur_w = int(net_info.get("width", 0)) or None
    except (TypeError, ValueError):
        cur_h = cur_w = None
    if cur_h is None and cur_w is None and "inputs" in net_info:
        # darknet's flat-input shortcut (parse_net_options: net.inputs
        # defaults to h*w*c; char-rnn cfgs give inputs=256 with no
        # width/height) — equivalent to a 1x1 spatial grid of `inputs`
        # channels
        try:
            in_ch = int(net_info["inputs"])
            out_channels[0] = in_ch
            cur_h = cur_w = 1
        except (TypeError, ValueError):
            pass
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
            # inference is a no-op; training applies inverted dropout
            # (forward_dropout_layer: drop with prob p, scale survivors
            # by 1/(1-p)) when forward() gets a dropout_key
            layers.append(LayerSpec(
                "dropout", cin,
                dropout_p=float(b.get("probability", 0.5))))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "crop":
            # parser.c parse_crop:401-423 / crop_layer.c forward:67-103.
            # Inference semantics: deterministic center crop
            # (dh=(h-out_h)/2, dw=(w-out_w)/2, no flip), then the range
            # shift x*2-1 unless noadjust.  The train-mode random
            # crop/flip/HSV is data augmentation and lives in the
            # training pipelines (train/yolo_train.py), not the graph.
            ch = int(b.get("crop_height", 1))
            cw = int(b.get("crop_width", 1))
            layers.append(LayerSpec(
                "crop", cin, crop_h=ch, crop_w=cw,
                noadjust=int(b.get("noadjust", 0)) != 0))
            out_channels.append(cin)
            dims.append((ch, cw))
        elif t == "normalization":
            # LRN (parser.c parse_normalization:498-506)
            layers.append(LayerSpec(
                "normalization", cin, size=int(b.get("size", 5)),
                lrn_alpha=float(b.get("alpha", 1e-4)),
                lrn_beta=float(b.get("beta", 0.75)),
                lrn_kappa=float(b.get("kappa", 1.0))))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "local":
            # locally-connected conv (parser.c parse_local:124-144,
            # local_layer.c).  darknet's `pad` here is the RAW 0/1 flag
            # passed straight to im2col as a pixel count, while the output
            # dims come from local_out_height: (h-1)/stride+1 when pad
            # else (h-size)/stride+1 — the two only agree for pad=0 (any
            # size) or pad=1 with size=3; anything else writes garbage in
            # darknet itself, so reject it.
            filters = int(b.get("filters", 1))
            size = int(b.get("size", 1))
            stride = int(b.get("stride", 1))
            pad = int(b.get("pad", 0))
            if cur_h is None or cur_w is None:
                raise ValueError(
                    "[local] layer needs width/height in the [net] block "
                    "to size its per-location weights statically")
            out_h = ((cur_h - 1) // stride + 1 if pad
                     else (cur_h - size) // stride + 1)
            out_w = ((cur_w - 1) // stride + 1 if pad
                     else (cur_w - size) // stride + 1)
            if ((cur_h + 2 * pad - size) // stride + 1 != out_h
                    or (cur_w + 2 * pad - size) // stride + 1 != out_w):
                raise ValueError(
                    f"[local] size={size} pad={pad} is internally "
                    "inconsistent in darknet (local_out_height vs im2col); "
                    "only pad=0, or pad=1 with size=3, are coherent")
            layers.append(LayerSpec(
                "local", filters, size=size, stride=stride, pad=pad,
                activation=b.get("activation", "logistic"),
                in_channels=cin, loc_h=out_h, loc_w=out_w))
            out_channels.append(filters)
            dims.append((out_h, out_w))
        elif t == "rnn":
            # parser.c parse_rnn:196-210 / rnn_layer.c: three [connected]
            # sublayers (input, self, output); time axis rides the leading
            # batch dim step-major (batch = rows/time_steps)
            if cur_h is None or cur_w is None:
                raise ValueError(
                    "[rnn] layer needs width/height in the [net] block")
            layers.append(LayerSpec(
                "rnn", int(b.get("output", 1)),
                hidden=int(b.get("hidden", 1)),
                activation=b.get("activation", "logistic"),
                batch_normalize=int(b.get("batch_normalize", 0)) != 0,
                rnn_logistic=int(b.get("logistic", 0)),
                rnn_shortcut=int(b.get("shortcut", 0)) != 0,
                in_features=cur_h * cur_w * cin,
                steps=max(int(net_info.get("time_steps", 1)), 1)))
            out_channels.append(int(b.get("output", 1)))
            dims.append((1, 1))
        elif t == "crnn":
            # parser.c parse_crnn:181-194 / crnn_layer.c: three 3x3/s1/p1
            # conv sublayers (input c->hidden, self hidden->hidden, output
            # hidden->output_filters), recurrent over hidden feature maps
            layers.append(LayerSpec(
                "crnn", int(b.get("output_filters", 1)),
                hidden=int(b.get("hidden_filters", 1)),
                activation=b.get("activation", "logistic"),
                batch_normalize=int(b.get("batch_normalize", 0)) != 0,
                rnn_shortcut=int(b.get("shortcut", 0)) != 0,
                in_channels=cin,
                steps=max(int(net_info.get("time_steps", 1)), 1)))
            out_channels.append(int(b.get("output_filters", 1)))
            dims.append((cur_h, cur_w))
        elif t == "gru":
            # parser.c parse_gru:212-220 / gru_layer.c: six LINEAR
            # [connected] sublayers; gates get their sigmoids after the
            # input+state sums (darknet's nonstandard GRU variant)
            if cur_h is None or cur_w is None:
                raise ValueError(
                    "[gru] layer needs width/height in the [net] block")
            layers.append(LayerSpec(
                "gru", int(b.get("output", 1)),
                batch_normalize=int(b.get("batch_normalize", 0)) != 0,
                in_features=cur_h * cur_w * cin,
                steps=max(int(net_info.get("time_steps", 1)), 1)))
            out_channels.append(int(b.get("output", 1)))
            dims.append((1, 1))
        elif t == "softmax":
            tree = None
            if b.get("tree"):
                from betapose_tpu.data.wordtree import WordTree
                tree = WordTree.read(b["tree"])     # parser.c:239-240
            layers.append(LayerSpec("softmax", cin, tree=tree))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "cost":
            # training objective (cost_layer.c): identity in the forward
            # graph; classifier_train reads type/scale off this spec
            layers.append(LayerSpec(
                "cost", cin,
                cost_type=str(b.get("type", "sse")),
                cost_scale=float(b.get("scale", 1.0))))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t in ("reorg", "reorg_old"):
            # YOLOv2 space-to-depth (reorg_layer.c): (h,w,c) ->
            # (h/s, w/s, c*s^2) with darknet's channel interleave;
            # reverse=1 runs the permutation the other way (depth-to-
            # space, out (h*s, w*s, c/s^2)).  [reorg_old] is the
            # original YOLO9000 layer (reorg_old_layer.c): same output
            # dims but reorg_cpu gets the INPUT dims, yielding a
            # different (historical) flat permutation.
            stride = int(b.get("stride", 1))
            reverse = int(b.get("reverse", 0)) != 0
            s2 = stride * stride
            if reverse:
                # reorg_cpu decomposes its out_c arg (= c/s^2 here) by
                # another /s^2 — darknet's own index math (blas.c:12)
                need = s2 if t == "reorg_old" else s2 * s2
                if cin % need:
                    raise ValueError(
                        f"[{t}] reverse=1 needs channels divisible by "
                        f"{need} (darknet reads out of bounds otherwise)")
                out_c = cin // s2
            else:
                if cin % s2 and t == "reorg_old":
                    raise ValueError(
                        f"[reorg_old] needs channels divisible by {s2}")
                out_c = cin * s2
            layers.append(LayerSpec(t, out_c, stride=stride,
                                    in_channels=cin, reverse=reverse))
            out_channels.append(out_c)
            mul = (lambda d: d * stride) if reverse else \
                  (lambda d: d // stride)
            dims.append((None if cur_h is None else mul(cur_h),
                         None if cur_w is None else mul(cur_w)))
        elif t == "activation":
            # parser.c parse_activation:532-547 / activation_layer.c:
            # parameterless elementwise activation, dims unchanged
            layers.append(LayerSpec(
                "activation", cin,
                activation=b.get("activation", "linear")))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "batchnorm":
            # standalone BN (parser.c parse_batchnorm:508-512,
            # batchnorm_layer.c): scales/rolling stats only — no beta
            layers.append(LayerSpec("batchnorm", cin))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        elif t == "region":
            # YOLOv2 detection head (region_layer.c): all `num` anchors in
            # GRID units (no mask); softmax/scales/bias_match/rescore per
            # parse_region:310-344; `tree=`/`map=` load the softmax-tree
            # hierarchy + class-id remap (parser.c:346-349; classfix out
            # of scope — absent from every stock detector cfg)
            flat = [float(x)
                    for x in b["anchors"].replace(" ", "").split(",")]
            anchors = tuple((flat[j], flat[j + 1])
                            for j in range(0, len(flat), 2))
            needed.add(i - 1)
            tree = None
            if b.get("tree"):
                from betapose_tpu.data.wordtree import WordTree
                tree = WordTree.read(b["tree"])
            cmap = None
            if b.get("map"):
                # utils.c read_map: one int per line
                cmap = tuple(int(v) for v in
                             open(b["map"]).read().split())
            layers.append(LayerSpec(
                "region", cin, anchors=anchors,
                num_classes=int(b["classes"]),
                tree=tree, class_map=cmap,
                det_softmax=int(b.get("softmax", 0)) != 0,
                ignore_thresh=float(b.get("thresh", 0.5)),
                coord_scale=float(b.get("coord_scale", 1.0)),
                object_scale=float(b.get("object_scale", 1.0)),
                noobject_scale=float(b.get("noobject_scale", 1.0)),
                class_scale=float(b.get("class_scale", 1.0)),
                bias_match=int(b.get("bias_match", 0)) != 0,
                rescore=int(b.get("rescore", 0)) != 0))
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
                ignore_thresh=float(b.get("ignore_thresh", 0.7)),
                focal_loss=int(b.get("focal_loss", 0)) != 0))
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
                det_sqrt=bool(int(b.get("sqrt", 0))),
                coord_scale=float(b.get("coord_scale", 1.0)),
                object_scale=float(b.get("object_scale", 1.0)),
                noobject_scale=float(b.get("noobject_scale", 1.0)),
                class_scale=float(b.get("class_scale", 1.0)),
                rescore=int(b.get("rescore", 0)) != 0))
            out_channels.append(cin)
            dims.append((cur_h, cur_w))
        else:
            raise ValueError(
                f"unsupported block type: {t} (supported: convolutional,"
                " shortcut, route, upsample, maxpool, avgpool, connected,"
                " dropout, softmax, cost, reorg, reorg_old, region, yolo,"
                " detection, crop, normalization, local, rnn, crnn, gru,"
                " activation, batchnorm)")
    return NetworkSpec(tuple(layers), frozenset(needed), net_info,
                       tuple(dims[1:]))


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def _bn_init_params(c, dtype):
    return {"bn_scale": jnp.ones((c,), dtype),
            "bn_bias": jnp.zeros((c,), dtype),
            "bn_mean": jnp.zeros((c,), dtype),
            "bn_var": jnp.ones((c,), dtype)}


def _init_conv_p(key, in_c, out_c, size, bn, dtype):
    fan_in = in_c * size * size
    w = jax.random.normal(
        key, (size, size, in_c, out_c), dtype) * jnp.sqrt(2.0 / fan_in)
    p = {"w": w}
    if bn:
        p.update(_bn_init_params(out_c, dtype))
    else:
        p["b"] = jnp.zeros((out_c,), dtype)
    return p


def _init_connected_p(key, in_f, out, bn, dtype):
    # connected_layer.c: scale = sqrt(2./inputs)
    w = jax.random.normal(key, (in_f, out), dtype) * jnp.sqrt(2.0 / in_f)
    p = {"w": w}
    if bn:
        # the on-disk bias array is BN's beta (forward_batchnorm_layer
        # applies scales then biases) — no separate bias
        p.update(_bn_init_params(out, dtype))
    else:
        p["b"] = jnp.zeros((out,), dtype)
    return p


def init_params(key, spec: NetworkSpec, dtype=jnp.float32):
    """He-style init for convs; BN starts at identity."""
    params = []
    for l in spec.layers:
        if l.kind == "conv":
            key, k1 = jax.random.split(key)
            params.append(_init_conv_p(
                k1, l.in_channels, l.out_channels, l.size,
                l.batch_normalize, dtype))
        elif l.kind == "connected":
            key, k1 = jax.random.split(key)
            params.append(_init_connected_p(
                k1, l.in_features, l.out_channels, l.batch_normalize, dtype))
        elif l.kind == "local":
            # local_layer.c: scale = sqrt(2./(size*size*c)), uniform(-1,1)
            # (darknet only fills the first location block and leaves the
            # rest zero — an init bug, not a contract; all locations get
            # the same distribution here)
            key, k1 = jax.random.split(key)
            k = l.size * l.size * l.in_channels
            locations = l.loc_h * l.loc_w
            w = jax.random.uniform(
                k1, (locations, l.out_channels, k), dtype,
                minval=-1.0, maxval=1.0) * jnp.sqrt(2.0 / k)
            params.append({
                "w": w,
                # bias layout [n, locations] channel-major (the on-disk
                # `outputs`-long array, local_layer.c forward copy_cpu)
                "b": jnp.zeros((l.out_channels, locations), dtype)})
        elif l.kind == "rnn":
            key, k1, k2, k3 = jax.random.split(key, 4)
            params.append({
                "input": _init_connected_p(
                    k1, l.in_features, l.hidden, l.batch_normalize, dtype),
                "self": _init_connected_p(
                    k2, l.hidden, l.hidden, l.batch_normalize, dtype),
                "output": _init_connected_p(
                    k3, l.hidden, l.out_channels, l.batch_normalize, dtype)})
        elif l.kind == "crnn":
            key, k1, k2, k3 = jax.random.split(key, 4)
            params.append({
                "input": _init_conv_p(
                    k1, l.in_channels, l.hidden, 3, l.batch_normalize,
                    dtype),
                "self": _init_conv_p(
                    k2, l.hidden, l.hidden, 3, l.batch_normalize, dtype),
                "output": _init_conv_p(
                    k3, l.hidden, l.out_channels, 3, l.batch_normalize,
                    dtype)})
        elif l.kind == "gru":
            keys = jax.random.split(key, 7)
            key = keys[0]
            out = l.out_channels
            ins = (l.in_features, l.in_features, l.in_features,
                   out, out, out)
            params.append({
                name: _init_connected_p(
                    kk, in_f, out, l.batch_normalize, dtype)
                for name, kk, in_f in zip(_GRU_SUBLAYERS, keys[1:], ins)})
        elif l.kind == "batchnorm":
            # make_batchnorm_layer: scales=1, rolling stats 0/0 — note
            # darknet calloc's rolling_variance to ZERO (not 1)
            params.append({
                "bn_scale": jnp.ones((l.out_channels,), dtype),
                "bn_mean": jnp.zeros((l.out_channels,), dtype),
                "bn_var": jnp.zeros((l.out_channels,), dtype)})
        else:
            params.append({})
    return params


# disk order: parser.c save/load order for GRU sublayers (parser.c:994-1000)
_GRU_SUBLAYERS = ("input_z", "input_r", "input_h",
                  "state_z", "state_r", "state_h")


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

    def read_connected(out_c, in_f, bn):
        # parser.c load_connected_weights: biases, weights [out, in]
        # row-major, then (if BN) scales, rolling_mean, rolling_var
        b_ = take(out_c)
        w_ = None if b_ is None else take(out_c * in_f)
        if w_ is None:
            return None
        p = {"b": jnp.asarray(b_, dtype),
             "w": jnp.asarray(w_.reshape(out_c, in_f).T, dtype)}
        if bn:
            for k in ("bn_scale", "bn_mean", "bn_var"):
                v = take(out_c)
                if v is None:
                    return None
                p[k] = jnp.asarray(v, dtype)
            # connected BN has no separate beta on disk; the bias slot
            # plays that role (connected_layer.c uses biases as beta)
            p["bn_bias"] = p.pop("b")
        return p

    def read_conv(out_c, in_c, size, bn):
        # load_convolutional_weights: biases (or the 4 BN arrays), then
        # OIHW weights
        p = {}
        for k in (("bn_bias", "bn_scale", "bn_mean", "bn_var")
                  if bn else ("b",)):
            v = take(out_c)
            if v is None:
                return None
            p[k] = jnp.asarray(v, dtype)
        w = take(out_c * in_c * size * size)
        if w is None:
            return None
        w = w.reshape(out_c, in_c, size, size)
        p["w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype)
        return p

    def read_subs(reader, shapes, bn):
        subs = {}
        for name, args in shapes:
            sp = reader(*args, bn)
            if sp is None:
                return None
            subs[name] = sp
        return subs

    for li, l in enumerate(spec.layers):
        if l.kind not in _PARAM_KINDS:
            params.append({})
            continue
        if exhausted:
            params.append(init[li])
            continue
        if l.kind == "conv":
            p = read_conv(l.out_channels, l.in_channels, l.size,
                          l.batch_normalize)
        elif l.kind == "connected":
            p = read_connected(l.out_channels, l.in_features,
                               l.batch_normalize)
        elif l.kind == "local":
            # save_weights_upto LOCAL branch (parser.c:1005-1014): biases
            # (n*locations, channel-major), then weights location-major
            # [locations, n, k] (forward addresses weights+j*k*n as an
            # [n, k] row-major block per location j, local_layer.c:108)
            locations = l.loc_h * l.loc_w
            k = l.size * l.size * l.in_channels
            b_ = take(l.out_channels * locations)
            w_ = (None if b_ is None
                  else take(locations * l.out_channels * k))
            p = None if w_ is None else {
                "b": jnp.asarray(
                    b_.reshape(l.out_channels, locations), dtype),
                "w": jnp.asarray(
                    w_.reshape(locations, l.out_channels, k), dtype)}
        elif l.kind == "rnn":
            # parser.c:990-993: input, self, output connected sublayers
            p = read_subs(read_connected,
                          (("input", (l.hidden, l.in_features)),
                           ("self", (l.hidden, l.hidden)),
                           ("output", (l.out_channels, l.hidden))),
                          l.batch_normalize)
        elif l.kind == "crnn":
            # parser.c:1001-1004: input, self, output 3x3 conv sublayers
            p = read_subs(read_conv,
                          (("input", (l.hidden, l.in_channels, 3)),
                           ("self", (l.hidden, l.hidden, 3)),
                           ("output", (l.out_channels, l.hidden, 3))),
                          l.batch_normalize)
        elif l.kind == "gru":
            # parser.c:994-1000 order (input_z/r/h then state_z/r/h)
            p = read_subs(
                read_connected,
                tuple((name,
                       (l.out_channels,
                        l.in_features if name.startswith("input")
                        else l.out_channels))
                      for name in _GRU_SUBLAYERS),
                l.batch_normalize)
        elif l.kind == "batchnorm":
            # load_batchnorm_weights (parser.c:1061-1071): scales,
            # rolling_mean, rolling_variance — no bias array
            p = {}
            for k in ("bn_scale", "bn_mean", "bn_var"):
                v = take(l.out_channels)
                if v is None:
                    p = None
                    break
                p[k] = jnp.asarray(v, dtype)
        params.append(init[li] if p is None else p)
    return params, header


_PARAM_KINDS = ("conv", "connected", "local", "rnn", "crnn", "gru",
                "batchnorm")


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
    sub_spec = NetworkSpec(tuple(sub_layers), spec.cache_idxs, spec.net_info,
                           spec.dims[:cutoff])
    save_darknet_weights(sub_spec, params[:cutoff], path, seen)


def save_darknet_weights(spec: NetworkSpec, params, path, seen: int = 0):
    """Write params in the exact darknet .weights layout (header then floats).

    Layer order/layouts mirror `parser.c save_weights_upto:962-1019`:
    conv = save_convolutional_weights, connected = save_connected_weights,
    rnn = 3 connected sublayers, gru = 6 (input_z/r/h, state_z/r/h),
    crnn = 3 conv sublayers, local = biases then location-major weights."""
    buf = io.BytesIO()
    buf.write(np.array([0, 1, 0, seen], dtype=np.int32).tobytes())

    def w32(a):
        buf.write(np.ascontiguousarray(a, dtype=np.float32).tobytes())

    def write_connected(p, bn):
        # save_connected_weights: biases, weights [out, in], then BN
        # scales/rolling_mean/rolling_var
        w32(p["bn_bias"] if bn else p["b"])
        w32(np.asarray(p["w"], dtype=np.float32).T)
        if bn:
            for k in ("bn_scale", "bn_mean", "bn_var"):
                w32(p[k])

    def write_conv(p, bn):
        for k in (("bn_bias", "bn_scale", "bn_mean", "bn_var")
                  if bn else ("b",)):
            w32(p[k])
        w32(np.transpose(np.asarray(p["w"], dtype=np.float32), (3, 2, 0, 1)))

    for l, p in zip(spec.layers, params):
        if l.kind == "connected":
            write_connected(p, l.batch_normalize)
        elif l.kind == "conv":
            write_conv(p, l.batch_normalize)
        elif l.kind == "local":
            w32(p["b"])
            w32(p["w"])
        elif l.kind == "rnn":
            for name in ("input", "self", "output"):
                write_connected(p[name], l.batch_normalize)
        elif l.kind == "crnn":
            for name in ("input", "self", "output"):
                write_conv(p[name], l.batch_normalize)
        elif l.kind == "gru":
            for name in _GRU_SUBLAYERS:
                write_connected(p[name], l.batch_normalize)
        elif l.kind == "batchnorm":
            # save_batchnorm_weights (parser.c:934-944)
            for k in ("bn_scale", "bn_mean", "bn_var"):
                w32(p[k])
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
    """The full darknet activation table (activations.h:22-55).
    Deviation: get_activation:43-60 warns and falls back to RELU on an
    unknown name; here that's a hard error (silent substitution would
    corrupt weights parity)."""
    if activation == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if activation == "relu":
        return jax.nn.relu(y)
    if activation == "logistic":
        return jax.nn.sigmoid(y)
    if activation == "loggy":
        # activations.h LOGGY: 2/(1+exp(-x)) - 1
        return 2.0 * jax.nn.sigmoid(y) - 1.0
    if activation == "tanh":
        return jnp.tanh(y)
    if activation == "elu":
        return jnp.where(y >= 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
    if activation == "relie":
        return jnp.where(y > 0, y, 0.01 * y)
    if activation == "ramp":
        # x*(x>0) + .1*x — NOT the same as leaky (adds .1x on BOTH sides)
        return y * (y > 0) + 0.1 * y
    if activation == "plse":
        return jnp.where(
            y < -4.0, 0.01 * (y + 4.0),
            jnp.where(y > 4.0, 0.01 * (y - 4.0) + 1.0, 0.125 * y + 0.5))
    if activation == "hardtan":
        return jnp.clip(y, -1.0, 1.0)
    if activation == "lhtan":
        return jnp.where(
            y < 0, 0.001 * y,
            jnp.where(y > 1.0, 0.001 * (y - 1.0) + 1.0, y))
    if activation == "stair":
        # int n = floor(x); n even -> floor(x/2), else (x-n)+floor(x/2)
        n = jnp.floor(y)
        half = jnp.floor(y / 2.0)
        return jnp.where(n % 2 == 0, half, (y - n) + half)
    if activation != "linear":
        raise ValueError(f"unknown activation: {activation}")
    return y  # linear


def _flatten_chw(x):
    """Flatten NHWC -> [B, C*H*W] in darknet's CHW memory order — the
    index convention every darknet flat consumer ([connected] weights,
    rnn/gru inputs, [detection] layout) was trained/saved under."""
    b = x.shape[0]
    return x.transpose(0, 3, 1, 2).reshape(b, -1)


def _dense(p, x2d, activation, bn, train=False, bn_stats=None, path=None):
    """connected_layer.c core on an already-flat [B, in] input: matmul ->
    BN (batch stats in training, running stats at inference; the bias array
    is BN's beta) or bias -> activation.  Returns [B, out] float32."""
    y = x2d.astype(jnp.float32) @ p["w"].astype(jnp.float32)
    if bn and "bn_scale" in p:
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
    return _activate(y, activation)


def _connected_layer(l: LayerSpec, p, x, train=False, bn_stats=None,
                     path=None):
    """Fully-connected layer (connected_layer.c): CHW flatten (darknet's
    memory order — NOT the NHWC raveling; they differ whenever the input
    still has spatial extent) -> matmul -> BN/bias -> activation.
    Returns [B, 1, 1, out]."""
    b = x.shape[0]
    y = _dense(p, _flatten_chw(x), l.activation, l.batch_normalize,
               train=train, bn_stats=bn_stats, path=path)
    return y.reshape(b, 1, 1, l.out_channels).astype(x.dtype)


def _crop_layer(l: LayerSpec, x):
    """crop_layer.c forward, inference branch (crop_layer.c:67-103):
    deterministic center crop dh=(h-out_h)/2, dw=(w-out_w)/2 (C integer
    division), no flip, then the range shift x*2-1 unless noadjust.
    The train-mode random crop/flip lives in the training pipelines."""
    _, h, w, _ = x.shape
    if l.crop_h > h or l.crop_w > w:
        raise ValueError(
            f"[crop] {l.crop_h}x{l.crop_w} exceeds input {h}x{w} "
            "(darknet's rand%(h-out_h+1) requires out <= in)")
    dh = (h - l.crop_h) // 2
    dw = (w - l.crop_w) // 2
    y = x[:, dh:dh + l.crop_h, dw:dw + l.crop_w, :]
    if not l.noadjust:
        y = y * 2.0 - 1.0
    return y


def _lrn_layer(l: LayerSpec, x):
    """Local Response Normalization (normalization_layer.c:65-94),
    including darknet's init quirk: the channel-0 seed loop sums squared
    channels [0, size/2) — one short of the clipped window [0, size/2] —
    and the rolling update then propagates that deficit to every channel,
    so norms[k] = kappa + alpha*(clipped_window_sum_k - squared[size/2])
    for ALL k.  out = in * norms^(-beta)."""
    c = x.shape[-1]
    half_lo = (l.size - 1) // 2
    half_hi = l.size // 2
    if half_hi >= c:
        raise ValueError(
            f"[normalization] size={l.size} with only {c} channels reads "
            "out of bounds in darknet's seed loop (undefined behavior)")
    xf = x.astype(jnp.float32)
    sq = xf * xf
    win = sq
    for d in range(-half_lo, half_hi + 1):
        if d < 0:
            win = win.at[..., -d:].add(sq[..., :d])
        elif d > 0:
            win = win.at[..., :-d].add(sq[..., d:])
    norms = l.lrn_kappa + l.lrn_alpha * (win - sq[..., half_hi:half_hi + 1])
    return (xf * norms ** (-l.lrn_beta)).astype(x.dtype)


def _local_layer(l: LayerSpec, p, x):
    """Locally-connected conv (local_layer.c forward:91-119): im2col
    patches (channel-major k index = (c*size+ky)*size+kx, zero pad) hit a
    DIFFERENT [n, k] weight matrix per output location; biases are per
    (channel, location).  Expressed as one batched einsum over locations —
    on TPU this is a single large contraction, not darknet's per-location
    1-column GEMM loop."""
    b = x.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.float32), (l.size, l.size), (l.stride, l.stride),
        padding=((l.pad, l.pad), (l.pad, l.pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # feature dim ordering is (c, ky, kx) with c slowest — same index
    # convention as darknet's im2col rows (im2col.c:25-28)
    k = l.size * l.size * l.in_channels
    pk = patches.reshape(b, l.loc_h * l.loc_w, k)
    y = jnp.einsum("blk,lnk->bln", pk, p["w"].astype(jnp.float32))
    y = y + p["b"].astype(jnp.float32).T[None]     # [n, loc] -> [loc, n]
    y = _activate(y, l.activation)
    return y.reshape(b, l.loc_h, l.loc_w, l.out_channels).astype(x.dtype)


def _rnn_layer(l: LayerSpec, p, x):
    """Vanilla darknet RNN (rnn_layer.c forward:83-122): three connected
    sublayers; per step state' = (shortcut ? state : 0) + act_i(input(x_t))
    + act_s(self(state)), out_t = act(output(state')).  The self-layer
    activation is LOGISTIC/LOGGY when logistic=1/2 in the cfg.  Time rides
    the leading batch axis step-major (batch = B/steps, rnn_layer.c:32);
    expressed as lax.scan over steps.  Deviation (documented): darknet
    persists l.state across inference calls (streaming); a functional
    graph starts each call from zeros — darknet's state at the start of
    the FIRST call is also zeros (calloc)."""
    b = x.shape[0]
    if b % l.steps:
        raise ValueError(f"[rnn] batch {b} not divisible by steps {l.steps}")
    batch = b // l.steps
    xs = _flatten_chw(x).reshape(l.steps, batch, l.in_features)
    self_act = {1: "logistic", 2: "loggy"}.get(l.rnn_logistic, l.activation)

    def step(state, xt):
        i = _dense(p["input"], xt, l.activation, l.batch_normalize)
        s = _dense(p["self"], state, self_act, l.batch_normalize)
        new_state = (state if l.rnn_shortcut else 0.0) + i + s
        o = _dense(p["output"], new_state, l.activation, l.batch_normalize)
        return new_state, o

    state0 = jnp.zeros((batch, l.hidden), jnp.float32)
    _, outs = jax.lax.scan(step, state0, xs)
    return outs.reshape(b, 1, 1, l.out_channels).astype(x.dtype)


def _crnn_layer(l: LayerSpec, p, x):
    """Convolutional RNN (crnn_layer.c forward:95-131): same recurrence as
    [rnn] but the three sublayers are 3x3/s1/p1 convs and the state is a
    hidden feature map.  scan over steps; steps ride the leading batch."""
    b, h, w, _ = x.shape
    if b % l.steps:
        raise ValueError(f"[crnn] batch {b} not divisible by steps {l.steps}")
    batch = b // l.steps
    mk = lambda cin, cout: LayerSpec(
        "conv", cout, size=3, stride=1, pad=1,
        batch_normalize=l.batch_normalize, activation=l.activation,
        in_channels=cin)
    spec_in = mk(l.in_channels, l.hidden)
    spec_self = mk(l.hidden, l.hidden)
    spec_out = mk(l.hidden, l.out_channels)
    xs = x.reshape(l.steps, batch, h, w, l.in_channels)

    def step(state, xt):
        i = _conv_layer(spec_in, p["input"], xt)
        s = _conv_layer(spec_self, p["self"], state)
        new_state = (state if l.rnn_shortcut else 0.0) + i + s
        o = _conv_layer(spec_out, p["output"], new_state)
        return new_state, o

    state0 = jnp.zeros((batch, h, w, l.hidden), x.dtype)
    _, outs = jax.lax.scan(step, state0, xs)
    return outs.reshape(b, h, w, l.out_channels)


def _gru_layer(l: LayerSpec, p, x):
    """darknet's GRU variant (gru_layer.c forward:117-193): six LINEAR
    connected sublayers; z = sigmoid(input_z(x) + state_z(s)),
    r = sigmoid(input_r(x) + state_r(s)), h = sigmoid(input_h(x) +
    state_h(r*s)) (LOGISTIC candidate — USET/TANH is compiled out), and
    out = z*s + (1-z)*h (weighted_sum_cpu, blas.c:53-59 — note z gates
    the OLD state, the transpose of the textbook GRU)."""
    b = x.shape[0]
    if b % l.steps:
        raise ValueError(f"[gru] batch {b} not divisible by steps {l.steps}")
    batch = b // l.steps
    xs = _flatten_chw(x).reshape(l.steps, batch, l.in_features)

    def dense(name, v):
        return _dense(p[name], v, "linear", l.batch_normalize)

    def step(state, xt):
        z = jax.nn.sigmoid(dense("input_z", xt) + dense("state_z", state))
        r = jax.nn.sigmoid(dense("input_r", xt) + dense("state_r", state))
        h = jax.nn.sigmoid(dense("input_h", xt)
                           + dense("state_h", r * state))
        out = z * state + (1.0 - z) * h
        return out, out

    state0 = jnp.zeros((batch, l.out_channels), jnp.float32)
    _, outs = jax.lax.scan(step, state0, xs)
    return outs.reshape(b, 1, 1, l.out_channels).astype(x.dtype)


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


def _batchnorm_layer(l: LayerSpec, p, x, train=False, bn_stats=None,
                     path=None):
    """Standalone [batchnorm] (batchnorm_layer.c forward:129-151):
    out = (x - mean) / (sqrt(var) + 1e-6) * scales — note darknet's
    normalize_cpu adds its epsilon to sqrt(var), NOT under it (blas.c:
    136), and the layer has NO beta.  Inference uses rolling stats
    (calloc'd to ZERO until trained/loaded); train uses batch stats and
    records them for rolling updates."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        if bn_stats is not None:
            bn_stats[path] = (mean, var)
    else:
        mean, var = p["bn_mean"], p["bn_var"]
    y = (xf - mean) / (jnp.sqrt(var) + 1e-6) * p["bn_scale"]
    return y.astype(x.dtype)


def _reorg_darknet(l: LayerSpec, x, old: bool):
    """Transcription of reorg_cpu (blas.c:9-33) covering the reverse
    flag and both layers' calling conventions: [reorg] passes its OUT
    dims (reorg_layer.c:78-86), [reorg_old] its IN dims
    (reorg_old_layer.c:80-88) — historically different flat
    permutations over the same buffer.  The output buffer is then read
    at the layer's out dims regardless.  All reshape/transpose on the
    CHW view: static permutations, no gathers."""
    b, h, w, c = x.shape
    s = l.stride
    if old:
        W, H, C = w, h, c
    elif l.reverse:
        W, H, C = w * s, h * s, c // (s * s)
    else:
        W, H, C = w // s, h // s, c * s * s
    in_c = C // (s * s)
    flat = x.transpose(0, 3, 1, 2).reshape(b, -1)  # darknet CHW order
    if l.reverse:
        # forward=1: out[(in_c,H*s,W*s) view] = x[(C,H,W) view],
        # k -> (offset, c2) with offset slow (blas.c:22-26)
        v = flat.reshape(b, s, s, in_c, H, W)      # (oy, ox, c2, j, i)
        out = v.transpose(0, 3, 4, 1, 5, 2)        # (c2, (j,oy), (i,ox))
    else:
        # forward=0: out[(C,H,W) view] = x[(in_c,H*s,W*s) view]
        v = flat.reshape(b, in_c, H, s, W, s)      # (c2, (j,oy), (i,ox))
        out = v.transpose(0, 3, 5, 1, 2, 4)        # ((oy,ox,c2), j, i)
    if l.reverse:
        oc, oh, ow = c // (s * s), h * s, w * s
    else:
        oc, oh, ow = c * s * s, h // s, w // s
    return out.reshape(b, oc, oh, ow).transpose(0, 2, 3, 1)


def decode_region_head(x_nhwc, anchors, num_classes, reso, softmax=True,
                       tree=None):
    """Decode a YOLOv2 [region] head (region_layer.c forward +
    get_region_box with DOABS=1, region_layer.c:78-90,179-210):
      bx = (cx + sigmoid(tx)) / gs,  bw = exp(tw) * anchor_w / gs
    (anchors in grid units, everything normalized to [0,1] then scaled to
    input-resolution pixels here to match `decode_head`'s convention);
    objectness sigmoid; classes SOFTMAXed when the cfg says softmax=1
    (stock v2 cfgs do; v3 uses per-class sigmoid), else raw.
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
    if tree is not None:
        # softmax-tree class path: per-group softmax (region_layer.c:
        # 196-201), joint probs up the ancestor chain
        # (hierarchy_predictions, tree.c:36-50, called from
        # get_region_boxes:393), then the no-map eval filter
        # (get_region_boxes:399-408): keep ONLY the deepest node whose
        # joint probability clears 0.5, zero everything else (parents
        # precede children, so node index orders by depth)
        from betapose_tpu.data.wordtree import group_softmax
        cond = group_softmax(x[..., 5:], tree.group_onehot())
        anc = jnp.asarray(tree.ancestor_matrix(), jnp.float32)
        joint = jnp.exp(jnp.log(jnp.maximum(cond, 1e-30)) @ anc.T)
        hit = joint > 0.5
        found = jnp.any(hit, axis=-1, keepdims=True)
        deepest = jnp.argmax(
            jnp.where(hit, jnp.arange(joint.shape[-1]), -1), axis=-1)
        cls = jnp.where(
            found & (jax.nn.one_hot(deepest, joint.shape[-1]) > 0),
            joint, 0.0)
    elif softmax:
        cls = jax.nn.softmax(x[..., 5:], axis=-1)
    else:
        cls = x[..., 5:]
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
    # darknet's detection layer reads the previous layer's flat buffer in
    # CHW order; a [connected] predecessor (the only stock case) is already
    # flat, but flatten CHW for spatial inputs too
    x = (_flatten_chw(x_flat) if x_flat.ndim == 4
         else x_flat.reshape(b, -1)).astype(jnp.float32)
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


@jax.custom_vjp
def _darknet_softmax(x):
    """[softmax] forward with darknet's backward: backward_softmax_layer
    (softmax_layer.c:63-69) adds the incoming delta STRAIGHT THROUGH to the
    previous layer — no softmax Jacobian.  With the [cost sse] delta
    (truth - pred) this makes the effective logit gradient scale*(pred -
    truth), i.e. exactly softmax-cross-entropy's gradient for one-hot truth
    while the reported loss stays SSE (see train/classifier_train.py)."""
    return jax.nn.softmax(x, axis=-1)


def _darknet_softmax_fwd(x):
    return jax.nn.softmax(x, axis=-1), None


def _darknet_softmax_bwd(_, g):
    return (g,)


_darknet_softmax.defvjp(_darknet_softmax_fwd, _darknet_softmax_bwd)


def forward(spec: NetworkSpec, params, x, reso: int, decode: bool = True,
            train: bool = False, bn_stats=None, dropout_key=None):
    """Run the network. x: [B, H, W, 3] (H == W == reso).

    Returns decoded detections [B, nBoxes, 5+nC] if decode else the list of
    raw yolo-head feature maps (for the training loss).  train=True uses
    batch-stat BN and records per-layer stats into `bn_stats` (dict keyed by
    layer index) for rolling updates (see `apply_bn_updates`).
    dropout_key (with train=True) activates [dropout] layers with
    darknet's inverted semantics (forward_dropout_layer: drop w/ prob p,
    survivors scaled 1/(1-p)); without a key they stay identity.
    """
    if train and any(l.kind in ("rnn", "crnn", "gru") for l in spec.layers):
        raise ValueError(
            "train=True is unsupported for recurrent layers (rnn/crnn/gru):"
            " per-step batch-stat BN inside the scan is not plumbed; "
            "Betapose never trains these (inference-only parity)")
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
            if l.tree is not None:
                # softmax_tree forward (softmax_layer.c:35-55): an
                # independent softmax per sibling group
                from betapose_tpu.data.wordtree import group_softmax
                b0 = x.shape[0]
                x = group_softmax(x.reshape(b0, -1),
                                  l.tree.group_onehot()) \
                    .reshape(x.shape).astype(x.dtype)
            else:
                x = _darknet_softmax(x.astype(jnp.float32)).astype(x.dtype)
        elif l.kind == "dropout":
            if train and dropout_key is not None and l.dropout_p > 0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, i),
                    1.0 - l.dropout_p, x.shape)
                x = jnp.where(keep, x / (1.0 - l.dropout_p),
                              jnp.zeros((), x.dtype)).astype(x.dtype)
            # else identity (inference, or no key supplied)
        elif l.kind == "cost":
            pass  # training-only bookkeeping; identity in the graph
        elif l.kind == "crop":
            x = _crop_layer(l, x)
        elif l.kind == "normalization":
            x = _lrn_layer(l, x)
        elif l.kind == "local":
            x = _local_layer(l, p, x)
        elif l.kind == "rnn":
            x = _rnn_layer(l, p, x)
        elif l.kind == "crnn":
            x = _crnn_layer(l, p, x)
        elif l.kind == "gru":
            x = _gru_layer(l, p, x)
        elif l.kind == "reorg":
            # fast NHWC slice path for the stock (non-reverse) YOLOv2
            # layer; the transcription handles reverse
            x = (_reorg(x, l.stride) if not l.reverse
                 else _reorg_darknet(l, x, old=False))
        elif l.kind == "reorg_old":
            x = _reorg_darknet(l, x, old=True)
        elif l.kind == "activation":
            x = _activate(x.astype(jnp.float32),
                          l.activation).astype(x.dtype)
        elif l.kind == "batchnorm":
            x = _batchnorm_layer(l, p, x, train=train, bn_stats=bn_stats,
                                 path=i)
        elif l.kind == "region":
            raw_heads.append(x)
            if decode:
                decoded.append(
                    decode_region_head(x, l.anchors, l.num_classes, reso,
                                       softmax=l.det_softmax, tree=l.tree))
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
