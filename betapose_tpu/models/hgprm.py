"""hgPRM — PyraNet stacked-hourglass with Pyramid Residual Modules, the
alternative KPD backbone (`--netType hgPRM`).

Functional NHWC reimplementation of `KPD/src/models/hgPRM.py` (PyraNet /
PyraNet_Inference) and `layers/PRM.py` / `layers/Residual.py`:

- PRM residual: dual-branch conv block — a bottleneck path and a pyramid
  path (C fractional-scale branches, conv3x3 each, bilinear-upsampled and
  summed), merged, then 1x1 expand; plus identity/conv skip
  (`PRM.py:23-111`).
- Plain preact residual (`Residual.py:14-41`).
- Hourglass depth 4: upper branch ResidualPyramid (depth>=2) / Residual,
  lower branch maxpool -> residual -> recurse -> residual -> nearest-up
  (`hgPRM.py:10-61`).
- PyraNet: conv7x7/2+bn+relu -> PRM(64->128)+maxpool -> PRM(128->128) ->
  PRM(128->nFeats); nStack hourglass stages with intermediate supervision
  (`hgPRM.py:63-145`); inference variant returns only the last head.

torch's stochastic `FractionalMaxPool2d(output_ratio=r)` is realized as a
deterministic adaptive max-pool to floor(r*H) x floor(r*W) (segment-max
binning) — deterministic and jit-friendly; the reference's randomized
pooling grid is an augmentation-flavored detail with no trained checkpoints
shipping for this backbone.

Defaults match `opt.py`: nFeats=256, nStack=4, baseWidth=9, cardinality=5,
nResidual=1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


class Static:
    """Static (non-differentiable) config value living inside a param tree:
    registered as a pytree node with NO leaves, so jax.grad/optax ignore it."""

    def __init__(self, v):
        self.v = v

    def __repr__(self):
        return f"Static({self.v!r})"


jax.tree_util.register_pytree_node(
    Static, lambda s: ((), s.v), lambda aux, _: Static(aux))


def _sv(x):
    """Unwrap a Static or return the raw value (back-compat)."""
    return x.v if isinstance(x, Static) else x


# ---------------------------------------------------------------------------
# primitive ops (shared conventions with models/kpd.py)
# ---------------------------------------------------------------------------

def _conv(x, w, b=None, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _bn_infer(x, p):
    scale = p["scale"] / jnp.sqrt(p["var"] + BN_EPS)
    return (x.astype(jnp.float32) * scale
            + (p["bias"] - p["mean"] * scale)).astype(x.dtype)


def _bn_train(x, p):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.var(xf, axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _bn_relu(x, p, bn=_bn_infer):
    return jax.nn.relu(bn(x, p))


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1),
                                 "VALID")


def adaptive_max_pool(x, out_h: int, out_w: int):
    """Deterministic adaptive max pool via segment-max binning (NHWC)."""
    b, h, w, c = x.shape
    row_bins = (np.arange(h) * out_h) // h
    col_bins = (np.arange(w) * out_w) // w
    x = jnp.swapaxes(x, 0, 1)                       # [H,B,W,C]
    x = jax.ops.segment_max(x, jnp.asarray(row_bins), num_segments=out_h)
    x = jnp.swapaxes(x, 0, 1)                       # [B,outH,W,C]
    x = jnp.swapaxes(x, 0, 2)                       # [W,outH,B,C]
    x = jax.ops.segment_max(x, jnp.asarray(col_bins), num_segments=out_w)
    return jnp.swapaxes(x, 0, 2)                    # [B,outH,outW,C]


def _bilinear_resize_ac(x, out_h: int, out_w: int):
    """align_corners=True bilinear resize (UpsamplingBilinear2d)."""
    b, h, w, c = x.shape
    ys = jnp.arange(out_h) * ((h - 1) / max(out_h - 1, 1))
    xs = jnp.arange(out_w) * ((w - 1) / max(out_w - 1, 1))
    rows = jnp.clip(1.0 - jnp.abs(ys[:, None] - jnp.arange(h)[None, :]), 0)
    cols = jnp.clip(1.0 - jnp.abs(xs[:, None] - jnp.arange(w)[None, :]), 0)
    with jax.default_matmul_precision("float32"):
        t = jnp.einsum("ih,bhwc->biwc", rows.astype(x.dtype), x)
        return jnp.einsum("jw,biwc->bijc", cols.astype(x.dtype), t)


def _upsample_nearest2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def _xavier(key, kh, kw, cin, cout, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = cin * kh * kw, cout * kh * kw
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _bn_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


class _KeyGen:
    def __init__(self, key):
        self.key = key

    def __call__(self):
        self.key, k = jax.random.split(self.key)
        return k


# ---------------------------------------------------------------------------
# PRM residual
# ---------------------------------------------------------------------------

def init_prm_residual(kg, num_in, num_out, net_type="preact",
                      use_conv=False, base_width=9, cardinality=5,
                      stride=1):
    d = max(1, num_out // base_width)
    p = {"net_type": Static(net_type), "stride": Static(stride), "D": Static(d), "C": Static(cardinality)}
    half = num_out // 2
    if net_type != "no_preact":
        p["pre1"] = _bn_init(num_in)
        p["pre2"] = _bn_init(num_in)
    # branch 1: bottleneck
    p["b1_conv1"] = {"w": _xavier(kg(), 1, 1, num_in, half,
                                  math.sqrt(1 / 2)),
                     "b": jnp.zeros((half,))}
    p["b1_bn"] = _bn_init(half)
    p["b1_conv2"] = {"w": _xavier(kg(), 3, 3, half, half),
                     "b": jnp.zeros((half,))}
    # branch 2: pyramid
    p["b2_conv1"] = {"w": _xavier(kg(), 1, 1, num_in, d,
                                  math.sqrt(1 / cardinality)),
                     "b": jnp.zeros((d,))}
    p["b2_bn1"] = _bn_init(d)
    p["pyra"] = [{"w": _xavier(kg(), 3, 3, d, d), "b": jnp.zeros((d,))}
                 for _ in range(cardinality)]
    p["b2_bn2"] = _bn_init(d)
    p["b2_conv2"] = {"w": _xavier(kg(), 1, 1, d, half,
                                  math.sqrt(1 / cardinality)),
                     "b": jnp.zeros((half,))}
    # merge
    p["m_bn"] = _bn_init(half)
    p["m_conv"] = {"w": _xavier(kg(), 1, 1, half, num_out, math.sqrt(1 / 2)),
                   "b": jnp.zeros((num_out,))}
    # skip
    if not (num_in == num_out and stride == 1 and not use_conv):
        p["skip_bn"] = _bn_init(num_in)
        p["skip_conv"] = {"w": _xavier(kg(), 1, 1, num_in, num_out,
                                       math.sqrt(1 / 2)),
                          "b": jnp.zeros((num_out,))}
    return p


def prm_residual(p, x, bn=_bn_infer):
    stride = _sv(p["stride"])
    c = _sv(p["C"])
    h, w = x.shape[1] // stride, x.shape[2] // stride

    def preact(x, which):
        if _sv(p["net_type"]) == "no_preact":
            return x
        return _bn_relu(x, p[which], bn)

    # branch 1
    b1 = preact(x, "pre1")
    b1 = _conv(b1, p["b1_conv1"]["w"], p["b1_conv1"]["b"])
    b1 = _bn_relu(b1, p["b1_bn"], bn)
    b1 = _conv(b1, p["b1_conv2"]["w"], p["b1_conv2"]["b"], stride, 1)
    # branch 2 (pyramid)
    b2 = preact(x, "pre2")
    b2 = _conv(b2, p["b2_conv1"]["w"], p["b2_conv1"]["b"], stride)
    b2 = _bn_relu(b2, p["b2_bn1"], bn)
    sc = 2 ** (1 / c)
    py = None
    for i, conv in enumerate(p["pyra"]):
        r = 1 / sc ** (i + 1)
        th, tw = max(1, int(r * h)), max(1, int(r * w))
        s = adaptive_max_pool(b2, th, tw)
        s = _conv(s, conv["w"], conv["b"], 1, 1)
        s = _bilinear_resize_ac(s, h, w)
        py = s if py is None else py + s
    b2 = _bn_relu(py, p["b2_bn2"], bn)
    b2 = _conv(b2, p["b2_conv2"]["w"], p["b2_conv2"]["b"])
    # merge
    m = _bn_relu(b1 + b2, p["m_bn"], bn)
    m = _conv(m, p["m_conv"]["w"], p["m_conv"]["b"])
    # skip
    if "skip_conv" in p:
        skip = _bn_relu(x, p["skip_bn"], bn)
        skip = _conv(skip, p["skip_conv"]["w"], p["skip_conv"]["b"], stride)
    else:
        skip = x
    return m + skip


def init_plain_residual(kg, num_in, num_out, net_type="preact",
                        use_conv=False, stride=1):
    half = num_out // 2
    p = {"net_type": Static(net_type), "stride": Static(stride), "plain": Static(True)}
    if net_type != "no_preact":
        p["pre"] = _bn_init(num_in)
    p["conv1"] = {"w": _xavier(kg(), 1, 1, num_in, half, math.sqrt(1 / 2)),
                  "b": jnp.zeros((half,))}
    p["bn1"] = _bn_init(half)
    p["conv2"] = {"w": _xavier(kg(), 3, 3, half, half),
                  "b": jnp.zeros((half,))}
    p["bn2"] = _bn_init(half)
    p["conv3"] = {"w": _xavier(kg(), 1, 1, half, num_out),
                  "b": jnp.zeros((num_out,))}
    if not (num_in == num_out and stride == 1 and not use_conv):
        p["skip_bn"] = _bn_init(num_in)
        p["skip_conv"] = {"w": _xavier(kg(), 1, 1, num_in, num_out,
                                       math.sqrt(1 / 2)),
                          "b": jnp.zeros((num_out,))}
    return p


def plain_residual(p, x, bn=_bn_infer):
    stride = _sv(p["stride"])
    y = x if _sv(p["net_type"]) == "no_preact" else _bn_relu(x, p["pre"], bn)
    y = _conv(y, p["conv1"]["w"], p["conv1"]["b"])
    y = _bn_relu(y, p["bn1"], bn)
    y = _conv(y, p["conv2"]["w"], p["conv2"]["b"], stride, 1)
    y = _bn_relu(y, p["bn2"], bn)
    y = _conv(y, p["conv3"]["w"], p["conv3"]["b"])
    if "skip_conv" in p:
        skip = _bn_relu(x, p["skip_bn"], bn)
        skip = _conv(skip, p["skip_conv"]["w"], p["skip_conv"]["b"], stride)
    else:
        skip = x
    return y + skip


def _residual_apply(p, x, bn=_bn_infer):
    return plain_residual(p, x, bn) if _sv(p.get("plain")) \
        else prm_residual(p, x, bn)


# ---------------------------------------------------------------------------
# Hourglass
# ---------------------------------------------------------------------------

def init_hourglass(kg, n, n_feats, n_modules, base_width, cardinality):
    use_pyra_up = n >= 2
    use_pyra_down = n >= 3

    def mk(use_pyra, use_conv=False):
        if use_pyra:
            return [init_prm_residual(kg, n_feats, n_feats,
                                      base_width=base_width,
                                      cardinality=cardinality,
                                      use_conv=use_conv)
                    for _ in range(n_modules)]
        return [init_plain_residual(kg, n_feats, n_feats, use_conv=use_conv)
                for _ in range(n_modules)]

    # low3 carries useConv=True (`hgPRM.py:36` _make_residual(..., True, ..))
    # -> its residuals get a BN+conv skip even at equal channels
    p = {"n": Static(n),
         "up1": mk(use_pyra_up),
         "low1": mk(use_pyra_down),
         "low3": mk(use_pyra_down, use_conv=True)}
    if n > 1:
        p["low2"] = init_hourglass(kg, n - 1, n_feats, n_modules,
                                   base_width, cardinality)
    else:
        p["low2_res"] = mk(use_pyra_down)
    return p


def hourglass(p, x, bn=_bn_infer):
    up1 = x
    for r in p["up1"]:
        up1 = _residual_apply(r, up1, bn)
    low = _maxpool2(x)
    for r in p["low1"]:
        low = _residual_apply(r, low, bn)
    if "low2" in p:
        low = hourglass(p["low2"], low, bn)
    else:
        for r in p["low2_res"]:
            low = _residual_apply(r, low, bn)
    for r in p["low3"]:
        low = _residual_apply(r, low, bn)
    low = _upsample_nearest2(low)
    return up1 + low


# ---------------------------------------------------------------------------
# PyraNet
# ---------------------------------------------------------------------------

def init_params(key, n_classes: int = 50, n_feats: int = 256,
                n_stack: int = 4, n_residual: int = 1, base_width: int = 9,
                cardinality: int = 5):
    kg = _KeyGen(key)
    p = {"n_stack": Static(n_stack)}
    p["conv1"] = {"w": _xavier(kg(), 7, 7, 3, 64, math.sqrt(1 / 3)),
                  "b": jnp.zeros((64,))}
    p["bn1"] = _bn_init(64)
    p["r1"] = init_prm_residual(kg, 64, 128, net_type="no_preact",
                                base_width=base_width,
                                cardinality=cardinality)
    p["r4"] = init_prm_residual(kg, 128, 128, base_width=base_width,
                                cardinality=cardinality)
    p["r5"] = init_prm_residual(kg, 128, n_feats, base_width=base_width,
                                cardinality=cardinality)
    p["stacks"] = []
    for i in range(n_stack):
        st = {
            "hg": init_hourglass(kg, 4, n_feats, n_residual, base_width,
                                 cardinality),
            "lin_bn1": _bn_init(n_feats),
            "lin_conv": {"w": _xavier(kg(), 1, 1, n_feats, n_feats,
                                      math.sqrt(1 / 2)),
                         "b": jnp.zeros((n_feats,))},
            "lin_bn2": _bn_init(n_feats),
            "out_conv": {"w": _xavier(kg(), 1, 1, n_feats, n_classes),
                         "b": jnp.zeros((n_classes,))},
        }
        if i < n_stack - 1:
            st["lin_"] = {"w": _xavier(kg(), 1, 1, n_feats, n_feats),
                          "b": jnp.zeros((n_feats,))}
            st["out_"] = {"w": _xavier(kg(), 1, 1, n_classes, n_feats),
                          "b": jnp.zeros((n_feats,))}
        p["stacks"].append(st)
    return p


def forward(params, x, all_heads: bool = False, train: bool = False,
            bn_stats=None):
    """x: [B,H,W,3].  Returns the final head's heatmaps [B,H/4,W/4,K]
    (PyraNet_Inference) or all nStack heads (PyraNet, for intermediate
    supervision) when all_heads=True.

    train=True normalizes every BN with batch statistics (required for
    stable training — running stats start at identity).  Running stats are
    NOT rolled during training (the deep nested structure makes per-site
    threading expensive); calibrate them post-hoc with `calibrate_bn`
    before running inference.  bn_stats is accepted for interface parity
    with kpd.forward and ignored.  The mode is threaded explicitly as the
    BN function (no module-level state — safe under concurrent tracing)."""
    return _forward_impl(params, x, all_heads,
                         bn=_bn_train if train else _bn_infer)


def _forward_impl(params, x, all_heads: bool = False, bn=_bn_infer):
    y = _conv(x, params["conv1"]["w"], params["conv1"]["b"], 2, 3)
    y = _bn_relu(y, params["bn1"], bn)
    y = prm_residual(params["r1"], y, bn)
    y = _maxpool2(y)
    y = prm_residual(params["r4"], y, bn)
    inter = prm_residual(params["r5"], y, bn)

    outs = []
    n_stack = _sv(params["n_stack"])
    for i, st in enumerate(params["stacks"]):
        lin = hourglass(st["hg"], inter, bn)
        lin = _bn_relu(lin, st["lin_bn1"], bn)
        lin = _conv(lin, st["lin_conv"]["w"], st["lin_conv"]["b"])
        lin = _bn_relu(lin, st["lin_bn2"], bn)
        out = _conv(lin, st["out_conv"]["w"], st["out_conv"]["b"])
        outs.append(out)
        if i < n_stack - 1:
            lin_ = _conv(lin, st["lin_"]["w"], st["lin_"]["b"])
            out_ = _conv(out, st["out_"]["w"], st["out_"]["b"])
            inter = inter + lin_ + out_
    return outs if all_heads else outs[-1]


# ---------------------------------------------------------------------------
# torch state_dict conversion
# ---------------------------------------------------------------------------

def torch_state_dict_to_params(sd, n_classes: int = 50, n_feats: int = 256,
                               n_stack: int = 4, n_residual: int = 1,
                               base_width: int = 9, cardinality: int = 5):
    """Convert a reference PyraNet / PyraNet_Inference torch state_dict
    (`KPD/src/models/hgPRM.py:63-143`) into this module's param tree.

    Key paths follow the reference's module nesting: `preact` =
    Sequential(cnv1, r1, r4, r5); PRM residuals expose `.con.modules_list.
    {0,1}` (convBlock / skipLayer, `layers/PRM.py:12-18`); plain residuals
    are a bare Sequential(ConcatTable, CaddTable) (`layers/Residual.py:7`);
    stack heads live in stack_lin / stack_out / stack_lin_ / stack_out_
    ModuleLists.  Every parameter tensor must be consumed exactly once —
    unused leftovers raise (catches silent wiring drift)."""
    used = set()

    def t(name):
        v = sd[name]
        used.add(name)
        try:
            v = v.detach().cpu().numpy()
        except AttributeError:
            v = np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    def conv(prefix):
        w = t(prefix + ".weight").transpose(2, 3, 1, 0)   # OIHW -> HWIO
        b = (t(prefix + ".bias") if prefix + ".bias" in sd
             else jnp.zeros((w.shape[-1],), jnp.float32))
        return {"w": w, "b": b}

    def bn(prefix):
        used.add(prefix + ".num_batches_tracked")          # may be absent
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias"),
                "mean": t(prefix + ".running_mean"),
                "var": t(prefix + ".running_var")}

    def prm(prefix, net_type="preact", stride=1):
        """PRM Residual at `prefix` (a layers/PRM.py Residual module)."""
        cb = prefix + ".con.modules_list.0"   # convBlock outer Sequential
        b1 = cb + ".0.0.modules_list.0"       # bottleneck branch Sequential
        b2 = cb + ".0.0.modules_list.1"       # pyramid branch Sequential
        off = 0 if net_type == "no_preact" else 2
        d = int(sd[f"{b2}.{off}.weight"].shape[0])
        p = {"net_type": Static(net_type), "stride": Static(stride),
             "D": Static(d), "C": Static(cardinality)}
        if net_type != "no_preact":
            p["pre1"] = bn(f"{b1}.0")
            p["pre2"] = bn(f"{b2}.0")
        p["b1_conv1"] = conv(f"{b1}.{off}")
        p["b1_bn"] = bn(f"{b1}.{off + 1}")
        p["b1_conv2"] = conv(f"{b1}.{off + 3}")
        p["b2_conv1"] = conv(f"{b2}.{off}")
        p["b2_bn1"] = bn(f"{b2}.{off + 1}")
        pyr = f"{b2}.{off + 3}.0.modules_list"  # pyramid ConcatTable
        p["pyra"] = [conv(f"{pyr}.{j}.1") for j in range(cardinality)]
        p["b2_bn2"] = bn(f"{b2}.{off + 4}")
        p["b2_conv2"] = conv(f"{b2}.{off + 6}")
        p["m_bn"] = bn(cb + ".1")
        p["m_conv"] = conv(cb + ".3")
        sk = prefix + ".con.modules_list.1"   # skipLayer module (has .m)
        if f"{sk}.m.2.weight" in sd:
            p["skip_bn"] = bn(f"{sk}.m.0")
            p["skip_conv"] = conv(f"{sk}.m.2")
        return p

    def plain(prefix, net_type="preact", stride=1):
        """Plain residual at `prefix` (layers/Residual.py Sequential)."""
        cb = prefix + ".0.modules_list.0"
        off = 0 if net_type == "no_preact" else 2
        p = {"net_type": Static(net_type), "stride": Static(stride),
             "plain": Static(True)}
        if net_type != "no_preact":
            p["pre"] = bn(f"{cb}.0")
        p["conv1"] = conv(f"{cb}.{off}")
        p["bn1"] = bn(f"{cb}.{off + 1}")
        p["conv2"] = conv(f"{cb}.{off + 3}")
        p["bn2"] = bn(f"{cb}.{off + 4}")
        p["conv3"] = conv(f"{cb}.{off + 6}")
        sk = prefix + ".0.modules_list.1"     # bare Sequential or Identity
        if f"{sk}.2.weight" in sd:
            p["skip_bn"] = bn(f"{sk}.0")
            p["skip_conv"] = conv(f"{sk}.2")
        return p

    def residuals(prefix, use_pyra):
        fn = prm if use_pyra else plain
        return [fn(f"{prefix}.{m}") for m in range(n_residual)]

    def hg(prefix, n):
        use_up, use_down = n >= 2, n >= 3
        p = {"n": Static(n),
             "up1": residuals(f"{prefix}.upperBranch", use_up),
             "low1": residuals(f"{prefix}.lowerBranch.0.1", use_down),
             "low3": residuals(f"{prefix}.lowerBranch.2", use_down)}
        if n > 1:
            p["low2"] = hg(f"{prefix}.lowerBranch.1", n - 1)
        else:
            p["low2_res"] = residuals(f"{prefix}.lowerBranch.1", use_down)
        return p

    params = {"n_stack": Static(n_stack)}
    params["conv1"] = conv("preact.0.0")
    params["bn1"] = bn("preact.0.1")
    params["r1"] = prm("preact.1.0", net_type="no_preact")
    params["r4"] = prm("preact.2")
    params["r5"] = prm("preact.3")
    params["stacks"] = []
    for i in range(n_stack):
        st = {
            "hg": hg(f"stack_lin.{i}.0", 4),
            "lin_bn1": bn(f"stack_lin.{i}.1"),
            "lin_conv": conv(f"stack_lin.{i}.3"),
            "lin_bn2": bn(f"stack_lin.{i}.4"),
            "out_conv": conv(f"stack_out.{i}"),
        }
        if i < n_stack - 1:
            st["lin_"] = conv(f"stack_lin_.{i}")
            st["out_"] = conv(f"stack_out_.{i}")
        params["stacks"].append(st)

    leftovers = {k for k in sd if k not in used
                 and not k.endswith("num_batches_tracked")}
    if leftovers:
        raise ValueError(
            f"unconsumed reference state_dict entries ({len(leftovers)}): "
            f"{sorted(leftovers)[:8]}...")
    return params


def calibrate_bn(params, x, momentum: float = 1.0):
    """Post-hoc BN calibration: run one representative batch in train mode
    and write the observed batch statistics into every BN's running stats
    (momentum=1.0 replaces them outright).  Returns new params."""
    stats = []

    def record_bn(x, p):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        stats.append((p, mean, var))
        y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
        return y.astype(x.dtype)

    # the recorder is threaded as the bn function (params dicts are shared
    # objects, so identity maps stats back onto the tree)
    _forward_impl(params, x, all_heads=False, bn=record_bn)

    id_to_stats = {id(p): (m, v) for p, m, v in stats}

    def rewrite(tree):
        if isinstance(tree, dict):
            if id(tree) in id_to_stats and "mean" in tree:
                m, v = id_to_stats[id(tree)]
                new = dict(tree)
                new["mean"] = (1 - momentum) * tree["mean"] + momentum * m
                new["var"] = (1 - momentum) * tree["var"] + momentum * v
                return new
            return {k: rewrite(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rewrite(v) for v in tree]
        return tree

    return rewrite(params)
