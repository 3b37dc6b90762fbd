"""Space-to-depth stem optimization for YOLOv3 — exact transform.

The first two darknet-53 layers (conv 3x3/1 3->32 at 416^2, conv 3x3/2
32->64) run at full resolution with tiny channel counts: the MXU contracts
27 / 288 elements against a 128-wide systolic array, so these layers are
~40% of the whole detector's wall-clock at <6% of its FLOPs.

This module rewrites them EXACTLY (same function, float-exact up to
reassociation) in a space-to-depth domain:

  x [B,416,416,3] --s2d(2)--> xp [B,208,208,12]   (phase-major packing)
  conv1 3x3/1 (3->32)  ==> conv 3x3/1 (12->128) whose outputs are the four
                           phases of the original conv1 output, packed
  leaky (elementwise — commutes with the packing permutation)
  conv2 3x3/2 (32->64) ==> conv 2x2/1 (128->64) with top/left pad 1
                           producing the standard [B,208,208,64] map

Weight mappings follow from index algebra on y = 2i + py - 1 + ky
(derivation in comments below); taps that fall on positions the original
padding never reaches are exactly zero.  After conv2 the network continues
unchanged, so route/shortcut indices are unaffected (nothing references
layer 0's full-res output in YOLOv3).

~2.4x more FLOPs on conv1, but >2x faster in practice from MXU utilization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth2(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel = (py*2+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B,h2,w2,py,px,C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def pack_conv1_weights(w):
    """[3,3,Cin,Cout] (s1 conv) -> [3,3,4*Cin,4*Cout] packed conv.

    For output phase (py,px) and tap (ky,kx): input row y = 2i+py-1+ky =
    2(i+d)+q with d = floor((py-1+ky)/2), q = (py-1+ky) mod 2; kernel row
    r = d+1.  Same along x."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for py in range(2):
        for px in range(2):
            for ky in range(3):
                dy, qy = divmod(py - 1 + ky, 2)
                for kx in range(3):
                    dx, qx = divmod(px - 1 + kx, 2)
                    ci = (qy * 2 + qx) * cin
                    co = (py * 2 + px) * cout
                    out = out.at[dy + 1, dx + 1, ci:ci + cin,
                                 co:co + cout].add(w[ky, kx])
    return out


def pack_conv1_bias(b):
    return jnp.tile(b, 4)


def pack_conv2_weights(w):
    """[3,3,Cin,Cout] (s2 conv) -> [2,2,4*Cin,Cout]: output grid is the
    stride-2 lattice; y = 2i-1+ky = 2(i+d)+q with d = floor((ky-1)/2)
    in {-1,0}, q = (ky-1) mod 2; kernel row r = d+1 in {0,1}."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for ky in range(3):
        dy, qy = divmod(ky - 1, 2)
        for kx in range(3):
            dx, qx = divmod(kx - 1, 2)
            ci = (qy * 2 + qx) * cin
            out = out.at[dy + 1, dx + 1, ci:ci + cin].add(w[ky, kx])
    return out


def pack_stride2_conv_weights(w):
    """[k,k,Cin,Cout] stride-2 'same'-padded conv (odd k) -> s2d-domain
    stride-1 conv [k2,k2,4*Cin,Cout] with asymmetric padding.

    For output (i,j): input row y = 2i - k//2 + ky = 2(i+d) + q with
    d = floor((ky - k//2)/2), q = (ky - k//2) mod 2.  Returns
    (packed_w, (pad_before, pad_after)) where pad_before = -d_min,
    pad_after = d_max in s2d pixels."""
    kh, kw, cin, cout = w.shape
    assert kh == kw and kh % 2 == 1
    half = kh // 2
    ds = [int(np.floor((ky - half) / 2)) for ky in range(kh)]
    d_min, d_max = min(ds), max(ds)
    k2 = d_max - d_min + 1
    out = jnp.zeros((k2, k2, 4 * cin, cout), w.dtype)
    for ky in range(kh):
        dy, qy = divmod(ky - half, 2)
        for kx in range(kw):
            dx, qx = divmod(kx - half, 2)
            ci = (qy * 2 + qx) * cin
            out = out.at[dy - d_min, dx - d_min,
                         ci:ci + cin].add(w[ky, kx])
    return out, (-d_min, d_max)


def conv_stride2_via_s2d(x, w):
    """Exact stride-2 'same' conv via space-to-depth + stride-1 conv.
    x: [B,H,W,Cin] (H, W even); w: [k,k,Cin,Cout] (odd k).  Used for
    MXU-starved stems (e.g. KPD's 7x7/2 conv on 3 input channels)."""
    packed, (pb, pa) = pack_stride2_conv_weights(w)
    xp = space_to_depth2(x)
    return jax.lax.conv_general_dilated(
        xp, packed.astype(x.dtype), (1, 1), ((pb, pa), (pb, pa)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def stem_applicable(spec):
    """True when layers 0/1 are the darknet-53 stem pattern and layer 0's
    output is never referenced by a route/shortcut."""
    if len(spec.layers) < 2:
        return False
    l0, l1 = spec.layers[0], spec.layers[1]
    return (l0.kind == "conv" and l0.size == 3 and l0.stride == 1
            and l0.pad == 1 and l1.kind == "conv" and l1.size == 3
            and l1.stride == 2 and l1.pad == 1
            and 0 not in spec.cache_idxs
            and l0.activation == "leaky" and l1.activation == "leaky")


def pack_stem_params(params):
    """Pack folded (conv+bias) params of layers 0 and 1.  Requires BN
    already folded (fold_bn)."""
    p0, p1 = params[0], params[1]
    return {
        "w1": pack_conv1_weights(p0["w"]),
        "b1": pack_conv1_bias(p0["b"]),
        "w2": pack_conv2_weights(p1["w"]),
        "b2": p1["b"],
    }


def stem_forward(packed, x):
    """x: [B,H,W,3] -> layer-1 output [B,H/2,W/2,C1] (exact)."""
    xp = space_to_depth2(x)
    y = jax.lax.conv_general_dilated(
        xp, packed["w1"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + packed["b1"]
    y = jnp.where(y > 0, y, 0.1 * y).astype(x.dtype)
    z = jax.lax.conv_general_dilated(
        y, packed["w2"].astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    z = z + packed["b2"]
    z = jnp.where(z > 0, z, 0.1 * z).astype(x.dtype)
    return z


def forward_with_s2d_stem(spec, params, x, reso, decode=True):
    """YOLOv3 forward with the packed stem, falling back to the standard
    forward when the pattern does not apply."""
    from betapose_tpu.models import yolov3 as yolo_mod

    if not stem_applicable(spec) or "b" not in params[0]:
        return yolo_mod.forward(spec, params, x, reso, decode=decode)
    packed = params[0].get("_s2d")
    if packed is None:
        packed = pack_stem_params(params)
    y = stem_forward(packed, x)

    cache = {1: y}
    raw_heads = []
    decoded = []
    for i, l in enumerate(spec.layers):
        if i < 2:
            continue
        p = params[i]
        if l.kind == "conv":
            y = yolo_mod._conv_layer(l, p, y)
        elif l.kind == "shortcut":
            y = cache[i - 1] + cache[l.from_idx]
        elif l.kind == "route":
            if len(l.route_idxs) == 1:
                y = cache[l.route_idxs[0]]
            else:
                y = jnp.concatenate([cache[a] for a in l.route_idxs],
                                    axis=-1)
        elif l.kind == "upsample":
            y = yolo_mod._upsample_nearest(y, l.stride)
        elif l.kind == "maxpool":
            y = yolo_mod._maxpool(y, l.size, l.stride, l.pad)
        elif l.kind == "yolo":
            raw_heads.append(y)
            if decode:
                decoded.append(yolo_mod.decode_head(
                    y, l.anchors, l.num_classes, reso))
            y = cache[i - 1]
        if i in spec.cache_idxs:
            cache[i] = y
    if decode:
        return jnp.concatenate(decoded, axis=1)
    return raw_heads
