"""Measure VERDICT r4 #3's two shallow-stage levers before believing
either (PROFILE.md records the outcome):

1. **s2d past the stem**: the HBM-bound 104² darknet53 stage (two
   residual bottlenecks, 1x1 128->64 + 3x3 64->128) rewritten exactly in
   the 52² space-to-depth domain — grouped 1x1s (4 phase-independent
   groups) + the packed 3x3 from `models/stem_s2d.pack_conv1_weights`.
   The transform is float-exact like the stem rewrite, BUT: activation
   BYTES are invariant under s2d (52²·512 == 104²·128), and the stage is
   bandwidth-bound (0.128 MFU, probe_vmem_chain --shallow), while the
   packed 3x3 runs 4x the dense FLOPs.  The stem won because its 3->32
   channels starved the 128-wide MXU; at 128 channels there is nothing
   to win back.  This probe measures the exact rewrite anyway.

2. **fusing the 416² resize into the stem**: bound the lever by
   measuring the resize pass itself (480x640 u8 -> 416² bf16, separable
   matmuls, batch 96) against the full fused step — fusing can never
   save more than the pass costs.

Run: python -m betapose_tpu.tools.probe_s2d_stage [--batch 96] [--k 20]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.models.stem_s2d import space_to_depth2, pack_conv1_weights

PEAK_BF16 = 394e12  # v5e


def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stage_normal(x, w1a, w2a, w1b, w2b):
    """Two darknet53 residual bottlenecks at native resolution
    (1x1 C->C/2 leaky, 3x3 C/2->C leaky, add)."""
    for w1, w2 in ((w1a, w2a), (w1b, w2b)):
        y = _leaky(_conv(x, w1))
        y = _leaky(_conv(y, w2))
        x = x + y
    return x


def stage_s2d(xp, w1a, w2a, w1b, w2b):
    """The same two blocks in the s2d(2) domain.

    1x1 C->C/2 == grouped 1x1 4C->4C/2 (phases never mix through a 1x1);
    3x3/s1 C/2->C == packed 3x3 4C/2->4C (pack_conv1_weights — identical
    index algebra to the stem's conv1).  leaky and the residual add are
    elementwise and commute with the packing permutation."""
    for w1, w2 in ((w1a, w2a), (w1b, w2b)):
        w1g = jnp.concatenate([w1] * 4, axis=3)       # [1,1,C,4*(C/2)]
        y = _leaky(_conv(xp, w1g, groups=4))
        y = _leaky(_conv(y, pack_conv1_weights(w2)))
        xp = xp + y
    return xp


def _time_fn(fn, x, k, iters=8):
    @jax.jit
    def chained(x0):
        return jax.lax.fori_loop(0, k, lambda _, xi: fn(xi), x0)

    out = chained(x)
    jax.device_get(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x)
    jax.device_get(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / (iters * k)


def probe_stage(b=96, h=104, w=104, c=128, k=20):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16) * 0.1
    mk = lambda kh, kw, ci, co: jnp.asarray(
        rng.standard_normal((kh, kw, ci, co)), jnp.bfloat16) * 0.05
    ws = (mk(1, 1, c, c // 2), mk(3, 3, c // 2, c),
          mk(1, 1, c, c // 2), mk(3, 3, c // 2, c))

    fn_n = functools.partial(stage_normal, w1a=ws[0], w2a=ws[1],
                             w1b=ws[2], w2b=ws[3])
    fn_s = functools.partial(stage_s2d, w1a=ws[0], w2a=ws[1],
                             w1b=ws[2], w2b=ws[3])

    # float-exactness of the rewrite (up to bf16 reassociation)
    ref = np.asarray(space_to_depth2(fn_n(x)), np.float32)
    got = np.asarray(fn_s(space_to_depth2(x)), np.float32)
    scale = max(float(np.abs(ref).max()), 1e-6)
    max_rel = float(np.abs(ref - got).max()) / scale
    assert max_rel < 0.05, f"s2d stage disagrees: {max_rel}"

    # dense FLOPs each way (the packed 3x3 pays 4x; zeros are stored)
    fl_n = 2 * b * h * w * (c * c // 2 + 9 * (c // 2) * c) * 2
    fl_s = 2 * b * (h // 2) * (w // 2) * (
        4 * c * (c // 2) + 9 * (4 * c // 2) * (4 * c)) * 2

    t_n = _time_fn(fn_n, x, k)
    t_s = _time_fn(fn_s, space_to_depth2(x), k)
    return {
        "probe": f"s2d_stage_{h}x{w}x{c}_b{b}",
        "max_rel_err": round(max_rel, 5),
        "normal_ms": round(t_n * 1e3, 3),
        "normal_mfu": round(fl_n / t_n / PEAK_BF16, 4),
        "s2d_ms": round(t_s * 1e3, 3),
        "s2d_dense_gflop_ratio": round(fl_s / fl_n, 2),
        "speedup": round(t_n / t_s, 3),
    }


def probe_resize(b=96, k=20):
    """The det-stage resize pass (u8 frames -> 416² bf16, the separable
    matmuls the pipeline actually runs) timed alone — the ceiling of any
    resize-into-stem fusion."""
    from betapose_tpu.ops.image import resize_bilinear_matmul
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (b, 480, 640, 3)), jnp.uint8)

    def fn(fr):
        img = fr.astype(jnp.bfloat16) / 255.0
        return resize_bilinear_matmul(img, 416, 416)

    @jax.jit
    def chained(fr):
        # resize is shape-changing; chain via a cheap data dependency
        def body(_, carry):
            fr2, acc = carry
            out = fn(fr2)
            return fr2, acc + out[0, 0, 0, 0]
        _, acc = jax.lax.fori_loop(0, k, body,
                                   (fr, jnp.asarray(0, jnp.bfloat16)))
        return acc

    out = chained(frames)
    jax.device_get(out)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out = chained(frames)
    jax.device_get(out)
    t = (time.perf_counter() - t0) / (iters * k)
    return {"probe": f"resize_480x640->416_b{b}",
            "resize_ms": round(t * 1e3, 3),
            "ms_per_frame": round(t * 1e3 / b, 4)}


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--skip_resize", action="store_true")
    args = p.parse_args(argv)
    rows = [probe_stage(b=args.batch, k=args.k)]
    if not args.skip_resize:
        rows.append(probe_resize(b=args.batch, k=args.k))
    for r in rows:
        print(json.dumps(r))
    return rows


if __name__ == "__main__":
    main()
