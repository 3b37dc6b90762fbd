"""Measure the VMEM-resident bottleneck-chain hypothesis (PROFILE.md).

Runs the same 1x1 -> 3x3 -> 1x1 residual-bottleneck math two ways on the
real chip and prints one JSON line per shape:

- `xla_ms` / `xla_mfu`: stock lax convs (the production lowering);
- `pallas_ms` / `pallas_mfu`: the Pallas kernel that keeps the whole
  chain's activations VMEM-resident (`ops/pallas/bottleneck_chain.py`).

Shapes probed are the pipeline's real bottleneck interiors:
- 13x13x1024 (Cm 512): darknet53 deep-stage block at YOLO-416;
- 10x8x2048  (Cm 512): SE-ResNet101 layer4 block at KPD 320x256;
- 20x16x1024 (Cm 256): SE-ResNet101 layer3 block (the 23x-repeated one).

K chained data-dependent repetitions per timed call amortize the tunnel's
~1.3 ms dispatch floor (same methodology as probe_conv_mfu).

Run: python -m betapose_tpu.tools.probe_vmem_chain [--batch 96] [--k 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from betapose_tpu.ops.pallas.bottleneck_chain import (
    bottleneck_chain_pallas, bottleneck_chain_xla, chain_flops)

PEAK_BF16 = 394e12  # v5e


def _time_chain(fn, x, k, iters=8):
    """fn: x -> y with y.shape == x.shape.  Chain k data-dependent calls
    inside one jit so per-call dispatch cancels."""

    @jax.jit
    def chained(x0):
        def body(_, xi):
            return fn(xi)
        return jax.lax.fori_loop(0, k, body, x0)

    out = chained(x)
    jax.device_get(out[0, 0, 0, 0])            # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x)
    jax.device_get(out[0, 0, 0, 0])
    return (time.perf_counter() - t0) / (iters * k)


def probe_shape(b, h, w, cin, cm, k, batch_tile, pallas=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16) * 0.1
    w1 = jnp.asarray(rng.standard_normal((cin, cm)), jnp.bfloat16) * 0.02
    w2 = jnp.asarray(rng.standard_normal((9, cm, cm)), jnp.bfloat16) * 0.02
    w3 = jnp.asarray(rng.standard_normal((cm, cin)), jnp.bfloat16) * 0.02

    xla_fn = functools.partial(bottleneck_chain_xla, w1=w1, w2=w2, w3=w3)
    flops = chain_flops(b, h, w, cin, cm)
    if not pallas:
        # shallow/large-spatial stages: only the XLA chain rate matters
        # for the stack-mix decomposition, and the 9-shift Mosaic kernel
        # compiles pathologically there — skip it.
        t_xla = _time_chain(xla_fn, x, k)
        return {
            "shape": f"{b}x{h}x{w}x{cin}->cm{cm}",
            "flops_g": round(flops / 1e9, 2),
            "xla_ms": round(t_xla * 1e3, 3),
            "xla_mfu": round(flops / t_xla / PEAK_BF16, 4),
        }

    # numeric agreement first (bf16 chains: loose tolerance); large-cin
    # shapes overflow the 16M scoped-VMEM stack at tile 8 — halve until
    # the kernel compiles (the weights stay resident either way).  Only
    # Mosaic's allocation-failure message triggers the retry (a genuine
    # kernel bug whose text merely mentions VMEM must surface), and only
    # tiles that divide the batch are tried (b % batch_tile is a kernel
    # precondition).
    def _is_vmem_alloc_failure(e):
        s = str(e).lower()
        return ("vmem" in s and
                any(t in s for t in ("exceed", "alloc", "oom",
                                     "out of memory", "overflow")))

    def _next_tile(t):
        t //= 2
        while t >= 1 and b % t:
            t //= 2
        return t

    ref = np.asarray(xla_fn(x), np.float32)
    got = None
    while batch_tile >= 1:
        pl_fn = functools.partial(bottleneck_chain_pallas, w1=w1, w2=w2,
                                  w3=w3, h=h, w=w, batch_tile=batch_tile)
        try:
            got = np.asarray(pl_fn(x), np.float32)
            break
        except Exception as e:  # noqa: BLE001 — compile-time VMEM OOM
            nxt = _next_tile(batch_tile)
            if not _is_vmem_alloc_failure(e) or nxt < 1:
                raise
            print(f"# batch_tile {batch_tile} overflows scoped VMEM at "
                  f"{b}x{h}x{w}x{cin}; retrying with {nxt}")
            batch_tile = nxt
    scale = max(float(np.abs(ref).max()), 1e-6)
    max_rel = float(np.abs(ref - got).max()) / scale
    assert max_rel < 0.05, f"kernel disagrees with XLA: max_rel={max_rel}"

    flops = chain_flops(b, h, w, cin, cm)
    t_xla = _time_chain(xla_fn, x, k)
    t_pl = _time_chain(pl_fn, x, k)
    return {
        "shape": f"{b}x{h}x{w}x{cin}->cm{cm}",
        "batch_tile": batch_tile,
        "flops_g": round(flops / 1e9, 2),
        "xla_ms": round(t_xla * 1e3, 3),
        "xla_mfu": round(flops / t_xla / PEAK_BF16, 4),
        "pallas_ms": round(t_pl * 1e3, 3),
        "pallas_mfu": round(flops / t_pl / PEAK_BF16, 4),
        "speedup": round(t_xla / t_pl, 3),
        "max_rel_err": round(max_rel, 5),
    }


def main(argv=None):
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch_tile", type=int, default=8)
    p.add_argument("--shallow", action="store_true",
                   help="also probe the shallow/mid darknet53 stages "
                        "(bandwidth-bound, large-spatial) to decompose "
                        "the whole-stack MFU mix")
    args = p.parse_args(argv)
    shapes = [
        (13, 13, 1024, 512, True),   # darknet53 deep stage @416
        (10, 8, 2048, 512, True),    # SE-R101 layer4 @320x256
        (20, 16, 1024, 256, True),   # SE-R101 layer3 @320x256
    ]
    if args.shallow:
        shapes += [
            (26, 26, 512, 256, False),    # darknet53 stage4 @416
            (52, 52, 256, 128, False),    # darknet53 stage3 @416
            (104, 104, 128, 64, False),   # darknet53 stage2 (bandwidth)
        ]
    rows = []
    for h, w, cin, cm, pallas in shapes:
        row = probe_shape(args.batch, h, w, cin, cm, args.k,
                          args.batch_tile, pallas=pallas)
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
