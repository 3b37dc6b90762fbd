"""Dispatch-amortized per-op conv/matmul MFU probe (PROFILE.md evidence).

Chains K applications of one op inside a single jit (`lax.fori_loop`) so
per-call dispatch latency (~1.3 ms through the axon remote tunnel — which
otherwise dwarfs every op under ~2 ms and makes naive per-op timing
meaningless) is split across K ops.  Quantifies the questions PROFILE.md's
ceiling analysis rests on:

- 3x3 conv rate at 13x13 vs 16x16: the odd-grid sublane-padding penalty.
  Measured: 0.450 vs 0.462 MFU — a 2.6% effect, NOT the ~19% once
  hypothesized from the 8-sublane register layout; XLA's conv lowering
  already absorbs odd grids.
- 1x1 conv vs the equivalent reshape-matmul: measured within 10% of each
  other (0.23 vs 0.26 MFU) — no win available from rewriting 1x1 convs as
  matmuls; these shapes ARE the weak ops of the YOLO/KPD mix.
- pure-matmul rate at the same [B*H*W, C] shapes: ~100 TF/s (0.25 MFU) —
  the practical per-op ceiling for 1024-wide serial-dependent matmuls on
  this chip (serial chain = no cross-op overlap, like a conv stack's
  layer-to-layer dependency).
- `--int8`: the same chains with int8 operands / int32 accumulation (the
  v5e's nominal 2x-throughput mode).  Measured at batch 64: 3x3 convs
  277 TOP/s (1.56x bf16's 177 TF/s), but 1x1 convs 85 TOP/s (0.94x — a
  REGRESSION) and the [8192,1024] matmul 71 TOP/s (0.7x).  A full
  mixed-precision prototype (int8 for size>=3 convs with per-channel
  weight scales + dynamic per-tensor activation quant, bf16 1x1s) ran the
  whole YOLOv3-416 forward only 1.07x faster (54.6 -> 51.2 ms at batch
  96): the per-layer quantize/dequantize passes are full-tensor
  bandwidth ops plus a serializing global-max reduce, and they consume
  the MXU win; decoded objectness correlation also dropped to 0.974.
  This is the measured reason the framework does NOT ship a quantized
  path (PROFILE.md "rejected levers").

Chain iterations are data-dependent (x -> op(x)) so XLA cannot batch or
elide them; weights are scaled ~1/sqrt(fan_in) to keep bf16 activations
bounded over K steps.

Usage: python -m betapose_tpu.tools.probe_conv_mfu [--k 40] [--batch 64]
Prints one line per shape: ms/op, TF/s, MFU (/394 bf16 peak v5e).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    from betapose_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=40,
                    help="ops chained per jit call")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--int8", action="store_true",
                    help="run the chains with int8 operands / int32 "
                         "accumulation instead of bf16/f32")
    args = ap.parse_args()
    K, B = args.k, args.batch

    import jax
    import jax.numpy as jnp

    peak_tfs = 394.0  # v5e bf16; rates still comparable on other chips
    in_dtype = jnp.int8 if args.int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if args.int8 else jnp.float32
    unit = "TOP/s" if args.int8 else "TF/s"

    def timed(fn, x):
        for _ in range(2):
            out = fn(x)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / (args.iters * K) * 1e3

    def report(name, ms, flops):
        tfs = flops / ms / 1e9
        print(f"{name:34s} {ms:7.4f} ms/op  {tfs:7.1f} {unit}  "
              f"MFU {tfs/peak_tfs:.3f}")

    def _renorm(y):
        # keep chained activations bounded: int8 accumulators are shifted
        # back into range, bf16 already has the ~1/sqrt(fan) weight scale
        if args.int8:
            return (y // 64).astype(jnp.int8)
        return y.astype(jnp.bfloat16)

    def _inputs(rng, x_shape, w_shape, fan_in):
        if args.int8:
            return (jnp.asarray(rng.integers(-8, 8, x_shape), jnp.int8),
                    jnp.asarray(rng.integers(-8, 8, w_shape), jnp.int8))
        return (jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16),
                jnp.asarray(rng.standard_normal(w_shape)
                            / np.sqrt(fan_in), jnp.bfloat16))

    def chain_conv(h, c, size):
        rng = np.random.default_rng(0)
        x, w = _inputs(rng, (B, h, h, c), (size, size, c, c),
                       size * size * c)
        pad = (size - 1) // 2

        @jax.jit
        def run(x):
            def body(_, v):
                y = jax.lax.conv_general_dilated(
                    v, w, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_dtype)
                return _renorm(y)
            return jax.lax.fori_loop(0, K, body, x)

        report(f"conv{size}x{size} {h}x{h}x{c}", timed(run, x),
               2 * B * h * h * c * c * size * size)

    def chain_mm(m, c, label=None):
        rng = np.random.default_rng(0)
        x, w = _inputs(rng, (m, c), (c, c), c)

        @jax.jit
        def run(x):
            def body(_, v):
                return _renorm(jnp.dot(v, w,
                                       preferred_element_type=acc_dtype))
            return jax.lax.fori_loop(0, K, body, x)

        report(label or f"matmul [{m},{c}]@[{c},{c}]", timed(run, x),
               2 * m * c * c)

    chain_conv(13, 1024, 3)   # YOLO deep stage, odd grid
    chain_conv(16, 1024, 3)   # aligned control
    chain_conv(13, 1024, 1)   # 1x1 bottleneck shape
    chain_mm(B * 13 * 13, 1024,
             label=f"mm-as-1x1 [{B*13*13},1024]@[1024,1024]")
    chain_conv(26, 512, 3)    # YOLO mid stage
    chain_mm(8192, 1024)      # roofline reference


if __name__ == "__main__":
    main()
