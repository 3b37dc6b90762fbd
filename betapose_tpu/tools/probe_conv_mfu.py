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
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=40,
                    help="ops chained per jit call")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    K, B = args.k, args.batch

    import jax
    import jax.numpy as jnp

    peak_tfs = 394.0  # v5e bf16; rates still comparable on other chips

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
        print(f"{name:34s} {ms:7.4f} ms/op  {tfs:7.1f} TF/s  "
              f"MFU {tfs/peak_tfs:.3f}")

    def chain_conv(h, c, size):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((size, size, c, c))
                        * (1.0 / np.sqrt(size * size * c)), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        pad = (size - 1) // 2

        @jax.jit
        def run(x):
            def body(_, v):
                y = jax.lax.conv_general_dilated(
                    v, w, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return y.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, K, body, x)

        report(f"conv{size}x{size} {h}x{h}x{c}", timed(run, x),
               2 * B * h * h * c * c * size * size)

    def chain_mm(m, c, label=None):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((c, c)) / np.sqrt(c),
                        jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(_, v):
                return (v @ w).astype(jnp.bfloat16)
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
