"""VMEM-resident bottleneck-chain kernel — a falsifiable perf experiment.

PROFILE.md's ceiling claim ("~100 TF/s is this chip's practical rate for
serially-dependent 1024-wide matmuls; no recoverable scheduling loss")
rests on ISOLATED-op probes (1x1 conv 0.231 MFU, bare matmul 0.256).  The
untested hypothesis: XLA schedules each conv of a bottleneck as its own
HBM->VMEM->HBM round trip, so holding ONE residual block's activations
VMEM-resident across its whole 1x1 -> 3x3 -> 1x1 chain could recover the
bandwidth between the matmuls.

This kernel runs the SE-ResNet/darknet53-style bottleneck body

    h1 = relu(x @ w1)            # 1x1 squeeze   [S, Cin] @ [Cin, Cm]
    h2 = relu(conv3x3(h1, w2))   # 9 shifted matmuls, VMEM-accumulated
    y  = relu(x + h2 @ w3)       # 1x1 expand + residual

entirely in VMEM per batch tile: x is loaded once, every intermediate
lives on-chip, y is stored once.  The 3x3 is expressed as 9 shifted
[S, Cm] @ [Cm, Cm] matmuls with border masking — matmul-only, no im2col
materialization.  Weights use constant index maps, so they are resident
across the whole grid.

BN is deliberately folded away (inference-mode BN is a scale/shift the
eval pipeline already folds into conv weights); the probe isolates the
matmul-chain question.  bf16 inputs/weights, f32 accumulation — the
production eval dtype.

Compare against the identical XLA lax-conv chain with
`tools/probe_vmem_chain.py`; either outcome lands in PROFILE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, w1_ref, w2_ref, w3_ref, y_ref, *, h, w):
    """One batch-tile of the bottleneck chain, all operands in VMEM.

    x_ref:  [TB, H*W, Cin]   (spatial flattened; bf16)
    w1_ref: [Cin, Cm]
    w2_ref: [9, Cm, Cm]      (3x3 taps, row-major dy,dx)
    w3_ref: [Cm, Cin]
    y_ref:  [TB, H*W, Cin]
    """
    x = x_ref[:]                                    # [TB, S, Cin]
    tb, s, cin = x.shape
    cm = w1_ref.shape[1]
    xf = x.reshape(tb * s, cin)

    # -- 1x1 squeeze --
    h1 = jnp.dot(xf, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(x.dtype)       # [TB*S, Cm]

    # -- 3x3 as 9 shifted matmuls, accumulated in VMEM f32 --
    # spatial grid is [h, w]; tap (dy, dx) contributes
    # out[y, x] += h1[y+dy-1, x+dx-1] @ w2[dy*3+dx]  (zero outside)
    h1g = h1.reshape(tb, h, w, cm)

    def shift(a, d, axis):
        # static shift by -d along axis with zero fill (d in {-1,0,1});
        # Python-level branches keep every Mosaic slice positive-sized
        # (jnp.roll emits a zero-size slice for d == 0, which Mosaic
        # rejects: "vector types must have positive constant sizes").
        if d == 0:
            return a
        n = a.shape[axis]
        sl = [slice(None)] * a.ndim
        zl = [slice(None)] * a.ndim
        if d > 0:            # out[y] = in[y+d]: drop head, append zeros
            sl[axis] = slice(d, n)
            zl[axis] = slice(0, d)
        else:                # out[y] = in[y+d]: prepend zeros, drop tail
            sl[axis] = slice(0, n + d)
            zl[axis] = slice(0, -d)
        body, pad = a[tuple(sl)], jnp.zeros_like(a[tuple(zl)])
        return jnp.concatenate(
            [body, pad] if d > 0 else [pad, body], axis=axis)

    acc = jnp.zeros((tb * s, cm), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = shift(shift(h1g, dy, 1), dx, 2)
            tap = w2_ref[(dy + 1) * 3 + (dx + 1)]
            acc += jnp.dot(shifted.reshape(tb * s, cm), tap,
                           preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc, 0.0).astype(x.dtype)      # [TB*S, Cm]

    # -- 1x1 expand + residual --
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    y = y + xf.astype(jnp.float32)
    y_ref[:] = jnp.maximum(y, 0.0).astype(x.dtype).reshape(tb, s, cin)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "batch_tile", "interpret"))
def bottleneck_chain_pallas(x, w1, w2, w3, *, h, w, batch_tile=8,
                            interpret=False):
    """x: [B, H, W, Cin] -> [B, H, W, Cin], VMEM-resident chain.

    batch_tile frames per grid step; weights resident across the grid.
    interpret=True runs the Pallas interpreter (CPU correctness tests)."""
    b, hh, ww, cin = x.shape
    assert hh == h and ww == w and b % batch_tile == 0
    s = h * w
    cm = w1.shape[1]
    xf = x.reshape(b, s, cin)
    grid = (b // batch_tile,)
    y = pl.pallas_call(
        functools.partial(_chain_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, s, cin), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, s, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cm, cm), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cm, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, s, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, w1, w2, w3)
    return y.reshape(b, h, w, cin)


def bottleneck_chain_xla(x, w1, w2, w3):
    """The identical math through stock lax convs (what the production
    pipeline runs after BN folding) — the baseline the kernel races."""
    cin, cm = w1.shape
    h1 = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, cin, cm).astype(x.dtype), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(x.dtype)
    # w2 [9, Cm, Cm] -> HWIO [3, 3, Cm, Cm]
    w2h = w2.reshape(3, 3, cm, cm).astype(x.dtype)
    h2 = jax.lax.conv_general_dilated(
        h1, w2h, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h2, w3.reshape(1, 1, cm, cin).astype(x.dtype), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + x.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def chain_flops(b, h, w, cin, cm):
    """MAC-pair FLOPs of the chain (residual/relu excluded, as in the
    PROFILE.md per-op accounting)."""
    s = b * h * w
    return 2 * s * cin * cm + 9 * 2 * s * cm * cm + 2 * s * cm * cin
