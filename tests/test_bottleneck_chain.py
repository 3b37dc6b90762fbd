"""Pallas VMEM-resident bottleneck chain vs the stock-XLA conv chain
(`ops/pallas/bottleneck_chain.py`) — interpreter-mode correctness on CPU;
the perf race runs on the real chip via `tools/probe_vmem_chain`."""

import numpy as np
import pytest

import jax.numpy as jnp

from betapose_tpu.ops.pallas.bottleneck_chain import (
    bottleneck_chain_pallas, bottleneck_chain_xla, chain_flops)


def _rand_chain(rng, b, h, w, cin, cm, dtype):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dtype) * 0.1
    w1 = jnp.asarray(rng.standard_normal((cin, cm)), dtype) * 0.05
    w2 = jnp.asarray(rng.standard_normal((9, cm, cm)), dtype) * 0.05
    w3 = jnp.asarray(rng.standard_normal((cm, cin)), dtype) * 0.05
    return x, w1, w2, w3


class TestBottleneckChainParity:
    @pytest.mark.parametrize("b,h,w,cin,cm", [
        (2, 5, 4, 16, 8),     # odd spatial dims: border masking exercised
        (4, 3, 3, 8, 16),     # cm > cin
    ])
    def test_interpret_matches_xla_f32(self, b, h, w, cin, cm):
        rng = np.random.default_rng(0)
        x, w1, w2, w3 = _rand_chain(rng, b, h, w, cin, cm, jnp.float32)
        got = bottleneck_chain_pallas(x, w1, w2, w3, h=h, w=w,
                                      batch_tile=b, interpret=True)
        want = bottleneck_chain_xla(x, w1, w2, w3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_batch_tiling_equivalence(self):
        """Grid over batch tiles must match the single-tile result."""
        rng = np.random.default_rng(1)
        b, h, w, cin, cm = 4, 4, 4, 8, 8
        x, w1, w2, w3 = _rand_chain(rng, b, h, w, cin, cm, jnp.float32)
        tiled = bottleneck_chain_pallas(x, w1, w2, w3, h=h, w=w,
                                        batch_tile=2, interpret=True)
        whole = bottleneck_chain_pallas(x, w1, w2, w3, h=h, w=w,
                                        batch_tile=4, interpret=True)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole),
                                   atol=1e-6)

    def test_bf16_matches_xla_chain(self):
        """The production dtype: bf16 operands, f32 accumulation — both
        paths quantize identically at the stage boundaries."""
        rng = np.random.default_rng(2)
        x, w1, w2, w3 = _rand_chain(rng, 2, 4, 4, 16, 8, jnp.bfloat16)
        got = bottleneck_chain_pallas(x, w1, w2, w3, h=4, w=4,
                                      batch_tile=2, interpret=True)
        want = bottleneck_chain_xla(x, w1, w2, w3)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_chain_flops_formula(self):
        # 1x1: 2*S*cin*cm, 3x3: 18*S*cm^2, expand: 2*S*cm*cin
        assert chain_flops(1, 2, 2, 4, 8) == (
            2 * 4 * 4 * 8 + 18 * 4 * 8 * 8 + 2 * 4 * 8 * 4)


class TestProbeTool:
    def test_probe_shape_xla_only_row(self):
        """`--shallow` rows skip the Pallas kernel (large-spatial Mosaic
        compile is pathological) and report only the XLA chain rate."""
        from betapose_tpu.tools.probe_vmem_chain import probe_shape
        row = probe_shape(2, 3, 3, 8, 4, k=2, batch_tile=2, pallas=False)
        assert set(row) == {"shape", "flops_g", "xla_ms", "xla_mfu"}
        assert row["shape"] == "2x3x3x8->cm4"
        # tiny CPU shape: mfu rounds to 0.0 at 4 decimals — only sanity
        assert row["xla_ms"] > 0 and row["xla_mfu"] >= 0
