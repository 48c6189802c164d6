"""Pallas bank-IIR kernel (`ops/pallas_iir_bank.py`): correctness vs the
XLA blocked path, real and complex cascades, chunk padding edges.

The kernel is measured SLOWER than the XLA doubling-prefix path on the
real TPU (negative result recorded in BASELINE.md round-4 notes): the
time-serial VMEM-state formulation issues ~100k latency-bound small
matmuls where XLA's log-depth prefix runs few large data-parallel
passes. It is kept as a verified alternative formulation; these tests
run it in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsptoolbox_tpu.ops.iir_block import (
    sosfilt_bank_apply,
    sosfilt_bank_operators,
)
from dsptoolbox_tpu.ops.pallas_iir_bank import (
    bank_dense_operators,
    sosfilt_bank_pallas,
)


def _compare(bank, x, _atol=2e-4, **kw):
    ops = sosfilt_bank_operators(bank, x.shape[-1])
    want = np.asarray(
        jax.jit(lambda v: sosfilt_bank_apply(ops, v))(jnp.asarray(x))
    )
    dense = bank_dense_operators(bank, x.shape[-1], **kw)
    got = np.asarray(
        sosfilt_bank_pallas(dense, jnp.asarray(x), interpret=True)
    )
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=_atol * scale)


class TestPallasBank:
    def test_complex_bank_with_chunk_padding(self):
        rng = np.random.default_rng(71)
        poles = 0.95 * np.exp(1j * np.linspace(0.1, 1.0, 6))
        bank = np.zeros((6, 4, 6), np.complex128)
        bank[:, :, 0] = 0.3
        bank[:, :, 3] = 1.0
        bank[:, :, 4] = -poles[:, None]
        x = (rng.standard_normal((2, 5000)) * 0.3).astype(np.float32)
        _compare(bank, x)  # 6 bands, chunk 4 -> identity padding

    def test_real_bank(self):
        from scipy.signal import butter

        rng = np.random.default_rng(72)
        bank = np.stack(
            [
                butter(4, [f, f * 1.4], btype="bandpass", fs=48000,
                       output="sos")
                for f in (200.0, 500.0, 1200.0, 3000.0)
            ]
        )
        x = (rng.standard_normal(3000) * 0.5).astype(np.float32)
        # near-unit-pole low bands: the sequential state chain and the
        # doubling prefix associate fp32 sums differently; divergence
        # stays bounded by the filters' own fp32 error growth
        _compare(bank, x, _atol=8e-4)

    def test_non_multiple_length_and_single_band(self):
        from scipy.signal import butter

        rng = np.random.default_rng(73)
        bank = butter(4, 0.2, output="sos")[None]
        x = (rng.standard_normal((1, 1000)) * 0.5).astype(np.float32)
        _compare(bank, x)  # T=1000 not a multiple of L; B=1 < chunk
