"""Property-based parity tests for the core device kernels.

Hypothesis drives randomized filter designs, signal lengths and block
sizes; every draw must match the scipy reference within fp32 tolerance.
This guards the blocked-IIR state-space math (operator construction,
doubling prefix, remainder blocks, zi layout) far beyond the fixed cases
in `test_ops_filtering.py`.
"""

import numpy as np
import pytest
import scipy.signal as sig
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from dsptoolbox_tpu.ops.fft_conv import fft_convolve, resample_poly
from dsptoolbox_tpu.ops.framing import frame_signal
from dsptoolbox_tpu.ops.iir_block import sosfilt_block

# fp32 kernels vs f64 scipy: scale-relative tolerance
TOL = 5e-4


def _rel_err(got, want):
    scale = np.max(np.abs(want)) or 1.0
    return np.max(np.abs(np.asarray(got) - want)) / scale


@settings(max_examples=25, deadline=None)
@given(
    order=st.integers(1, 4),
    T=st.integers(3, 700),
    block=st.sampled_from([None, 8, 33, 128]),
    cutoff=st.floats(0.05, 0.9),
    seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_sosfilt_block_matches_scipy(order, T, block, cutoff, seed):
    rng = np.random.default_rng(seed)
    sos = sig.butter(order, cutoff, output="sos")
    x = rng.standard_normal((2, T)).astype(np.float32)
    y, zf = sosfilt_block(sos, jnp.asarray(x), block_size=block)
    want, zf_want = sig.sosfilt(
        sos, x.astype(np.float64), axis=-1,
        zi=np.zeros((sos.shape[0], x.shape[0], 2)),
    )
    assert _rel_err(y, want) < TOL
    # zf layout (..., S, 2) vs scipy's (S, C, 2)
    zf_want_t = np.moveaxis(zf_want, 1, 0)
    assert _rel_err(zf, zf_want_t) < TOL


@settings(max_examples=25, deadline=None)
@given(
    order=st.integers(1, 3),
    T=st.integers(8, 500),
    cutoff=st.floats(0.05, 0.9),
    seed=st.integers(0, 2**31 - 1),
)
def test_sosfilt_block_with_state(order, T, cutoff, seed):
    rng = np.random.default_rng(seed)
    sos = sig.butter(order, cutoff, output="sos")
    x = rng.standard_normal((1, T)).astype(np.float32)
    zi = rng.standard_normal((1, sos.shape[0], 2)).astype(np.float32) * 0.1
    y, zf = sosfilt_block(sos, jnp.asarray(x), zi=jnp.asarray(zi))
    zi_sp = np.moveaxis(zi.astype(np.float64), 0, 1)  # (S, C, 2)
    want, zf_want = sig.sosfilt(
        sos, x.astype(np.float64), axis=-1, zi=zi_sp
    )
    assert _rel_err(y, want) < TOL
    assert _rel_err(zf, np.moveaxis(zf_want, 1, 0)) < TOL


@settings(max_examples=25, deadline=None)
@given(
    T=st.integers(2, 400),
    K=st.integers(1, 100),
    mode=st.sampled_from(["full", "same", "valid"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_fft_convolve_matches_scipy(T, K, mode, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(T).astype(np.float32)
    h = rng.standard_normal(K).astype(np.float32)
    if mode == "valid" and K > T:
        x, h = h, x  # scipy valid-mode requires len(x) >= len(h)
    got = fft_convolve(jnp.asarray(x), jnp.asarray(h), mode)
    want = sig.convolve(
        np.asarray(x, np.float64), np.asarray(h, np.float64), mode
    )
    assert got.shape == want.shape
    assert _rel_err(got, want) < TOL


@settings(max_examples=15, deadline=None)
@given(
    T=st.integers(32, 600),
    up=st.integers(1, 5),
    down=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_resample_poly_matches_scipy(T, up, down, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(T).astype(np.float32)
    got = resample_poly(jnp.asarray(x), up, down)
    want = sig.resample_poly(np.asarray(x, np.float64), up, down)
    assert got.shape == want.shape
    assert _rel_err(got, want) < 2e-3


@settings(max_examples=25, deadline=None)
@given(
    T=st.integers(16, 800),
    L=st.integers(4, 64),
    data=st.data(),
)
def test_frame_signal_matches_reference_convention(T, L, data):
    step = data.draw(st.integers(1, L))
    x = np.arange(T, dtype=np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), L, step, True))
    # reference convention: ceil(T/step) frames; frame k starts at k*step
    n_frames = int(np.ceil(T / step))
    assert frames.shape == (n_frames, L)
    for k in (0, n_frames // 2, n_frames - 1):
        start = k * step
        want = np.zeros(L, np.float32)
        n_avail = max(0, min(L, T - start))
        want[:n_avail] = x[start : start + n_avail]
        np.testing.assert_array_equal(frames[k], want)


@given(
    n_bands=st.integers(2, 6),
    orders=st.integers(1, 4),
    T=st.integers(64, 1200),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=25, deadline=None)
@pytest.mark.slow
def test_banked_filterbank_matches_per_filter_loop(n_bands, orders, T, seed):
    """The one-program banked Parallel path must equal filtering each
    band's cascade independently (identity-section padding is exact)."""
    import jax.numpy as jnp

    from dsptoolbox_tpu.ops.iir import sosfilt
    from dsptoolbox_tpu.ops.iir_block import (
        sosfilt_bank_apply,
        sosfilt_bank_operators,
    )

    rng = np.random.default_rng(seed)
    bank = []
    max_s = 0
    for b in range(n_bands):
        order = 1 + (seed + b) % (2 * orders)
        cutoff = 0.05 + 0.8 * rng.random()
        sos = sig.butter(order, cutoff, output="sos")
        bank.append(sos)
        max_s = max(max_s, sos.shape[0])
    identity = np.array([1.0, 0, 0, 1.0, 0, 0])
    stacked = np.stack(
        [
            np.vstack([s] + [identity[None]] * (max_s - s.shape[0]))
            for s in bank
        ]
    )
    x = rng.standard_normal((2, T)).astype(np.float32) * 0.5

    ops = sosfilt_bank_operators(stacked, T)
    got = np.asarray(sosfilt_bank_apply(ops, jnp.asarray(x)))
    for b, sos in enumerate(bank):
        want, _ = sosfilt(sos, jnp.asarray(x))
        np.testing.assert_allclose(
            got[b], np.asarray(want), rtol=2e-3, atol=2e-5
        )


# ======== Long-signal fp32 stress (SURVEY §7 "hard parts") ==================
# The blocked state-space IIR precomputes its block operators in f64 on the
# host and applies them as fp32 matmuls; the boundary recurrence is log-depth,
# so rounding does NOT accumulate linearly in T. Measured on 1-hour signals
# (28.8M samples @ 8 kHz): max relative error 2.4e-6 for a 100 Hz lowpass
# (poles at |z| ~ 0.98), 5e-7 for moderate filters, and the error in the LAST
# 1% of the hour is no larger than in the first 1% — zero drift. FFT
# overlap-based convolution measured 3.3e-7. Bounds below carry ~4x headroom.


@pytest.mark.slow
def test_hour_long_iir_fp32_no_drift():
    fs = 8000
    T = fs * 3600  # one hour
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T)).astype(np.float32)
    # the nastiest practical case: low cutoff relative to fs -> poles near
    # the unit circle, long impulse response
    sos = sig.butter(4, 100, btype="lowpass", fs=fs, output="sos")
    y = np.asarray(sosfilt_block(sos, jnp.asarray(x))[0])
    want = sig.sosfilt(sos, x.astype(np.float64), axis=-1)
    scale = np.max(np.abs(want))
    err = np.abs(y - want) / scale
    assert err.max() < 1e-5, f"hour-long IIR error {err.max():.2e}"
    # no accumulation: the last 1% of the signal is no worse than 2x the
    # first 1% (measured: equal)
    n = T // 100
    assert err[:, -n:].max() < 2 * max(err[:, :n].max(), 1e-7), (
        f"drift: first 1% {err[:, :n].max():.2e}, "
        f"last 1% {err[:, -n:].max():.2e}"
    )


@pytest.mark.slow
def test_hour_long_fir_convolution_fp32():
    fs = 8000
    T = fs * 3600
    rng = np.random.default_rng(1)
    x = rng.standard_normal(T).astype(np.float32)
    h = sig.firwin(4097, 0.21).astype(np.float32)
    y = np.asarray(
        fft_convolve(jnp.asarray(x[None]), jnp.asarray(h), "full")
    )[0]
    want = sig.oaconvolve(x.astype(np.float64), h.astype(np.float64))
    scale = np.max(np.abs(want))
    err = np.abs(y - want) / scale
    assert err.max() < 2e-6, f"hour-long FIR error {err.max():.2e}"
