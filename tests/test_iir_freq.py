"""Frequency-sampling IIR path (`ops.iir_freq`) and the Pallas blocked-IIR
v2 kernel (`ops.pallas_iir`, interpret mode on the CPU mesh) against the
scipy float64 oracle."""

import numpy as np
import pytest
from scipy.signal import butter, cheby1, ellip, sosfilt, sosfilt_zi

import jax.numpy as jnp
from dsptoolbox_tpu.ops.iir import sosfilt_zero_state
from dsptoolbox_tpu.ops.iir_block import _block_operators, sosfilt_block
from dsptoolbox_tpu.ops.iir_freq import (
    decay_margin,
    plan_nfft,
    sosfilt_bank_freq,
    sosfilt_freq,
)
from dsptoolbox_tpu.ops.pallas_iir import sosfilt_pallas

RNG = np.random.default_rng(7)


def _rel_err(got, want):
    return np.max(np.abs(np.asarray(got) - want)) / np.max(np.abs(want))


class TestSosfiltFreq:
    x = RNG.standard_normal((2, 44100)).astype(np.float32)

    @pytest.mark.parametrize(
        "sos",
        [
            butter(4, 0.2, output="sos"),
            butter(8, [0.0105, 0.0115], btype="bandpass", output="sos"),
            cheby1(6, 0.5, 0.7, btype="highpass", output="sos"),
            ellip(4, 0.5, 60, [0.3, 0.31], btype="bandstop", output="sos"),
        ],
        ids=["butter-lp", "narrow-bp", "cheby-hp", "ellip-bs"],
    )
    def test_matches_scipy_f64(self, sos):
        y = sosfilt_freq(sos, jnp.asarray(self.x))
        y_ref = sosfilt(sos, self.x.astype(np.float64), axis=-1)
        assert _rel_err(y, y_ref) < 5e-6

    def test_complex_gammatone_section(self):
        fs, f0 = 44100, 500.0
        erb = 24.7 + f0 / 9.265
        a_g = np.pi * 720 * 2**-6 / 36
        lam = np.exp(-2 * np.pi * (erb / a_g) / fs)
        c = lam * np.exp(1j * 2 * np.pi * f0 / fs)
        sos = np.tile(np.array([[1, 0, 0, 1, -c, 0]]), (4, 1))
        sos[3, 0] = 2 * (1 - np.abs(c)) ** 4
        y = sosfilt_freq(sos, jnp.asarray(self.x))
        y_ref = sosfilt(sos, self.x.astype(np.complex128), axis=-1)
        assert np.iscomplexobj(np.asarray(y))
        assert _rel_err(y, y_ref) < 5e-6

    def test_bank(self):
        bank = np.stack(
            [butter(4, f, output="sos") for f in (0.1, 0.3, 0.5, 0.8)]
        )
        y = np.asarray(sosfilt_bank_freq(bank, jnp.asarray(self.x)))
        assert y.shape == (4,) + self.x.shape
        for i in range(4):
            y_ref = sosfilt(bank[i], self.x.astype(np.float64), axis=-1)
            assert _rel_err(y[i], y_ref) < 5e-6

    def test_margin_none_for_integrator(self):
        # pole exactly on the unit circle: frequency sampling must refuse
        sos = np.array([[1.0, 0, 0, 1.0, -1.0, 0]])
        assert decay_margin(sos) is None
        assert plan_nfft(sos, 10000) is None

    def test_zero_state_dispatch_consistency(self):
        """Long (freq) and short (blocked) dispatch agree with scipy."""
        sos = butter(4, 0.25, output="sos")
        for T in (1024, 50000):  # below / above the dispatch threshold
            x = self.x[:, :T]
            y = sosfilt_zero_state(sos, jnp.asarray(x))
            y_ref = sosfilt(sos, x.astype(np.float64), axis=-1)
            assert _rel_err(y, y_ref) < 5e-6


class TestPallasIIR:
    @pytest.mark.parametrize(
        "B,T,order,L",
        [(3, 1024, 4, 128), (1, 4096, 8, 128), (5, 2000, 2, 100)],
    )
    def test_interpret_matches_scipy_and_xla(self, B, T, order, L):
        sos = butter(order, 0.2, output="sos")
        x = RNG.standard_normal((B, T)).astype(np.float32)
        lead = (T // L) * L
        key = tuple(np.asarray(sos, np.float64).reshape(-1).tolist())
        H, G, A, M = (
            np.asarray(m, np.float32) for m in _block_operators(key, L)
        )
        y, zf = sosfilt_pallas(
            H, G, A, M, jnp.asarray(x[:, :lead]), interpret=True
        )
        y_ref = sosfilt(sos, x[:, :lead].astype(np.float64), axis=-1)
        assert _rel_err(y, y_ref) < 5e-6
        # bit-comparable to the XLA blocked path (same operators, same
        # matmul order within blocks)
        y_xla, _ = sosfilt_block(sos, jnp.asarray(x[:, :lead]))
        assert np.max(np.abs(np.asarray(y) - np.asarray(y_xla))) < 1e-5

    def test_dispatch_in_sosfilt_block(self):
        """Forced-on Pallas lead inside `sosfilt_block` (interpret mode)
        agrees with the XLA prefix path, remainder tail and zf included."""
        from dsptoolbox_tpu import _config

        sos = butter(6, 0.3, output="sos")
        x = RNG.standard_normal((2, 4096 + 77)).astype(np.float32)
        zi1 = np.tile(sosfilt_zi(sos)[None], (2, 1, 1)) * 0.3
        y_ref, zf_ref = sosfilt_block(
            sos, jnp.asarray(x), zi=jnp.asarray(zi1, jnp.float32)
        )
        _config.set_pallas_iir("on")
        try:
            y_p, zf_p = sosfilt_block(
                sos, jnp.asarray(x), zi=jnp.asarray(zi1, jnp.float32)
            )
        finally:
            _config.set_pallas_iir("auto")
        assert np.max(np.abs(np.asarray(y_p) - np.asarray(y_ref))) < 1e-5
        assert np.max(np.abs(np.asarray(zf_p) - np.asarray(zf_ref))) < 1e-6

    def test_initial_state_and_zf(self):
        sos = butter(4, 0.2, output="sos")
        B, T, L = 3, 1024, 128
        x = RNG.standard_normal((B, T)).astype(np.float32)
        zi1 = np.tile(sosfilt_zi(sos)[None], (B, 1, 1)) * RNG.standard_normal(
            (B, 1, 1)
        )
        key = tuple(np.asarray(sos, np.float64).reshape(-1).tolist())
        H, G, A, M = (
            np.asarray(m, np.float32) for m in _block_operators(key, L)
        )
        y, zf = sosfilt_pallas(
            H,
            G,
            A,
            M,
            jnp.asarray(x),
            s0=jnp.asarray(zi1.reshape(B, -1), np.float32),
            interpret=True,
        )
        y_ref, zf_ref = sosfilt(
            sos,
            x.astype(np.float64),
            axis=-1,
            zi=np.transpose(zi1, (1, 0, 2)),
        )
        assert _rel_err(y, y_ref) < 5e-6
        zf_got = np.asarray(zf).reshape(B, -1, 2)
        assert np.max(
            np.abs(zf_got - np.transpose(zf_ref, (1, 0, 2)))
        ) < 1e-6
