"""IO tests: WAV round-trips and the native FLAC decoder."""

import numpy as np
import pytest

import dsptoolbox_tpu as dsp
from dsptoolbox_tpu.io import read_audio, write_audio
from dsptoolbox_tpu.io.flac import read_flac

EXAMPLE = "/root/reference/example_data"


class TestWav:
    @pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "FLOAT"])
    def test_roundtrip(self, tmp_path, subtype):
        rng = np.random.default_rng(0)
        data = np.clip(rng.standard_normal((1000, 2)) * 0.3, -1, 0.999)
        path = str(tmp_path / "x.wav")
        write_audio(path, data, 48000, subtype)
        back, fs = read_audio(path)
        assert fs == 48000
        tol = {"PCM_16": 2**-15, "PCM_24": 2**-23, "FLOAT": 1e-7}[subtype]
        np.testing.assert_allclose(back, data, atol=tol)

    def test_example_data_wavs(self):
        for name in ["chirp.wav", "rir.wav", "fuer_elise.wav"]:
            data, fs = read_audio(f"{EXAMPLE}/{name}")
            assert fs > 0 and len(data) > 0


class TestFlac:
    def test_decode_speech(self):
        data, fs = read_flac(f"{EXAMPLE}/speech.flac")
        # STREAMINFO of the file: mono, 48 kHz, 16 bit, 189056 samples
        assert fs == 48000
        assert data.shape == (189056,)
        assert np.max(np.abs(data)) <= 1.0
        # 16-bit PCM: scaled samples must be exact integers
        scaled = data * 32768.0
        np.testing.assert_array_equal(scaled, np.round(scaled))

    def test_no_frame_boundary_discontinuities(self):
        # a mis-decoded predictor/residual would break sample continuity
        # at the 4096-sample frame boundaries
        data, _ = read_flac(f"{EXAMPLE}/speech.flac")
        d = np.abs(np.diff(data))
        bidx = np.arange(4095, len(d), 4096)
        mask = np.zeros(len(d), bool)
        mask[bidx] = True
        assert d[mask].mean() < 5 * d[~mask].mean()

    def test_signal_loads_flac(self):
        s = dsp.Signal(f"{EXAMPLE}/speech.flac")
        assert s.sampling_rate_hz == 48000
        assert s.number_of_channels == 1
        assert len(s) == 189056


class TestFlacWrite:
    @pytest.mark.parametrize("bits", [16, 24])
    def test_roundtrip(self, tmp_path, bits):
        rng = np.random.default_rng(1)
        data = np.clip(rng.standard_normal((10000, 2)) * 0.3, -1, 0.999)
        path = str(tmp_path / "x.flac")
        from dsptoolbox_tpu.io.flac import write_flac

        write_flac(path, data, 44100, bits)
        back, fs = read_audio(path)
        assert fs == 44100
        np.testing.assert_allclose(back, data, atol=2 ** -(bits - 1))

    def test_signal_save_flac(self, tmp_path):
        s = dsp.Signal(f"{EXAMPLE}/chirp_mono.wav")
        path = str(tmp_path / "s.flac")
        s.save_signal(path, mode="flac", bit_depth=24)
        s2 = dsp.Signal(path)
        assert s2.sampling_rate_hz == s.sampling_rate_hz
        np.testing.assert_allclose(
            s2.time_data, s.time_data, atol=2**-22
        )
