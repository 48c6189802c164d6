"""audio_io tests against a fake (loopback) sounddevice backend.

The reference leaves hardware IO untested ("Tests for audio io module
should be manual", reference `tests/test_audio_io.py:1-4`); here a fake
backend exercises the full API: playback, recording, duplex loopback,
device/default configuration.
"""

import sys
import types

import numpy as np
import pytest

import dsptoolbox_tpu as dsp


@pytest.fixture
def fake_sd(monkeypatch):
    """Install a loopback sounddevice fake for the duration of a test."""
    sd = types.ModuleType("sounddevice")
    state = {"played": None}

    sd.default = types.SimpleNamespace(
        device=None, samplerate=None, blocksize=None, latency=None
    )

    class DeviceList(list):
        pass

    sd.DeviceList = DeviceList
    sd.query_devices = lambda *a, **k: (
        {"name": "fake", "index": a[0]} if a else DeviceList(
            [{"name": "fake", "index": 0}]
        )
    )

    def playrec(data, samplerate, channels, blocking=True, **kw):
        state["played"] = np.array(data)
        out = np.zeros((len(data), channels))
        # loopback: copy first played channel into every record channel
        for c in range(channels):
            out[:, c] = np.asarray(data)[:, 0]
        return out

    def rec(frames, samplerate, channels, blocking=True, **kw):
        rng = np.random.default_rng(0)
        return rng.standard_normal((frames, channels)) * 1e-3

    def play(data, samplerate, blocking=True, **kw):
        state["played"] = np.array(data)

    sd.playrec, sd.rec, sd.play = playrec, rec, play
    sd.sleep = lambda ms: None

    class CallbackStop(Exception):
        pass

    sd.CallbackStop = CallbackStop

    class OutputStream:
        def __init__(self, *a, **k):
            pass

    sd.OutputStream = OutputStream

    monkeypatch.setitem(sys.modules, "sounddevice", sd)
    return sd, state


def _tone(fs=8000, n=4000):
    t = np.arange(n) / fs
    return dsp.Signal(
        None, (0.3 * np.sin(2 * np.pi * 440 * t))[:, None], fs
    )


class TestAudioIO:
    def test_defaults_and_device(self, fake_sd):
        sd, _ = fake_sd
        dsp.audio_io.set_latency(0.1)
        assert sd.default.latency == 0.1
        dsp.audio_io.set_blocksize(256)
        assert sd.default.blocksize == 256
        dsp.audio_io.set_device(0)
        assert sd.default.device == 0
        assert dsp.audio_io.default_config.blocksize == 256

    def test_print_device_info(self, fake_sd):
        info = dsp.audio_io.print_device_info(device_number=0)
        assert info is not None

    def test_play(self, fake_sd):
        _, state = fake_sd
        s = _tone()
        dsp.audio_io.play(s)
        np.testing.assert_allclose(state["played"], s.time_data)

    def test_play_and_record_loopback(self, fake_sd):
        s = _tone()
        rec = dsp.audio_io.play_and_record(s, record_channels=[1, 2])
        assert rec.number_of_channels == 2
        assert rec.sampling_rate_hz == s.sampling_rate_hz
        np.testing.assert_allclose(
            rec.time_data[:, 0], s.time_data[:, 0], atol=1e-12
        )

    def test_record(self, fake_sd):
        rec = dsp.audio_io.record(
            duration_seconds=0.5, sampling_rate_hz=8000
        )
        assert len(rec) == 4000
        assert rec.sampling_rate_hz == 8000
