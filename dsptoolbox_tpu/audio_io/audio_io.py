"""Audio hardware IO wrappers (host-side; sounddevice-backed).

Behavioral reference: `dsptoolbox/audio_io/audio_io.py`. The sounddevice
dependency is optional: in environments without it (like this TPU image),
every function raises a clear RuntimeError at call time while the module
remains importable. All device math happens elsewhere — this layer only
moves host numpy buffers to/from PortAudio.
"""

from __future__ import annotations

import numpy as np

from ..classes import Signal


def _sd():
    try:
        import sounddevice as sd

        return sd
    except ImportError as e:
        raise RuntimeError(
            "sounddevice is not available in this environment; audio "
            "hardware IO is disabled. Install sounddevice to use "
            "dsptoolbox_tpu.audio_io."
        ) from e


class _DefaultConfig:
    """Lazy proxy for ``sounddevice.default`` — the reference exposes it
    as the module attribute ``default_config`` (`audio_io/audio_io.py:22`).
    Attribute access resolves against sounddevice at call time so the
    module stays importable without audio hardware."""

    def __getattr__(self, name):
        return getattr(_sd().default, name)

    def __setattr__(self, name, value):
        setattr(_sd().default, name, value)

    def __repr__(self):  # pragma: no cover
        try:
            return repr(_sd().default)
        except RuntimeError:
            return "<default_config: sounddevice unavailable>"


default_config = _DefaultConfig()


class CallbackStop(Exception):
    """Exception to raise inside a stream callback to stop the stream
    (mirrors sounddevice.CallbackStop)."""


def print_device_info(device_number: int | None = None):
    """Print and return device info (`audio_io.py:25-52`)."""
    sd = _sd()
    if device_number is None:
        info = sd.query_devices()
    else:
        info = sd.query_devices(device_number)
    print(info)
    return info


def set_latency(latency):
    """Set default latency on sounddevice (`audio_io.py:53-80`)."""
    _sd().default.latency = latency


def set_blocksize(blocksize_samples: int):
    """Set default block size (`audio_io.py:81-110`)."""
    _sd().default.blocksize = blocksize_samples


def set_device(device_number=None):
    """Set default input/output device (`audio_io.py:111-176`)."""
    sd = _sd()
    if device_number is None:
        print(sd.query_devices())
        device_number = int(input("Select device number: "))
    sd.default.device = device_number


def play_and_record(
    signal: Signal,
    duration_seconds: float | None = None,
    play_channels=None,
    record_channels=[1],
    **kwargs,
) -> Signal:
    """Blocking duplex play+record (`audio_io.py:203-292`)."""
    sd = _sd()
    record_channels = sorted(np.atleast_1d(record_channels).tolist())
    td = signal.time_data
    rec = sd.playrec(
        td,
        samplerate=signal.sampling_rate_hz,
        channels=len(record_channels),
        blocking=True,
        **kwargs,
    )
    return Signal(
        None, np.asarray(rec), signal.sampling_rate_hz,
        constrain_amplitude=False,
    )


def record(
    duration_seconds: float = 5,
    sampling_rate_hz: int = 48000,
    record_channels=[1],
    **kwargs,
) -> Signal:
    """Blocking recording (`audio_io.py:295-345`)."""
    sd = _sd()
    record_channels = sorted(np.atleast_1d(record_channels).tolist())
    length = int(duration_seconds * sampling_rate_hz)
    rec = sd.rec(
        frames=length,
        samplerate=sampling_rate_hz,
        channels=len(record_channels),
        blocking=True,
        **kwargs,
    )
    return Signal(
        None, np.asarray(rec), sampling_rate_hz, constrain_amplitude=False
    )


def play(signal: Signal, blocking: bool = True, **kwargs):
    """Play back a signal (`audio_io.py:346-410`)."""
    sd = _sd()
    sd.play(
        signal.time_data,
        samplerate=signal.sampling_rate_hz,
        blocking=blocking,
        **kwargs,
    )


def sleep(ms: int):
    """Sleep helper mirroring sounddevice.sleep (`audio_io.py:412-430`)."""
    _sd().sleep(ms)


def output_stream(
    signal: Signal,
    blocksize: int = 512,
    **kwargs,
):
    """Create an OutputStream that plays the signal block-wise
    (`audio_io.py:433-495`)."""
    sd = _sd()
    data = signal.time_data
    position = {"idx": 0}

    def callback(outdata, frames, time, status):  # pragma: no cover
        start = position["idx"]
        stop = start + frames
        chunk = data[start:stop]
        if len(chunk) < frames:
            outdata[: len(chunk)] = chunk
            outdata[len(chunk) :] = 0
            raise sd.CallbackStop()
        outdata[:] = chunk
        position["idx"] = stop

    return sd.OutputStream(
        samplerate=signal.sampling_rate_hz,
        blocksize=blocksize,
        channels=signal.number_of_channels,
        callback=callback,
        **kwargs,
    )
