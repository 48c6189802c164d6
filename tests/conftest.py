"""Test configuration.

- Forces JAX onto CPU with 8 virtual devices (multi-chip sharding tests run on
  a virtual mesh; the real TPU is only used by bench.py).
- Installs lightweight stand-ins for `soundfile` / `sounddevice` so the
  *reference* package at /root/reference can be imported and used as a
  numerical oracle.
"""

import os
import sys
import types

# Must happen before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers the axon TPU backend before this
# file runs and pins JAX_PLATFORMS=axon; re-point jax at CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

EXAMPLE_DATA = "/root/reference/example_data"


def _install_audio_stubs():
    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")
        import scipy.io.wavfile as wavfile

        def read(path, **kw):
            import dsptoolbox_tpu.io as dtio

            data, fs = dtio.read_audio(path)
            return data, fs

        sf.read = read
        sf.write = lambda *a, **k: None
        sys.modules["soundfile"] = sf
    if "sounddevice" not in sys.modules:
        sd = types.ModuleType("sounddevice")
        sd.default = types.SimpleNamespace(
            device=None, samplerate=None, blocksize=None, latency=None
        )

        class DeviceList(list):
            pass

        sd.DeviceList = DeviceList
        # one fake duplex device so the reference's own
        # tests/test_audio_io.py (print_device_info + set_device(0)) run
        # against the stub
        _fake_dev = {
            "name": "stub-duplex",
            "index": 0,
            "hostapi": 0,
            "max_input_channels": 2,
            "max_output_channels": 2,
            "default_low_input_latency": 0.01,
            "default_low_output_latency": 0.01,
            "default_high_input_latency": 0.1,
            "default_high_output_latency": 0.1,
            "default_samplerate": 48000.0,
        }

        def _query_devices(device=None, kind=None, **k):
            if device is None and kind is None:
                return DeviceList([dict(_fake_dev)])
            return dict(_fake_dev)

        sd.query_devices = _query_devices
        sd.playrec = sd.play = sd.rec = lambda *a, **k: None
        sd.sleep = lambda ms: None

        class CallbackStop(Exception):
            pass

        sd.CallbackStop = CallbackStop

        class OutputStream:
            pass

        sd.OutputStream = OutputStream
        sys.modules["sounddevice"] = sd


# Install at import time: test_api_parity's audit would otherwise install a
# non-reading soundfile stub first (alphabetically first test file) and break
# every later file-loading oracle test in the same process.
_install_audio_stubs()


@pytest.fixture(scope="session")
def ref():
    """The reference dsptoolbox package, importable as a numerical oracle."""
    _install_audio_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import dsptoolbox

    return dsptoolbox


def assert_close(actual, desired, tol=2e-5, name=""):
    """Scale-relative closeness: max|a-d| <= tol * max|d| (plus tiny floor).

    Used instead of elementwise rtol because fp32 spectra legitimately carry
    ~1e-7-relative-to-peak noise on near-zero bins.
    """
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    assert actual.shape == desired.shape, (
        f"{name}: shape mismatch {actual.shape} vs {desired.shape}"
    )
    scale = np.max(np.abs(desired))
    if scale == 0:
        scale = 1.0
    err = np.max(np.abs(actual - desired)) / scale
    assert err <= tol, f"{name}: scale-relative error {err:.3e} > {tol:.1e}"


@pytest.fixture
def close():
    return assert_close
