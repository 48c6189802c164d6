"""MultiBandSignal: a list of per-band Signals (optionally multirate).

Behavioral reference: `dsptoolbox/classes/multibandsignal.py`. For
same-sampling-rate banks, `get_all_time_data` returns the stacked
``(T, bands, channels)`` device-backed array — the layout the batched band
kernels consume directly.
"""

from __future__ import annotations

from copy import deepcopy
from pickle import HIGHEST_PROTOCOL, dump
from warnings import warn

import numpy as np

from ..helpers.other import check_format_in_path
from .signal import Signal


class MultiBandSignal:
    def __init__(
        self,
        bands: list | None = None,
        same_sampling_rate: bool = True,
        info: dict | None = None,
    ):
        if info is None:
            info = {}
        self.same_sampling_rate = same_sampling_rate
        self.bands = bands if bands is not None else []
        self.info: dict = info

    # ======== Properties ====================================================
    @property
    def bands(self) -> list[Signal]:
        return self.__bands

    @bands.setter
    def bands(self, new_bands):
        if new_bands is None:
            new_bands = []
        if isinstance(new_bands, tuple):
            new_bands = list(new_bands)
        assert isinstance(new_bands, list), "bands has to be a list"
        if new_bands:
            self.__number_of_channels = new_bands[0].number_of_channels
            sr = []
            complex_data = new_bands[0].is_complex_signal
            for s in new_bands:
                assert isinstance(s, Signal), (
                    f"{type(s)} is not a valid band type. Use Signal objects"
                )
                assert s.number_of_channels == self.__number_of_channels, (
                    "Signals have different number of channels. This "
                    "behaviour is not supported"
                )
                assert s.is_complex_signal == complex_data, (
                    "Some bands have imaginary time data and others do "
                    "not. This behavior is not supported."
                )
                sr.append(s.sampling_rate_hz)
            if self.same_sampling_rate:
                self.sampling_rate_hz = new_bands[0].sampling_rate_hz
                expected = new_bands[0].length_samples
                for s in new_bands:
                    assert s.sampling_rate_hz == self.sampling_rate_hz, (
                        "Not all Signals have the same sampling rate. "
                        "If you wish to create a multirate system, set "
                        "same_sampling_rate to False"
                    )
                    assert s.length_samples == expected, (
                        "The length of the bands is not always the same. "
                        "This behaviour is not supported if there is a "
                        "constant sampling rate"
                    )
            else:
                self.sampling_rate_hz = sr
        self.__bands = new_bands

    @property
    def sampling_rate_hz(self):
        return self.__sampling_rate_hz

    @sampling_rate_hz.setter
    def sampling_rate_hz(self, new_sampling_rate_hz):
        if isinstance(new_sampling_rate_hz, (list, tuple, np.ndarray)):
            self.__sampling_rate_hz = [int(s) for s in new_sampling_rate_hz]
        else:
            self.__sampling_rate_hz = int(new_sampling_rate_hz)

    @property
    def same_sampling_rate(self) -> bool:
        return self.__same_sampling_rate

    @same_sampling_rate.setter
    def same_sampling_rate(self, new_same):
        assert isinstance(new_same, bool), (
            "Same sampling rate attribute must be a boolean"
        )
        self.__same_sampling_rate = new_same

    @property
    def number_of_bands(self) -> int:
        return len(self.bands)

    @property
    def number_of_channels(self) -> int:
        return self.bands[0].number_of_channels if self.bands else 0

    @property
    def length_samples(self):
        if self.same_sampling_rate:
            return self.bands[0].length_samples
        return [b.length_samples for b in self.bands]

    @property
    def length_seconds(self):
        if self.same_sampling_rate:
            return self.bands[0].length_seconds
        return [b.length_seconds for b in self.bands]

    @property
    def is_complex_signal(self) -> bool:
        return self.bands[0].is_complex_signal

    def __len__(self):
        return self.number_of_bands

    def __iter__(self):
        return iter(self.bands)

    def __str__(self):
        return self.metadata_str

    @property
    def metadata(self) -> dict:
        return {
            "number_of_bands": self.number_of_bands,
            "same_sampling_rate": self.same_sampling_rate,
            "sampling_rate_hz": self.sampling_rate_hz,
            "number_of_channels": self.number_of_channels,
        }

    @property
    def metadata_str(self) -> str:
        txt = "Multiband signal:"
        for k, v in (self.metadata | self.info).items():
            txt += f" | {str(k).replace('_', ' ').capitalize()}: {v}"
        txt += "\n" + "–" * len(txt)
        for ind, band in enumerate(self.bands):
            txt += f"\nSignal {ind}:"
            for kf, vf in band.metadata.items():
                txt += f" | {str(kf).replace('_', ' ').capitalize()}: {vf}"
        return txt

    # ======== Band management ===============================================
    def add_band(self, sig: Signal, index: int = -1) -> "MultiBandSignal":
        """Insert a band (validated through the bands setter)."""
        bands = self.bands
        if index == -1:
            bands = bands + [sig]
        else:
            bands = bands[:index] + [sig] + bands[index:]
        self.bands = bands
        return self

    def remove_band(self, index: int = -1, return_band: bool = False):
        """Remove (and optionally return) one band."""
        assert self.bands, "There are no bands to remove"
        bands = list(self.bands)
        band = bands.pop(index)
        self.bands = bands
        if return_band:
            return self, band
        return self

    def swap_bands(self, new_order) -> "MultiBandSignal":
        new_order = np.atleast_1d(np.asarray(new_order).squeeze())
        assert len(new_order) == self.number_of_bands, (
            "The number of bands does not match"
        )
        assert len(np.unique(new_order)) == len(new_order), (
            "There are repeated indexes in the new order vector"
        )
        assert np.all(
            (new_order >= 0) & (new_order < self.number_of_bands)
        ), "Indexes of the new order vector exceed the number of bands"
        self.bands = [self.bands[i] for i in new_order]
        return self

    def collapse(self) -> Signal:
        """Sum all bands into one Signal
        (`classes/multibandsignal.py:405-427`)."""
        assert self.same_sampling_rate, (
            "Collapsing is only available for same sampling rate bands"
        )
        from .signal import DeviceTimeData, _dev_jit

        add = _dev_jit("add", lambda a, b: a + b)
        total = self.bands[0]._time_data
        for b in self.bands[1:]:
            total = add(total, b._time_data)
        if not self.is_complex_signal:
            # device-resident sum: band data never crosses the host boundary
            return self.bands[0].copy_with_new_time_data(total)
        total_imag = self.bands[0]._time_data_imag
        for b in self.bands[1:]:
            total_imag = add(total_imag, b._time_data_imag)
        return self.bands[0].copy_with_new_time_data(
            DeviceTimeData(total, total_imag)
        )

    # ======== Getters =======================================================
    def _band_class(self):
        return type(self.bands[0])

    def get_all_bands(self, channel: int = 0):
        """One channel of every band as a multichannel Signal (same rate) or
        (list of arrays, list of rates) for multirate banks."""
        if self.same_sampling_rate:
            cols = []
            for b in self.bands:
                col = b.time_data[:, channel]
                if self.is_complex_signal:
                    col = col + 1j * b.time_data_imaginary[:, channel]
                cols.append(col)
            new_time_data = np.stack(cols, axis=1)
            return self._band_class()(
                None, new_time_data, self.sampling_rate_hz
            )
        td, sr = [], []
        for b in self.bands:
            col = b.time_data[:, channel]
            if self.is_complex_signal:
                col = col + 1j * b.time_data_imaginary[:, channel]
            td.append(col)
            sr.append(b.sampling_rate_hz)
        if self.is_complex_signal:
            warn("Output is complex since signal data had imaginary part")
        return td, sr

    def get_all_time_data(self):
        """All data stacked ``(T, bands, channels)`` (same rate) or per-band
        (array, rate) list (`classes/multibandsignal.py:522-574`)."""
        complex_data = self.is_complex_signal
        if self.same_sampling_rate:
            mats = []
            for b in self.bands:
                m = b.time_data
                if complex_data:
                    m = m + 1j * b.time_data_imaginary
                mats.append(m)
            return np.stack(mats, axis=1), self.sampling_rate_hz
        out = []
        for b in self.bands:
            m = b.time_data
            if complex_data:
                m = m + 1j * b.time_data_imaginary
            out.append((m, b.sampling_rate_hz))
        return out

    # ======== Saving / copying ==============================================
    def save_signal(self, path: str):
        path = check_format_in_path(path, "pkl")
        with open(path, "wb") as data_file:
            dump(self, data_file, HIGHEST_PROTOCOL)
        return self

    def copy(self) -> "MultiBandSignal":
        return deepcopy(self)

    def show_info(self):
        print(self.metadata_str)
        return self
