"""Shared channel-manipulation mixin for Signal and Spectrum.

Behavioral reference: `dsptoolbox/classes/_multichannel_data.py`. Data lives
in jax arrays; channel selection/permutation are gathers.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax.numpy as jnp
import numpy as np


class MultichannelData(ABC):
    """Channel ops over data shaped ``(samples_or_bins, channels)``."""

    @abstractmethod
    def _get_data(self) -> jnp.ndarray: ...

    @abstractmethod
    def _set_data(self, data) -> None: ...

    @abstractmethod
    def _create_copy_with_new_data(self, data): ...

    @abstractmethod
    def _update_state(self) -> None: ...

    def _data_shape(self) -> tuple:
        """Shape of the underlying data. Subclasses backed by a device
        array override this to avoid materializing the data host-side
        just to read its shape."""
        return self._get_data().shape

    @property
    def number_of_channels(self) -> int:
        return self._data_shape()[-1]

    def __len__(self):
        return self._data_shape()[0]

    def remove_channel(self, channel_number: int = -1):
        """Remove one channel in place."""
        data = self._get_data()
        n = data.shape[1]
        if channel_number < 0:
            # numpy-delete negative-index semantics (the reference uses
            # np.delete, `_multichannel_data.py:32-56`)
            channel_number = n + channel_number
        assert n > 1, "Cannot not erase only channel"
        assert 0 <= channel_number <= n - 1, (
            f"Channel number {channel_number} does not exist. Signal only "
            f"has {n - 1} channels (zero included)."
        )
        keep = [c for c in range(n) if c != channel_number]
        self._set_data(data[:, jnp.asarray(keep)])
        self._update_state()
        return self

    def swap_channels(self, new_order):
        """Reorder channels in place."""
        new_order = np.atleast_1d(np.asarray(new_order).squeeze())
        assert new_order.ndim == 1, (
            "Too many or too few dimensions are given in the new "
            "arrangement vector"
        )
        n = self.number_of_channels
        assert n == len(new_order), "The number of channels does not match"
        assert all(new_order < n) and all(new_order >= 0), (
            f"Indexes of new channels have to be in [0, {n - 1}]"
        )
        assert len(np.unique(new_order)) == len(new_order), (
            "There are repeated indexes in the new order vector"
        )
        self._set_data(self._get_data()[:, jnp.asarray(new_order)])
        self._update_state()
        return self

    def get_channels(self, channels):
        """Copy with only the selected channels."""
        channels = np.atleast_1d(np.asarray(channels).squeeze())
        n = self._data_shape()[1]
        bad = channels[(channels < -n) | (channels >= n)]
        if bad.size:
            # jax gather clamps out-of-range indices silently; the reference
            # indexes numpy and raises (tests/test_classes.py:155)
            raise IndexError(
                f"index {int(bad[0])} is out of bounds for axis 1 with "
                f"size {n}"
            )
        return self._create_copy_with_new_data(
            self._get_data()[:, jnp.asarray(channels)]
        )

    def sum_channels(self):
        """Copy with all channels summed into one."""
        return self._create_copy_with_new_data(
            jnp.sum(self._get_data(), axis=1, keepdims=True)
        )
