"""Mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("dp",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a `Mesh` over the first ``n_devices`` available devices.

    ``shape`` gives the per-axis device counts for multi-axis meshes
    (e.g. ``axis_names=("dp", "ch"), shape=(2, 4)``); by default all
    devices land on the single first axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"Requested {n_devices} devices, only {len(devices)} available"
    )
    devs = np.array(devices[:n_devices])
    if shape is None:
        assert len(axis_names) == 1, (
            "shape must be given for multi-axis meshes"
        )
        shape = (n_devices,)
    assert int(np.prod(shape)) == n_devices, (
        f"Mesh shape {shape} does not use exactly {n_devices} devices"
    )
    return Mesh(devs.reshape(shape), axis_names=axis_names)


def shard_batch(mesh: Mesh, ndim: int = 2, axis: int = 0) -> NamedSharding:
    """`NamedSharding` splitting dimension ``axis`` of an ``ndim``-rank
    array across the mesh's first axis (the data-parallel layout)."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def shard_channels(
    mesh: Mesh, ndim: int = 2, channel_axis: int = 0
) -> NamedSharding:
    """Split the channel axis across the mesh — the layout for O(C²)
    cross-spectral work. Uses the mesh axis named "ch" when present,
    otherwise the first axis."""
    name = "ch" if "ch" in mesh.axis_names else mesh.axis_names[0]
    spec = [None] * ndim
    spec[channel_axis] = name
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (every device holds a copy)."""
    return NamedSharding(mesh, P())
