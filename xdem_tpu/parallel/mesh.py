"""Device mesh construction for spatial domain decomposition."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _near_square_factors(n: int) -> tuple[int, int]:
    """Factor n into (a, b) with a*b = n and a <= b as square as possible."""
    a = int(math.isqrt(n))
    while a > 1 and n % a != 0:
        a -= 1
    return a, n // a


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("ry", "rx"),
    shape: tuple[int, int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """A 2-D device mesh (rows x cols) for sharding rasters spatially.

    :param n_devices: Number of devices to use (default: all available).
    :param axis_names: Mesh axis names, (row-axis, col-axis).
    :param shape: Explicit (rows, cols) mesh shape; default near-square factorization.
    :param devices: Explicit device list.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if shape is None:
        shape = _near_square_factors(n_devices)
    if shape[0] * shape[1] != n_devices:
        raise ValueError(f"Mesh shape {shape} does not match device count {n_devices}.")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def as_mesh_1d(mesh: Mesh, axis_name: str = "runs") -> Mesh:
    """View a mesh's devices as a 1-D mesh (for run-sharded workloads like the variogram).

    A 1-D input mesh is returned unchanged; an N-D mesh is flattened over all its devices.
    """
    if len(mesh.axis_names) == 1:
        return mesh
    return Mesh(mesh.devices.reshape(-1), (axis_name,))


def as_mesh_2d(mesh: Mesh) -> Mesh:
    """View a mesh's devices as a 2-D (rows x cols) mesh (for halo-sharded stencils).

    A 2-D input mesh is returned unchanged; a 1-D mesh of n devices becomes near-square
    (rows x cols) so stencil halos stay small in both dimensions.
    """
    if len(mesh.axis_names) == 2:
        return mesh
    n = mesh.devices.size
    shape = _near_square_factors(n)
    return Mesh(mesh.devices.reshape(shape), ("ry", "rx"))
