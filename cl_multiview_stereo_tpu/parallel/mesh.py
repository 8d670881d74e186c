"""Mesh construction and canonical shardings."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_view: int | None = None, n_disp: int = 1, devices=None
) -> Mesh:
    """Build a ``(view, disp)`` mesh.  ``n_view`` defaults to all devices /
    ``n_disp``."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    total = devs.size
    if n_view is None:
        n_view = total // n_disp
    if n_view * n_disp != total:
        raise ValueError(f"{n_view}x{n_disp} mesh != {total} devices")
    return Mesh(devs.reshape(n_view, n_disp), axis_names=("view", "disp"))


def view_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (view) axis, replicate the rest."""
    return NamedSharding(mesh, P("view", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
