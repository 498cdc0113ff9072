"""Voxel indexing helpers for the perception window.

The reference keys its marking structure by truncated voxel coords
``int(c/res)`` (`cluster_marking.cpp:99-104`, `multilayer_spinning_lidar.cpp:426-428`
— truncation toward zero, NOT floor). We reproduce that exact rounding for
behavioral parity, and lay marked state out as a dense, world-anchored,
robot-following window ``(Nx, Ny, Nz)`` instead of nested ``std::map``s.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class VoxelSpec(NamedTuple):
    """Static geometry of the perception window (jit-static)."""
    nx: int
    ny: int
    nz: int
    xy_resolution: float
    height_resolution: float


def world_to_cell(spec: VoxelSpec, pts):
    """Global voxel coords with reference truncation semantics (int(c/res))."""
    cx = jnp.trunc(pts[..., 0] / spec.xy_resolution).astype(jnp.int32)
    cy = jnp.trunc(pts[..., 1] / spec.xy_resolution).astype(jnp.int32)
    cz = jnp.trunc(pts[..., 2] / spec.height_resolution).astype(jnp.int32)
    return jnp.stack([cx, cy, cz], axis=-1)


def cell_to_world(spec: VoxelSpec, cells):
    """Voxel corner position (reference uses ``idx*res`` as the voxel's
    representative point, e.g. `multilayer_spinning_lidar.cpp:533-535`)."""
    res = jnp.asarray(
        [spec.xy_resolution, spec.xy_resolution, spec.height_resolution],
        dtype=jnp.float32)
    return cells.astype(jnp.float32) * res


def window_origin_for(spec: VoxelSpec, robot_xyz):
    """Window origin cell such that the robot sits at the window center."""
    c = world_to_cell(spec, robot_xyz)
    half = jnp.asarray([spec.nx // 2, spec.ny // 2, spec.nz // 2], jnp.int32)
    return c - half


def in_window(spec: VoxelSpec, local_cells):
    return (
        (local_cells[..., 0] >= 0) & (local_cells[..., 0] < spec.nx)
        & (local_cells[..., 1] >= 0) & (local_cells[..., 1] < spec.ny)
        & (local_cells[..., 2] >= 0) & (local_cells[..., 2] < spec.nz)
    )


def scroll_grid(grid, origin, new_origin):
    """Shift a window-anchored grid so it is anchored at ``new_origin``,
    zero-filling cells that scroll into view. Marks that scroll out of the
    window are dropped — mirroring the reference's behavior of only
    clearing/consuming marks inside ``perception_window_size``
    (`multilayer_spinning_lidar.cpp:489-497`)."""
    shift = new_origin - origin  # positive: window moved +, content moves -
    nx, ny, nz = grid.shape

    def roll_and_mask(g, s, axis, n):
        g = jnp.roll(g, -s, axis=axis)
        idx = jnp.arange(n)
        # valid source cells: 0 <= idx + s < n
        keep = (idx + s >= 0) & (idx + s < n)
        shape = [1, 1, 1]
        shape[axis] = n
        return g * keep.reshape(shape).astype(g.dtype)

    g = roll_and_mask(grid, shift[0], 0, nx)
    g = roll_and_mask(g, shift[1], 1, ny)
    g = roll_and_mask(g, shift[2], 2, nz)
    return g
