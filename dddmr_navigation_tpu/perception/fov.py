"""Sensor FOV tests and range-image construction.

Reproduces `MultiLayerSpinningLidar::isinLidarObservation`
(`multilayer_spinning_lidar.cpp:682-746`): a point is observable iff

  * its elevation w.r.t. the sensor's spin plane, ``asin(p2plane / p2s)``,
    lies within ``[vertical_FOV_bottom, vertical_FOV_top]`` (degrees), and
  * its azimuth in the sensor frame lies within the effective scan ranges
    (``yaw>=0`` must be in [pos_start, pos_end]; ``yaw<0`` in
    [neg_end, neg_start]).

The ray-cast clearing loop (`multilayer_spinning_lidar.cpp:456-628`) is
re-designed as a *range image* comparison: instead of marching each
sensor→voxel ray against a KD-tree of the scan with a distance-proportional
spot size, we rasterize the scan into a (elevation, azimuth) min-range
image once and compare each marked voxel's spherical coordinates against
it — one gather per voxel instead of ~40 KD-tree queries per voxel. The
spot-size tolerance maps to an angular bin size plus a range margin.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dddmr_navigation_tpu.geometry import quat_rotate, quat_conjugate


class RangeImageSpec(NamedTuple):
    rows: int            # elevation bins
    cols: int            # azimuth bins
    elev_min_deg: float  # = vertical_FOV_bottom
    elev_max_deg: float  # = vertical_FOV_top
    max_range: float = 100.0


def sensor_frame_spherical(sensor_pos, sensor_quat, pts):
    """(range, elevation_deg, azimuth_deg) of global points w.r.t. the
    sensor pose, matching the reference's plane/yaw construction."""
    d = pts - sensor_pos
    rng = jnp.linalg.norm(d, axis=-1)
    # elevation: angle between d and the sensor spin plane (normal = R @ z)
    normal = quat_rotate(sensor_quat, jnp.asarray([0.0, 0.0, 1.0]))
    p2plane = jnp.sum(d * normal, axis=-1)
    safe_rng = jnp.maximum(rng, 1e-9)
    elev = jnp.degrees(jnp.arcsin(jnp.clip(p2plane / safe_rng, -1.0, 1.0)))
    # azimuth: yaw of d expressed in the sensor frame
    d_s = quat_rotate(quat_conjugate(sensor_quat), d)
    azim = jnp.degrees(jnp.arctan2(d_s[..., 1], d_s[..., 0]))
    return rng, elev, azim


def in_fov(elev_deg, azim_deg, *, vertical_FOV_bottom, vertical_FOV_top,
           scan_effective_positive_start, scan_effective_positive_end,
           scan_effective_negative_start, scan_effective_negative_end):
    """Vectorized `isinLidarObservation` FOV predicate."""
    vert_ok = (elev_deg >= vertical_FOV_bottom) & (elev_deg <= vertical_FOV_top)
    pos_ok = (azim_deg >= 0) & (azim_deg >= scan_effective_positive_start) & (
        azim_deg <= scan_effective_positive_end)
    neg_ok = (azim_deg < 0) & (azim_deg <= scan_effective_negative_start) & (
        azim_deg >= scan_effective_negative_end)
    return vert_ok & (pos_ok | neg_ok)


def _bins(spec: RangeImageSpec, elev_deg, azim_deg):
    er = (elev_deg - spec.elev_min_deg) / max(
        spec.elev_max_deg - spec.elev_min_deg, 1e-6) * spec.rows
    row = jnp.clip(er.astype(jnp.int32), 0, spec.rows - 1)
    ac = (azim_deg + 180.0) / 360.0 * spec.cols
    col = jnp.clip(ac.astype(jnp.int32), 0, spec.cols - 1)
    return row, col


def build_range_image(spec: RangeImageSpec, sensor_pos, sensor_quat,
                      scan_pts, scan_mask):
    """Min-range scatter of the scan into an (rows, cols) image.
    Empty bins hold ``max_range`` (treated as free space)."""
    rng, elev, azim = sensor_frame_spherical(sensor_pos, sensor_quat, scan_pts)
    row, col = _bins(spec, elev, azim)
    rng = jnp.where(scan_mask, rng, jnp.inf)
    img = jnp.full((spec.rows, spec.cols), spec.max_range, dtype=jnp.float32)
    img = img.at[row, col].min(jnp.where(jnp.isfinite(rng), rng, spec.max_range))
    return img


def lookup_range(spec: RangeImageSpec, img, elev_deg, azim_deg):
    """Min of the 3x3 bin neighborhood — the analogue of the reference's
    distance-proportional spot size (min(dist/20+0.01, 0.1) m) which widens
    the ray into a cone (`multilayer_spinning_lidar.cpp:556-575`)."""
    row, col = _bins(spec, elev_deg, azim_deg)
    out = jnp.full(row.shape, jnp.inf, dtype=jnp.float32)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            r = jnp.clip(row + dr, 0, spec.rows - 1)
            c = (col + dc) % spec.cols
            out = jnp.minimum(out, img[r, c])
    return out
