"""Swept oriented-cuboid collision test — hot loop #1b of the reference
(`collision_model.cpp:51-148`: per-step KD-tree radius search + dot-product
point-in-box test, run serially per trajectory) as one fused kernel over
(samples × steps × obstacles).

Geometry: a rollout step's footprint box is given by its three unit axes
``axes`` (rows: box x/y/z in world frame), the box-center projections
``projc[k] = axes[k]·center`` and half extents ``half``. A point ``p`` is
inside iff ``|axes[k]·p − projc[k]| ≤ half[k]`` for all k — exactly the
reference's corner-difference dot test (axis layout comment
`dd_simple_trajectory_generator_theory.cpp:219-229`).

The Pallas kernel tiles samples over the grid, keeps the obstacle set in
VMEM, and streams obstacle chunks through the VPU — the (S,N,3,M)
projection tensor never exists in HBM. All multiply-adds are f32 VPU ops,
so the XLA path's bf16-MXU precision hazard doesn't arise.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.ops.backend import resolve_backend

_FAR = 1.0e9          # padding coordinate: outside any footprint box
_TILE_S = 8           # f32 sublane count
_CHUNK_M = 512        # obstacle lanes per VPU pass


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _xla_hits(axes, projc, step_valid, obstacles, obs_mask, half,
              obstacle_chunk: int = 256):
    """XLA composite: scan over obstacle chunks (the pre-existing critics
    implementation, kept as the non-TPU / fallback path)."""
    half = jnp.asarray(half, jnp.float32)
    k_total = obstacles.shape[0]
    chunk = min(obstacle_chunk, k_total)
    n_chunks = -(-k_total // chunk)
    pad = n_chunks * chunk - k_total
    obs_p = jnp.pad(obstacles, ((0, pad), (0, 0)))
    obs_m = jnp.pad(obs_mask, (0, pad))
    obs_p = obs_p.reshape(n_chunks, chunk, 3)
    obs_m = obs_m.reshape(n_chunks, chunk)

    def body(hit, chunk_in):
        pts, mask = chunk_in
        proj_p = jnp.einsum("snak,mk->snam", axes, pts,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        dist = jnp.abs(proj_p - projc[..., None])
        inside = jnp.all(dist <= half[None, None, :, None], axis=2)
        inside = inside & mask[None, None, :] & step_valid[:, :, None]
        return hit | jnp.any(inside, axis=(1, 2)), None

    hit0 = jnp.zeros(axes.shape[0], bool)
    hit, _ = jax.lax.scan(body, hit0, (obs_p, obs_m))
    return hit


def _pallas_kernel(half, n_chunks, chunk, axes_ref, projc_ref, valid_ref,
                   obs_ref, out_ref):
    t, n = valid_ref.shape

    def body(c, hit):
        px = obs_ref[0, pl_ds(c * chunk, chunk)][None, None, :]
        py = obs_ref[1, pl_ds(c * chunk, chunk)][None, None, :]
        pz = obs_ref[2, pl_ds(c * chunk, chunk)][None, None, :]
        inside = None
        for k in range(3):
            ax = axes_ref[:, :, 3 * k + 0][..., None]
            ay = axes_ref[:, :, 3 * k + 1][..., None]
            az = axes_ref[:, :, 3 * k + 2][..., None]
            proj = ax * px + ay * py + az * pz
            ok = jnp.abs(proj - projc_ref[:, :, k][..., None]) <= half[k]
            inside = ok if inside is None else (inside & ok)
        return hit | jnp.any(inside, axis=2)

    hit = jax.lax.fori_loop(0, n_chunks, body,
                            jnp.zeros((t, n), bool), unroll=True)
    hit = hit & (valid_ref[...] > 0)
    any_hit = jnp.any(hit, axis=1)
    out_ref[...] = jnp.broadcast_to(
        any_hit[:, None], (t, 128)).astype(jnp.float32)


def pl_ds(start, size):  # local alias so the kernel body reads cleanly
    from jax.experimental import pallas as pl
    return pl.ds(start, size)


def _pallas_hits(axes, projc, step_valid, obstacles, obs_mask, half,
                 interpret: bool):
    from jax.experimental import pallas as pl

    s, n = step_valid.shape
    m = obstacles.shape[0]
    s_pad = -(-s // _TILE_S) * _TILE_S
    chunk = min(_CHUNK_M, max(128, m))
    m_pad = -(-m // chunk) * chunk

    axes_f = _pad_to(axes.reshape(s, n, 9), s_pad, 0)
    projc_f = _pad_to(projc, s_pad, 0)
    valid_f = _pad_to(step_valid.astype(jnp.float32), s_pad, 0)
    # invalid/padded obstacles land far away → never inside
    obs = jnp.where(obs_mask[:, None], obstacles, _FAR)
    obs_t = _pad_to(obs, m_pad, 0, value=_FAR).T       # (3, M_pad)

    half_t = tuple(float(x) for x in np.asarray(half))
    kernel = functools.partial(_pallas_kernel, half_t, m_pad // chunk, chunk)
    grid = (s_pad // _TILE_S,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_S, n, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE_S, n, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE_S, n), lambda i: (i, 0)),
            pl.BlockSpec((3, m_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_S, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((s_pad, 128), jnp.float32),
        interpret=interpret,
    )(axes_f, projc_f, valid_f, obs_t)
    return out[:s, 0] > 0.5


def swept_box_hits(axes, projc, step_valid, obstacles, obs_mask, half,
                   backend: str = "auto", obstacle_chunk: int = 256):
    """True per sample when any obstacle point is inside the oriented
    footprint box at any valid rollout step.

    Args:
      axes: (S, N, 3, 3) unit box axes (rows) per sample/step, world frame.
      projc: (S, N, 3) axes·center projections.
      step_valid: (S, N) bool valid-step mask.
      obstacles: (M, 3) points (same frame as the axes/centers).
      obs_mask: (M,) bool.
      half: (3,) static half extents (Python/numpy floats).
      backend: auto | xla | pallas | pallas_interpret.

    Returns: (S,) bool hit mask.
    """
    b = resolve_backend(backend)
    if b == "xla":
        return _xla_hits(axes, projc, step_valid, obstacles, obs_mask, half,
                         obstacle_chunk)
    return _pallas_hits(axes, projc, step_valid, obstacles, obs_mask, half,
                        interpret=(b == "pallas_interpret"))
