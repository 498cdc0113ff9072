"""Masked min-distance: for each query point, the Euclidean distance to
the nearest valid point of a padded point set — the framework's
replacement for the reference's per-query PCL KD-tree nearest-neighbor
searches (`stick_path_model.cpp:51-77` per-step NN, `cluster_marking.cpp:
49-96` obstacle→ground-node distances, `lidar_measurement_model_likelihood
.cpp:196-249` feature matching).

The Pallas kernel puts 128 queries in the lane dimension per grid step and
streams obstacle chunks through the VPU, so the (Q, M) distance matrix
never exists in HBM. The XLA composite (chunked `lax.scan`) is the
fallback for non-TPU backends and the oracle for the interpret-mode test.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.ops.backend import resolve_backend

_BIG = 1.0e12
_FAR = 1.0e6          # padding coordinate for invalid points
_LANES = 128
_CHUNK_M = 512


def _xla_min_dist(queries, q_mask, points, p_mask, chunk: int = 512):
    m = points.shape[0]
    chunk = min(chunk, m)
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    pts = jnp.where(p_mask[:, None], points, _FAR)
    pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=_FAR)
    pts = pts.reshape(n_chunks, chunk, 3)

    def body(best, chunk_pts):
        d = queries[:, None, :] - chunk_pts[None, :, :]
        d2 = jnp.sum(d * d, axis=-1)
        return jnp.minimum(best, jnp.min(d2, axis=1)), None

    best0 = jnp.full((queries.shape[0],), _BIG, jnp.float32)
    best, _ = jax.lax.scan(body, best0, pts)
    out = jnp.sqrt(best)
    return jnp.where(q_mask, out, _FAR)


def _pallas_kernel(n_chunks, chunk, qx_ref, qy_ref, qz_ref, obs_ref,
                   out_ref):
    from jax.experimental import pallas as pl

    qx = qx_ref[0, :][:, None]          # (128, 1)
    qy = qy_ref[0, :][:, None]
    qz = qz_ref[0, :][:, None]

    def body(c, best):
        px = obs_ref[0, pl.ds(c * chunk, chunk)][None, :]   # (1, chunk)
        py = obs_ref[1, pl.ds(c * chunk, chunk)][None, :]
        pz = obs_ref[2, pl.ds(c * chunk, chunk)][None, :]
        dx = qx - px
        dy = qy - py
        dz = qz - pz
        d2 = dx * dx + dy * dy + dz * dz                    # (128, chunk)
        return jnp.minimum(best, jnp.min(d2, axis=1))

    best = jax.lax.fori_loop(0, n_chunks, body,
                             jnp.full((_LANES,), _BIG, jnp.float32),
                             unroll=True)
    out_ref[0, :] = jnp.sqrt(best)


def _pallas_min_dist(queries, q_mask, points, p_mask, interpret: bool):
    from jax.experimental import pallas as pl

    q = queries.shape[0]
    m = points.shape[0]
    q_pad = -(-q // _LANES) * _LANES
    chunk = min(_CHUNK_M, max(128, m))
    m_pad = -(-m // chunk) * chunk

    qs = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    qx = qs[:, 0].reshape(q_pad // _LANES, _LANES)
    qy = qs[:, 1].reshape(q_pad // _LANES, _LANES)
    qz = qs[:, 2].reshape(q_pad // _LANES, _LANES)
    pts = jnp.where(p_mask[:, None], points, _FAR)
    obs_t = jnp.pad(pts, ((0, m_pad - m), (0, 0)),
                    constant_values=_FAR).T                  # (3, M_pad)

    kernel = functools.partial(_pallas_kernel, m_pad // chunk, chunk)
    grid = (q_pad // _LANES,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((3, m_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q_pad // _LANES, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(qx, qy, qz, obs_t)
    out = out.reshape(q_pad)[:q]
    return jnp.where(q_mask, out, _FAR)


def masked_min_distance(queries, q_mask, points, p_mask,
                        backend: str = "auto", chunk: int = 512):
    """Distance from each query to the nearest valid point.

    Args:
      queries: (Q, 3) f32.
      q_mask: (Q,) bool — invalid queries return the far sentinel (1e6).
      points: (M, 3) f32 padded point set.
      p_mask: (M,) bool.
      backend: auto | xla | pallas | pallas_interpret.

    Returns: (Q,) f32 distances (1e6 where the query is masked or the
    point set is empty).
    """
    b = resolve_backend(backend)
    if b == "xla":
        return _xla_min_dist(queries, q_mask, points, p_mask, chunk)
    return _pallas_min_dist(queries, q_mask, points, p_mask,
                            interpret=(b == "pallas_interpret"))
