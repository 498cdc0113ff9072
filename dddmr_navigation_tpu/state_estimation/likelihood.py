"""Lidar measurement likelihood — TPU re-design of the reference's
``LidarMeasurementModelLikelihood::measure``
(`src/lidar_measurement_model_likelihood.cpp:86-253`).

The reference scores each particle with per-point PCL KD-tree radius
searches against the submap's map/ground clouds plus a ground-normal
"stick to ground" weight. Here the submap is preprocessed (host-side, at
submap warm-up — the analogue of ``SubMaps::warmUpThread``) into dense
**Euclidean distance fields** and a **ground-normal / ground-height
raster**; per-particle scoring becomes gather + vector math, vmapped over
particles and batched over feature points (the reference's hot loop #4,
60 particles × ~600 points, becomes one fused device program).

Semantics preserved per reference lines:
  * score contribution per matched point:
    ``(match_dist_min − max(dist, match_dist_flat))²`` — flat features vs
    the ground field (map field when ground isn't trusted), less-sharp
    features vs the map field divided by the per-point segmentation weight
    (intensity) (`:196-249`).
  * pos_weight ladder (`:104-192`): trusted ground (≥ threshold points in
    1 m) → tilted-normal penalty 0.2, else ``(1−d_ground)·(1−roll_diff)``;
    untrusted ground → ``1−d_map``; negatives clamp to 0.01.
  * match_ratio = matched points / total points.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.geometry import quat_rotate, rpy_from_quat, \
    quat_multiply, quat_normalize
from dddmr_navigation_tpu.config import MCLConfig


class DistanceField(NamedTuple):
    """Dense EDT over a padded AABB; trilinear-sampled on device.

    Optional precomputed layouts (built host-side, once, at
    ``build_distance_field`` time — an advisor finding: deriving the
    z-packed layout inside every traced sample call makes XLA materialize
    a fresh HBM copy of the field per program):

    * ``packed`` — the (Nx, Ny, nz8, 8) z-packed layout the ``nearest``
      sampling mode row-gathers from.
    * ``near_pt`` — (Nx, Ny, Nz, 4) per-voxel [x, y, z, dist] of the
      NEAREST occupied voxel center (the EDT's Voronoi owner), enabling
      correspondence-cached sampling (``sample_nearest_point``).
    """
    dist: jnp.ndarray    # (Nx, Ny, Nz) f32 distance to nearest cloud point
    origin: jnp.ndarray  # (3,) f32 world position of voxel center (0,0,0)
    res: float           # static
    packed: object = None   # (Nx, Ny, ceil(Nz/8), 8) or None
    near_pt: object = None  # (Nx, Ny, Nz, 4) or None


class SubmapContext(NamedTuple):
    """Preprocessed submap (the analogue of the warm-up thread's output:
    KD-trees + ground normals, `sub_maps.cpp:219-318`)."""
    map_field: DistanceField
    ground_field: DistanceField
    # Ground rasters on the map_field XY lattice:
    ground_normal: jnp.ndarray  # (Nx, Ny, 3) f32 avg normal within search radius
    ground_count: jnp.ndarray   # (Nx, Ny) i32 ground points within search radius
    ground_xy_res: float
    ground_xy_origin: jnp.ndarray  # (2,)


def _pack_z(edt: np.ndarray) -> np.ndarray:
    """Host-side z-packed (Nx, Ny, ceil(Nz/8), 8) layout with +inf pad
    lanes (the masked-min lane select never picks a pad lane)."""
    nz = edt.shape[2]
    nz8 = -(-nz // 8)
    return np.pad(edt, ((0, 0), (0, 0), (0, nz8 * 8 - nz)),
                  constant_values=np.inf).reshape(
        edt.shape[0], edt.shape[1], nz8, 8)


def build_distance_field(points: np.ndarray, res: float, pad: float,
                         max_cells: int = 512, pack: bool = True,
                         with_nearest: bool = False) -> DistanceField:
    """Host-side EDT of a point cloud over its padded AABB.

    ``with_nearest`` additionally stores, per voxel, the world coordinates
    of the nearest occupied voxel center (+ the distance, packed as 4
    gather lanes) — the Voronoi-owner raster that correspondence-cached
    sampling (``field_sampling='corr'``) reads once per feature point
    instead of once per (particle × point). Costs 4× the field's memory;
    leave off for very large fields that only trilinear-sample."""
    from scipy import ndimage

    points = np.asarray(points, np.float32)[:, :3]
    mn = points.min(0) - pad
    mx = points.max(0) + pad
    dims = np.minimum(np.ceil((mx - mn) / res).astype(np.int64) + 1,
                      max_cells)
    occ = np.zeros(tuple(dims), bool)
    ci = np.clip(((points - mn) / res).astype(np.int64), 0, dims - 1)
    occ[ci[:, 0], ci[:, 1], ci[:, 2]] = True
    near_pt = None
    origin = (mn + 0.5 * res).astype(np.float32)
    if with_nearest:
        from scipy.spatial import cKDTree

        edt, inds = ndimage.distance_transform_edt(
            ~occ, sampling=res, return_indices=True)
        edt = edt.astype(np.float32)
        # Owner = an ACTUAL cloud point (the first point binned into the
        # owner voxel), not the voxel center: |q − owner| is then the
        # exact distance to a real cloud point, so on-cloud queries score
        # ~0 like the reference's KD-tree NN (voxel centers would floor
        # every distance at the ~res/2 center offset).
        rep = np.zeros(tuple(dims) + (3,), np.float32)
        rep[ci[::-1, 0], ci[::-1, 1], ci[::-1, 2]] = points[::-1]
        nn_world = rep[inds[0], inds[1], inds[2]]         # (Nx, Ny, Nz, 3)
        # Surface normal at each cloud point (kNN PCA — the same
        # construction build_submap_context uses for ground normals):
        # correspondence-cached scoring is point-to-PLANE, so sliding
        # along a locally flat surface stays unpenalized (the aperture a
        # re-searched NN would also leave open).
        k = int(min(10, len(points)))
        if k >= 3:
            tree = cKDTree(points)
            _, nb = tree.query(points, k=k)
            nbp = points[nb]                               # (P, k, 3)
            c = nbp - nbp.mean(1, keepdims=True)
            cov = np.einsum("pki,pkj->pij", c, c)
            _, vecs = np.linalg.eigh(cov)
            normals = vecs[:, :, 0].astype(np.float32)     # smallest eigval
        else:
            normals = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32),
                              (len(points), 1))
        repn = np.zeros(tuple(dims) + (3,), np.float32)
        repn[ci[::-1, 0], ci[::-1, 1], ci[::-1, 2]] = normals[::-1]
        nn_normal = repn[inds[0], inds[1], inds[2]]        # (Nx, Ny, Nz, 3)
        pad_lane = np.zeros(edt.shape + (1,), np.float32)
        near_pt = jnp.asarray(np.concatenate(
            [nn_world, edt[..., None], nn_normal, pad_lane],
            axis=-1))                                      # (Nx, Ny, Nz, 8)
    else:
        edt = ndimage.distance_transform_edt(
            ~occ, sampling=res).astype(np.float32)
    return DistanceField(dist=jnp.asarray(edt),
                         origin=jnp.asarray(origin),
                         res=float(res),
                         packed=jnp.asarray(_pack_z(edt)) if pack else None,
                         near_pt=near_pt)


def sample_distance(field: DistanceField, pts, method: str = "trilinear"):
    """Sample the EDT at world points (..., 3). Outside the grid the
    clamped border value plus the out-of-bounds offset is returned
    (distance lower bound, monotone — far points score 0).

    ``method='nearest'`` reads ONE cell instead of eight: TPU gathers
    cost ~10 ns/element, and at fleet scale (64 robots × 60 particles ×
    hundreds of features) the eight trilinear corner gathers are the
    dominant cost of the whole MCL stage (measured ~0.24 s/tick). The
    nearest read quantizes distances to ±res/2 (0.075 m at the default
    0.15 m raster) — inside the quadratic score with a 0.3 m match gate
    this adds noise comparable to the sensor model's own, a documented
    speed/precision trade for large fleets."""
    g = (pts - field.origin) / field.res
    dims = jnp.asarray(field.dist.shape, jnp.float32)
    gc = jnp.clip(g, 0.0, dims - 1.0 - 1e-4)
    if method == "nearest":
        i = jnp.round(gc).astype(jnp.int32)
        i = jnp.minimum(i, jnp.asarray(field.dist.shape, jnp.int32) - 1)
        # 8-lane z-row gather + {0, inf} masked-min lane select (the
        # wavefront relaxation's trick). Honest measurement at fleet
        # scale (64 robots × 60 particles × 1,024 field samples): 67.5 →
        # 64.1 ms — only ~5%, because unlike the wavefront (whose rows
        # are shared across lanes) every sample here needs its own row,
        # so the GATHER COUNT (~3.9M/tick) is unchanged and that count
        # is what binds the MCL stage. Kept for the small win; the
        # per-tick sample count itself is reference fidelity (the C++
        # measures the full flat+less_sharp clouds per particle,
        # `lidar_measurement_model_likelihood.cpp:96-115`). x + 0.0 == x,
        # so the selected value is bit-identical to the direct read (the
        # +inf pad lanes never win the min for in-range iz). The packed
        # layout comes precomputed from build_distance_field (advisor
        # finding: re-deriving it per traced call materializes an HBM
        # copy of the whole field per program).
        if field.packed is not None:
            packed = field.packed
        else:
            nz = field.dist.shape[2]
            nz8 = -(-nz // 8)
            packed = jnp.pad(field.dist, ((0, 0), (0, 0), (0, nz8 * 8 - nz)),
                             constant_values=jnp.inf)
            packed = packed.reshape(field.dist.shape[0], field.dist.shape[1],
                                    nz8, 8)
        rows = packed[i[..., 0], i[..., 1], i[..., 2] // 8]    # (..., 8)
        lane_sel = jnp.where(
            (i[..., 2] % 8)[..., None] == jnp.arange(8), 0.0, jnp.inf)
        d = jnp.min(rows + lane_sel, axis=-1)
        oob = jnp.linalg.norm((g - gc) * field.res, axis=-1)
        return d + oob
    i0 = jnp.floor(gc).astype(jnp.int32)
    f = gc - i0.astype(jnp.float32)

    def at(dx, dy, dz):
        return field.dist[i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz]

    d = (at(0, 0, 0) * (1 - f[..., 0]) * (1 - f[..., 1]) * (1 - f[..., 2])
         + at(1, 0, 0) * f[..., 0] * (1 - f[..., 1]) * (1 - f[..., 2])
         + at(0, 1, 0) * (1 - f[..., 0]) * f[..., 1] * (1 - f[..., 2])
         + at(0, 0, 1) * (1 - f[..., 0]) * (1 - f[..., 1]) * f[..., 2]
         + at(1, 1, 0) * f[..., 0] * f[..., 1] * (1 - f[..., 2])
         + at(1, 0, 1) * f[..., 0] * (1 - f[..., 1]) * f[..., 2]
         + at(0, 1, 1) * (1 - f[..., 0]) * f[..., 1] * f[..., 2]
         + at(1, 1, 1) * f[..., 0] * f[..., 1] * f[..., 2])
    # Clamped-out-of-bounds correction: add the residual to the border.
    oob = jnp.linalg.norm((g - gc) * field.res, axis=-1)
    return d + oob


def sample_nearest_point(field: DistanceField, pts):
    """Voronoi-owner lookup: the nearest cloud point (and its surface
    normal) for each query point (..., 3) → ((..., 3) owner coords,
    (...,) field distance at the query's cell, (..., 3) owner surface
    normal). ONE 8-lane row gather per point from the precomputed
    ``near_pt`` raster.

    This is the gather half of correspondence-cached likelihood scoring:
    the owner is looked up ONCE per feature point (at a reference pose)
    and every particle then scores against the fixed owner with pure VPU
    math (see :func:`measure_all_corr` for the distance model)."""
    if field.near_pt is None:
        raise ValueError("field built without with_nearest=True")
    g = (pts - field.origin) / field.res
    dims = jnp.asarray(field.dist.shape, jnp.float32)
    gc = jnp.clip(g, 0.0, dims - 1.0 - 1e-4)
    i = jnp.round(gc).astype(jnp.int32)
    i = jnp.minimum(i, jnp.asarray(field.dist.shape, jnp.int32) - 1)
    rows = field.near_pt[i[..., 0], i[..., 1], i[..., 2]]   # (..., 8)
    return rows[..., :3], rows[..., 3], rows[..., 4:7]


def build_submap_context(map_pts: np.ndarray, ground_pts: np.ndarray,
                         cfg: MCLConfig, res: float = 0.15,
                         normal_knn: int = 12,
                         with_nearest: bool = True) -> SubmapContext:
    """Preprocess a submap's map/ground clouds (host, NumPy/SciPy).

    Ground normals: per ground point, PCA plane normal of its kNN
    (the reference computes PCL normals on the warm-up thread,
    `sub_maps.cpp:276-300`), then averaged onto an XY raster over the
    ``radius_of_ground_search`` neighborhood with |nz| (the reference sums
    ``fabs(normal_z)``, `lidar_measurement_model_likelihood.cpp:121-126`).
    """
    from scipy.spatial import cKDTree

    map_pts = np.asarray(map_pts, np.float32)[:, :3]
    ground_pts = np.asarray(ground_pts, np.float32)[:, :3]
    map_field = build_distance_field(map_pts, res, pad=2.0,
                                     with_nearest=with_nearest)
    ground_field = build_distance_field(ground_pts, res, pad=2.0,
                                        with_nearest=with_nearest)

    # kNN PCA normals for ground points.
    tree = cKDTree(ground_pts)
    k = min(normal_knn, len(ground_pts))
    _, nbr = tree.query(ground_pts, k=k)
    nbrs = ground_pts[nbr]                      # (G, k, 3)
    c = nbrs - nbrs.mean(1, keepdims=True)
    cov = np.einsum("gki,gkj->gij", c, c)
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]                     # smallest eigval
    normals[:, 2] = np.abs(normals[:, 2])

    # XY raster (2D — ground is a height-field surface): average normal and
    # point count within radius_of_ground_search of each cell center.
    xy_res = 0.5
    mn = ground_pts[:, :2].min(0) - cfg.radius_of_ground_search
    mx = ground_pts[:, :2].max(0) + cfg.radius_of_ground_search
    nx = int(np.ceil((mx[0] - mn[0]) / xy_res)) + 1
    ny = int(np.ceil((mx[1] - mn[1]) / xy_res)) + 1
    cx, cy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    centers = np.stack([cx, cy], -1).reshape(-1, 2) * xy_res + mn + 0.5 * xy_res
    tree2 = cKDTree(ground_pts[:, :2])
    idx_lists = tree2.query_ball_point(centers, cfg.radius_of_ground_search)
    avg_n = np.zeros((nx * ny, 3), np.float32)
    cnt = np.zeros((nx * ny,), np.int32)
    for i, lst in enumerate(idx_lists):
        cnt[i] = len(lst)
        if lst:
            avg_n[i] = normals[lst].mean(0)
    return SubmapContext(
        map_field=map_field, ground_field=ground_field,
        ground_normal=jnp.asarray(avg_n.reshape(nx, ny, 3)),
        ground_count=jnp.asarray(cnt.reshape(nx, ny)),
        ground_xy_res=xy_res,
        ground_xy_origin=jnp.asarray(mn, jnp.float32))


def _roll_diff(quat, normal):
    """The reference's ground-alignment roll residual
    (`lidar_measurement_model_likelihood.cpp:137-165`): rotate the pose by
    the quaternion that tips `up` onto the averaged ground normal, take the
    roll of the result, and fold it through the piecewise mapping."""
    up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    axis = jnp.cross(normal, up)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    ang = -jnp.arccos(jnp.clip(jnp.dot(normal, up), -1.0, 1.0))
    s, c = jnp.sin(0.5 * ang), jnp.cos(0.5 * ang)
    q_normal = jnp.concatenate([axis * s, c[None]])
    q_new = quat_normalize(quat_multiply(quat, q_normal))
    roll, _, _ = rpy_from_quat(q_new)
    ar = jnp.abs(roll)
    return jnp.where((ar > 2.6) & (ar < jnp.pi), jnp.pi - ar,
                     jnp.where(ar < 0.5, ar, 0.55))


def _pos_weight(ctx: SubmapContext, cfg: MCLConfig, pos, quat):
    """`lidar_measurement_model_likelihood.cpp:104-192`."""
    ij = ((pos[:2] - ctx.ground_xy_origin) / ctx.ground_xy_res).astype(jnp.int32)
    nx, ny = ctx.ground_count.shape
    i = jnp.clip(ij[0], 0, nx - 1)
    j = jnp.clip(ij[1], 0, ny - 1)
    cnt = ctx.ground_count[i, j]
    n = ctx.ground_normal[i, j]
    trusted = cnt >= cfg.threshold_for_trusted_ground

    tilted = (jnp.abs(n[0]) >= 3.0 * jnp.abs(n[2])) | \
             (jnp.abs(n[1]) >= 3.0 * jnp.abs(n[2]))
    nn = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
    rd = _roll_diff(quat, nn)
    d_ground = sample_distance(ctx.ground_field, pos)
    w_ground = jnp.maximum((1.0 - d_ground) * (1.0 - rd), 0.01)
    w_trusted = jnp.where(tilted, 0.2, w_ground)

    d_map = sample_distance(ctx.map_field, pos)
    w_untrusted = jnp.maximum(1.0 - d_map, 0.01)
    return jnp.where(trusted, w_trusted, w_untrusted), trusted


def measure_likelihood(ctx: SubmapContext, cfg: MCLConfig,
                       flat_pts, flat_mask, sharp_pts, sharp_mask,
                       sharp_weight, pos, quat):
    """Likelihood + match ratio of ONE particle. Feature clouds are in the
    base frame (static-shape padded); masks flag valid points."""
    fp = quat_rotate(quat[None, :], flat_pts) + pos[None, :]
    sp = quat_rotate(quat[None, :], sharp_pts) + pos[None, :]

    pos_w, trusted = _pos_weight(ctx, cfg, pos, quat)
    method = getattr(cfg, "field_sampling", "trilinear")

    d_flat_g = sample_distance(ctx.ground_field, fp, method)
    d_flat_m = sample_distance(ctx.map_field, fp, method)
    d_flat = jnp.where(trusted, d_flat_g, d_flat_m)
    matched_f = flat_mask & (d_flat <= cfg.match_dist_min)
    sc_f = cfg.match_dist_min - jnp.maximum(d_flat, cfg.match_dist_flat)
    sc_f = jnp.where(matched_f & (sc_f >= 0.0), sc_f * sc_f, 0.0)

    d_sharp = sample_distance(ctx.map_field, sp, method)
    matched_s = sharp_mask & (d_sharp <= cfg.match_dist_min)
    sc_s = cfg.match_dist_min - jnp.maximum(d_sharp, cfg.match_dist_flat)
    sc_s = jnp.where(matched_s & (sc_s >= 0.0),
                     sc_s * sc_s / jnp.maximum(sharp_weight, 1e-6), 0.0)

    score = (jnp.sum(sc_f) + jnp.sum(sc_s)) * pos_w
    total = jnp.maximum(jnp.sum(flat_mask) + jnp.sum(sharp_mask), 1)
    num = (jnp.sum(matched_f & (cfg.match_dist_min
                                - jnp.maximum(d_flat, cfg.match_dist_flat) >= 0))
           + jnp.sum(matched_s))
    return score, num.astype(jnp.float32) / total.astype(jnp.float32)


def measure_all(ctx: SubmapContext, cfg: MCLConfig, flat_pts, flat_mask,
                sharp_pts, sharp_mask, sharp_weight, pf_pos, pf_quat):
    """vmap over particles → (likelihood (N,), match_ratio (N,))."""
    return jax.vmap(
        lambda p, q: measure_likelihood(ctx, cfg, flat_pts, flat_mask,
                                        sharp_pts, sharp_mask, sharp_weight,
                                        p, q))(pf_pos, pf_quat)


def measure_all_corr(ctx: SubmapContext, cfg: MCLConfig, flat_pts, flat_mask,
                     sharp_pts, sharp_mask, sharp_weight, pf_pos, pf_quat,
                     pose0_pos, pose0_quat):
    """Correspondence-cached particle scoring (``field_sampling='corr'``).

    The reference KD-tree-queries the nearest map point per (particle ×
    feature point) (`lidar_measurement_model_likelihood.cpp:196-249`);
    the 'nearest'/'trilinear' modes here do the same via one EDT gather
    per (particle × point). At fleet scale the GATHER COUNT is what binds
    the MCL stage (~3.9 M/tick measured ≈ 57 ms). This mode looks the
    correspondence up ONCE per feature point, at the odometry-predicted
    reference pose ``pose0`` — the Voronoi owner of the point's cell via
    :func:`sample_nearest_point` — and every particle then scores the
    EXACT Euclidean distance ``|T_p·x − nn|`` to that fixed owner with
    pure elementwise math: N_points gathers + N_particles·N_points VPU
    flops instead of N_particles·N_points gathers.

    Distance model (point-to-plane with a bounded patch): with Δ =
    ``T_p·x − nn`` and n̂ the owner's surface normal,

        d_p = max(|Δ·n̂|, |Δ| − r_patch),   r_patch = corr_patch_cells·res

    |Δ·n̂| keeps the aperture a re-searched NN would leave open — sliding
    along a locally flat wall/ground patch costs nothing (plain
    point-to-point |Δ| would falsely constrain the tangent direction and
    anchor the filter to the odometry-predicted pose, killing drift
    correction). The |Δ| − r_patch term bounds the free slide to the
    local patch the cached owner can stand in for — beyond it the owner
    would genuinely have changed, and the bound keeps d_p a lower bound
    of |Δ| rather than letting particles ride an infinite plane.

    Exact at the reference pose; within the particle cloud's spread the
    error vs a re-searched NN is O(surface curvature · spread²) plus the
    patch-boundary cases, and the owner set is SHARED by all particles,
    so cross-particle ranking (what the filter consumes) is preserved.
    Regression-tested: closed-loop convergence at the standard bound
    (``tests/test_state_estimation.py::test_mcl_converges_corr_mode``).
    This is a TRACKING-mode accelerator — for global relocalization
    (expansion-scale spreads ≫ r_patch) prefer 'nearest'/'trilinear'.

    Returns (likelihood (N,), match_ratio (N,)).
    """
    r_patch = getattr(cfg, "corr_patch_cells", 2.0) * ctx.map_field.res

    # One gather pass at the reference pose:
    fp0 = quat_rotate(pose0_quat[None, :], flat_pts) + pose0_pos[None, :]
    sp0 = quat_rotate(pose0_quat[None, :], sharp_pts) + pose0_pos[None, :]
    nn_flat_g, _, n_flat_g = sample_nearest_point(ctx.ground_field, fp0)
    nn_flat_m, _, n_flat_m = sample_nearest_point(ctx.map_field, fp0)
    nn_sharp_m, _, n_sharp_m = sample_nearest_point(ctx.map_field, sp0)

    def pp_dist(q, nn, nrm):
        delta = q - nn
        along = jnp.abs(jnp.sum(delta * nrm, axis=-1))
        full = jnp.linalg.norm(delta, axis=-1)
        return jnp.maximum(along, full - r_patch)

    def one(pos, quat):
        fp = quat_rotate(quat[None, :], flat_pts) + pos[None, :]
        sp = quat_rotate(quat[None, :], sharp_pts) + pos[None, :]
        pos_w, trusted = _pos_weight(ctx, cfg, pos, quat)

        d_flat_g = pp_dist(fp, nn_flat_g, n_flat_g)
        d_flat_m = pp_dist(fp, nn_flat_m, n_flat_m)
        d_flat = jnp.where(trusted, d_flat_g, d_flat_m)
        matched_f = flat_mask & (d_flat <= cfg.match_dist_min)
        sc_f = cfg.match_dist_min - jnp.maximum(d_flat, cfg.match_dist_flat)
        sc_f = jnp.where(matched_f & (sc_f >= 0.0), sc_f * sc_f, 0.0)

        d_sharp = pp_dist(sp, nn_sharp_m, n_sharp_m)
        matched_s = sharp_mask & (d_sharp <= cfg.match_dist_min)
        sc_s = cfg.match_dist_min - jnp.maximum(d_sharp, cfg.match_dist_flat)
        sc_s = jnp.where(matched_s & (sc_s >= 0.0),
                         sc_s * sc_s / jnp.maximum(sharp_weight, 1e-6), 0.0)

        score = (jnp.sum(sc_f) + jnp.sum(sc_s)) * pos_w
        total = jnp.maximum(jnp.sum(flat_mask) + jnp.sum(sharp_mask), 1)
        num = (jnp.sum(matched_f
                       & (cfg.match_dist_min
                          - jnp.maximum(d_flat, cfg.match_dist_flat) >= 0))
               + jnp.sum(matched_s))
        return score, num.astype(jnp.float32) / total.astype(jnp.float32)

    return jax.vmap(one)(pf_pos, pf_quat)
