import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.perception import (
    VoxelSpec, world_to_cell, window_origin_for, scroll_grid,
    RangeImageSpec, build_range_image, label_components, cluster_table,
    build_map_context, distance_to_ground, near_static,
    MarkingParams, init_marking_state, perception_update, mark_scan,
    clear_marked, update_dgraph)
from dddmr_navigation_tpu.io import flat_ground_map
from dddmr_navigation_tpu.io.maps import box_obstacle
from dddmr_navigation_tpu.geometry import quat_identity


SPEC = VoxelSpec(nx=64, ny=64, nz=24, xy_resolution=0.1, height_resolution=0.1)
RI = RangeImageSpec(rows=32, cols=360, elev_min_deg=-60.0, elev_max_deg=60.0)
PARAMS = MarkingParams(
    vertical_FOV_bottom=-60.0, vertical_FOV_top=60.0,
    scan_effective_positive_start=0.0, scan_effective_positive_end=180.0,
    scan_effective_negative_start=0.0, scan_effective_negative_end=-180.0,
    max_marked_voxels=512, max_window_nodes=2048, max_clusters=16,
)


PUPDATE = jax.jit(perception_update, static_argnums=(0, 1, 2))


def pad_scan(pts, n=2048):
    pts = np.asarray(pts, np.float32)[:n]
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts[:, :3]
    mask = np.zeros((n,), bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.fixture(scope="module")
def map_ctx():
    ground = flat_ground_map(10, 10, 0.25)
    return build_map_context(ground)


def test_world_to_cell_truncation():
    spec = SPEC
    pts = jnp.asarray([[0.26, -0.26, 0.04], [-0.04, 0.04, -0.26]])
    cells = np.asarray(world_to_cell(spec, pts))
    # reference: int(c/res) truncation toward zero
    np.testing.assert_array_equal(cells[0], [2, -2, 0])
    np.testing.assert_array_equal(cells[1], [0, 0, -2])


def test_scroll_grid():
    g = jnp.zeros((4, 4, 2), jnp.uint8).at[1, 1, 0].set(1)
    origin = jnp.asarray([0, 0, 0])
    new_origin = jnp.asarray([1, 0, 0])
    out = np.asarray(scroll_grid(g, origin, new_origin))
    assert out[0, 1, 0] == 1 and out.sum() == 1
    # scrolling far drops content
    out2 = np.asarray(scroll_grid(g, origin, jnp.asarray([10, 0, 0])))
    assert out2.sum() == 0


def test_label_components_two_blobs():
    occ = jnp.zeros((16, 16, 4), bool)
    occ = occ.at[1:3, 1:3, 1].set(True)
    occ = occ.at[10:13, 10:12, 1].set(True)
    labels = label_components(occ, tol_cells=1, num_iters=8)
    l = np.asarray(labels)
    blob1 = set(l[1:3, 1:3, 1].ravel().tolist())
    blob2 = set(l[10:13, 10:12, 1].ravel().tolist())
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
    assert l[0, 0, 0] == -1


def test_cluster_table_centroids():
    occ = jnp.zeros((8, 8, 2), bool).at[2:4, 2:4, 0].set(True)
    labels = label_components(occ, 1, 8)
    pos = jnp.stack(jnp.meshgrid(
        jnp.arange(8.0), jnp.arange(8.0), jnp.arange(2.0), indexing="ij"), -1)
    cents, sizes, idx = cluster_table(labels, occ, pos, max_clusters=4)
    sizes = np.asarray(sizes)
    assert sizes.sum() == 4
    c = np.asarray(cents)[sizes > 0][0]
    np.testing.assert_allclose(c, [2.5, 2.5, 0.0], atol=1e-5)


def test_map_context_lookups(map_ctx):
    d = np.asarray(distance_to_ground(map_ctx, jnp.asarray([[0.0, 0.0, 0.5]])))
    np.testing.assert_allclose(d, [0.5], atol=0.05)
    # static grid is a far-away sentinel -> nothing near
    assert not bool(near_static(map_ctx, jnp.asarray([[0.0, 0.0, 0.0]]), 0.1)[0])


def _mark_obstacle(map_ctx, center=(1.5, 0.0, 0.0)):
    state = init_marking_state(SPEC, PARAMS, map_ctx.ground.shape[0])
    robot_pos = jnp.asarray([0.0, 0.0, 0.0])
    q = quat_identity()
    sensor_pos = jnp.asarray([0.0, 0.0, 0.5])
    obs = box_obstacle(center, size=(0.3, 0.3, 0.8), resolution=0.1)
    # keep obstacle points off the ground plane (cluster centroid test is
    # centroid-based; raise base so centroid isn't ground-attached)
    obs[:, 2] += 0.2
    scan, mask = pad_scan(obs)
    state = PUPDATE(SPEC, RI, PARAMS, state, map_ctx, scan, mask,
                              robot_pos, q, sensor_pos, q)
    return state, robot_pos, q, sensor_pos


def test_mark_and_dgraph(map_ctx):
    state, *_ = _mark_obstacle(map_ctx)
    assert int(np.asarray(state.grid).sum()) > 0
    ground = np.asarray(map_ctx.ground)
    dg = np.asarray(state.dgraph)
    # node right under the obstacle center -> lethal distance
    i_near = np.argmin(np.linalg.norm(ground[:, :2] - [1.5, 0.0], axis=1))
    assert dg[i_near] < PARAMS.inscribed_radius
    # node ~1.2 m from the obstacle edge: value ≈ XY clearance
    i_mid = np.argmin(np.linalg.norm(ground[:, :2] - [2.9, 0.0], axis=1))
    assert 0.8 < dg[i_mid] < 1.45
    # distant node untouched
    i_far = np.argmin(np.linalg.norm(ground[:, :2] - [-4.0, -4.0], axis=1))
    assert dg[i_far] == PARAMS.max_obstacle_distance


def test_clear_when_seen_through(map_ctx):
    state, robot_pos, q, sensor_pos = _mark_obstacle(map_ctx)
    assert int(np.asarray(state.grid).sum()) > 0
    # new scan: wall far behind where the obstacle was -> rays pass through
    wall = box_obstacle((5.0, 0.0, 0.0), size=(0.2, 3.0, 1.5), resolution=0.1)
    wall[:, 2] += 0.2
    scan, mask = pad_scan(wall)
    state2 = PUPDATE(SPEC, RI, PARAMS, state, map_ctx, scan, mask,
                               robot_pos, q, sensor_pos, q)
    g_old = np.asarray(state.grid)
    g_new = np.asarray(state2.grid)
    # the old obstacle region must be (mostly) cleared; wall is now marked
    old_region = g_old.copy()
    still = (g_new.astype(bool) & old_region.astype(bool)).sum()
    assert still <= 0.2 * old_region.sum()
    # dgraph near old obstacle relaxed back up
    ground = np.asarray(map_ctx.ground)
    i_near = np.argmin(np.linalg.norm(ground[:, :2] - [1.5, 0.0], axis=1))
    assert np.asarray(state2.dgraph)[i_near] > PARAMS.inscribed_radius


def test_keep_when_reobserved(map_ctx):
    state, robot_pos, q, sensor_pos = _mark_obstacle(map_ctx)
    n0 = int(np.asarray(state.grid).sum())
    # identical second scan: everything re-observed, marks persist
    obs = box_obstacle((1.5, 0.0, 0.0), size=(0.3, 0.3, 0.8), resolution=0.1)
    obs[:, 2] += 0.2
    scan, mask = pad_scan(obs)
    state2 = PUPDATE(SPEC, RI, PARAMS, state, map_ctx, scan, mask,
                               robot_pos, q, sensor_pos, q)
    n1 = int(np.asarray(state2.grid).sum())
    assert n1 >= 0.8 * n0


def test_keep_when_occluded(map_ctx):
    state, robot_pos, q, sensor_pos = _mark_obstacle(map_ctx, center=(2.5, 0.0, 0.0))
    n0 = int(np.asarray(state.grid).sum())
    # new scan: wall *in front of* the old obstacle -> rays blocked -> keep
    wall = box_obstacle((1.0, 0.0, 0.0), size=(0.2, 3.0, 1.5), resolution=0.05)
    wall[:, 2] += 0.2
    scan, mask = pad_scan(wall, 4096)
    state2 = PUPDATE(SPEC, RI, PARAMS, state, map_ctx, scan, mask,
                               robot_pos, q, sensor_pos, q)
    g_new = np.asarray(state2.grid)
    g_old = np.asarray(state.grid)
    kept = (g_new.astype(bool) & g_old.astype(bool)).sum()
    assert kept >= 0.8 * n0


def test_ground_attached_cluster_rejected(map_ctx):
    state = init_marking_state(SPEC, PARAMS, map_ctx.ground.shape[0])
    robot_pos = jnp.asarray([0.0, 0.0, 0.0])
    q = quat_identity()
    sensor_pos = jnp.asarray([0.0, 0.0, 0.5])
    # flat patch on the ground: centroid z≈0.0 -> ground-attached -> rejected
    pts = np.stack(np.meshgrid(np.arange(1.0, 1.4, 0.1),
                               np.arange(-0.2, 0.2, 0.1), [0.01]), -1).reshape(-1, 3)
    scan, mask = pad_scan(pts)
    state2 = PUPDATE(SPEC, RI, PARAMS, state, map_ctx, scan, mask,
                               robot_pos, q, sensor_pos, q)
    assert int(np.asarray(state2.grid).sum()) == 0


def test_static_cluster_rejected():
    ground = flat_ground_map(10, 10, 0.25)
    wall = box_obstacle((2.0, 0.0, 0.0), size=(0.2, 2.0, 1.5), resolution=0.1)
    ctx = build_map_context(ground, wall)
    params = PARAMS._replace(segmentation_ignore_ratio=0.5)
    state = init_marking_state(SPEC, params, ctx.ground.shape[0])
    robot_pos = jnp.asarray([0.0, 0.0, 0.0])
    q = quat_identity()
    sensor_pos = jnp.asarray([0.0, 0.0, 0.5])
    # scan of the wall itself: matches static map -> rejected
    scan, mask = pad_scan(wall + np.array([0.0, 0.0, 0.0], np.float32))
    state2 = PUPDATE(SPEC, RI, params, state, ctx, scan, mask,
                               robot_pos, q, sensor_pos, q)
    assert int(np.asarray(state2.grid).sum()) == 0


def test_scan_stitcher():
    """`stitcher_num` sweep accumulation (`multilayer_spinning_lidar.cpp:
    177-201`): last-N concatenation, passthrough at 0, fixed output pad."""
    from dddmr_navigation_tpu.perception.stitcher import ScanStitcher
    s = ScanStitcher(0)
    p = np.ones((4, 3), np.float32)
    m = np.ones((4,), bool)
    op, om = s.push(p, m)
    assert op is p and om is m  # passthrough

    s = ScanStitcher(2, pad_to=16)
    a = np.full((3, 3), 1.0, np.float32)
    b = np.full((3, 3), 2.0, np.float32)
    c = np.full((3, 3), 3.0, np.float32)
    mm = np.ones((3,), bool)
    s.push(a, mm)
    op, om = s.push(b, mm)
    assert om.sum() == 6 and (op[:3] == 1.0).all() and (op[3:6] == 2.0).all()
    op, om = s.push(c, mm)   # deque(maxlen=2) drops the oldest sweep
    assert om.sum() == 6 and (op[:3] == 2.0).all() and (op[3:6] == 3.0).all()
    assert op.shape == (16, 3)


@pytest.mark.slow
def test_perception_update_vmaps_over_robots(map_ctx):
    """The mark/clear engine is a pure pytree function, so a fleet's
    perception updates batch with one vmap (SURVEY §2.12 scenario-DP):
    per-robot grids/dgraphs must match the sequential results."""
    import functools
    n_robots = 3
    states = [init_marking_state(SPEC, PARAMS, map_ctx.ground.shape[0])
              for _ in range(n_robots)]
    batched_state = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x), *states)

    rng = np.random.default_rng(4)
    robots = np.stack([[i * 1.0 - 1.0, 0.3 * i, 0.0]
                       for i in range(n_robots)]).astype(np.float32)
    scans, masks = [], []
    for i in range(n_robots):
        wall = box_obstacle([robots[i, 0] + 1.2, 0.4, 0.0],
                            size=(0.3, 0.6, 0.8))
        p, m = pad_scan(wall)
        scans.append(p)
        masks.append(m)
    scans = jnp.stack(scans)
    masks = jnp.stack(masks)
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    quats = jnp.broadcast_to(quat, (n_robots, 4))
    sensors = jnp.asarray(robots) + jnp.asarray([0.0, 0.0, 0.5])

    upd = functools.partial(perception_update, SPEC, RI, PARAMS)
    batched = jax.vmap(upd, in_axes=(0, None, 0, 0, 0, 0, 0, 0))(
        batched_state, map_ctx, scans, masks, jnp.asarray(robots), quats,
        sensors, quats)

    for i in range(n_robots):
        seq = PUPDATE(SPEC, RI, PARAMS, states[i], map_ctx, scans[i],
                      masks[i], jnp.asarray(robots[i]), quat, sensors[i],
                      quat)
        np.testing.assert_array_equal(np.asarray(batched.grid[i]),
                                      np.asarray(seq.grid))
        np.testing.assert_allclose(np.asarray(batched.dgraph[i]),
                                   np.asarray(seq.dgraph), rtol=1e-5)


class TestClearWindowRotation:
    """Round-3 review item 9: marked cells beyond the max_marked_voxels
    extraction cap must be clear-tested within a bounded number of ticks
    even when the first-extracted cells never clear (out of FOV). The
    extraction window now starts at MarkingState.clear_offset, advanced
    by the cap every tick."""

    def _setup(self):
        from dddmr_navigation_tpu.perception.voxel import VoxelSpec
        from dddmr_navigation_tpu.perception.fov import RangeImageSpec
        from dddmr_navigation_tpu.perception.marking import MarkingParams
        spec = VoxelSpec(nx=8, ny=8, nz=4, xy_resolution=0.2,
                         height_resolution=0.2)
        ri = RangeImageSpec(rows=16, cols=128, elev_min_deg=-15.0,
                            elev_max_deg=15.0)
        params = MarkingParams(
            scan_effective_positive_start=0.0,
            scan_effective_negative_start=0.0,
            max_marked_voxels=8)
        # sensor at the iz=2 plane (window z is robot-centered: iz=2 ⇒
        # z=0.0): iz=0 cells (z=-0.4) sit BELOW the -15° vertical FOV at
        # every in-window dxy ⇒ never clear-tested positive; iz=2 cells
        # at sensor height are in-FOV
        sensor = jnp.asarray([0.0, 0.0, 0.0])
        return spec, ri, params, sensor

    def _marked_grid(self, spec):
        grid = np.zeros((spec.nx, spec.ny, spec.nz), np.uint8)
        sticky, observable = [], []
        for ix in (0, 1):
            for iy in range(4):
                grid[ix, iy, 0] = 1          # lowest linear indices
                sticky.append((ix, iy, 0))
        for ix in (6, 7):
            for iy in range(8):
                grid[ix, iy, 2] = 1          # beyond the 8-cell cap
                observable.append((ix, iy, 2))
        return grid, sticky, observable

    def _scan(self):
        ang = np.linspace(-np.pi, np.pi, 128, endpoint=False)
        pts = np.stack([5.0 * np.cos(ang), 5.0 * np.sin(ang),
                        np.zeros_like(ang)], 1).astype(np.float32)
        return jnp.asarray(pts), jnp.ones((len(ang),), bool)

    def test_fixed_window_starves_rotating_does_not(self):
        from dddmr_navigation_tpu.perception.marking import clear_marked
        from dddmr_navigation_tpu.perception.voxel import window_origin_for
        spec, ri, params, sensor = self._setup()
        grid0, sticky, observable = self._marked_grid(spec)
        origin = window_origin_for(spec, jnp.zeros(3))
        scan, smask = self._scan()
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        n_cells = spec.nx * spec.ny * spec.nz

        step = jax.jit(lambda g, off: clear_marked(
            spec, ri, params, g, origin, sensor, q, scan, smask,
            clear_offset=off))

        # fixed window (the old behavior): the 8 sticky cells fill every
        # extraction slot forever and the observable cells starve
        g = jnp.asarray(grid0)
        for _ in range(12):
            g = step(g, jnp.asarray(0, jnp.int32))
        g_np = np.asarray(g)
        assert all(g_np[c] for c in sticky)
        assert all(g_np[c] for c in observable), \
            "precondition broken: fixed window should starve these"

        # rotating window: every cell is tested within n_cells/cap ticks
        g = jnp.asarray(grid0)
        off = jnp.asarray(0, jnp.int32)
        ticks_needed = -(-n_cells // params.max_marked_voxels) + 1
        for _ in range(ticks_needed):
            g = step(g, off)
            off = (off + params.max_marked_voxels) % n_cells
        g_np = np.asarray(g)
        assert all(g_np[c] for c in sticky), "out-of-FOV cells must stay"
        assert not any(g_np[c] for c in observable), \
            "observable over-cap cells must clear once the window reaches them"

    def test_perception_update_advances_offset(self):
        from dddmr_navigation_tpu.perception.marking import (
            MarkingParams, init_marking_state, perception_update)
        from dddmr_navigation_tpu.perception.static_map import (
            build_map_context)
        spec, ri, params, sensor = self._setup()
        ground = flat_ground_map(2, 2, 0.25)
        ctx = build_map_context(ground)
        st = init_marking_state(spec, params, len(ground))
        scan, smask = self._scan()
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        st2 = perception_update(spec, ri, params, st, ctx, scan, smask,
                                jnp.zeros(3), q, sensor, q)
        assert int(st2.clear_offset) == params.max_marked_voxels
        st3 = perception_update(spec, ri, params, st2, ctx, scan, smask,
                                jnp.zeros(3), q, sensor, q)
        assert int(st3.clear_offset) == 2 * params.max_marked_voxels


def test_pooled_clustering_matches_fine_on_separated_clusters():
    """cluster_pool=2 (the reference's own 0.1 m clustering lattice —
    it voxel-downsamples to 0.1 m before EuclideanClusterExtraction,
    `multilayer_spinning_lidar.cpp:268,327`) must produce the same
    cluster decomposition as fine-grid labeling for well-separated
    obstacles: same cluster count, same per-cluster cell memberships,
    centroids within the pooling quantum."""
    import jax.numpy as jnp
    from dddmr_navigation_tpu.perception.clustering import (
        label_components, label_components_pooled, cluster_table)

    occ = np.zeros((32, 32, 16), bool)
    occ[4:8, 4:8, 0:10] = True          # box A
    occ[20:23, 18:22, 0:6] = True       # box B (far from A)
    occ[10, 28, 2] = True               # lone voxel C
    occj = jnp.asarray(occ)
    pos = jnp.asarray(
        np.stack(np.meshgrid(np.arange(32), np.arange(32), np.arange(16),
                             indexing="ij"), -1).astype(np.float32) * 0.05)

    lab_f = label_components(occj, 2, 24)
    cf, sf, idx_f = cluster_table(lab_f, occj, pos, 8)
    lab_p, root = label_components_pooled(occj, 2, 24)
    cp, sp, idx_p = cluster_table(lab_p, occj, pos, 8, root_mask=root)

    nf = int((np.asarray(sf) > 0).sum())
    npo = int((np.asarray(sp) > 0).sum())
    assert nf == npo == 3
    # same memberships: cells sharing a fine cluster share a pooled one
    fi = np.asarray(idx_f)[occ]
    pi = np.asarray(idx_p)[occ]
    for k in np.unique(fi):
        assert len(np.unique(pi[fi == k])) == 1
    # centroids agree (order may differ) within the pooling quantum
    cf_v = np.asarray(cf)[np.asarray(sf) > 0]
    cp_v = np.asarray(cp)[np.asarray(sp) > 0]
    for row in cf_v:
        assert np.min(np.linalg.norm(cp_v - row, axis=1)) < 1e-5
