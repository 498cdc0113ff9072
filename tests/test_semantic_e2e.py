"""Trained segmentation end-to-end: the committed checkpoint must (a)
generalize to fresh procedural scenes (mIoU) and (b) drive the full
perception consumption chain — mask → class point cloud → no-entry zone
field → planner reroute (`trt_interface.py:16-80` →
`semantic_segmentation2point_cloud.cpp:81-176` → `no_entry_layer.cpp`)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.perception.semantic import (
    init_segmenter, infer_classes, load_params, segmentation_to_pointcloud)
from dddmr_navigation_tpu.perception.semantic_data import (
    CameraIntrinsics, render_scene, make_batch, miou, camera_to_world)

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "semantic_ddrnet.npz")


@pytest.fixture(scope="module")
def net():
    assert os.path.exists(ART), "run tools/train_semantic.py first"
    with open(ART + ".json") as f:
        meta = json.load(f)
    cam = CameraIntrinsics()
    model, template = init_segmenter(
        jax.random.PRNGKey(0), height=cam.height, width=cam.width,
        num_classes=meta["num_classes"], net_width=meta["net_width"])
    params = load_params(ART, template)
    return model, params, cam, meta


@pytest.mark.slow
def test_checkpoint_generalizes_to_fresh_scenes(net):
    model, params, cam, meta = net
    rng = np.random.default_rng(777)     # never seen in training
    rgb, labels = make_batch(rng, 8, cam)
    pred = np.asarray(infer_classes(model, params, jnp.asarray(rgb)))
    score = miou(pred, labels, num_classes=4)
    assert score >= 0.7, f"fresh-scene mIoU {score:.3f}"
    # and the recorded metadata claims what the artifact delivers
    assert meta["miou_heldout"] >= 0.7


@pytest.mark.slow
def test_forbidden_class_region_reroutes_planner(net):
    """Camera sees a grass zone across the robot's path; the chain
    mask → class cloud → no-entry field must bend the global plan."""
    from dddmr_navigation_tpu.io.maps import flat_ground_map
    from dddmr_navigation_tpu.perception.layers import no_entry_dgraph
    from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
    from dddmr_navigation_tpu.planning.global_.planner import plan_on_graph
    from dddmr_navigation_tpu.config import GlobalPlannerConfig

    model, params, cam, _ = net
    rng = np.random.default_rng(5)
    zone = (3.5, 0.0, 2.0, 2.0)          # x∈[2.5,4.5], y∈[-1,1]
    rgb, depth, labels, _, (origin, pitch) = render_scene(
        rng, cam, n_boxes=0, zones=[zone], pitch_jitter=0.0)

    pred = np.asarray(infer_classes(model, params,
                                    jnp.asarray(rgb[None])))[0]
    cloud, valid = segmentation_to_pointcloud(
        jnp.asarray(depth), jnp.asarray(pred), cam.fx, cam.fy, cam.cx,
        cam.cy, keep_classes=[2])
    pts_cam = np.asarray(cloud)[np.asarray(valid)][:, :3]
    assert len(pts_cam) > 50, "no forbidden-class points detected"
    pts_world = camera_to_world(pts_cam, origin, pitch)
    # detected zone points must actually lie in the true zone (±0.4 slack
    # for boundary pixels)
    in_zone = ((np.abs(pts_world[:, 0] - zone[0]) <= zone[2] / 2 + 0.4)
               & (np.abs(pts_world[:, 1] - zone[1]) <= zone[3] / 2 + 0.4)
               & (np.abs(pts_world[:, 2]) <= 0.2))
    assert in_zone.mean() > 0.9, f"only {in_zone.mean():.2f} in-zone"

    # feed the detected cloud into the no-entry layer + planner
    ground = flat_ground_map(16, 8, 0.25)
    ground[:, 0] += 7.0                  # x ∈ [-1, 15]
    g = len(ground)
    zone_pts = pts_world[in_zone].astype(np.float32)
    field = no_entry_dgraph(
        jnp.asarray(ground), jnp.ones((g,), bool), jnp.asarray(zone_pts),
        jnp.ones((len(zone_pts),), bool), inflation_distance=1.0,
        max_obstacle_distance=9999.0)

    graph = build_ground_graph(ground, radius=0.5, k_max=16)
    gcfg = GlobalPlannerConfig()

    def plan(dgraph):
        res = jax.jit(lambda d: plan_on_graph(
            gcfg, jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
            jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
            jnp.ones((g,), bool), d, jnp.zeros((g,)),
            jnp.asarray(graph.avg_intensity),
            jnp.asarray([0.5, 0.0, 0.0], jnp.float32),
            jnp.asarray([7.5, 0.0, 0.0], jnp.float32),
            inscribed_radius=0.5, inflation_descending_rate=2.0))(dgraph)
        ids = np.asarray(res.node_ids)[np.asarray(res.node_valid)]
        return bool(res.ok), ground[ids]

    ok_free, path_free = plan(jnp.full((g,), 9999.0))
    ok_zone, path_zone = plan(field)
    assert ok_free and ok_zone
    assert np.abs(path_free[:, 1]).max() < 0.3, "baseline not straight"
    mid = (path_zone[:, 0] > 2.0) & (path_zone[:, 0] < 5.0)
    assert np.abs(path_zone[mid, 1]).max() > 1.2, \
        "plan did not reroute around the detected forbidden zone"


def test_bev_homography_recovers_zone_footprint():
    """Depth-free ground-plane projection (`perspective_transform.py`
    role): the BEV class grid built from the TRUE labels must reproduce
    the forbidden zone's metric rectangle."""
    from dddmr_navigation_tpu.perception.semantic_data import (
        render_scene, bev_class_grid, CameraIntrinsics)
    cam = CameraIntrinsics()
    rng = np.random.default_rng(2)
    zone = (3.0, -0.5, 1.6, 1.2)
    _, _, labels, _, (origin, pitch) = render_scene(
        rng, cam, n_boxes=0, zones=[zone], pitch_jitter=0.0)
    grid, xs, ys = bev_class_grid(labels, cam, origin[2], pitch,
                                  x_range=(1.0, 6.0), y_range=(-2.5, 2.5),
                                  resolution=0.1)
    gy, gx = np.nonzero(grid == 2)
    assert len(gx) > 50, "no forbidden cells in BEV"
    zx, zy = xs[gx], ys[gy]
    # recovered extents match the true rectangle within a cell or two
    assert abs(zx.min() - (zone[0] - zone[2] / 2)) < 0.25
    assert abs(zx.max() - (zone[0] + zone[2] / 2)) < 0.25
    assert abs(zy.min() - (zone[1] - zone[3] / 2)) < 0.25
    assert abs(zy.max() - (zone[1] + zone[3] / 2)) < 0.25
    # nothing outside the rectangle (+1 cell slack) is class 2
    pad = 0.25
    outside = ((zx < zone[0] - zone[2] / 2 - pad)
               | (zx > zone[0] + zone[2] / 2 + pad)
               | (zy < zone[1] - zone[3] / 2 - pad)
               | (zy > zone[1] + zone[3] / 2 + pad))
    assert not outside.any()


def test_perspective_matrix_matches_manual_points():
    """4-point DLT homography maps the source corners exactly."""
    from dddmr_navigation_tpu.perception.semantic_data import (
        perspective_matrix, warp_nearest)
    src = [[409, 484], [878, 488], [1273, 646], [0, 638]]
    dst = [[0, 0], [1000, 0], [1000, 950], [0, 950]]
    M = perspective_matrix(src, dst)
    for (x, y), (u, v) in zip(src, dst):
        p = M @ np.array([x, y, 1.0])
        np.testing.assert_allclose(p[:2] / p[2], [u, v], atol=1e-2)
    img = np.zeros((700, 1300), np.int32)
    img[480:650, 400:1280] = 7
    out, ok = warp_nearest(img, M, 950, 1000)
    assert (out[ok.reshape(950, 1000)] == 7).mean() > 0.8
