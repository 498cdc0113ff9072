"""Pose-graph editor (slam/editor.py) vs reference
`pose_graph_editor.cpp` semantics, plus the pointcloud2occupancy util."""
import numpy as np
import pytest

from dddmr_navigation_tpu.io.occupancy import cloud_to_occupancy
from dddmr_navigation_tpu.slam.editor import GraphEditor
from dddmr_navigation_tpu.state_estimation.submaps import PoseGraph


def _line_graph(k=6, drift=0.05, n_pts=256, seed=0):
    """Keyframes along x with linear drift in y; clouds share one world
    structure so ICP between any two keyframes can recover truth."""
    rng = np.random.default_rng(seed)
    world = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
    poses = np.zeros((k, 8), np.float32)
    feats, grounds = [], []
    for i in range(k):
        true_p = np.array([1.0 * i, 0.0, 0.0], np.float32)
        est_p = true_p + np.array([0.0, drift * i, 0.0], np.float32)
        poses[i, :3] = est_p
        # keyframe cloud = world seen from the TRUE pose (identity rot)
        feats.append(world - true_p[None, :])
        grounds.append((world - true_p[None, :]) * np.float32(0.5))
    return PoseGraph(poses=poses, feature_clouds=feats,
                     ground_clouds=grounds), world


def test_editor_delete_edge():
    g, _ = _line_graph()
    ed = GraphEditor.from_graph(g)
    n0 = len(ed.edges)
    assert ed.delete_edge(2, 3)
    assert len(ed.edges) == n0 - 1
    assert not ed.delete_edge(2, 3)


def test_editor_icp_edge_and_optimize():
    g, _ = _line_graph(k=6, drift=0.06)
    ed = GraphEditor.from_graph(g)
    fitness = ed.add_icp_edge(0, 5)
    assert fitness < 1e-2
    # boost the manual loop edge the way the panel's accept does
    ed.edges[-1]["weight"] = 50.0
    err_before = abs(g.poses[5, 1])          # drifted y at kf 5
    ed.optimize(iters=10)
    err_after = abs(ed.graph.poses[5, 1])
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_editor_rigid_ops():
    g, _ = _line_graph(k=4, drift=0.0)
    ed = GraphEditor.from_graph(g)
    ed.translate([1.0, -2.0, 0.5])
    np.testing.assert_allclose(ed.graph.poses[0, :3], [1.0, -2.0, 0.5],
                               atol=1e-6)
    ed.rotate_yaw(np.pi / 2, about=(1.0, -2.0, 0.5))
    # kf1 was at (2,-2,.5); rotating +90° about kf0 sends it to (1,-1,.5)
    np.testing.assert_allclose(ed.graph.poses[1, :3], [1.0, -1.0, 0.5],
                               atol=1e-5)
    np.testing.assert_allclose(ed.graph.poses[1, 6], np.pi / 2, atol=1e-6)


def test_editor_merge_and_save_roundtrip(tmp_path):
    g1, _ = _line_graph(k=3, drift=0.0, seed=1)
    g2, _ = _line_graph(k=3, drift=0.0, seed=1)
    ed = GraphEditor.from_graph(g1)
    ed.merge(g2, connect=None)
    assert len(ed.graph.poses) == 6
    # odom chains of both sessions present (2 + 2 edges)
    assert sum(e["kind"] == "odom" for e in ed.edges) == 4
    ed.edges.append(dict(i=0, j=3, rel_pos=np.zeros(3, np.float32),
                         rel_quat=np.array([0, 0, 0, 1], np.float32),
                         weight=1.0, kind="loop"))
    out = str(tmp_path / "merged_pg")
    ed.save(out)
    ed2 = GraphEditor.load(out)
    assert len(ed2.graph.poses) == 6
    assert sum(e["kind"] == "loop" for e in ed2.edges) == 1


def test_cloud_to_occupancy_matches_reference_layout():
    pts = np.array([[0.12, 0.07, 0.3],
                    [1.04, 0.52, 0.0]], np.float32)
    grid, origin = cloud_to_occupancy(pts, resolution=0.05)
    # reference: min_x_int = int(0.12/0.05)-1 = 1, max = int(1.04/.05)+1=21
    assert origin == pytest.approx((0.05, 0.0))
    h, w = grid.shape
    assert (w, h) == (21 - 1, 11 - 0)
    assert grid[int(0.07 / 0.05) - 0, int(0.12 / 0.05) - 1] == 100
    assert grid[int(0.52 / 0.05) - 0, int(1.04 / 0.05) - 1] == 100
    assert int((grid == 100).sum()) == 2


def test_cloud_to_occupancy_empty():
    grid, origin = cloud_to_occupancy(np.zeros((0, 3), np.float32))
    assert grid.shape == (0, 0)


def test_map_editor_select_delete_undo_save(tmp_path):
    """Map-cloud editor (the rviz map_editor_panel vertical,
    `map_editor_panel.cpp:16-101`): region selection, delete, undo,
    reference-format save."""
    import numpy as np
    from tools.map_editor import MapEditor
    from dddmr_navigation_tpu.io.pcd import read_pcd

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    ed = MapEditor(pts)
    n_sel = ed.select_box([-1, -1, -5], [1, 1, 5])
    assert n_sel > 10
    n_del = ed.delete_selected()
    assert n_del == n_sel and len(ed.points) == 2000 - n_del
    # nothing inside the box remains
    inside = np.all((ed.points[:, :3] >= [-1, -1, -5])
                    & (ed.points[:, :3] <= [1, 1, 5]), axis=1)
    assert not inside.any()
    # undo restores
    assert ed.undo()
    assert len(ed.points) == 2000
    # radius + z-band compose; deselect subtracts
    ed.clear_selection()
    ed.select_radius([0, 0, 0], 2.0)
    before = int(ed.selected.sum())
    ed.select_radius([0, 0, 0], 1.0, add=False)
    assert int(ed.selected.sum()) < before
    # crop-to-selection + save roundtrip
    ed.clear_selection()
    ed.select_z_band(0.0, 5.0)
    kept = ed.keep_only_selected()
    out = str(tmp_path / "edited.pcd")
    ed.save(out, compressed=True)
    back = read_pcd(out)
    assert len(back) == kept
    assert (back[:, 2] >= 0.0).all()
