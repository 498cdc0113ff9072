"""Operator surface: the live web viewer + click-to-command channel
(the rviz-tools role, `src/dddmr_rviz_tools/` — goal tool raycast onto
the map cloud, panels as the HUD readout)."""
import json
import urllib.request

import numpy as np

from dddmr_navigation_tpu.io.maps import flat_ground_map
from dddmr_navigation_tpu.runtime.viewer import NavViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_viewer_serves_map_state_and_click_commands():
    ground = flat_ground_map(10, 6, 0.25)
    viewer = NavViewer(ground, port=0)     # ephemeral port
    try:
        page = _get(viewer.port, "/")
        assert b"canvas" in page

        m = json.loads(_get(viewer.port, "/map"))
        assert len(m["ground"]) > 100
        assert len(m["bounds"]) == 4

        # no snapshot yet
        assert json.loads(_get(viewer.port, "/state")) is None

        viewer.publish(robot_pos=[1.0, 2.0, 0.0], robot_yaw=0.3, v=0.4,
                       w=0.1, decision=4, planner_state=4, tick=7,
                       dgraph=np.full((len(ground),), 9999.0),
                       plan=np.array([[0, 0, 0], [1, 0, 0]], np.float32),
                       goal=[4.0, 0.0, 0.0])
        st = json.loads(_get(viewer.port, "/state"))
        assert st["tick"] == 7 and st["decision"] == 4
        assert abs(st["robot"][0] - 1.0) < 1e-6
        assert len(st["dgraph"]) == len(m["ground"])

        # click-to-set-goal: snapped onto the ground cloud
        _post(viewer.port, "/goal", {"x": 3.07, "y": -1.18})
        g = viewer.pop_goal()
        assert g is not None
        d = np.hypot(ground[:, 0] - 3.07, ground[:, 1] + 1.18)
        np.testing.assert_allclose(g, ground[int(np.argmin(d))])
        assert viewer.pop_goal() is None

        # shift-click: initial pose channel
        _post(viewer.port, "/initial_pose", {"x": -4.9, "y": 2.9})
        p = viewer.pop_initial_pose()
        assert p is not None and abs(p[0] + 4.9) < 0.3
    finally:
        viewer.close()


class TestPoseGraph3DViewer:
    """Browser pose-graph editing surface (runtime/viewer3d.py) — the
    rviz pose_graph_editor_panel analogue: select two keyframes, add an
    ICP loop edge, optimize, all over HTTP against `slam/editor.py`."""

    def _editor(self):
        import sys
        sys.path.insert(0, "tests")
        from test_editor import _line_graph
        from dddmr_navigation_tpu.slam.editor import GraphEditor
        g, world = _line_graph(k=6, drift=0.06)
        return GraphEditor.from_graph(g), world

    def test_http_editing_roundtrip(self):
        import json
        import urllib.request
        from dddmr_navigation_tpu.runtime.viewer3d import PoseGraph3DViewer

        ed, world = self._editor()
        v = PoseGraph3DViewer(ed, map_pts=world, port=0)
        try:
            base = f"http://127.0.0.1:{v.port}"
            page = urllib.request.urlopen(base + "/", timeout=5).read()
            assert b"canvas" in page and b"add_icp_edge" in page
            cloud = json.loads(urllib.request.urlopen(
                base + "/cloud", timeout=5).read())
            assert len(cloud) == len(world)
            graph = json.loads(urllib.request.urlopen(
                base + "/graph", timeout=5).read())
            assert len(graph["nodes"]) == 6
            n_edges0 = len(graph["edges"])

            def cmd(payload):
                req = urllib.request.Request(
                    base + "/cmd", data=json.dumps(payload).encode(),
                    method="POST")
                urllib.request.urlopen(req, timeout=5).read()

            # the browser flow: select kf 0 and 5, press I, then O
            cmd({"op": "add_icp_edge", "i": 0, "j": 5})
            err_before = abs(float(ed.graph.poses[5, 1]))
            assert v.poll() == 1
            assert len(ed.edges) == n_edges0 + 1
            ed.edges[-1]["weight"] = 50.0     # panel accept boosts weight
            cmd({"op": "optimize"})
            assert v.poll() == 1
            err_after = abs(float(ed.graph.poses[5, 1]))
            assert err_after < 0.5 * err_before

            # republished graph carries the new loop edge + the op log
            graph = json.loads(urllib.request.urlopen(
                base + "/graph", timeout=5).read())
            assert len(graph["edges"]) == n_edges0 + 1
            assert any(kind == 1 for _, _, kind in graph["edges"])
            assert "optimize ok" in graph["log"]

            # delete it again from the page
            cmd({"op": "delete_edge", "i": 0, "j": 5})
            assert v.poll() == 1
            assert len(ed.edges) == n_edges0
        finally:
            v.close()
