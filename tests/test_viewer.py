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
