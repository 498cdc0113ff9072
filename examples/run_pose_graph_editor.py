"""Browser pose-graph editing demo (the rviz pose_graph_editor_panel
flow, `src/dddmr_rviz_tools/` + `pose_graph_editor.cpp`):

    python examples/run_pose_graph_editor.py [pose_graph_dir]

Opens a 3D orbit viewer at http://127.0.0.1:8131 over a pose graph —
either a saved reference-format directory (poses.pcd + keyframe clouds)
or, with no argument, a synthetic drifted survey loop. In the browser:
drag to orbit, click two keyframes, press I to add an ICP loop edge,
O to re-optimize (watch the drift pull flat), D to delete an edge.
Edits apply through `slam/editor.py` on the host loop and the page
refreshes automatically.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_survey(k=14, drift=0.04, n_pts=600, seed=0):
    """A drifted lawnmower survey over a shared world cloud — keyframe i's
    cloud is the world seen from its TRUE pose, while the stored pose
    accumulates y drift (what an odometry-only backend would save)."""
    from dddmr_navigation_tpu.state_estimation.submaps import PoseGraph
    rng = np.random.default_rng(seed)
    world = np.concatenate([
        rng.uniform([-2, -2, 0], [12, 8, 0.2], (n_pts // 2, 3)),
        rng.uniform([-2, -2, 0], [12, 8, 2.5], (n_pts // 2, 3)),
    ]).astype(np.float32)
    poses = np.zeros((k, 8), np.float32)
    feats, grounds = [], []
    for i in range(k):
        leg, t = divmod(i, k // 2)
        true_p = np.array([1.6 * t, 6.0 * leg, 0.0], np.float32)
        poses[i, :3] = true_p + [0.0, drift * i, 0.0]
        feats.append(world - true_p[None, :])
        grounds.append((world - true_p[None, :]) * np.float32(0.5))
    return PoseGraph(poses=poses, feature_clouds=feats,
                     ground_clouds=grounds), world


def main():
    from dddmr_navigation_tpu.slam.editor import GraphEditor
    from dddmr_navigation_tpu.runtime.viewer3d import PoseGraph3DViewer

    if len(sys.argv) > 1:
        ed = GraphEditor.load(sys.argv[1])
        cloud = np.concatenate(
            [f + ed.graph.poses[i, :3]
             for i, f in enumerate(ed.graph.feature_clouds)])[:40000]
    else:
        g, world = synthetic_survey()
        ed = GraphEditor.from_graph(g)
        cloud = world

    v = PoseGraph3DViewer(ed, map_pts=cloud, port=8131)
    print(f"pose-graph editor at http://127.0.0.1:{v.port} "
          f"({len(ed.graph.poses)} keyframes, {len(ed.edges)} edges) — "
          f"click 2 nodes, I=icp edge, O=optimize, D=delete, ctrl-c quits")
    try:
        while True:
            if v.poll():
                print("applied:", v._log[-1])
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    finally:
        v.close()


if __name__ == "__main__":
    main()
