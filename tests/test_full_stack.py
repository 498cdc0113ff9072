"""The complete reference composition in one closed loop
(`go2_localization.launch`): lego_loam maps → pose-graph artifact →
mcl_3dl localizes with DRIFTING odometry → the navigation vertical
drives on the estimate only. Ground truth scores the run."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_map_localize_navigate_closed_loop(tmp_path):
    from examples.run_full_stack import run
    r = run(n_ticks=250, out_dir=str(tmp_path / "pg"), verbose=False)
    assert r["done"] and r["ok"], r
    assert r["true_goal_err"] < 1.5, r
    # r4: the base now tracks commands under acceleration limits
    # (track_twist), a harder closed loop than perfect execution
    assert r["est_err"] < 1.5, r
    # odometry genuinely drifted — dead reckoning alone would not have
    # scored this; the MCL correction carried the run
    assert r["max_odom_drift"] > 0.15, r
