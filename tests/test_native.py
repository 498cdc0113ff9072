"""Native host-runtime tests (C++ PCD loader, kNN graph builder, SPSC
ring). Skipped when the shared library cannot be built."""
import threading

import numpy as np
import pytest

from dddmr_navigation_tpu.io.native import (
    native_available, read_pcd_native, build_knn_graph_native, SensorRing)
from dddmr_navigation_tpu.io import write_pcd

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def test_native_pcd_binary_and_ascii(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 10, (257, 4)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"t_{binary}.pcd")
        write_pcd(p, pts, fields=("x", "y", "z", "intensity"), binary=binary)
        back = read_pcd_native(p)
        assert back.shape == (257, 4)
        np.testing.assert_allclose(back, pts, atol=1e-4)


def test_native_knn_matches_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 8, (800, 3)).astype(np.float32)
    idx, dist = build_knn_graph_native(pts, radius=0.6, k=8, orphan_k=8)
    tree = cKDTree(pts)
    for i in rng.choice(800, 20, replace=False):
        in_r = sorted(j for j in tree.query_ball_point(pts[i], 0.6)
                      if j != i)
        mine = [j for j in idx[i] if j >= 0]
        if len(in_r) >= 8:
            # nearest 8 of the in-radius set
            d_ref, j_ref = tree.query(pts[i], k=9)
            expect = set(j_ref[1:][d_ref[1:] <= 0.6 + 1e-6])
            assert set(mine) <= set(in_r)
            assert len(mine) == 8
        else:
            # orphan fallback: kNN-8 superset of the in-radius set
            assert set(in_r) <= set(mine)
            assert len(mine) == 8
        # distances sorted ascending
        d = dist[i][idx[i] >= 0]
        assert np.all(np.diff(d) >= -1e-6)


def test_native_knn_distances_correct():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0], [5, 5, 5]], np.float32)
    idx, dist = build_knn_graph_native(pts, radius=2.5, k=3, orphan_k=2)
    assert idx[0, 0] == 1 and np.isclose(dist[0, 0], 1.0)
    assert idx[0, 1] == 2 and np.isclose(dist[0, 1], 2.0)


def test_spsc_ring_threaded():
    ring = SensorRing(1 << 20)
    n = 200
    got = []

    def producer():
        for i in range(n):
            a = np.full((16,), i, np.float32)
            while not ring.push(a):
                pass

    def consumer():
        while len(got) < n:
            m = ring.pop()
            if m is not None:
                got.append(int(m[0]))

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=10); tc.join(timeout=10)
    assert got == list(range(n))   # FIFO order preserved


def test_spsc_ring_full_and_empty():
    ring = SensorRing(256)
    assert ring.pop() is None
    big = np.zeros((1024,), np.float32)   # 4 KB > capacity
    assert not ring.push(big)
    small = np.arange(8, dtype=np.float32)
    assert ring.push(small)
    out = ring.pop()
    np.testing.assert_array_equal(out, small)


def test_realtime_executor_paces_and_accounts():
    """Native executor: drift-free pacing + deadline stats
    (the rclcpp timer role, `perception_3d_ros.cpp:220-249`)."""
    import time
    from dddmr_navigation_tpu.io.native import native_available, RealtimeExecutor
    if not native_available():
        pytest.skip("native library unavailable")
    hits = []

    def cb(i):
        hits.append(i)
        if i == 3:
            time.sleep(0.03)   # force one deadline miss at 100 Hz

    ex = RealtimeExecutor(100.0, cb)
    ex.start()
    time.sleep(0.35)
    ex.stop()
    s = ex.stats()
    ex.close()
    assert s["error"] is None
    # ~35 ticks expected; overruns skip periods, so the count stays close
    assert 20 <= s["ticks"] <= 40, s
    assert s["deadline_misses"] >= 1
    assert s["max_ms"] >= 25.0          # the slow tick is in the tail
    assert s["p50_ms"] < 5.0
    assert hits == sorted(hits)
