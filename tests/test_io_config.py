import os

import numpy as np
import pytest

from dddmr_navigation_tpu.io import read_pcd, write_pcd, flat_ground_map, corridor_map, voxel_downsample
from dddmr_navigation_tpu.io.maps import box_obstacle
from dddmr_navigation_tpu.config import NavigationConfig, load_yaml_config


def test_pcd_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "a.pcd"
    write_pcd(str(p), pts, fields=("x", "y", "z", "intensity"), binary=True)
    back = read_pcd(str(p))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_pcd_roundtrip_ascii(tmp_path):
    pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    p = tmp_path / "b.pcd"
    write_pcd(str(p), pts, binary=False)
    back = read_pcd(str(p))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_synthetic_maps():
    g = flat_ground_map(10, 10, 0.5)
    assert g.shape[1] == 3 and len(g) == 21 * 21
    ground, walls = corridor_map()
    assert walls[:, 2].max() >= 1.9
    obs = box_obstacle((1.0, 0.0, 0.0))
    assert len(obs) > 0


def test_voxel_downsample():
    pts = np.array([[0.01, 0.01, 0.0], [0.02, 0.02, 0.0], [1.0, 1.0, 0.0]], np.float32)
    out = voxel_downsample(pts, 0.1)
    assert out.shape[0] == 2


def test_default_config_hashable():
    cfg = NavigationConfig()
    assert hash(cfg) is not None
    assert cfg.local_planner.generator.limits.max_vel_x == 1.0
    assert len(cfg.local_planner.cuboid.corners()) == 8


def test_load_reference_yaml(tmp_path):
    # A minimal reference-format YAML exercising ingestion.
    y = tmp_path / "cfg.yaml"
    y.write_text(
        """
p2p_move_base:
  ros__parameters:
    controller_frequency: 20.0
local_planner:
  ros__parameters:
    forward_prune: 2.5
    xy_goal_tolerance: 0.2
trajectory_generators:
  ros__parameters:
    differential_drive_simple:
      max_vel_x: 0.8
      sim_time: 3.0
      linear_x_sample: 4.0
      cuboid:
        flb: [0.3, 0.25, 0.0]
        frb: [0.3, -0.25, 0.0]
        flt: [0.3, 0.25, 0.5]
        frt: [0.3, -0.25, 0.5]
        blb: [-0.3, 0.25, 0.0]
        brb: [-0.3, -0.25, 0.0]
        blt: [-0.3, 0.25, 0.5]
        brt: [-0.3, -0.25, 0.5]
mpc_critics:
  ros__parameters:
    stick_path:
      plugin: "mpc_critics::StickPathModel"
      weight: 0.2
perception_3d_local:
  ros__parameters:
    inscribed_radius: 0.4
    lidar:
      resolution: 0.1
mcl_3dl:
  ros__parameters:
    num_particles: 30
"""
    )
    cfg = load_yaml_config(str(y))
    assert cfg.move_base.controller_frequency == 20.0
    assert cfg.local_planner.forward_prune == 2.5
    assert cfg.local_planner.generator.limits.max_vel_x == 0.8
    assert cfg.local_planner.generator.sim_time == 3.0
    assert cfg.local_planner.generator.linear_x_sample == 4
    assert cfg.local_planner.generator.cuboid.flb == (0.3, 0.25, 0.0)
    assert cfg.local_planner.critics.stick_path.weight == 0.2
    assert cfg.perception.inscribed_radius == 0.4
    assert cfg.perception.lidar.xy_resolution == 0.1
    assert cfg.mcl.num_particles == 30


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/dddmr_p2p_move_base/config"),
    reason="reference configs not mounted")
@pytest.mark.parametrize("name", [
    "p2p_move_base_localization.yaml", "p2p_move_base_mapping.yaml",
    "p2p_wo_mcl.yaml", "go2_localization.yaml", "go2_mapping.yaml"])
def test_all_reference_yamls_ingest(name):
    """Every deployment YAML the reference ships parses into the typed
    config with sane values (not just the canonical one)."""
    from dddmr_navigation_tpu.config import load_yaml_config
    cfg = load_yaml_config(
        f"/root/reference/src/dddmr_p2p_move_base/config/{name}")
    assert cfg.move_base.controller_frequency > 0
    assert cfg.perception.inscribed_radius > 0
    gen = cfg.local_planner.generator
    assert gen.limits.max_vel_x > 0
    assert gen.sim_time > 0
    assert cfg.global_planner.a_star_expanding_radius > 0
    assert cfg.move_base.global_planner_action_name in (
        "get_plan", "get_dwa_plan")


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/src/dddmr_global_planner/data/warehouse.pgm"),
    reason="reference data not mounted")
def test_warehouse_pgm_to_ground_and_plan():
    """`occupancy2ground` on the reference's REAL warehouse.pgm
    (`path_planning_on_2d_map` demo, `occupancy2ground.cpp:60-250`):
    the 2D map extrudes into ground+wall clouds a real plan runs on."""
    from dddmr_navigation_tpu.io.occupancy import (
        read_pgm, occupancy_to_clouds)
    grid = read_pgm(
        "/root/reference/src/dddmr_global_planner/data/warehouse.pgm")
    assert grid.shape == (414, 275)
    ground, walls = occupancy_to_clouds(grid, resolution=0.05)
    assert len(ground) > 10_000 and len(walls) > 1_000

    # plan across the free space of the real map (downsampled for speed)
    from dddmr_navigation_tpu.io.maps import voxel_downsample
    from dddmr_navigation_tpu.planning.global_.runtime import (
        GlobalPlannerRuntime)
    ground_ds = voxel_downsample(ground, 0.25)
    cfg = NavigationConfig()
    rt = GlobalPlannerRuntime(cfg, ground_ds)
    free = np.full((len(ground_ds),), 9999.0, np.float32)
    # pick two distant free cells
    a = ground_ds[np.argmin(ground_ds[:, 0] + ground_ds[:, 1])]
    b = ground_ds[np.argmax(ground_ds[:, 0] + ground_ds[:, 1])]
    out = rt.plan(a, b, free)
    assert out is not None
    pos, _ = out
    assert np.linalg.norm(pos[-1] - b) < 0.6


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/dddmr_p2p_move_base/config"),
    reason="reference configs not mounted")
def test_omni_deployment_yaml_values():
    """The omni deployment (p2p_wo_mcl.yaml binds omni_drive_simple)
    ingests its generator limits + the twirling critic."""
    from dddmr_navigation_tpu.config import load_yaml_config
    cfg = load_yaml_config(
        "/root/reference/src/dddmr_p2p_move_base/config/p2p_wo_mcl.yaml")
    og = cfg.local_planner.omni_generator
    assert og.limits.min_vel_x == pytest.approx(-1.0)
    assert og.limits.max_vel_y == pytest.approx(1.0)
    assert og.limits.acc_lim_y == pytest.approx(2.0)
    assert og.limits.use_motor_constraint is False
    assert og.limits.min_vel_trans == pytest.approx(0.1)
    assert cfg.local_planner.critics.twirling is not None


def test_pcd_binary_compressed_roundtrip(tmp_path):
    """PCL's binary_compressed encoding (u32 sizes + LZF blob over
    field-major data): write → read roundtrip, plus the LZF codec on
    degenerate inputs."""
    from dddmr_navigation_tpu.io.pcd import (
        read_pcd, write_pcd, lzf_compress, lzf_decompress)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    write_pcd(p, pts, fields=("x", "y", "z", "intensity"), compressed=True)
    back = read_pcd(p)
    np.testing.assert_array_equal(back, pts)
    # compression actually engages on redundant data
    rep = np.tile(pts[:8], (50, 1))
    p2 = str(tmp_path / "r.pcd")
    write_pcd(p2, rep, fields=("x", "y", "z", "intensity"), compressed=True)
    import os
    assert os.path.getsize(p2) < rep.nbytes / 2
    np.testing.assert_array_equal(read_pcd(p2), rep)
    # codec-level roundtrips incl. literal-only and long-match paths
    for blob in (b"", b"abc", b"a" * 1000, bytes(rng.integers(0, 4, 5000,
                                                              dtype=np.uint8))):
        assert lzf_decompress(lzf_compress(blob), len(blob)) == blob
