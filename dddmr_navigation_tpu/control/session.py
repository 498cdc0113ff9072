"""NavigationSession: the fully-integrated perception→planning loop.

The reference runs this as a graph of nodes — `Perception3D_ROS` (one per
vertical) ticking `StackedPerception::doClear_then_Mark` at 10 Hz
(`perception_3d_ros.cpp:220-249`), the global planner consuming
`get_min_dGraphValue` + the aggregated lethal cloud, the local planner
consuming the aggregated observation, `P2PMoveBase` orchestrating. Here one
host object owns the whole vertical over device state:

  per tick:
    1. mark/clear the dynamic layer from the live scan
       (`stacked_perception.cpp:72-90` clear→mark ordering),
    2. min-compose static / no-entry / dynamic distance fields
       (`stacked_perception.cpp:114-126`) and aggregate the lethal cloud
       (`:142-155`) for the planner's LOS gate,
    3. aggregate observations (the local vertical's transformed scan,
       `multilayer_spinning_lidar.cpp:264-269`) for the critics +
       path-blocked strategy,
    4. evaluate the speed-limit zone cap and the no-entry toggle state
       (`speed_limit_layer.cpp:222-300`, `no_entry_layer.cpp:225-290`),
    5. drive `MoveBaseDriver.tick` with the host freshness/TF gates.

Also provides the `clear_perception_marking` service analogue
(`perception_3d_ros.cpp:276`): :meth:`clear_marking`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.config import NavigationConfig
from dddmr_navigation_tpu.geometry import quat_rotate
from dddmr_navigation_tpu.io.maps import voxel_downsample
from dddmr_navigation_tpu.perception.voxel import VoxelSpec
from dddmr_navigation_tpu.perception.fov import RangeImageSpec
from dddmr_navigation_tpu.perception.static_map import build_map_context
from dddmr_navigation_tpu.perception.marking import (
    MarkingParams, init_marking_state, perception_update)
from dddmr_navigation_tpu.perception.layers import (
    min_dgraph, no_entry_dgraph, speed_limit_at)
from dddmr_navigation_tpu.perception.depth_camera import (
    CameraModel, init_depth_buffer, push_observation)
from dddmr_navigation_tpu.planning.global_.los import lethal_cloud_from_dgraph
from dddmr_navigation_tpu.control.move_base import MoveBaseDriver
from dddmr_navigation_tpu.runtime.watchdog import FreshnessGate


class NavigationSession:
    """One robot's complete navigation vertical over a loaded map."""

    def __init__(self, cfg: NavigationConfig, ground: np.ndarray,
                 map_pts: Optional[np.ndarray] = None,
                 node_weight: Optional[np.ndarray] = None,
                 static_dgraph: Optional[np.ndarray] = None,
                 no_entry_zones: Optional[np.ndarray] = None,
                 speed_zones: Optional[tuple] = None,
                 threaded_plan_manager: bool = False,
                 sensor_offset=(0.0, 0.0, 0.5),
                 depth_cameras: int = 0,
                 depth_camera_model: Optional[CameraModel] = None,
                 depth_buffer_depth: int = 3,
                 depth_max_points: int = 1024,
                 depth_keep_time: float = 0.5):
        self.cfg = cfg
        p = cfg.perception
        self.ground = np.asarray(ground, np.float32)
        g = len(self.ground)

        self.params = MarkingParams.from_config(p)
        self.spec = VoxelSpec(
            nx=p.voxel_window_cells_xy, ny=p.voxel_window_cells_xy,
            nz=p.voxel_window_cells_z,
            xy_resolution=p.lidar.xy_resolution,
            height_resolution=p.lidar.height_resolution)
        self.ri_spec = RangeImageSpec(
            rows=p.lidar.range_image_rows, cols=p.lidar.range_image_cols,
            elev_min_deg=p.lidar.vertical_FOV_bottom,
            elev_max_deg=p.lidar.vertical_FOV_top)
        self.map_ctx = build_map_context(self.ground, map_pts,
                                         node_weight=node_weight)
        self.marking = init_marking_state(self.spec, self.params, g)
        self._jit_perception = jax.jit(perception_update,
                                       static_argnums=(0, 1, 2))
        self._jit_lethal = jax.jit(partial(
            lethal_cloud_from_dgraph, inscribed_radius=p.inscribed_radius,
            max_lethal=cfg.global_planner.max_lethal_points))

        # static layer field (overhang lethals etc. from map preprocessing)
        self.static_dgraph = jnp.asarray(
            np.full((g,), p.max_obstacle_distance, np.float32)
            if static_dgraph is None else static_dgraph)

        # no-entry layer (runtime toggle — `no_entry_layer.cpp` enable
        # service): the zone field is precomputed; the toggle min-composes
        # it in or not.
        self.no_entry_enabled = no_entry_zones is not None
        if no_entry_zones is not None:
            zp = jnp.asarray(np.asarray(no_entry_zones, np.float32))
            self.no_entry_field = no_entry_dgraph(
                jnp.asarray(self.ground), jnp.ones((g,), bool), zp,
                jnp.ones((len(no_entry_zones),), bool),
                inflation_distance=p.inflation_radius,
                max_obstacle_distance=p.max_obstacle_distance)
        else:
            self.no_entry_field = None

        # speed-limit layer
        if speed_zones is not None:
            zpts, zspeed = speed_zones
            self.speed_pts = jnp.asarray(np.asarray(zpts, np.float32))
            self.speed_valid = jnp.ones((len(zpts),), bool)
            self.speed_val = jnp.asarray(np.asarray(zspeed, np.float32))
        else:
            self.speed_pts = None

        self.driver = MoveBaseDriver(
            cfg, self.ground, node_weight=node_weight,
            threaded_plan_manager=threaded_plan_manager)
        self.sensor_offset = np.asarray(sensor_offset, np.float32)
        self.gate = FreshnessGate(expected_dt={
            "scan": max(2.0 / p.sensors_collected_frequency,
                        2.0 * p.lidar.expected_sensor_time),
            "odom": 0.5,
        })
        self._last_perception_t = -1e9
        self.composed_dgraph = self.static_dgraph
        self.lethal = None
        from dddmr_navigation_tpu.perception.stitcher import ScanStitcher
        self.stitcher = ScanStitcher(p.lidar.stitcher_num,
                                     pad_to=p.lidar.max_scan_points)

        # depth-camera layer: its own marking grid + dGraph (per-plugin
        # separation like the reference's stacked plugins), cleared by the
        # buffered-frustum test and min-composed below
        self.n_depth_cameras = depth_cameras
        if depth_cameras > 0:
            self.depth_cam = depth_camera_model or CameraModel()
            self.depth_keep_time = depth_keep_time
            self.depth_buffer = init_depth_buffer(
                depth_cameras, depth_buffer_depth, depth_max_points)
            self.depth_marking = init_marking_state(self.spec, self.params, g)
            self._depth_max_points = depth_max_points
            self._jit_depth = jax.jit(self._depth_update_impl)

    # ------------------------------------------------------------------
    def _depth_update_impl(self, marking, buf, now, robot_pos, robot_quat,
                           map_ctx):
        """Depth layer tick — the shared `depth_layer_update` (also the
        fused program's depth stage): clear vs ALL live buffered frustums
        (`depth_camera_layer.cpp:226-456`), mark from the LATEST
        observations only, recompute the layer dGraph. ``map_ctx`` is an
        argument (not a closure constant) so the big map arrays don't ride
        every dispatch."""
        from dddmr_navigation_tpu.perception.depth_camera import (
            depth_layer_update)
        marking2, _latest = depth_layer_update(
            self.spec, self.params, self.depth_cam, marking, buf, now,
            self.depth_keep_time, map_ctx, robot_pos, robot_quat)
        return marking2

    def push_depth_observation(self, cam_idx: int, cam_pos, cam_quat,
                               points, now):
        """Buffer one camera frame (world-frame points), padded to the
        configured size (`bufferCloud`)."""
        pts = np.asarray(points, np.float32)[:self._depth_max_points]
        pad = np.zeros((self._depth_max_points, 3), np.float32)
        pad[:len(pts)] = pts
        mask = np.zeros((self._depth_max_points,), bool)
        mask[:len(pts)] = True
        self.depth_buffer = push_observation(
            self.depth_buffer, cam_idx, jnp.asarray(cam_pos, jnp.float32),
            jnp.asarray(cam_quat, jnp.float32), jnp.asarray(pad),
            jnp.asarray(mask), jnp.asarray(now, jnp.float32))

    def _depth_tick(self, robot_pos, robot_quat, now):
        self.depth_marking = self._jit_depth(
            self.depth_marking, self.depth_buffer,
            jnp.asarray(now, jnp.float32),
            jnp.asarray(robot_pos, jnp.float32),
            jnp.asarray(robot_quat, jnp.float32), self.map_ctx)

    def set_goal(self, goal_pos, now=0.0, goal_quat=None):
        self.driver.set_goal(goal_pos, now=now, goal_quat=goal_quat)

    def set_no_entry_enabled(self, enabled: bool):
        """Runtime zone toggle (`no_entry_layer.cpp` enable/disable)."""
        self.no_entry_enabled = enabled and self.no_entry_field is not None

    def clear_marking(self):
        """`clear_perception_marking` service (`perception_3d_ros.cpp:276`)
        + dGraph reset semantics."""
        g = len(self.ground)
        self.marking = init_marking_state(self.spec, self.params, g)

    def note_odom(self, now):
        self.gate.update("odom", now=now)

    # -- checkpoint/resume (SURVEY.md §5: per-tick pytree snapshot) ------
    def checkpoint_state(self):
        """Snapshot of every dynamic device state: one pytree
        (restore with :meth:`restore_state`); pair with
        `runtime.checkpoint.save_pytree` for on-disk persistence."""
        state = {
            "marking": self.marking,
            "fsm": self.driver.fsm,
            "dgraph": self.driver.dgraph,
        }
        if self.n_depth_cameras > 0:
            state["depth_marking"] = self.depth_marking
            state["depth_buffer"] = self.depth_buffer
        return state

    def restore_state(self, state):
        self.marking = state["marking"]
        self.driver.fsm = state["fsm"]
        self.driver.dgraph = state["dgraph"]
        if self.n_depth_cameras > 0 and "depth_marking" in state:
            self.depth_marking = state["depth_marking"]
            self.depth_buffer = state["depth_buffer"]

    # ------------------------------------------------------------------
    def _observation(self, scan_global: np.ndarray):
        """Aggregated observation: voxel-downsampled transformed scan
        (`multilayer_spinning_lidar.cpp:264-269` local-mode observation),
        padded to the critics' static shape."""
        k = self.cfg.local_planner.max_obstacle_points
        pts = voxel_downsample(scan_global, 0.1) if len(scan_global) else scan_global
        if len(pts) > k:
            stride = int(np.ceil(len(pts) / k))
            pts = pts[::stride][:k]
        obs = np.zeros((k, 3), np.float32)
        obs[:len(pts)] = pts
        mask = np.zeros((k,), bool)
        mask[:len(pts)] = True
        return jnp.asarray(obs), jnp.asarray(mask)

    def tick(self, scan_pts, scan_mask, robot_pos, robot_quat, v, w, now,
             tf_age: float = 0.0, scan_is_global: bool = False):
        """One 10 Hz cycle of the whole vertical.

        Args:
          scan_pts/scan_mask: live lidar sweep in the SENSOR frame
            (robot frame + sensor_offset), or global frame when
            ``scan_is_global``. Pass ``scan_mask.sum()==0`` for a missed
            scan (freshness gate then decays toward
            PERCEPTION_MALFUNCTION).
          tf_age: seconds since the localization TF was updated (>2 s ⇒
            TF_FAIL, `local_planner.cpp:512-515`).
        Returns (vx, wz, decision, done, succeeded).
        """
        robot_pos = np.asarray(robot_pos, np.float32)
        robot_quat_j = jnp.asarray(robot_quat, jnp.float32)
        scan_pts = np.asarray(scan_pts, np.float32)
        scan_mask = np.asarray(scan_mask, bool)

        sensor_pos = robot_pos + np.asarray(
            quat_rotate(robot_quat_j, jnp.asarray(self.sensor_offset)))
        if scan_is_global:
            scan_global = scan_pts
        else:
            # optional stitcher_num sweep accumulation in the sensor frame
            # (`multilayer_spinning_lidar.cpp:177-201`)
            scan_pts, scan_mask = self.stitcher.push(scan_pts, scan_mask)
            scan_global = np.asarray(
                quat_rotate(robot_quat_j[None, :],
                            jnp.asarray(scan_pts))) + sensor_pos[None, :]

        fresh_scan = bool(scan_mask.sum() >= 5)
        if fresh_scan:
            self.gate.update("scan", now=now)
        self.note_odom(now)

        p = self.cfg.perception
        if (fresh_scan and now - self._last_perception_t
                >= 1.0 / p.sensors_collected_frequency):
            self._last_perception_t = now
            self.marking = self._jit_perception(
                self.spec, self.ri_spec, self.params, self.marking,
                self.map_ctx, jnp.asarray(scan_global),
                jnp.asarray(scan_mask), jnp.asarray(robot_pos),
                robot_quat_j, jnp.asarray(sensor_pos), robot_quat_j)

        # --- stacked composition -----------------------------------------
        if self.n_depth_cameras > 0:
            self._depth_tick(robot_pos, robot_quat, now)
        fields = [self.static_dgraph, self.marking.dgraph]
        if self.n_depth_cameras > 0:
            fields.append(self.depth_marking.dgraph)
        if self.no_entry_enabled:
            fields.append(self.no_entry_field)
        self.composed_dgraph = min_dgraph(*fields)
        lethal_pts, lethal_valid = self._jit_lethal(
            jnp.asarray(self.ground), jnp.ones((len(self.ground),), bool),
            self.composed_dgraph)
        self.lethal = (lethal_pts, lethal_valid)
        self.driver.set_dgraph(self.composed_dgraph)
        self.driver.set_lethal(lethal_pts, lethal_valid)

        cap = -1.0
        if self.speed_pts is not None:
            cap = float(speed_limit_at(jnp.asarray(robot_pos), self.speed_pts,
                                       self.speed_valid, self.speed_val))

        obs, obs_mask = self._observation(
            scan_global[scan_mask] if len(scan_global) else scan_global)

        sensor_ok = self.gate.ok(now=now)
        tf_ok = tf_age <= 2.0
        return self.driver.tick(robot_pos, robot_quat_j, v, w, obs, obs_mask,
                                now, sensor_ok=sensor_ok, tf_ok=tf_ok,
                                allowed_max_speed=cap)
