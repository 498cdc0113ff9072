"""Global planning: ground graph, wavefront solvers, LOS gate, DWA
windowed replanning, and the host runtime (the `dddmr_global_planner`
vertical)."""
from dddmr_navigation_tpu.planning.global_.graph import (
    GroundGraph, build_ground_graph, pad_graph)
from dddmr_navigation_tpu.planning.global_.wavefront import (
    node_costs, wavefront_distances, wavefront_distances_turning,
    extract_path, extract_path_turning, theta_reference)
from dddmr_navigation_tpu.planning.global_.los import (
    long_edge_los_mask, lethal_cloud_from_dgraph)
from dddmr_navigation_tpu.planning.global_.planner import (
    GlobalPathResult, plan_on_graph, path_to_poses, post_smooth_path,
    snap_to_ground)
from dddmr_navigation_tpu.planning.global_.runtime import GlobalPlannerRuntime
from dddmr_navigation_tpu.planning.global_.dwa import (
    DWAGlobalPlanManager, CachedPlan, dwa_pivot)

__all__ = [
    "GroundGraph", "build_ground_graph", "pad_graph", "node_costs",
    "wavefront_distances", "wavefront_distances_turning", "extract_path",
    "extract_path_turning", "theta_reference", "long_edge_los_mask",
    "lethal_cloud_from_dgraph", "GlobalPathResult", "plan_on_graph",
    "path_to_poses", "post_smooth_path", "snap_to_ground",
    "GlobalPlannerRuntime", "DWAGlobalPlanManager", "CachedPlan",
    "dwa_pivot",
]
