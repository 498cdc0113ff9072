from dddmr_navigation_tpu.perception.voxel import (
    VoxelSpec, world_to_cell, cell_to_world, window_origin_for, in_window,
    scroll_grid)
from dddmr_navigation_tpu.perception.fov import (
    RangeImageSpec, sensor_frame_spherical, in_fov, build_range_image,
    lookup_range)
from dddmr_navigation_tpu.perception.clustering import (
    label_components, cluster_table)
from dddmr_navigation_tpu.perception.static_map import (
    MapContext, build_map_context, ground_height_at, distance_to_ground,
    near_static)
from dddmr_navigation_tpu.perception.marking import (
    MarkingParams, MarkingState, init_marking_state, perception_update,
    clear_marked, mark_scan, update_dgraph)

# NOTE: perception.semantic (the flax net + class-map ingestion) is NOT
# imported here — flax is an optional dependency and the navigation
# verticals must import without it. Use
# `from dddmr_navigation_tpu.perception.semantic import ...` directly.
from dddmr_navigation_tpu.perception import semantic_scene19
