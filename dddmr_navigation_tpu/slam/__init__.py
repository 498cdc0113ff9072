"""SLAM: lidar odometry + mapping (reference `dddmr_lego_loam`)."""
from dddmr_navigation_tpu.slam.projection import (
    RangeImage, project, project_scan, mark_ground, segment_image)
from dddmr_navigation_tpu.slam.features import (
    FeatureSet, extract_features, smoothness, occlusion_mask)
from dddmr_navigation_tpu.slam.scan_matching import (
    match_scans, match_to_map, icp_point2point)
from dddmr_navigation_tpu.slam.pose_graph import (
    PoseGraphArrays, empty_graph, add_node, add_edge,
    optimize_pose_graph, detect_loop_candidate)
from dddmr_navigation_tpu.slam.pipeline import MappingSession
from dddmr_navigation_tpu.slam.editor import GraphEditor
