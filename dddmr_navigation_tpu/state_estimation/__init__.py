"""State estimation: 6DOF Monte-Carlo localization (reference
`dddmr_mcl_3dl`) + 3D odometry fusion (reference `dddmr_odom_3d`)."""
from dddmr_navigation_tpu.state_estimation.pf import (
    PFState, init_particles, predict_diff_drive, measure, bias_weights,
    expectation, expectation_biased, max_particle, resample,
    add_pose_noise, refresh_odom_noise, covariance)
from dddmr_navigation_tpu.state_estimation.likelihood import (
    DistanceField, SubmapContext, build_distance_field, sample_distance,
    sample_nearest_point, build_submap_context, measure_all,
    measure_all_corr)
from dddmr_navigation_tpu.state_estimation.mcl import (
    MCLState, MCLOutput, init_mcl, mcl_update, motion_gate, relative_odom)
from dddmr_navigation_tpu.state_estimation.submaps import (
    PoseGraph, read_pose_graph, write_pose_graph, stitch_submap,
    SubmapManager, transform_keyframe)
from dddmr_navigation_tpu.state_estimation.odom3d import (
    Odom3DState, init_odom3d, odom3d_step, integrate_log)
from dddmr_navigation_tpu.state_estimation.feature_weights import (
    preprocess_features, sharp_feature_weights, voxel_downsample_flat,
    label_clusters, knn_normals)
