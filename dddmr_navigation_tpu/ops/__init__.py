"""Pallas TPU kernels for the stack's hot ops, with XLA fallbacks.

The reference's hot loops are KD-tree queries inside per-trajectory /
per-voxel C++ loops (SURVEY.md §3 hot loops #1-#3); here they are fused
device kernels:

  * ``swept_box_hits`` — the collision critic's oriented-cuboid sweep
    (`collision_model.cpp:51-148`) over (samples × steps × obstacles),
  * ``masked_min_distance`` — the ground-node distance-field update
    (`cluster_marking.cpp:49-96`) over (nodes × marked points).

Backend selection: ``backend="auto"`` uses the Pallas kernel on TPU
(probing Mosaic support once) and the XLA composite elsewhere;
``"pallas_interpret"`` forces the interpreter for CPU parity tests.
"""
from dddmr_navigation_tpu.ops.backend import pallas_supported, resolve_backend
from dddmr_navigation_tpu.ops.collision import swept_box_hits
from dddmr_navigation_tpu.ops.distance_field import masked_min_distance
