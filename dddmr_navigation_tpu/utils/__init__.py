"""Shared utilities: synthetic sensor simulation fixtures."""
from dddmr_navigation_tpu.utils.lidar_sim import BoxWorld, simulate_scan
