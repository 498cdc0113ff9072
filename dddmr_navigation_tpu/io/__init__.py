from dddmr_navigation_tpu.io.pcd import read_pcd, write_pcd
from dddmr_navigation_tpu.io.maps import (
    flat_ground_map,
    ramp_ground_map,
    corridor_map,
    multi_level_map,
    voxel_downsample,
)
from dddmr_navigation_tpu.io.occupancy import (
    read_pgm,
    occupancy_to_clouds,
    cloud_to_occupancy,
)
