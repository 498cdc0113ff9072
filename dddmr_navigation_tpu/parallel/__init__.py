from dddmr_navigation_tpu.parallel.fleet import (
    fleet_tick, make_fleet_mesh, sharded_fleet_tick, FleetState,
    fused_fleet_tick, sharded_fused_fleet_tick,
    FleetFullState, init_fleet_full_state, fleet_full_tick,
    sharded_fleet_full_tick, track_twist, integrate_fleet,
    device_features_from_map)
from dddmr_navigation_tpu.parallel.multihost import (
    initialize_distributed, make_host_mesh, scenario_sharding,
    sharded_fleet_tick_multihost, host_local_batch)
