from dddmr_navigation_tpu.parallel.fleet import (
    fleet_tick, make_fleet_mesh, sharded_fleet_tick, FleetState)
