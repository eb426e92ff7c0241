from tpu_collide.sim.integrator import integrate
from tpu_collide.sim.generator import generate_fleet, default_cities
from tpu_collide.sim.traffic import (TrafficMap, RoadSegment, City,
                                     VehicleSimulator, scene_sink)
