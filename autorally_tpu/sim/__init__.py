"""Independent physics simulation — the framework's Gazebo stand-in.

The reference validates its controller against Gazebo, a rigid-body
simulator whose vehicle model (wheel contacts, Ackermann steering joints,
effort-controlled axles) shares nothing with the controller's learned
dynamics (``autorally_gazebo/nodes/autorally_controller.py``,
``autorally_description/urdf/autoRallyPlatform.urdf.xacro``).  This
package is that independent oracle: a first-principles four-wheel
vehicle model (tire slip forces, wheel spin dynamics, steering servo,
load transfer, roll) with actuation semantics ported from the Gazebo
controller node — so closed-loop results grade the controller against
physics it has never seen, not against its own model family.
"""

from autorally_tpu.sim.vehicle import (SimState, VehicleParams,
                                       controller_state, init_sim_state,
                                       vehicle_step)
from autorally_tpu.sim.actuation import (ActuationLimits, SimCommand,
                                         SimCommandArbiter, ackermann_angles,
                                         wheel_speeds)
from autorally_tpu.sim.plant import SimVehiclePlant
from autorally_tpu.sim.sensors import (SensorSimConfig, SensorSimulator,
                                       SimVehicleEstimatedPlant)
from autorally_tpu.sim.description import (DEFAULT_URDF, VehicleDescription,
                                           WorldDescription, load_urdf,
                                           load_world,
                                           sensor_config_from_description,
                                           vehicle_params_from_description)

__all__ = [
    "SimState", "VehicleParams", "vehicle_step", "init_sim_state",
    "controller_state", "ActuationLimits", "SimCommand",
    "SimCommandArbiter", "ackermann_angles", "wheel_speeds",
    "SimVehiclePlant", "SensorSimConfig", "SensorSimulator",
    "SimVehicleEstimatedPlant", "DEFAULT_URDF", "VehicleDescription",
    "WorldDescription", "load_urdf", "load_world",
    "sensor_config_from_description", "vehicle_params_from_description",
]
