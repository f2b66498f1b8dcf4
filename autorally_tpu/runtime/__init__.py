"""Real-time runtime: controller, plants, control loop, vehicle I/O,
telemetry, diagnostics, profiling."""

from autorally_tpu.runtime.controller import Controller
from autorally_tpu.runtime.plant import (BasePlant, FullState, SyntheticPlant,
                                         ReplayPlant)
from autorally_tpu.runtime.control_loop import ControlLoopConfig, run_control_loop
from autorally_tpu.runtime.telemetry import (LapStats, StatusMonitor,
                                             TimingStats)
from autorally_tpu.runtime.diagnostics import Diagnostics, DiagnosticsAggregator
from autorally_tpu.runtime.wheel_odometry import WheelOdometry
from autorally_tpu.runtime.state_estimator import ErrorStateEKF
from autorally_tpu.runtime.profiling import SolveTimer, device_trace
from autorally_tpu.runtime.controllers import (ConstantSpeedController,
                                               GpsWaypointController,
                                               JoystickController,
                                               SafeSpeedGovernor,
                                               ThrottleCalibration)
from autorally_tpu.runtime.system_status import SystemStatusMonitor
from autorally_tpu.runtime.telemetry_bus import (RunstopReceiver,
                                                 TelemetryBus, send_runstop)
from autorally_tpu.runtime.runstop_box import RunStopBox
from autorally_tpu.runtime.vehicle_network import (VehicleNetworkCoordinator,
                                                   VehicleNetworkNode)

__all__ = [
    "Controller", "BasePlant", "FullState", "SyntheticPlant", "ReplayPlant",
    "ControlLoopConfig", "run_control_loop",
    "LapStats", "StatusMonitor", "TimingStats",
    "Diagnostics", "DiagnosticsAggregator", "WheelOdometry",
    "ErrorStateEKF", "SolveTimer", "device_trace",
    "ConstantSpeedController", "GpsWaypointController",
    "JoystickController", "SafeSpeedGovernor", "ThrottleCalibration",
    "SystemStatusMonitor", "TelemetryBus", "RunstopReceiver",
    "send_runstop", "RunStopBox", "VehicleNetworkCoordinator",
    "VehicleNetworkNode",
]
