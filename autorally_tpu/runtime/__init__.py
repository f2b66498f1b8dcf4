"""Real-time runtime: controller, plants, control loop, telemetry."""

from autorally_tpu.runtime.controller import Controller
from autorally_tpu.runtime.plant import (BasePlant, FullState, SyntheticPlant,
                                         ReplayPlant)
from autorally_tpu.runtime.control_loop import ControlLoopConfig, run_control_loop
from autorally_tpu.runtime.telemetry import (LapStats, StatusMonitor,
                                             TimingStats)

__all__ = [
    "Controller", "BasePlant", "FullState", "SyntheticPlant", "ReplayPlant",
    "ControlLoopConfig", "run_control_loop",
    "LapStats", "StatusMonitor", "TimingStats",
]
