"""MPPI and DDP solvers."""

from autorally_tpu.solver.mppi import MPPISolver, SolveStats
from autorally_tpu.solver.ddp import DDPSolver
from autorally_tpu.solver.ensemble import EnsembleMPPISolver

__all__ = ["MPPISolver", "SolveStats", "DDPSolver", "EnsembleMPPISolver"]
