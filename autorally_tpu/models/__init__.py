"""Dynamics models for the MPPI framework (batched, MXU-friendly)."""

from autorally_tpu.models.base import Dynamics
from autorally_tpu.models.neural_net import NeuralNetDynamics
from autorally_tpu.models.basis_function import BasisFunctionDynamics
from autorally_tpu.models.ensemble import EnsembleDynamics

__all__ = [
    "Dynamics",
    "NeuralNetDynamics",
    "BasisFunctionDynamics",
    "EnsembleDynamics",
]
