"""Cost functions and costmap handling for MPPI."""

from autorally_tpu.costs.costmap import Costmap, load_costmap, save_costmap
from autorally_tpu.costs.mppi_cost import MPPICost

__all__ = ["Costmap", "load_costmap", "save_costmap", "MPPICost"]
