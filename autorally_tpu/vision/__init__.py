"""Camera subsystem: auto exposure/gain balance, hardware trigger link,
and the image republisher (the ``autorally_core`` camera stack role)."""

from autorally_tpu.vision.auto_balance import (AutoBalanceConfig,
                                               CameraAutoBalance,
                                               SimulatedCamera,
                                               luminance_histogram, msv)
from autorally_tpu.vision.camera_trigger import CameraTrigger
from autorally_tpu.vision.image_republisher import ImageRepublisher
from autorally_tpu.vision.overhead import (OverheadClient,
                                           OverheadDetection,
                                           OverheadPoseBridge,
                                           SyntheticOverheadCamera)

__all__ = ["AutoBalanceConfig", "CameraAutoBalance", "SimulatedCamera",
           "luminance_histogram", "msv", "CameraTrigger",
           "ImageRepublisher", "OverheadClient", "OverheadDetection",
           "OverheadPoseBridge", "SyntheticOverheadCamera"]
