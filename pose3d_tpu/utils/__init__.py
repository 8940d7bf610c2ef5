from pose3d_tpu.utils.meters import AverageValueMeter
from pose3d_tpu.utils.logging import TxtLogger, MetricsWriter

__all__ = ["AverageValueMeter", "TxtLogger", "MetricsWriter"]
