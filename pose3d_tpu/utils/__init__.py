from pose3d_tpu.utils.meters import AverageValueMeter
from pose3d_tpu.utils.logging import TxtLogger, MetricsWriter
from pose3d_tpu.utils.optim import frozen_tx, count_parameters

__all__ = ["AverageValueMeter", "TxtLogger", "MetricsWriter", "frozen_tx",
           "count_parameters"]
