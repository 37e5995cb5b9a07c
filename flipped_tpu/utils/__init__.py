from .metrics import (MetricLogger, SmoothedValue, log_qtype,
                      qtype_frequencies)
from .logging import (is_main_process, save_result, setup_for_distributed,
                      write_log_line)

__all__ = ["MetricLogger", "SmoothedValue", "log_qtype", "qtype_frequencies",
           "is_main_process", "save_result", "setup_for_distributed",
           "write_log_line"]
