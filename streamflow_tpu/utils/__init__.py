from streamflow_tpu.utils.logger import MetricsLogger, Tee
from streamflow_tpu.utils.profiling import phase_timer, trace_ctx

__all__ = ["MetricsLogger", "Tee", "phase_timer", "trace_ctx"]
