from streamflow_tpu.training.loss import sequence_loss, MAX_FLOW
from streamflow_tpu.training.optim import make_optimizer, onecycle_linear

__all__ = ["sequence_loss", "MAX_FLOW", "make_optimizer", "onecycle_linear"]
