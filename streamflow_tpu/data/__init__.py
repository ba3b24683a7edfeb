from streamflow_tpu.data import frame_utils
from streamflow_tpu.data.flow_viz import flow_to_image

__all__ = ["frame_utils", "flow_to_image"]
