from streamflow_tpu.convert.torch_import import convert_streamflow_checkpoint

__all__ = ["convert_streamflow_checkpoint"]
