"""Model registry: named constructors replace the reference's
``eval(args.model_name)`` dispatch (core/models/streamflow.py:45-47)."""

from streamflow_tpu.config import RAFTConfig, StreamFlowConfig
from streamflow_tpu.models.raft import RAFT
from streamflow_tpu.models.streamflow import StreamFlow

_REGISTRY = {
    # multi-frame flagship (reference SKFlow_MF8)
    "streamflow": lambda cfg=None, **kw: StreamFlow(cfg=cfg or StreamFlowConfig(**kw)),
    # two-frame baselines
    "raft": lambda cfg=None, **kw: RAFT(cfg=cfg or RAFTConfig(update_block="raft", **kw)),
    "raft_gma": lambda cfg=None, **kw: RAFT(cfg=cfg or RAFTConfig(update_block="gma", **kw)),
    "skflow": lambda cfg=None, **kw: RAFT(
        cfg=cfg or RAFTConfig(update_block="sk", use_gma=True, **kw)
    ),
}


def create_model(name: str, cfg=None, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg=cfg, **kwargs)


def available_models():
    return sorted(_REGISTRY)


__all__ = ["StreamFlow", "RAFT", "create_model", "available_models"]
