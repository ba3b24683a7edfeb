"""PyTorch -> JAX weight conversion for the released StreamFlow checkpoints
(reference checkpoint format: torch.save dict with optional 'model' key and
DataParallel 'module.' prefixes — train_mf.py:207-212, demo.py:388).

The conversion is driven by an explicit mapping table
(dst flax path, src torch key, kind), where kind encodes the layout rule:

  conv    Conv2d (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  linear  Linear (O, I)          -> kernel (I, O)
  raw     copied as-is (biases, LayerNorm scale/bias, gamma)

The table covers the canonical SKFlow_MF8 configuration (Twins_CSC +
SKMotionEncoder6_Deep_nopool_res + SKUpdateBlock_TAM_v3 + GMA, T=4).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# (dst, src, kind)
Rule = Tuple[str, str, str]


def _conv(dst, src) -> List[Rule]:
    return [(f"{dst}/kernel", f"{src}.weight", "conv"),
            (f"{dst}/bias", f"{src}.bias", "raw?")]


def _linear(dst, src) -> List[Rule]:
    return [(f"{dst}/kernel", f"{src}.weight", "linear"),
            (f"{dst}/bias", f"{src}.bias", "raw?")]


def _ln(dst, src) -> List[Rule]:
    return [(f"{dst}/scale", f"{src}.weight", "raw"),
            (f"{dst}/bias", f"{src}.bias", "raw")]


def _sk_block(dst, src, k_conv) -> List[Rule]:
    """PCBlock4_Deep_nopool_res -> SKBlock (layers/sk.py)."""
    rules = _conv(f"{dst}/ffn1_in", f"{src}.ffn1.0")
    rules += _conv(f"{dst}/ffn1_out", f"{src}.ffn1.2")
    for i, k in enumerate(k_conv):
        rules += _conv(f"{dst}/dw{i}_k{k}", f"{src}.conv_list.{i}")
    rules += _conv(f"{dst}/pw", f"{src}.pw")
    rules += _conv(f"{dst}/ffn2_in", f"{src}.ffn2.0")
    rules += _conv(f"{dst}/ffn2_out", f"{src}.ffn2.2")
    return rules


def _twins(dst, src, depths=(2, 2)) -> List[Rule]:
    """Twins_CSC (core/encoders/twins_csc.py) -> TwinsCSC (layers/twins.py)."""
    rules: List[Rule] = []
    for i in range(2):
        rules += _conv(f"{dst}/stages/patch_embed{i}/proj",
                       f"{src}.svt.patch_embeds.{i}.proj")
        rules += _ln(f"{dst}/stages/patch_embed{i}/norm",
                     f"{src}.svt.patch_embeds.{i}.norm")
        rules += _conv(f"{dst}/stages/pos_block{i}/proj",
                       f"{src}.svt.pos_block.{i}.proj.0")
        for j in range(depths[i]):
            bs, bd = f"{src}.svt.blocks.{i}.{j}", f"{dst}/stages/stage{i}_block{j}"
            rules += _ln(f"{bd}/norm1", f"{bs}.norm1")
            rules += _ln(f"{bd}/norm2", f"{bs}.norm2")
            rules += _linear(f"{bd}/mlp/fc1", f"{bs}.mlp.fc1")
            rules += _linear(f"{bd}/mlp/fc2", f"{bs}.mlp.fc2")
            rules += _linear(f"{bd}/attn/proj", f"{bs}.attn.proj")
            if j % 2 == 0:  # LocallyGroupedAttn
                rules += _linear(f"{bd}/attn/qkv", f"{bs}.attn.qkv")
            else:  # GlobalSubSampleAttn
                rules += _linear(f"{bd}/attn/q", f"{bs}.attn.q")
                rules += _linear(f"{bd}/attn/kv", f"{bs}.attn.kv")
                rules += _conv(f"{bd}/attn/sr", f"{bs}.attn.sr")
                rules += _ln(f"{bd}/attn/norm", f"{bs}.attn.norm")
    return rules


def _temporal(dst, src) -> List[Rule]:
    """TemporalLayer2/TransformerBlock (core/update.py:459-513) ->
    layers/temporal.py (note: custom zero-init params, not nn.Dense)."""
    blk = f"{src}.transformer_block"
    return [
        (f"{dst}/block/norm1/scale", f"{blk}.norm1.weight", "raw"),
        (f"{dst}/block/norm1/bias", f"{blk}.norm1.bias", "raw"),
        (f"{dst}/block/norm2/scale", f"{blk}.norm2.weight", "raw"),
        (f"{dst}/block/norm2/bias", f"{blk}.norm2.bias", "raw"),
        (f"{dst}/block/attn/qkv_kernel", f"{blk}.attn.qkv.weight", "linear"),
        (f"{dst}/block/attn/proj_kernel", f"{blk}.attn.proj.weight", "linear"),
        (f"{dst}/block/attn/proj_bias", f"{blk}.attn.proj.bias", "raw"),
        (f"{dst}/block/mlp/fc1_kernel", f"{blk}.mlp.fc1.weight", "linear"),
        (f"{dst}/block/mlp/fc1_bias", f"{blk}.mlp.fc1.bias", "raw"),
        (f"{dst}/block/mlp/fc2_kernel", f"{blk}.mlp.fc2.weight", "linear"),
        (f"{dst}/block/mlp/fc2_bias", f"{blk}.mlp.fc2.bias", "raw"),
    ]


def build_mapping(k_conv: Sequence[int] = (1, 15),
                  pc_updater_conv: Sequence[int] = (1, 7)) -> List[Rule]:
    rules: List[Rule] = []
    rules += _twins("fnet", "fnet")
    rules += _twins("cnet", "cnet")
    rules += _conv("att/to_qk", "att.to_qk")

    ub_s, ub_d = "update_block", "step/update_block"
    enc = f"{ub_s}.encoder"
    rules += _sk_block(f"{ub_d}/encoder/convc1", f"{enc}.convc1", k_conv)
    rules += _sk_block(f"{ub_d}/encoder/convc2", f"{enc}.convc2", k_conv)
    rules += _conv(f"{ub_d}/encoder/convf1", f"{enc}.convf1")
    rules += _sk_block(f"{ub_d}/encoder/convf2", f"{enc}.convf2", k_conv)
    rules += _sk_block(f"{ub_d}/encoder/conv", f"{enc}.conv", k_conv)
    rules += _conv(f"{ub_d}/aggregator/to_v", f"{ub_s}.aggregator.to_v")
    rules += [(f"{ub_d}/aggregator/gamma", f"{ub_s}.aggregator.gamma", "raw")]
    rules += _temporal(f"{ub_d}/transformer_block", f"{ub_s}.transformer_block")
    rules += _sk_block(f"{ub_d}/gru", f"{ub_s}.gru", pc_updater_conv)
    rules += _sk_block(f"{ub_d}/flow_head", f"{ub_s}.flow_head", k_conv)
    rules += _conv(f"{ub_d}/mask/conv1", f"{ub_s}.mask.0")
    rules += _conv(f"{ub_d}/mask/conv2", f"{ub_s}.mask.2")
    return rules


def _bn(dst, src) -> Tuple[List[Rule], List[Rule]]:
    """BatchNorm2d -> flax nn.BatchNorm (anonymous child 'BatchNorm_0' of the
    _Norm wrapper): (weight, bias) into params, running stats into the
    batch_stats collection."""
    params = [(f"{dst}/BatchNorm_0/scale", f"{src}.weight", "raw"),
              (f"{dst}/BatchNorm_0/bias", f"{src}.bias", "raw")]
    stats = [(f"{dst}/BatchNorm_0/mean", f"{src}.running_mean", "raw"),
             (f"{dst}/BatchNorm_0/var", f"{src}.running_var", "raw")]
    return params, stats


def _basic_encoder(dst, src, norm_fn: str) -> Tuple[List[Rule], List[Rule]]:
    """Reference BasicEncoder (core/extractor.py:121-194) ->
    layers/basic_encoder.py::BasicEncoder. InstanceNorm carries no
    parameters (torch affine=False); BatchNorm splits into params+stats."""
    rules = _conv(f"{dst}/conv1", f"{src}.conv1")
    rules += _conv(f"{dst}/conv2", f"{src}.conv2")
    stats: List[Rule] = []

    def norm(d, s):
        if norm_fn == "batch":
            p, st = _bn(d, s)
            rules.extend(p)
            stats.extend(st)

    norm(f"{dst}/norm1", f"{src}.norm1")
    strides = (1, 2, 2)
    for i, stride in enumerate(strides, start=1):
        for j in range(2):
            bs = f"{src}.layer{i}.{j}"
            bd = f"{dst}/layer{i}_{j}"
            rules.extend(_conv(f"{bd}/conv1", f"{bs}.conv1"))
            rules.extend(_conv(f"{bd}/conv2", f"{bs}.conv2"))
            norm(f"{bd}/norm1", f"{bs}.norm1")
            norm(f"{bd}/norm2", f"{bs}.norm2")
            if j == 0 and stride != 1:
                rules.extend(_conv(f"{bd}/downsample", f"{bs}.downsample.0"))
                norm(f"{bd}/norm3", f"{bs}.norm3")
    return rules, stats


def build_raft_mapping(update_block: str = "raft",
                       k_conv: Sequence[int] = (1, 15),
                       pc_updater_conv: Sequence[int] = (1, 7),
                       ) -> Tuple[List[Rule], List[Rule]]:
    """Two-frame baselines: RAFT / RAFT-GMA / SKFlow (reference
    core/models/raft.py:71-190, raftgma.py, sk_decoder.py:79-209):
    BasicEncoder fnet (instance) + cnet (batch) + BasicUpdateBlock /
    GMAUpdateBlock / SKUpdateBlock6_Deep_nopoolres_AllDecoder
    (core/update.py:1932-1953, 2245-2268, 410-448)."""
    rules, stats = _basic_encoder("fnet", "fnet", "instance")
    r2, s2 = _basic_encoder("cnet", "cnet", "batch")
    rules += r2
    stats += s2

    ub_s, ub_d = "update_block", "step/update_block"
    if update_block == "sk":
        enc = f"{ub_s}.encoder"
        rules += _sk_block(f"{ub_d}/encoder/convc1", f"{enc}.convc1", k_conv)
        rules += _sk_block(f"{ub_d}/encoder/convc2", f"{enc}.convc2", k_conv)
        rules += _conv(f"{ub_d}/encoder/convf1", f"{enc}.convf1")
        rules += _sk_block(f"{ub_d}/encoder/convf2", f"{enc}.convf2", k_conv)
        rules += _sk_block(f"{ub_d}/encoder/conv", f"{enc}.conv", k_conv)
        rules += _sk_block(f"{ub_d}/gru", f"{ub_s}.gru", pc_updater_conv)
        rules += _sk_block(f"{ub_d}/flow_head", f"{ub_s}.flow_head", k_conv)
    else:
        for c in ("convc1", "convc2", "convf1", "convf2", "conv"):
            rules += _conv(f"{ub_d}/encoder/{c}", f"{ub_s}.encoder.{c}")
        for tn, jn in (("1", "h"), ("2", "v")):
            for g in ("convz", "convr", "convq"):
                rules += _conv(f"{ub_d}/gru/{g}_{jn}", f"{ub_s}.gru.{g}{tn}")
        rules += _conv(f"{ub_d}/flow_head/conv1", f"{ub_s}.flow_head.conv1")
        rules += _conv(f"{ub_d}/flow_head/conv2", f"{ub_s}.flow_head.conv2")
    rules += _conv(f"{ub_d}/mask/conv1", f"{ub_s}.mask.0")
    rules += _conv(f"{ub_d}/mask/conv2", f"{ub_s}.mask.2")
    if update_block in ("gma", "sk"):
        rules += _conv("att/to_qk", "att.to_qk")
        rules += _conv(f"{ub_d}/aggregator/to_v", f"{ub_s}.aggregator.to_v")
        rules += [(f"{ub_d}/aggregator/gamma", f"{ub_s}.aggregator.gamma",
                   "raw")]
    return rules, stats


def convert_raft_checkpoint(state_dict: Dict[str, np.ndarray],
                            update_block: str = "raft",
                            strict: bool = True, gma: bool = False) -> dict:
    """Flat torch state-dict -> {'params', 'batch_stats'} for models.RAFT
    (update_block='raft' | 'gma' | 'sk'; legacy gma=True implies 'gma').
    Accepts raw or {'model': ...}-wrapped dicts; strips 'module.' prefixes."""
    if gma and update_block == "raft":
        update_block = "gma"
    sd = _strip_wrappers(state_dict)
    rules, stats = build_raft_mapping(update_block=update_block)
    out = {"params": {}, "batch_stats": {}}
    _apply_table(out["params"], sd, rules, strict)
    _apply_table(out["batch_stats"], sd, stats, strict)
    return out


def apply_rule(kind: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if kind == "conv":
        return np.transpose(value, (2, 3, 1, 0))
    if kind == "conv3d_t1":
        # Conv3d with tubelet_size 1 (T kernel dim of extent 1) -> 2D conv
        # kernel: (O, I, 1, kh, kw) -> (kh, kw, I, O)
        return np.transpose(value[:, :, 0], (2, 3, 1, 0))
    if kind == "linear":
        return np.transpose(value, (1, 0))
    return value


def build_umt_mapping(depth: int = 4) -> List[Rule]:
    """UMT video ViT encoder (reference core/encoders/umt.py:209-368, the
    4-block ViT-B/16 surgery) -> layers/umt.py::UMT. The reference's
    Attention keeps separate q_bias/v_bias with k pinned to zero
    (umt.py:69-85); the flax qkv bias is assembled from them by
    convert_umt_params."""
    rules: List[Rule] = [
        ("patch_embed/kernel", "patch_embed.proj.weight", "conv3d_t1"),
        ("patch_embed/bias", "patch_embed.proj.bias", "raw?"),
    ]
    for i in range(depth):
        bs, bd = f"blocks.{i}", f"block{i}"
        rules += _ln(f"{bd}/norm1", f"{bs}.norm1")
        rules += _ln(f"{bd}/norm2", f"{bs}.norm2")
        rules += [(f"{bd}/qkv/kernel", f"{bs}.attn.qkv.weight", "linear")]
        rules += _linear(f"{bd}/proj", f"{bs}.attn.proj")
        rules += _linear(f"{bd}/mlp/fc1", f"{bs}.mlp.fc1")
        rules += _linear(f"{bd}/mlp/fc2", f"{bs}.mlp.fc2")
    return rules


def convert_umt_params(state_dict: Dict[str, np.ndarray], depth: int = 4,
                       prefix: str = "", strict: bool = True) -> dict:
    """Torch UMT/VideoMAE state-dict -> flax params tree for layers/umt.py.
    ``prefix`` addresses a sub-module (e.g. 'fnet.' inside a full model)."""
    sd = _strip_wrappers(state_dict)
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    tree: dict = {}
    _apply_table(tree, sd, build_umt_mapping(depth), strict)
    # qkv bias = [q_bias, zeros, v_bias] (k bias is a softmax no-op, pinned
    # to zero by the reference)
    for i in range(depth):
        qb = sd.get(f"blocks.{i}.attn.q_bias")
        vb = sd.get(f"blocks.{i}.attn.v_bias")
        if qb is None or vb is None:
            if strict:
                raise KeyError(f"checkpoint missing q/v bias for block {i}")
            continue
        qb = np.asarray(qb)
        _set(tree, f"block{i}/qkv/bias",
             np.concatenate([qb, np.zeros_like(qb), np.asarray(vb)]))
    return {"params": tree}


def torch_shape_for(kind: str, flax_shape) -> tuple:
    """Inverse shape rule (used by tests and synthetic checkpoints)."""
    if kind == "conv":
        kh, kw, i, o = flax_shape
        return (o, i, kh, kw)
    if kind == "conv3d_t1":
        kh, kw, i, o = flax_shape
        return (o, i, 1, kh, kw)
    if kind == "linear":
        i, o = flax_shape
        return (o, i)
    return tuple(flax_shape)


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def _strip_wrappers(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unwrap the reference checkpoint format: optional {'model': ...} key and
    DataParallel 'module.' prefixes (train_mf.py:207-212, demo.py:388)."""
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _apply_table(tree: dict, sd: Dict[str, np.ndarray],
                 table: Sequence[Rule], strict: bool) -> None:
    """Apply one mapping table into ``tree``; a trailing '?' on a rule's kind
    marks the source key optional."""
    for dst, src, kind in table:
        optional = kind.endswith("?")
        kind = kind.rstrip("?")
        if src not in sd:
            if optional:
                continue
            if strict:
                raise KeyError(f"checkpoint missing '{src}' (for {dst})")
            continue
        _set(tree, dst, apply_rule(kind, sd[src]))


def convert_streamflow_checkpoint(
    state_dict: Dict[str, np.ndarray],
    k_conv: Sequence[int] = (1, 15),
    pc_updater_conv: Sequence[int] = (1, 7),
    strict: bool = True,
) -> dict:
    """Flat torch state-dict -> flax params for models.StreamFlow. Accepts
    raw or {'model': ...}-wrapped dicts; strips 'module.' prefixes."""
    sd = _strip_wrappers(state_dict)
    tree: dict = {}
    _apply_table(tree, sd, build_mapping(k_conv, pc_updater_conv), strict)
    return {"params": tree}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into numpy arrays (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}
