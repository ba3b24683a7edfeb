"""Golden end-to-end parity against the REFERENCE'S OWN torch code.

Imports /root/reference/core's update.py (SKUpdateBlock_TAM_v3), corr.py
(CorrBlock), gma.py (Attention) and models/streamflow.py (upsample_flow),
instantiates them with seeded random weights, exports the torch state_dict
through convert/torch_import.py, and asserts the jax decoder chain matches to
fp32 tolerance. This is the strongest in-environment correctness proof short
of real released checkpoints (which require network egress): any converter
key-layout bug or layer-semantics drift in the update block / corr lookup /
convex upsample chain fails here.

The reference's TransformerBlock needs two tiny timm modules (timm is not
installed); faithful stand-ins for timm's ViT Attention / Mlp / DropPath are
registered in sys.modules before import. The stand-ins are standard public
definitions, not reference code.
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_CORE = "/root/reference/core"
REF_MODELS = "/root/reference/core/models"


def _install_timm_stub():
    import torch.nn as tnn

    class Attention(tnn.Module):
        """timm.models.vision_transformer.Attention (eval semantics)."""

        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                     attn_drop=0.0, proj_drop=0.0, norm_layer=None):
            super().__init__()
            assert not qk_norm
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, self.head_dim)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            attn = (q * self.scale) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(tnn.Module):
        """timm.models.layers.Mlp (fc1 -> act -> fc2), drop ignored (0)."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=tnn.GELU, drop=0.0, **kw):
            super().__init__()
            hidden_features = hidden_features or in_features
            out_features = out_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    def register_model(fn):
        return fn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Attention = Attention
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.to_2tuple = to_2tuple
    layers.drop_path = drop_path
    layers.trunc_normal_ = trunc_normal_
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = register_model
    # `from timm.layers import ...` (core/extractor.py:7) — same classes
    layers2 = types.ModuleType("timm.layers")
    layers2.DropPath = DropPath
    layers2.Mlp = Mlp
    layers2.to_2tuple = to_2tuple
    timm.models = models
    timm.layers = layers2
    models.vision_transformer = vt
    models.layers = layers
    models.registry = registry
    mods = {"timm": timm, "timm.models": models,
            "timm.models.vision_transformer": vt,
            "timm.models.layers": layers,
            "timm.models.registry": registry,
            "timm.layers": layers2,
            # `from encoders import *` in models/streamflow.py; the classes
            # are only touched via eval(args.Encoder), which we never call.
            "encoders": types.ModuleType("encoders")}
    sys.modules.update(mods)
    return set(mods)


@pytest.fixture(scope="module")
def ref():
    """Reference modules imported flat (they import each other that way)."""
    added = _install_timm_stub()
    flat = ["update", "corr", "gma", "utils", "utils.utils", "streamflow"]
    saved = {m: sys.modules.get(m) for m in flat}
    sys.path[0:0] = [REF_CORE, REF_MODELS]
    try:
        import corr as ref_corr
        import gma as ref_gma
        import streamflow as ref_streamflow
        import update as ref_update

        yield SimpleNamespace(update=ref_update, corr=ref_corr, gma=ref_gma,
                              streamflow=ref_streamflow)
    finally:
        for p in (REF_CORE, REF_MODELS):
            sys.path.remove(p)
        for m in flat:
            if saved[m] is None:
                sys.modules.pop(m, None)
            else:
                sys.modules[m] = saved[m]
        for m in added:
            sys.modules.pop(m, None)


def _ref_args():
    return SimpleNamespace(
        Encoder="Twins_CSC", UpdateBlock="SKUpdateBlock_TAM_v3",
        decoder_dim=256, corr_levels=4, corr_radius=4,
        k_conv=[1, 15], PCUpdater_conv=[1, 7], num_heads=1,
        use_gma=True, T=4)


def _randomize(module, seed):
    """Random weights at fan-in scale: the SK gelu-residual chains amplify
    anything larger into 1e10+ activations, where fp32 association-order
    noise swamps a meaningful tolerance."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            r = torch.randn(p.shape, generator=g)
            if p.ndim >= 2:
                p.copy_(r / (p[0].numel() ** 0.5))
            else:
                p.copy_(0.05 * r)


def _nhwc(t):
    return np.ascontiguousarray(t.detach().permute(0, 2, 3, 1).numpy())


# H, W large enough that the coarsest pyramid level is >= 2x2 (a 1-pixel
# level hits grid_sample's align_corners 1/(W-1) normalization singularity
# in the reference itself).
B, F, H, W, D = 1, 3, 16, 24, 128
CORR_CH = 4 * 9 * 9


@pytest.fixture(scope="module")
def torch_inputs():
    g = torch.Generator().manual_seed(100)

    def r(*shape, s=1.0):
        return s * torch.randn(*shape, generator=g)

    return {
        "nets": torch.tanh(r(B * F, D, H, W)),
        "inps": torch.relu(r(B * F, D, H, W)),
        "corrs": r(B * F, CORR_CH, H, W, s=0.5),
        "flows": r(B * F, 2, H, W),
        "fmap1": r(B * F, 256, H, W, s=0.5),
        "fmap2": r(B * F, 256, H, W, s=0.5),
    }


@pytest.fixture(scope="module")
def oracle(ref, torch_inputs):
    """Reference update block + attention with random weights, plus the
    converted jax params."""
    from streamflow_tpu.convert import convert_streamflow_checkpoint

    args = _ref_args()
    torch.manual_seed(0)
    block = ref.update.SKUpdateBlock_TAM_v3(args).eval()
    att = ref.gma.Attention(args=args, dim=D, heads=args.num_heads,
                            max_pos_size=160, dim_head=D).eval()
    _randomize(block, 1)
    _randomize(att, 2)

    sd = {f"update_block.{k}": v.numpy() for k, v in
          block.state_dict().items()}
    sd.update({f"att.{k}": v.numpy() for k, v in att.state_dict().items()})
    params = convert_streamflow_checkpoint(sd, strict=False)["params"]
    return SimpleNamespace(block=block, att=att, params=params, args=args)


def test_attention_map_matches_reference(oracle, torch_inputs):
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.layers.gma import GMAAttention

    inps = torch_inputs["inps"]
    with torch.no_grad():
        attn_ref = oracle.att(inps).numpy()  # (BF, heads, N, N)

    mod = GMAAttention(heads=1, dim_head=D, mode="full")
    attn_jax = jax.jit(mod.apply)({"params": oracle.params["att"]},
                                  jnp.asarray(_nhwc(inps)))
    np.testing.assert_allclose(np.asarray(attn_jax), attn_ref,
                               atol=2e-5, rtol=1e-4)


def test_update_block_matches_reference(oracle, torch_inputs):
    """Full SKUpdateBlock_TAM_v3 (motion encoder -> GMA aggregate ->
    temporal transformer -> SK-GRU -> joint flow head + mask head) vs the
    reference's own forward with identical (converted) weights."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.layers.update import SKUpdateBlockTAMv3

    ti = torch_inputs
    with torch.no_grad():
        attn = oracle.att(ti["inps"])
        nets_ref, masks_ref, deltas_ref = oracle.block(
            ti["nets"], ti["inps"], ti["corrs"], ti["flows"], attn, T=F)

    mod = SKUpdateBlockTAMv3(
        embed_dim=D, num_frames=F, k_conv=(1, 15), pc_updater_conv=(1, 7),
        num_heads=1, use_gma=True, ratio=8, attn_mode="full", dw_impl="xla")
    jp = {"params": oracle.params["step"]["update_block"]}

    def unflat(t):
        a = _nhwc(t)
        return a.reshape(B, F, H, W, a.shape[-1])

    net_j, mask_j, delta_j = jax.jit(mod.apply)(
        jp, jnp.asarray(unflat(ti["nets"])), jnp.asarray(unflat(ti["inps"])),
        jnp.asarray(unflat(ti["corrs"])), jnp.asarray(unflat(ti["flows"])),
        jnp.asarray(attn.numpy()))

    # reference: nets (BF, D, H, W); masks/deltas (B, F, C, H, W)
    np.testing.assert_allclose(
        np.asarray(net_j).reshape(B * F, H, W, D),
        _nhwc(nets_ref), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(delta_j),
        deltas_ref.permute(0, 1, 3, 4, 2).numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mask_j),
        masks_ref.permute(0, 1, 3, 4, 2).numpy(), atol=5e-5, rtol=1e-4)


def test_update_block_tam_v1_matches_reference(ref, torch_inputs):
    """SKUpdateBlock_TAM (v1, core/update.py:691-735) — identical to v3 but
    with a per-frame flow head — vs our joint_flow_head=False variant with
    converted weights. (The _noinit variant shares v3's graph and key layout
    exactly, so loaded-weight parity is already covered by the v3 test; its
    init behaviour is asserted in test_attention.py.)"""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert import convert_streamflow_checkpoint
    from streamflow_tpu.layers.update import SKUpdateBlockTAMv3

    args = _ref_args()
    args.UpdateBlock = "SKUpdateBlock_TAM"
    torch.manual_seed(0)
    block = ref.update.SKUpdateBlock_TAM(args).eval()
    att = ref.gma.Attention(args=args, dim=D, heads=args.num_heads,
                            max_pos_size=160, dim_head=D).eval()
    _randomize(block, 5)
    _randomize(att, 6)

    sd = {f"update_block.{k}": v.numpy() for k, v in
          block.state_dict().items()}
    sd.update({f"att.{k}": v.numpy() for k, v in att.state_dict().items()})
    params = convert_streamflow_checkpoint(sd, strict=False)["params"]

    ti = torch_inputs
    with torch.no_grad():
        attn = att(ti["inps"])
        nets_ref, masks_ref, deltas_ref = block(
            ti["nets"], ti["inps"], ti["corrs"], ti["flows"], attn, T=F)

    mod = SKUpdateBlockTAMv3(
        embed_dim=D, num_frames=F, k_conv=(1, 15), pc_updater_conv=(1, 7),
        num_heads=1, use_gma=True, ratio=8, attn_mode="full", dw_impl="xla",
        joint_flow_head=False)
    jp = {"params": params["step"]["update_block"]}

    def unflat(t):
        a = _nhwc(t)
        return a.reshape(B, F, H, W, a.shape[-1])

    net_j, mask_j, delta_j = jax.jit(mod.apply)(
        jp, jnp.asarray(unflat(ti["nets"])), jnp.asarray(unflat(ti["inps"])),
        jnp.asarray(unflat(ti["corrs"])), jnp.asarray(unflat(ti["flows"])),
        jnp.asarray(attn.numpy()))

    np.testing.assert_allclose(
        np.asarray(net_j).reshape(B * F, H, W, D),
        _nhwc(nets_ref), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(delta_j),
        deltas_ref.permute(0, 1, 3, 4, 2).numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mask_j),
        masks_ref.permute(0, 1, 3, 4, 2).numpy(), atol=5e-5, rtol=1e-4)


def test_corr_block_matches_reference(ref, torch_inputs):
    """CorrBlock volume+pyramid+lookup vs ops/corr.CorrPyramid at the
    reference's own bilinear_sampler semantics, off-grid coords included."""
    import jax.numpy as jnp

    from streamflow_tpu.ops.corr import CorrPyramid

    f1, f2 = torch_inputs["fmap1"], torch_inputs["fmap2"]
    cb = ref.corr.CorrBlock(f1, f2, num_levels=4, radius=4)

    g = torch.Generator().manual_seed(3)
    ys, xs = torch.meshgrid(torch.arange(H).float(),
                            torch.arange(W).float(), indexing="ij")
    coords = torch.stack([xs, ys])[None].repeat(B * F, 1, 1, 1)
    coords = coords + 3.0 * torch.randn(B * F, 2, H, W, generator=g)
    with torch.no_grad():
        out_ref = cb(coords).numpy()  # (BF, 324, H, W)

    pyr = CorrPyramid.build(jnp.asarray(_nhwc(f1)), jnp.asarray(_nhwc(f2)),
                            num_levels=4, radius=4)
    out_jax = pyr.lookup(jnp.asarray(_nhwc(coords)))
    np.testing.assert_allclose(
        np.asarray(out_jax).transpose(0, 3, 1, 2), out_ref,
        atol=5e-5, rtol=1e-4)


def test_convex_upsample_matches_reference(ref):
    """upsample_flow (F.unfold + softmax mask) vs ops/upsample.convex_upsample
    on the reference's own method (unbound; self unused)."""
    import jax.numpy as jnp

    from streamflow_tpu.ops.upsample import convex_upsample

    g = torch.Generator().manual_seed(4)
    flow = torch.randn(B * F, 2, H, W, generator=g)
    mask = torch.randn(B * F, 9 * 64, H, W, generator=g)
    with torch.no_grad():
        up_ref = ref.streamflow.SKFlow_MF8.upsample_flow(
            None, flow, mask, ratio=8).numpy()

    up_jax = convex_upsample(jnp.asarray(_nhwc(flow)),
                             jnp.asarray(_nhwc(mask)), ratio=8)
    np.testing.assert_allclose(
        np.asarray(up_jax).transpose(0, 3, 1, 2), up_ref,
        atol=1e-5, rtol=1e-5)


def test_decoder_chain_two_iterations_matches_reference(ref, oracle,
                                                        torch_inputs):
    """The full refinement chain, two iterations: corr lookup at the moving
    coords -> update block -> coords update -> final convex upsample. Mirrors
    the reference hot loop (core/models/streamflow.py:130-147) on both sides
    with identical weights and inputs."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.layers.update import SKUpdateBlockTAMv3
    from streamflow_tpu.ops.corr import CorrPyramid
    from streamflow_tpu.ops.coords import coords_grid
    from streamflow_tpu.ops.upsample import convex_upsample

    ti = torch_inputs
    f1, f2 = ti["fmap1"], ti["fmap2"]

    # --- reference side ---
    cb = ref.corr.CorrBlock(f1, f2, num_levels=4, radius=4)
    ys, xs = torch.meshgrid(torch.arange(H).float(),
                            torch.arange(W).float(), indexing="ij")
    coords0 = torch.stack([xs, ys])[None].repeat(B * F, 1, 1, 1)
    coords1 = coords0.clone()
    nets = ti["nets"].clone()
    with torch.no_grad():
        attn = oracle.att(ti["inps"])
        for _ in range(2):
            corrs = cb(coords1)
            flows = coords1 - coords0
            nets, masks, deltas = oracle.block(
                nets, ti["inps"], corrs, flows, attn, T=F)
            coords1 = coords1 + deltas.reshape(B * F, 2, H, W)
        final_ref = ref.streamflow.SKFlow_MF8.upsample_flow(
            None, coords1 - coords0, masks.reshape(B * F, -1, H, W),
            ratio=8).numpy()

    # --- jax side ---
    mod = SKUpdateBlockTAMv3(
        embed_dim=D, num_frames=F, k_conv=(1, 15), pc_updater_conv=(1, 7),
        num_heads=1, use_gma=True, ratio=8, attn_mode="full", dw_impl="xla")
    jp = {"params": oracle.params["step"]["update_block"]}
    pyr = CorrPyramid.build(jnp.asarray(_nhwc(f1)), jnp.asarray(_nhwc(f2)),
                            num_levels=4, radius=4)
    attn_j = jnp.asarray(attn.numpy())
    inp_j = jnp.asarray(_nhwc(ti["inps"])).reshape(B, F, H, W, D)
    net_j = jnp.asarray(_nhwc(ti["nets"])).reshape(B, F, H, W, D)
    c0 = coords_grid(B * F, H, W)
    c1 = c0

    apply = jax.jit(mod.apply)
    for _ in range(2):
        corr_j = pyr.lookup(c1).reshape(B, F, H, W, -1)
        flow_j = (c1 - c0).reshape(B, F, H, W, 2)
        net_j, mask_j, delta_j = apply(jp, net_j, inp_j, corr_j, flow_j,
                                       attn_j)
        c1 = c1 + delta_j.reshape(B * F, H, W, 2)
    final_jax = convex_upsample(
        c1 - c0, np.asarray(mask_j).reshape(B * F, H, W, -1), ratio=8)

    np.testing.assert_allclose(
        np.asarray(final_jax).transpose(0, 3, 1, 2), final_ref,
        atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Full two-frame RAFT model vs the reference's own code (second model family;
# exercises BasicEncoder instance/batch norm semantics, the batch_stats
# converter path, SepConvGRU, FlowHead and the RAFT update block end-to-end).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_raft(ref):
    """Reference extractor + RAFT model, imported flat like the ``ref``
    fixture (the timm stub provides timm.layers for core/extractor.py:7)."""
    sys.path[0:0] = [REF_CORE, REF_MODELS]
    try:
        import extractor as ref_extractor
        import raft as ref_raft_mod
        import raftgma as ref_raftgma_mod
        import sk_decoder as ref_sk_mod

        yield SimpleNamespace(extractor=ref_extractor, raft=ref_raft_mod,
                              raftgma=ref_raftgma_mod, sk=ref_sk_mod)
    finally:
        for p in (REF_CORE, REF_MODELS):
            sys.path.remove(p)
        for m in ("extractor", "raft", "raftgma", "sk_decoder"):
            sys.modules.pop(m, None)


@pytest.mark.slow
@pytest.mark.parametrize("ub", ["raft", "gma", "sk"])
def test_raft_model_matches_reference(ref_raft, ub, monkeypatch):
    """models.RAFT (update_block='raft'/'gma'/'sk') with weights converted by
    convert_raft_checkpoint reproduces the reference RAFT / RAFTGMA /
    SK_Decoder (core/models/raft.py:71-190, raftgma.py, sk_decoder.py:79-209)
    end to end: 2 refinement iterations at 128x192, instance-norm fnet,
    batch-norm cnet with RANDOM running stats (so a stats-mapping bug cannot
    hide behind the 0/1 defaults). SK_Decoder's hard-coded debug-image writes
    (sk_decoder.py:180,189 — a known reference defect) are stubbed out."""
    import argparse

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.convert import convert_raft_checkpoint
    from streamflow_tpu.models.raft import RAFT

    args = argparse.Namespace(
        model_name="raft-oracle", cost_encoder_v1=False, cost_encoder_v2=False,
        cost_encoder_v3=False, mixed_precision=False, dropout=0, num_heads=1,
        UpdateBlock="SKUpdateBlock6_Deep_nopoolres_AllDecoder", use_gma=True,
        decoder_dim=256, k_conv=[1, 15], PCUpdater_conv=[1, 7],
        Encoder="BasicEncoder")
    torch.manual_seed(0)
    if ub == "sk":
        # Two reference defects stubbed/repaired to make its own model run
        # (SURVEY vintage sk_decoder.py): hard-coded debug-image writes
        # (:180,189) and eval-dispatch passing hidden_dim= to an update block
        # whose __init__ doesn't accept it (:95 vs update.py:410).
        monkeypatch.setattr(ref_raft.sk, "vis_featmap", lambda *a, **k: None)
        real_blk = ref_raft.sk.SKUpdateBlock6_Deep_nopoolres_AllDecoder
        monkeypatch.setattr(
            ref_raft.sk, "SKUpdateBlock6_Deep_nopoolres_AllDecoder",
            lambda args, hidden_dim=128: real_blk(args))
        cls = ref_raft.sk.SK_Decoder
    else:
        cls = ref_raft.raft.RAFT if ub == "raft" else ref_raft.raftgma.RAFTGMA
    model = cls(args).eval()
    _randomize(model, 5)
    # randomize BN running stats too (mean ~N(0, 0.1), var in [0.5, 1.5])
    g = torch.Generator().manual_seed(6)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))

    gi = torch.Generator().manual_seed(7)
    h8, w8 = 128, 192
    img1 = (255 * torch.rand(1, 3, h8, w8, generator=gi))
    img2 = (255 * torch.rand(1, 3, h8, w8, generator=gi))
    with torch.no_grad():
        lowres_ref, up_ref = model(img1.clone(), img2.clone(), iters=2,
                                   test_mode=True)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    variables = convert_raft_checkpoint(sd, update_block=ub)

    cfg = RAFTConfig(update_block=ub, mixed_precision=False, iters=2,
                     use_gma=ub == "sk", corr_impl="xla", attn_impl="full")
    jmodel = RAFT(cfg=cfg)
    # converted tree must exactly match the model's own init structure
    init_vars = jax.jit(
        lambda k, a, b: jmodel.init(k, a, b, iters=2, test_mode=True)
    )(jax.random.PRNGKey(0), jnp.asarray(_nhwc(img1)), jnp.asarray(_nhwc(img2)))
    assert (jax.tree_util.tree_structure(init_vars["params"])
            == jax.tree_util.tree_structure(variables["params"]))
    assert (jax.tree_util.tree_structure(init_vars["batch_stats"])
            == jax.tree_util.tree_structure(variables["batch_stats"]))

    lowres_j, up_j = jax.jit(
        lambda v, a, b: jmodel.apply(v, a, b, iters=2, test_mode=True)
    )(variables, jnp.asarray(_nhwc(img1)), jnp.asarray(_nhwc(img2)))

    # the SK gelu-residual chains amplify fp32 reassociation noise on flows
    # spanning O(200); absolute tolerance scaled accordingly for 'sk'
    atol = 2e-2 if ub == "sk" else 2e-4
    np.testing.assert_allclose(
        np.asarray(up_j).transpose(0, 3, 1, 2), up_ref.numpy(),
        atol=atol, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lowres_j).transpose(0, 3, 1, 2), lowres_ref.numpy(),
        atol=atol, rtol=1e-3)

    # warm start: feed the low-res flow back as flow_init on both sides
    # (reference raft.py:157-158)
    with torch.no_grad():
        _, up_ref2 = model(img1.clone(), img2.clone(), iters=1,
                           flow_init=0.5 * lowres_ref, test_mode=True)
    _, up_j2 = jax.jit(
        lambda v, a, b, fi: jmodel.apply(v, a, b, iters=1, flow_init=fi,
                                         test_mode=True)
    )(variables, jnp.asarray(_nhwc(img1)), jnp.asarray(_nhwc(img2)),
      0.5 * lowres_j)
    np.testing.assert_allclose(
        np.asarray(up_j2).transpose(0, 3, 1, 2), up_ref2.numpy(),
        atol=atol, rtol=1e-3)


# ---------------------------------------------------------------------------
# UMT video ViT encoder vs the reference's own code (4-block ViT-B/16 with
# joint space-time attention, q/v-bias attention, tubelet-1 patch embed).
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_umt_encoder_matches_reference(ref, monkeypatch):
    """layers/umt.py::UMT with convert_umt_params weights reproduces the
    reference VisionTransformer (core/encoders/umt.py:209-368) after its
    4-block surgery. The reference constructor hard-loads a checkpoint file
    (umt.py:285-292); torch.load / load_state_dict are stubbed so random
    init survives."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import convert_umt_params
    from streamflow_tpu.layers.umt import UMT

    sys.path[0:0] = ["/root/reference/core/encoders"]
    try:
        import umt as ref_umt
    finally:
        sys.path.remove("/root/reference/core/encoders")
    try:
        monkeypatch.setattr(ref_umt.torch, "load", lambda *a, **k: {})
        monkeypatch.setattr(ref_umt.VisionTransformer, "load_state_dict",
                            lambda self, sd, strict=True: None)
        t, h8, w8 = 2, 64, 96
        torch.manual_seed(0)
        model = ref_umt.VisionTransformer(
            img_size=(h8, w8), patch_size=16, embed_dim=768, depth=12,
            num_heads=12, mlp_ratio=4, qkv_bias=True, all_frames=t,
            norm_layer=_ft.partial(torch.nn.LayerNorm, eps=1e-6)).eval()
        _randomize(model, 8)

        g = torch.Generator().manual_seed(9)
        x = torch.randn(1, t, 3, h8, w8, generator=g)
        with torch.no_grad():
            out_ref = model(x)  # (B, T, C, h, w)

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        variables = convert_umt_params(sd, depth=4)

        jmodel = UMT(depth=4, dtype=None)
        xj = jnp.asarray(x.permute(0, 1, 3, 4, 2).numpy())
        init = jax.jit(jmodel.init)(jax.random.PRNGKey(0), xj)
        assert (jax.tree_util.tree_structure(init["params"])
                == jax.tree_util.tree_structure(variables["params"]))
        out_j = jax.jit(jmodel.apply)(variables, xj)  # (B, T, h, w, C)

        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 1, 4, 2, 3), out_ref.numpy(),
            atol=2e-4, rtol=1e-3)
    finally:
        sys.modules.pop("umt", None)


# ---------------------------------------------------------------------------
# Twins_CSC encoder vs the reference's own code. The reference file
# (core/encoders/twins_csc.py) is its PatchEmbed temporal token grid + model
# surgery + forward; the timm internals it builds on (twins_svt_large:
# LocallyGroupedAttn / GlobalSubSampleAttn / Block / PosConv) are faithful
# stand-ins of the public timm semantics, registered below.
# ---------------------------------------------------------------------------


def _install_twins_stub():
    """timm.models.twins stand-ins + timm.create_model('twins_svt_large'),
    so the reference's own core/encoders/twins_csc.py imports and runs.
    Returns the module names to pop from sys.modules afterwards."""
    import torch.nn as tnn
    import torch.nn.functional as tF

    class LocallyGroupedAttn(tnn.Module):
        """timm LocallyGroupedAttn: windowed MHA over non-overlapping ws x ws
        groups; the grid is zero-padded to window multiples (no mask — timm's
        shipping forward, its masked variant is commented out)."""

        def __init__(self, dim, num_heads=8, attn_drop=0.0, proj_drop=0.0,
                     ws=1):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = tnn.Linear(dim, dim * 3, bias=True)
            self.proj = tnn.Linear(dim, dim)
            self.ws = ws

        def forward(self, x, size):
            B, N, C = x.shape
            H, W = size
            ws, nh = self.ws, self.num_heads
            x = x.view(B, H, W, C)
            pad_r = (ws - W % ws) % ws
            pad_b = (ws - H % ws) % ws
            x = tF.pad(x, (0, 0, 0, pad_r, 0, pad_b))
            _, Hp, Wp, _ = x.shape
            _h, _w = Hp // ws, Wp // ws
            x = x.reshape(B, _h, ws, _w, ws, C).transpose(2, 3)
            qkv = self.qkv(x).reshape(
                B, _h * _w, ws * ws, 3, nh, C // nh).permute(3, 0, 1, 4, 2, 5)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            attn = (attn @ v).transpose(2, 3).reshape(B, _h, _w, ws, ws, C)
            x = attn.transpose(2, 3).reshape(B, _h * ws, _w * ws, C)
            if pad_r > 0 or pad_b > 0:
                x = x[:, :H, :W, :].contiguous()
            return self.proj(x.reshape(B, N, C))

    class GlobalSubSampleAttn(tnn.Module):
        """timm GlobalSubSampleAttn: full-sequence queries against
        sr_ratio-strided-conv subsampled (then LayerNormed) keys/values."""

        def __init__(self, dim, num_heads=8, attn_drop=0.0, proj_drop=0.0,
                     sr_ratio=1):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.q = tnn.Linear(dim, dim, bias=True)
            self.kv = tnn.Linear(dim, dim * 2, bias=True)
            self.proj = tnn.Linear(dim, dim)
            if sr_ratio > 1:
                self.sr = tnn.Conv2d(dim, dim, kernel_size=sr_ratio,
                                     stride=sr_ratio)
                self.norm = tnn.LayerNorm(dim)
            else:
                self.sr = None
                self.norm = None

        def forward(self, x, size):
            B, N, C = x.shape
            nh = self.num_heads
            q = self.q(x).reshape(B, N, nh, C // nh).permute(0, 2, 1, 3)
            if self.sr is not None:
                x = x.permute(0, 2, 1).reshape(B, C, *size)
                x = self.sr(x).reshape(B, C, -1).permute(0, 2, 1)
                x = self.norm(x)
            kv = self.kv(x).reshape(B, -1, 2, nh, C // nh).permute(
                2, 0, 3, 1, 4)
            k, v = kv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class _TwinsPosConv(tnn.Module):
        """timm twins PosConv (PEG): depthwise 3x3 in an nn.Sequential
        (state-dict key 'proj.0') + residual at stride 1."""

        def __init__(self, dim):
            super().__init__()
            self.proj = tnn.Sequential(
                tnn.Conv2d(dim, dim, 3, 1, 1, bias=True, groups=dim))

        def forward(self, x, size):
            B, N, C = x.shape
            feat = x.transpose(1, 2).view(B, C, *size)
            out = self.proj(feat) + feat
            return out.flatten(2).transpose(1, 2)

    class _TwinsBlock(tnn.Module):
        """timm twins Block: pre-norm attn + pre-norm Mlp; even blocks LGA
        (ws=7), odd blocks GSA (ws==1 selects it)."""

        def __init__(self, dim, num_heads, mlp_ratio, sr_ratio, ws):
            super().__init__()
            Mlp = sys.modules["timm.layers"].Mlp
            self.norm1 = tnn.LayerNorm(dim)
            if ws == 1:
                self.attn = GlobalSubSampleAttn(dim, num_heads,
                                                sr_ratio=sr_ratio)
            else:
                self.attn = LocallyGroupedAttn(dim, num_heads, ws=ws)
            self.norm2 = tnn.LayerNorm(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x, size):
            x = x + self.attn(self.norm1(x), size)
            x = x + self.mlp(self.norm2(x))
            return x

    class _TimmPatchEmbed(tnn.Module):
        """timm twins PatchEmbed: strided conv + LayerNorm over tokens. Same
        state-dict keys ('proj', 'norm') as the reference's replacement
        PatchEmbed (twins_csc.py:14-34), which is why one converter table
        serves both Twins_CSC and plain Twins."""

        def __init__(self, patch_size, in_chans, embed_dim):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.proj = tnn.Conv2d(in_chans, embed_dim,
                                   kernel_size=patch_size, stride=patch_size)
            self.norm = tnn.LayerNorm(embed_dim)

        def forward(self, x):
            B, C, H, W = x.shape
            x = self.proj(x).flatten(2).transpose(1, 2)
            x = self.norm(x)
            return x, (H // self.patch_size[0], W // self.patch_size[1])

    class _TwinsSVT(tnn.Module):
        """twins_svt_large skeleton: exactly the attributes / state-dict keys
        the reference surgery touches (twins_csc.py:40-58, twins.py:21-27).
        Stages 3-4 are built with depth 1 (real model: 18, 2) — both
        reference encoders delete them before any use, so only the list
        lengths matter."""

        def __init__(self):
            super().__init__()
            dims, heads = (128, 256, 512, 1024), (4, 8, 16, 32)
            srs, wss, depths = (8, 4, 2, 1), (7, 7, 7, 7), (2, 2, 1, 1)
            self.patch_embeds = tnn.ModuleList([
                _TimmPatchEmbed(ps, ic, d) for ps, ic, d in
                zip((4, 2, 2, 2), (3,) + dims[:3], dims)])
            self.pos_drops = tnn.ModuleList(
                [tnn.Dropout(0.0) for _ in depths])
            self.blocks = tnn.ModuleList([
                tnn.ModuleList([
                    _TwinsBlock(dims[k], heads[k], 4.0, srs[k],
                                1 if i % 2 == 1 else wss[k])
                    for i in range(depths[k])])
                for k in range(4)])
            self.pos_block = tnn.ModuleList([_TwinsPosConv(d) for d in dims])
            self.head = tnn.Linear(dims[-1], 1000)

    def create_model(name, pretrained=False, **kw):
        assert name == "twins_svt_large" and not pretrained
        return _TwinsSVT()

    timm = sys.modules["timm"]
    twins_mod = types.ModuleType("timm.models.twins")
    twins_mod.LocallyGroupedAttn = LocallyGroupedAttn
    twins_mod.GlobalSubSampleAttn = GlobalSubSampleAttn
    twins_mod._TwinsSVT = _TwinsSVT  # exposed for load_state_dict patching
    sys.modules["timm.models.twins"] = twins_mod
    timm.models.twins = twins_mod
    timm.create_model = create_model
    return {"timm.models.twins"}


@pytest.mark.slow
def test_twins_csc_encoder_matches_reference(ref):
    """layers/twins.py::TwinsCSC + the _twins converter table reproduce the
    reference's own Twins_CSC (core/encoders/twins_csc.py:37-85) with
    identical (converted) weights: temporal (H*T, W) token grid, LGA/GSA
    alternation, PEG after block 0, two-stage truncation. Grid sizes are
    chosen NON-divisible by ws=7 so the LGA zero-pad path (the production
    case at 440x1024) is exercised, and H != W to catch axis swaps."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import _apply_table, _twins
    from streamflow_tpu.layers.twins import TwinsCSC

    extra = _install_twins_stub()
    sys.path[0:0] = ["/root/reference/core/encoders"]
    try:
        import twins_csc as ref_twins
    finally:
        sys.path.remove("/root/reference/core/encoders")
    try:
        torch.manual_seed(0)
        enc = ref_twins.Twins_CSC(pretrained=False).eval()
        _randomize(enc, 12)

        t, h, w = 2, 64, 96
        g = torch.Generator().manual_seed(13)
        x = torch.randn(1, t, 3, h, w, generator=g)
        with torch.no_grad():
            out_ref = enc(x)  # (B, T, 256, h/8, w/8)

        sd = {f"fnet.{k}": v.numpy() for k, v in enc.state_dict().items()}
        tree = {}
        _apply_table(tree, sd, _twins("fnet", "fnet"), strict=True)

        jmodel = TwinsCSC(dtype=None)
        xj = jnp.asarray(x.permute(0, 1, 3, 4, 2).numpy())
        init = jax.jit(jmodel.init)(jax.random.PRNGKey(0), xj)
        assert (jax.tree_util.tree_structure(init["params"])
                == jax.tree_util.tree_structure(tree["fnet"]))
        out_j = jax.jit(jmodel.apply)({"params": tree["fnet"]}, xj)

        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 1, 4, 2, 3), out_ref.numpy(),
            atol=2e-4, rtol=1e-3)
    finally:
        sys.modules.pop("twins_csc", None)
        for m in extra:
            sys.modules.pop(m, None)


@pytest.mark.slow
def test_streamflow_full_model_matches_reference(ref, monkeypatch):
    """The COMPLETE flagship model vs the reference's own SKFlow_MF8
    (core/models/streamflow.py:30-149) with identical converted weights:
    Twins_CSC fnet/cnet -> corr pyramids -> GMA attention -> 2 refinement
    iterations -> convex upsample, on the warm-start (flow_init) path so the
    (flows, flows_lowres) return (reference :142-147) is covered too. The
    state_dict goes through convert_streamflow_checkpoint(strict=True) — the
    production converter entry point — so any key-layout drift fails here."""
    import argparse

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.convert import convert_streamflow_checkpoint
    from streamflow_tpu.models.streamflow import StreamFlow

    extra = _install_twins_stub()
    sys.path[0:0] = ["/root/reference/core/encoders"]
    try:
        import twins_csc as ref_twins
    finally:
        sys.path.remove("/root/reference/core/encoders")
    try:
        tw = sys.modules["timm.models.twins"]
        # the args Namespace arrives as Twins_CSC's `pretrained` param
        # (truthy — reference quirk, core/models/streamflow.py:45-46), so the
        # hard-coded checkpoint load must be stubbed out
        monkeypatch.setattr(ref_twins.torch, "load", lambda *a, **k: {})
        monkeypatch.setattr(tw._TwinsSVT, "load_state_dict",
                            lambda self, sd, strict=True: None)
        # `from encoders import *` is stubbed empty; eval('Twins_CSC')
        # resolves in the streamflow module globals
        monkeypatch.setattr(ref.streamflow, "Twins_CSC",
                            ref_twins.Twins_CSC, raising=False)

        t, h, w = 3, 128, 160
        iters = 2
        args = argparse.Namespace(
            Encoder="Twins_CSC", UpdateBlock="SKUpdateBlock_TAM_v3",
            decoder_dim=256, k_conv=[1, 15], PCUpdater_conv=[1, 7],
            num_heads=1, use_gma=True, T=t, mixed_precision=False)
        torch.manual_seed(0)
        model = ref.streamflow.SKFlow_MF8(args).eval()
        _randomize(model, 21)

        g = torch.Generator().manual_seed(22)
        images = [255.0 * torch.rand(1, 3, h, w, generator=g)
                  for _ in range(t)]
        flow_init = [0.5 * torch.randn(1, 2, h // 8, w // 8, generator=g)
                     for _ in range(t - 1)]
        with torch.no_grad():
            flows_ref, lowres_ref = model(
                [im.clone() for im in images], iters=iters,
                flow_init=[fi.clone() for fi in flow_init], test_mode=True)

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        variables = convert_streamflow_checkpoint(sd, strict=True)

        cfg = StreamFlowConfig(
            T=t, mixed_precision=False, corr_impl="xla", attn_impl="full",
            dw_impl="xla", corr_store="fp32")
        jmodel = StreamFlow(cfg=cfg)
        x_j = jnp.asarray(
            torch.stack(images, dim=1).permute(0, 1, 3, 4, 2).numpy())
        fi_j = jnp.asarray(
            torch.stack(flow_init, dim=1).permute(0, 1, 3, 4, 2).numpy())
        flows_j, lowres_j = jax.jit(
            lambda v, a, fi: jmodel.apply(v, a, iters=iters, flow_init=fi,
                                          test_mode=True)
        )(variables, x_j, fi_j)

        flows_ref_np = torch.stack(flows_ref, dim=1).numpy()  # (B,F,2,H,W)
        lowres_ref_np = torch.stack(lowres_ref, dim=1).numpy()
        np.testing.assert_allclose(
            np.asarray(flows_j).transpose(0, 1, 4, 2, 3), flows_ref_np,
            atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(lowres_j).transpose(0, 1, 4, 2, 3), lowres_ref_np,
            atol=2e-3, rtol=1e-3)
    finally:
        sys.modules.pop("twins_csc", None)
        for m in extra:
            sys.modules.pop(m, None)


@pytest.mark.slow
def test_twins_plain_encoder_matches_reference(ref, monkeypatch):
    """layers/twins.py::Twins (per-frame, T folded into batch) vs the
    reference's own plain Twins (core/encoders/twins.py:15-52). The plain
    encoder keeps timm's ORIGINAL PatchEmbeds, whose 'proj'/'norm' key names
    equal the CSC replacement's — the same _twins converter table serves
    both families verbatim."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import _apply_table, _twins
    from streamflow_tpu.layers.twins import Twins

    extra = _install_twins_stub()
    sys.path[0:0] = ["/root/reference/core/encoders"]
    try:
        import twins as ref_twins_plain
    finally:
        sys.path.remove("/root/reference/core/encoders")
    try:
        torch.manual_seed(0)
        enc = ref_twins_plain.Twins(pretrained=False).eval()
        _randomize(enc, 31)

        t, h, w = 2, 64, 96
        g = torch.Generator().manual_seed(32)
        x = torch.randn(1, t, 3, h, w, generator=g)
        with torch.no_grad():
            out_ref = enc(x)  # (B, T, 256, h/8, w/8)

        sd = {f"fnet.{k}": v.numpy() for k, v in enc.state_dict().items()}
        tree = {}
        _apply_table(tree, sd, _twins("fnet", "fnet"), strict=True)

        jmodel = Twins(dtype=None)
        xj = jnp.asarray(x.permute(0, 1, 3, 4, 2).numpy())
        out_j = jax.jit(jmodel.apply)({"params": tree["fnet"]}, xj)

        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 1, 4, 2, 3), out_ref.numpy(),
            atol=2e-4, rtol=1e-3)
    finally:
        sys.modules.pop("twins", None)
        for m in extra:
            sys.modules.pop(m, None)


# ---------------------------------------------------------------------------
# Ablation CNN encoders vs the reference's own extractor.py: Res18_3D
# (temporal-attention residual blocks) and AttnBasicEncoder (layer-2
# self-similarity map). No released checkpoints exist for these, so the
# mapping tables live here rather than in convert/torch_import.py.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_res18_3d_encoder_matches_reference(ref_raft):
    """layers/basic_encoder.py::Res18_3D vs the reference's own Res18_3D
    (core/extractor.py:276-356) with converted weights. Catches the skip-path
    subtlety: the residual bypasses the temporal attention hook (the
    downsample/identity runs on the pre-temporal input, :269-273) — invisible
    to identity-at-init tests because temporal_fc starts at zero."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import (_apply_table, _conv,
                                                     _linear, _ln)
    from streamflow_tpu.layers.basic_encoder import Res18_3D

    t = 3
    torch.manual_seed(0)
    enc = ref_raft.extractor.Res18_3D(
        SimpleNamespace(T=t), norm_fn="instance").eval()
    _randomize(enc, 41)

    g = torch.Generator().manual_seed(42)
    x = torch.randn(1, t, 3, 64, 96, generator=g)
    with torch.no_grad():
        out_ref = torch.cat(enc(x), dim=1).numpy()  # (B, T, 256, h, w)

    rules = _conv("conv1", "conv1") + _conv("conv2", "conv2")
    for i, stride in enumerate((1, 2, 2), start=1):
        for j in range(2):
            bs, bd = f"layer{i}.{j}", f"layer{i}_{j}"
            rules += _ln(f"{bd}/norm0", f"{bs}.norm0")
            rules += [(f"{bd}/temporal_attn/qkv_kernel",
                       f"{bs}.temporal_attn.qkv.weight", "linear"),
                      (f"{bd}/temporal_attn/proj_kernel",
                       f"{bs}.temporal_attn.proj.weight", "linear"),
                      (f"{bd}/temporal_attn/proj_bias",
                       f"{bs}.temporal_attn.proj.bias", "raw")]
            rules += _linear(f"{bd}/temporal_fc", f"{bs}.temporal_fc")
            rules += _conv(f"{bd}/spatial/conv1", f"{bs}.conv1")
            rules += _conv(f"{bd}/spatial/conv2", f"{bs}.conv2")
            if j == 0 and stride != 1:
                rules += _conv(f"{bd}/spatial/downsample",
                               f"{bs}.downsample.0")

    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    tree = {}
    _apply_table(tree, sd, rules, strict=True)

    jmodel = Res18_3D(norm_fn="instance")
    xj = jnp.asarray(x.permute(0, 1, 3, 4, 2).numpy())
    out_j = jax.jit(jmodel.apply)({"params": tree}, xj)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 1, 4, 2, 3), out_ref,
        atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_attn_basic_encoder_matches_reference(ref_raft):
    """layers/basic_encoder.py::AttnBasicEncoder vs the reference's own
    (core/extractor.py:434-511): features for both frames plus the layer-2
    self-similarity softmax of frame 1."""
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import (_apply_table,
                                                     _basic_encoder)
    from streamflow_tpu.layers.basic_encoder import AttnBasicEncoder

    torch.manual_seed(0)
    enc = ref_raft.extractor.AttnBasicEncoder(
        output_dim=128, norm_fn="instance").eval()
    _randomize(enc, 51)

    g = torch.Generator().manual_seed(52)
    img1 = torch.randn(2, 3, 64, 96, generator=g)
    img2 = torch.randn(2, 3, 64, 96, generator=g)
    with torch.no_grad():
        f1_ref, f2_ref, attn_ref = enc([img1, img2])

    rules, stats = _basic_encoder("e", "e", "instance")
    assert not stats  # instance norm carries no running statistics
    sd = {f"e.{k}": v.numpy() for k, v in enc.state_dict().items()}
    tree = {}
    _apply_table(tree, sd, rules, strict=True)

    jmodel = AttnBasicEncoder(output_dim=128, norm_fn="instance")
    xj = jnp.asarray(_nhwc(torch.cat([img1, img2], dim=0)))
    f1_j, f2_j, attn_j = jax.jit(jmodel.apply)({"params": tree["e"]}, xj)

    np.testing.assert_allclose(np.asarray(f1_j).transpose(0, 3, 1, 2),
                               f1_ref.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f2_j).transpose(0, 3, 1, 2),
                               f2_ref.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(attn_j), attn_ref[:, 0].numpy(),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Temporal aggregate variants vs the reference's own gma.py (107-300). These
# are experimental decoder hooks with zero-init gamma gates, so the existing
# identity-at-init tests can't see their attention math; here they run with
# random (non-zero) weights. No released checkpoints use them, so the
# mapping rules live in-test.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_temporal_aggregates_match_reference(ref):
    import jax
    import jax.numpy as jnp

    from streamflow_tpu.convert.torch_import import _apply_table
    from streamflow_tpu.layers import gma as jgma

    bt, f, c, h, w = 2, 2, 128, 8, 12
    n = h * w
    args = SimpleNamespace(no_temporal_project=False, T=f + 1)
    g = torch.Generator().manual_seed(61)

    def softmax_attn(*shape):
        return torch.randn(*shape, generator=g).softmax(dim=-1)

    fmap = torch.randn(bt, c, h, w, generator=g)
    fmap_j = jnp.asarray(_nhwc(fmap))
    attn4 = softmax_attn(bt, 4, n, n)
    tattn4 = softmax_attn(bt, 4, n, n)
    attn1 = softmax_attn(bt, 1, n, n)
    tattn1 = softmax_attn(1, 1, n, n)
    tattn1_b = softmax_attn(bt, 1, n, n)
    attn_joint = softmax_attn(1, 4, f * n, f * n)

    def convert(module, rules):
        sd = {k: v.numpy() for k, v in module.state_dict().items()}
        tree = {}
        _apply_table(tree, sd, rules, strict=True)
        return {"params": tree}

    def check(out_j, out_ref):
        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 3, 1, 2),
            out_ref.detach().numpy(), atol=1e-5, rtol=1e-4)

    # TemporalAggregate (gma.py:107-137)
    torch.manual_seed(0)
    m = ref.gma.TemporalAggregate(args, dim=c, heads=4, dim_head=128).eval()
    _randomize(m, 62)
    with torch.no_grad():
        out_ref = m(tattn4, fmap)
    v = convert(m, [("to_v/kernel", "to_v.weight", "conv"),
                    ("temporal_project/kernel", "temporal_project.weight",
                     "conv"),
                    ("temporal_gamma", "temporal_gamma", "raw")])
    out_j = jax.jit(jgma.TemporalAggregate(heads=4, dim_head=128).apply)(
        v, jnp.asarray(tattn4.numpy()), fmap_j)
    check(out_j, out_ref)

    # SpatioTemporalAggregate (gma.py:140-191). NOTE: the reference class is
    # only runnable when inner_dim == dim — its temporal_project is declared
    # Conv2d(inner_dim, dim) but applied to a dim-channel tensor (:186-189),
    # so any heads*dim_head != dim config crashes in the reference itself.
    torch.manual_seed(0)
    m = ref.gma.SpatioTemporalAggregate(args, dim=c, heads=1,
                                        dim_head=c).eval()
    _randomize(m, 63)
    with torch.no_grad():
        out_ref = m(attn1, tattn1_b, fmap)
    v = convert(m, [("to_v/kernel", "to_v.weight", "conv"),
                    ("temporal_project/kernel", "temporal_project.weight",
                     "conv"),
                    ("gamma", "gamma", "raw"),
                    ("temporal_gamma", "temporal_gamma", "raw")])
    out_j = jax.jit(
        jgma.SpatioTemporalAggregate(heads=1, dim_head=c).apply)(
        v, jnp.asarray(attn1.numpy()), jnp.asarray(tattn1_b.numpy()), fmap_j)
    check(out_j, out_ref)

    # TemporalAttention map (gma.py:195-212)
    torch.manual_seed(0)
    m = ref.gma.TemporalAttention(args, dim=c).eval()
    _randomize(m, 64)
    x5 = torch.randn(1, f, c, h, w, generator=g)
    with torch.no_grad():
        out_ref_map = m(x5)  # (1, 1, n, n)
    v = convert(m, [("to_qk/kernel", "to_qk.weight", "conv")])
    xj = jnp.asarray(x5.permute(0, 1, 3, 4, 2).numpy())
    map_j = jax.jit(jgma.TemporalAttentionMap().apply)(v, xj)
    np.testing.assert_allclose(np.asarray(map_j), out_ref_map.numpy(),
                               atol=1e-5, rtol=1e-4)

    # SpatioTemporalAggregate2 (gma.py:214-256): joint (H, T*W) token grid
    torch.manual_seed(0)
    m = ref.gma.SpatioTemporalAggregate2(args, dim=c, heads=4,
                                         dim_head=128).eval()
    _randomize(m, 65)
    with torch.no_grad():
        out_ref = m(attn_joint, None, fmap)
    v = convert(m, [("to_v/kernel", "to_v.weight", "conv"),
                    ("project/kernel", "project.weight", "conv"),
                    ("gamma", "gamma", "raw")])
    out_j = jax.jit(
        jgma.SpatioTemporalAggregate2(num_frames=f, heads=4,
                                      dim_head=128).apply)(
        v, jnp.asarray(attn_joint.numpy()), fmap_j)
    check(out_j, out_ref)

    # TMMAggregate (gma.py:261-300): channel-concat temporal pass
    torch.manual_seed(0)
    m = ref.gma.TMMAggregate(args, dim=c, heads=1, dim_head=128).eval()
    _randomize(m, 66)
    with torch.no_grad():
        out_ref = m(attn1, tattn1, fmap)
    v = convert(m, [("to_v/kernel", "to_v.weight", "conv"),
                    ("gamma", "gamma", "raw"),
                    ("temporal_gamma", "temporal_gamma", "raw")])
    out_j = jax.jit(
        jgma.TMMAggregate(num_frames=f, heads=1, dim_head=128).apply)(
        v, jnp.asarray(attn1.numpy()), jnp.asarray(tattn1.numpy()), fmap_j)
    check(out_j, out_ref)
