"""Weight-converter structural test: fabricate a torch-layout state dict from
the converter's own mapping table, convert, and check it reproduces the
model's true parameter tree (paths, shapes, transposed values)."""

import jax
import jax.numpy as jnp
import numpy as np

from streamflow_tpu.config import StreamFlowConfig
from streamflow_tpu.convert import convert_streamflow_checkpoint
from streamflow_tpu.convert.torch_import import (
    apply_rule,
    build_mapping,
    torch_shape_for,
)
from streamflow_tpu.models import create_model


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def test_converter_covers_model_params_exactly():
    cfg = StreamFlowConfig(T=4, iters=1, mixed_precision=False)
    model = create_model("streamflow", cfg=cfg)
    imgs = jnp.zeros((1, 4, 64, 96, 3))
    ref = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
        jax.random.PRNGKey(0), imgs
    )
    want = _flatten(ref["params"])

    rules = build_mapping()
    rng = np.random.default_rng(0)

    sd = {}
    by_dst = {}
    for dst, src, kind in rules:
        kind_c = kind.rstrip("?")
        if dst not in want:
            assert kind.endswith("?"), f"converter writes unknown path {dst}"
            continue
        sd[src] = rng.standard_normal(
            torch_shape_for(kind_c, want[dst].shape)).astype(np.float32)
        by_dst[dst] = (src, kind_c)

    # Every model parameter must be covered by a rule.
    missing = sorted(set(want) - set(by_dst))
    assert not missing, f"converter misses {len(missing)} params: {missing[:6]}"

    got = _flatten(convert_streamflow_checkpoint(sd)["params"])
    assert set(got) == set(want)
    for dst, (src, kind) in by_dst.items():
        assert got[dst].shape == want[dst].shape, dst
        np.testing.assert_array_equal(got[dst], apply_rule(kind, sd[src]))


def test_converter_strips_module_prefix_and_model_key():
    rules = build_mapping()
    rng = np.random.default_rng(1)
    # minimal: just check one known param routes through wrappers
    dst, src, kind = next(r for r in rules if r[2] == "conv")
    sd = {f"module.{src}": rng.standard_normal((8, 3, 4, 4)).astype(np.float32)}
    out = convert_streamflow_checkpoint({"model": sd}, strict=False)
    flat = _flatten(out["params"])
    assert dst in flat and flat[dst].shape == (4, 4, 3, 8)


def test_raft_converter_covers_model_variables_exactly():
    """build_raft_mapping covers every params AND batch_stats leaf of
    models.RAFT (update_block='gma' is the superset graph)."""
    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.convert import convert_raft_checkpoint
    from streamflow_tpu.convert.torch_import import build_raft_mapping

    cfg = RAFTConfig(update_block="gma", mixed_precision=False, iters=1,
                     corr_impl="xla", attn_impl="full")
    model = create_model("raft", cfg=cfg)
    img = jnp.zeros((1, 64, 96, 3))
    ref = jax.jit(lambda k, a, b: model.init(k, a, b, iters=1,
                                             test_mode=True))(
        jax.random.PRNGKey(0), img, img)

    rules, stats = build_raft_mapping(update_block="gma")
    rng = np.random.default_rng(0)
    sd = {}
    covered = {"params": {}, "batch_stats": {}}
    for coll, table in (("params", rules), ("batch_stats", stats)):
        want = _flatten(ref[coll])
        for dst, src, kind in table:
            kind_c = kind.rstrip("?")
            if dst not in want:
                assert kind.endswith("?"), (
                    f"converter writes unknown path {coll}/{dst}")
                continue
            sd[src] = rng.standard_normal(
                torch_shape_for(kind_c, want[dst].shape)).astype(np.float32)
            covered[coll][dst] = src
        missing = sorted(set(want) - set(covered[coll]))
        assert not missing, f"{coll}: misses {missing[:6]}"

    out = convert_raft_checkpoint(sd, update_block="gma")
    for coll in ("params", "batch_stats"):
        assert set(_flatten(out[coll])) == set(_flatten(ref[coll]))


def test_convert_cli_roundtrip(tmp_path):
    """tools/convert.py: .pth (torch.save, module.-prefixed, 'model'-wrapped)
    -> .npz -> load_variables_npz gives an applyable variables dict."""
    import subprocess
    import sys

    import torch

    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.convert.torch_import import (
        build_raft_mapping,
        torch_shape_for,
    )
    from streamflow_tpu.models import create_model as _cm
    from streamflow_tpu.training.checkpoint import load_variables_npz

    cfg = RAFTConfig(update_block="raft", mixed_precision=False, iters=1,
                     corr_impl="xla", attn_impl="full")
    model = _cm("raft", cfg=cfg)
    img = jnp.zeros((1, 64, 96, 3))
    ref = jax.jit(lambda k, a, b: model.init(k, a, b, iters=1,
                                             test_mode=True))(
        jax.random.PRNGKey(0), img, img)

    rng = np.random.default_rng(1)
    rules, stats = build_raft_mapping(update_block="raft")
    sd = {}
    for coll, table in (("params", rules), ("batch_stats", stats)):
        want = _flatten(ref[coll])
        for dst, src, kind in table:
            if dst not in want:
                continue
            shape = torch_shape_for(kind.rstrip("?"), want[dst].shape)
            if dst.endswith("/var"):
                arr = 0.5 + rng.random(shape)  # variances must be positive
            else:
                arr = 0.1 * rng.standard_normal(shape)
            sd["module." + src] = torch.from_numpy(arr.astype(np.float32))
    pth = tmp_path / "raft.pth"
    torch.save({"model": sd, "total_steps": 7}, pth)

    out = tmp_path / "raft.npz"
    import pathlib

    repo_root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo_root / "tools" / "convert.py"),
         "--pth", str(pth), "--out", str(out), "--model", "raft"],
        capture_output=True, text=True, cwd=repo_root)
    assert r.returncode == 0, r.stderr[-2000:]

    variables = load_variables_npz(str(out))
    assert set(variables) == {"params", "batch_stats"}
    y_low, y_up = jax.jit(
        lambda v, a, b: model.apply(v, a, b, iters=1, test_mode=True)
    )(variables, img, img)
    assert np.isfinite(np.asarray(y_up)).all()
