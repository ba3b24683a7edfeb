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
