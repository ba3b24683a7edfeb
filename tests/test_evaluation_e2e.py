"""End-to-end eval + submission: synthetic Sintel tree -> validate_sintel()
and create_sintel_submission() with a tiny random model. Checks the dedup
accounting, metric plumbing, and .flo submission layout."""

import os.path as osp
from glob import glob

import jax
import numpy as np
import pytest
from PIL import Image

from streamflow_tpu.config import StreamFlowConfig
from streamflow_tpu.data import frame_utils
from streamflow_tpu.config import RAFTConfig  # noqa
from streamflow_tpu.models import create_model

H, W, T = 64, 96, 4


@pytest.fixture(scope="module")
def sintel_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sintel_e2e")
    rng = np.random.default_rng(0)
    for split, scenes in [("training", ["alley_1"]), ("test", ["temple_1"])]:
        for scene in scenes:
            for ds in ["clean", "final"]:
                d = root / split / ds / scene
                d.mkdir(parents=True, exist_ok=True)
                for i in range(5):
                    Image.fromarray(
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                    ).save(d / f"frame_{i + 1:04d}.png")
            if split == "training":
                fd = root / split / "flow" / scene
                fd.mkdir(parents=True, exist_ok=True)
                for i in range(4):
                    frame_utils.write_flo(
                        fd / f"frame_{i + 1:04d}.flo",
                        rng.standard_normal((H, W, 2)).astype(np.float32))
    return str(root)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = StreamFlowConfig(T=T, iters=2, mixed_precision=False)
    model = create_model("streamflow", cfg=cfg)
    import jax.numpy as jnp

    imgs = jnp.zeros((1, T, H, W, 3))
    params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
        jax.random.PRNGKey(0), imgs)
    return model, params


def test_validate_sintel_runs(sintel_root, model_and_params):
    from streamflow_tpu.evaluation import validate_sintel

    model, params = model_and_params
    res = validate_sintel(model, params, root=sintel_root, iters=2,
                          nframes=T, dstypes=("clean",), progress=False)
    assert set(res) == {"clean_epe", "clean_1px", "clean_3px", "clean_5px"}
    assert np.isfinite(res["clean_epe"])
    # random model vs random GT: epe should be clearly nonzero
    assert res["clean_epe"] > 0.1


def test_sintel_submission_writes_flo(sintel_root, model_and_params, tmp_path):
    from streamflow_tpu.submission import create_sintel_submission

    model, params = model_and_params
    out = tmp_path / "subm"
    create_sintel_submission(model, params, root=sintel_root,
                             output_path=str(out), iters=2, nframes=T,
                             dstypes=("clean",))
    files = sorted(glob(str(out / "clean" / "temple_1" / "*.flo")))
    # 5 frames -> 4 flow fields, each written exactly once
    assert [osp.basename(f) for f in files] == [
        f"frame{i:04d}.flo" for i in range(1, 5)]
    fl = frame_utils.read_flo(files[0])
    assert fl.shape == (H, W, 2)


def test_spring_submission_flo5_numbering(model_and_params, tmp_path):
    """Spring .flo5 numbering must follow the reference's per-scene frame
    ids (FW: first-frame index j+1; BW: len-j — core/mf_datasets.py:63,79),
    not any global record count: regression test for the r1 BW bug."""
    from streamflow_tpu.submission import create_spring_submission

    rng = np.random.default_rng(1)
    root = tmp_path / "spring"
    for scene, n in [("0001", 6), ("0002", 4)]:
        for cam in ["left", "right"]:
            d = root / "test" / scene / f"frame_{cam}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(1, n + 1):
                Image.fromarray(
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                ).save(d / f"frame_{cam}_{i:04d}.png")

    model, params = model_and_params
    out = tmp_path / "subm"
    create_spring_submission(model, params, root=str(root),
                             output_path=str(out), iters=2, nframes=T)

    def nums(scene, tag, cam):
        files = glob(str(out / scene / f"flow_{tag}_{cam}" / "*.flo5"))
        return sorted(int(osp.basename(f)[:-5].split("_")[-1]) for f in files)

    for cam in ["left", "right"]:
        # 6 frames: FW pairs (1..5)->(2..6); BW pairs (6..2)->(5..1)
        assert nums("0001", "FW", cam) == [1, 2, 3, 4, 5]
        assert nums("0001", "BW", cam) == [2, 3, 4, 5, 6]
        # 4 frames: one window each way
        assert nums("0002", "FW", cam) == [1, 2, 3]
        assert nums("0002", "BW", cam) == [2, 3, 4]
    fl = frame_utils.read_flo5(
        str(out / "0001" / "flow_FW_left" / "flow_FW_left_0001.flo5"))
    assert fl.shape == (H, W, 2)


def test_validate_sintel_2f_raft(sintel_root):
    """Two-frame validator drives a RAFT baseline end to end."""
    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.evaluation import validate_sintel_2f

    cfg = RAFTConfig(iters=2, mixed_precision=False)
    model = create_model("raft", cfg=cfg)
    import jax.numpy as jnp

    im = jnp.zeros((1, H, W, 3))
    params = jax.jit(lambda k, a, b: model.init(k, a, b, test_mode=True))(
        jax.random.PRNGKey(0), im, im)
    res = validate_sintel_2f(model, params, root=sintel_root, iters=2,
                             dstypes=("clean",))
    assert np.isfinite(res["clean_epe_2f"]) and res["clean_epe_2f"] > 0.0


@pytest.fixture(scope="module")
def things_root(tmp_path_factory):
    """FlyingThings TEST-split tree (validation split of the reference's
    validate_things, evaluate_mf.py:396-429)."""
    from streamflow_tpu.data import frame_utils

    root = tmp_path_factory.mktemp("things_e2e")
    rng = np.random.default_rng(2)
    for dstype in ["frames_cleanpass", "frames_finalpass"]:
        idir = root / dstype / "TEST" / "A" / "0000" / "left"
        idir.mkdir(parents=True)
        for i in range(5):
            Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                            ).save(idir / f"{i:04d}.png")
    for sub in ["into_future", "into_past"]:
        d = root / "optical_flow" / "TEST" / "A" / "0000" / sub / "left"
        d.mkdir(parents=True)
        for i in range(5):
            frame_utils.write_pfm(
                str(d / f"{i:04d}.pfm"),
                rng.standard_normal((H, W, 3)).astype(np.float32))
    return str(root)


def test_validate_things_mf(things_root, model_and_params):
    from streamflow_tpu.evaluation import validate_things_mf

    model, params = model_and_params
    res = validate_things_mf(model, params, root=things_root, iters=2,
                             nframes=T)
    assert set(res) == {"things_clean_epe", "things_final_epe"}
    assert all(np.isfinite(v) and v > 0.1 for v in res.values())


def test_validate_things_2f(things_root):
    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.evaluation import validate_things

    cfg = RAFTConfig(iters=2, mixed_precision=False)
    model = create_model("raft", cfg=cfg)
    import jax.numpy as jnp

    im = jnp.zeros((1, H, W, 3))
    params = jax.jit(lambda k, a, b: model.init(k, a, b, test_mode=True))(
        jax.random.PRNGKey(0), im, im)
    res = validate_things(model, params, root=things_root, iters=2)
    assert np.isfinite(res["things_clean_epe"])
    assert res["things_final_epe"] > 0.1


def test_validate_sintel_warm(sintel_root, model_and_params):
    """Warm-start validation: forward-interpolated prev-window flow as
    flow_init (repairing the reference's dead evaluate_mf.py:596-632)."""
    from streamflow_tpu.evaluation import validate_sintel_warm

    model, params = model_and_params
    res = validate_sintel_warm(model, params, root=sintel_root, iters=2,
                               nframes=T, dstypes=("clean",), progress=False)
    assert np.isfinite(res["clean_warm_epe"]) and res["clean_warm_epe"] > 0.1
