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


def test_per_pair_warm_start_semantics():
    """The next-window flow_init is built PER PAIR (reference
    evaluate_mf.py:304-305), not a broadcast of the last pair's flow:
    regression test for the r2 broadcast deviation."""
    from streamflow_tpu.ops.warp import per_pair_warm_start

    h, w = 16, 24
    # Constant flow per pair: forward-interpolating a constant field
    # returns (approximately) the same constant in the interior, so the
    # per-pair identity is directly observable.
    consts = [(1.0, 0.0), (0.0, 1.0), (2.0, -1.0)]
    lowres = np.stack([np.full((h, w, 2), 0.0, np.float32) + np.r_[cx, cy]
                       for cx, cy in consts])
    warm = per_pair_warm_start(lowres)
    assert warm.shape == (1, 3, h, w, 2)
    interior = (slice(4, h - 4), slice(4, w - 4))
    for p, (cx, cy) in enumerate(consts):
        np.testing.assert_allclose(warm[0, p][interior][..., 0], cx, atol=1e-5)
        np.testing.assert_allclose(warm[0, p][interior][..., 1], cy, atol=1e-5)
    # and pairs genuinely differ (a broadcast would make them equal)
    assert np.abs(warm[0, 0] - warm[0, 2]).max() > 0.5


def test_model_flow_init_is_per_pair(model_and_params):
    """A flow_init on pair 0 only must move pair 0's low-res output by
    (approximately) that offset relative to zero-init, pair-addressed —
    the model contract the per-pair warm start relies on
    (core/models/streamflow.py:114-115)."""
    import jax.numpy as jnp

    model, params = model_and_params
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 255, (1, T, H, W, 3)), jnp.float32)
    zero = jnp.zeros((1, T - 1, H // 8, W // 8, 2), jnp.float32)
    init = zero.at[:, 0].add(3.0)

    _, low0 = model.apply(params, imgs, iters=0, test_mode=True,
                          flow_init=zero)
    _, low1 = model.apply(params, imgs, iters=0, test_mode=True,
                          flow_init=init)
    d = np.asarray(low1) - np.asarray(low0)
    np.testing.assert_allclose(d[0, 0], 3.0, atol=1e-5)
    np.testing.assert_allclose(d[0, 1:], 0.0, atol=1e-5)


@pytest.fixture(scope="module")
def spring_root(tmp_path_factory):
    """Synthetic Spring train tree: scene 0041 (the val split), both cams,
    FW+BW .flo5 GT at 2x resolution with the TOP HALF NaN (invalid)."""
    root = tmp_path_factory.mktemp("spring_e2e")
    rng = np.random.default_rng(3)
    for cam in ["left", "right"]:
        d = root / "train" / "0041" / f"frame_{cam}"
        d.mkdir(parents=True)
        for i in range(1, 5):
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            ).save(d / f"frame_{cam}_{i:04d}.png")
        for tag, idxs in [("FW", [1, 2, 3]), ("BW", [4, 3, 2])]:
            fd = root / "train" / "0041" / f"flow_{tag}_{cam}"
            fd.mkdir(parents=True)
            for i in idxs:
                gt = rng.standard_normal((2 * H, 2 * W, 2)).astype(np.float32)
                gt[: H] = np.nan
                frame_utils.write_flo5(
                    str(fd / f"flow_{tag}_{cam}_{i:04d}.flo5"), gt)
    return str(root)


def test_validate_spring_masks_invalid(spring_root, model_and_params):
    """spring_epe / spring_1px are computed over VALID (non-NaN GT) pixels
    only — regression test for the r2 nan_to_num deviation (and for the
    reference's own NaN-poisoned epe_all, evaluate_mf.py:74-90)."""
    from streamflow_tpu.data import mf_datasets
    from streamflow_tpu.evaluation import validate_spring

    model, params = model_and_params
    res = validate_spring(model, params, root=spring_root, iters=2,
                          nframes=T, progress=False)
    assert np.isfinite(res["spring_epe"])

    # Independent recompute: run the same model over the same windows and
    # accumulate the valid-masked EPE directly.
    import jax
    import jax.numpy as jnp
    import os.path as osp
    from streamflow_tpu.ops.padding import InputPadder

    ds = mf_datasets.SpringVal(root=osp.join(spring_root, "train"),
                               nframes=T, subsample_groundtruth=True)
    assert len(ds) == 4  # 2 cams x 2 directions, one window each

    @jax.jit
    def fwd(p, x):
        return model.apply(p, x, iters=2, test_mode=True)

    vals = []
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="sintel")
        flows = np.asarray(padder.unpad(fwd(params, jnp.asarray(
            padder.pad(imgs)))))[0]
        for p in range(T - 1):
            if s["frame_ids"][p] == -1:
                continue
            gt = s["flows"][p]
            valid = ~np.isnan(gt.sum(-1))
            assert valid.any() and not valid.all()
            epe = np.sqrt(((flows[p] - np.nan_to_num(gt)) ** 2).sum(-1))
            vals.append(epe[valid].reshape(-1))
    expected = float(np.concatenate(vals).mean())
    np.testing.assert_allclose(res["spring_epe"], expected, rtol=1e-6)
