"""Dataset-index and loading semantics on synthetic on-disk fixtures:
window construction (stride, tail dedup markers), KITTI GT flags, mixing."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from streamflow_tpu.data import frame_utils
from streamflow_tpu.data.mf_datasets import (
    KITTIMultiFrame,
    KITTIMultiFrameEval,
    MixedDataset,
    SintelMultiframe,
    SintelMultiframeEval,
)

H, W = 24, 32


def _write_png(path, rng):
    Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def sintel_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sintel")
    rng = np.random.default_rng(0)
    for scene, n in [("alley_1", 7), ("ambush_2", 5)]:
        for ds in ["clean", "final"]:
            d = root / "training" / ds / scene
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                _write_png(d / f"frame_{i + 1:04d}.png", rng)
        fd = root / "training" / "flow" / scene
        fd.mkdir(parents=True, exist_ok=True)
        for i in range(n - 1):
            frame_utils.write_flo(
                fd / f"frame_{i + 1:04d}.flo",
                rng.standard_normal((H, W, 2)).astype(np.float32))
    return str(root)


def test_sintel_train_windows_stride1(sintel_root):
    ds = SintelMultiframe(None, root=sintel_root, dstype="clean", nframes=4)
    # alley_1: 7 frames -> windows at 0,1,2,3 (4); ambush_2: 5 -> 2
    assert len(ds) == 4 + 2
    s = ds.load(0)
    assert s["images"].shape == (4, H, W, 3)
    assert s["flows"].shape == (3, H, W, 2)
    assert s["valids"].shape == (3, H, W)
    assert (s["valids"] == 1).all()


def test_sintel_eval_windows_stride3_dedup(sintel_root):
    ds = SintelMultiframeEval(None, split="training", root=sintel_root,
                              dstype="clean", nframes=4)
    # alley_1 (7): windows at 0, 3 -> covers frames 0-6, no tail
    # ambush_2 (5): windows at 0, then tail at 1 with first 2 pairs dup-marked
    recs = [r for r in ds.records if "alley_1" in r.scene]
    assert len(recs) == 2
    assert recs[1].frame_ids == (3, 4, 5, 6)
    recs2 = [r for r in ds.records if "ambush_2" in r.scene]
    assert len(recs2) == 2
    assert recs2[0].frame_ids == (0, 1, 2, 3)
    assert recs2[1].frame_ids == (-1, -1, 3, 4)


def test_sintel_augmented_load(sintel_root):
    aug = {"crop_size": (16, 24), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": True}
    ds = SintelMultiframe(aug, root=sintel_root, dstype="final", nframes=4)
    s = ds.load(1, np.random.default_rng(3))
    assert s["images"].shape == (4, 16, 24, 3)
    assert s["flows"].shape == (3, 16, 24, 2)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("multi-kitti")
    rng = np.random.default_rng(1)
    img_d = root / "training" / "image_2"
    flow_d = root / "training" / "flow_occ"
    img_d.mkdir(parents=True)
    flow_d.mkdir(parents=True)
    for seq in range(3):
        for i in range(8, 13):  # multi-kitti carries frames around keyframe 10
            _write_png(img_d / f"{seq:06d}_{i:02d}.png", rng)
        frame_utils.write_flow_kitti(
            flow_d / f"{seq:06d}_10.png",
            rng.standard_normal((H, W, 2)).astype(np.float32) * 3)
    return str(root)


def _trim_kitti(ds, n=3):
    ds.records = [r for r in ds.records if int(r.scene[:6]) < n]
    return ds


def test_kitti_t4_gt_flags(kitti_root):
    ds = _trim_kitti(KITTIMultiFrame(kitti_root, "training", None, nframes=4,
                                     t4=True))
    assert len(ds) == 3
    rec = ds.records[0]
    assert rec.frame_ids == (9, 10, 11, 12)
    assert rec.has_gt == (False, True, False)  # only 10->11 supervised
    s = ds.load(0)
    assert (s["valids"][0] == 0).all()
    assert s["valids"][1].sum() > 0
    assert (s["valids"][2] == 0).all()


def test_kitti_eval_final_pair_only(kitti_root):
    ds = _trim_kitti(KITTIMultiFrameEval(kitti_root, "training", nframes=4))
    s = ds.load(1)
    assert s["images"].shape == (4, H, W, 3)
    assert (s["valids"][0] == 0).all() and (s["valids"][1] == 0).all()
    assert s["valids"][2].sum() > 0


def test_mixed_dataset_replication(sintel_root, kitti_root):
    a = SintelMultiframe(None, root=sintel_root, dstype="clean", nframes=4)
    b = _trim_kitti(KITTIMultiFrame(kitti_root, "training", None, nframes=4,
                                    t4=True))
    mix = MixedDataset([(a, 10), (b, 1)])
    assert len(mix) == 10 * len(a) + len(b)
    s = mix.load(len(a) * 10)  # first kitti record
    assert s["frame_ids"][0] == 9


def test_spring_dataset_and_eval(tmp_path):
    """Spring tree: fw+bw both cams, [::2,::2] GT subsample, NaN-invalid,
    scene 0041 val split (reference core/mf_datasets.py:47-324)."""
    import os.path as osp

    from streamflow_tpu.data.mf_datasets import Spring, SpringVal

    rng = np.random.default_rng(5)
    root = tmp_path / "spring" / "train"
    Hs, Ws = 16, 24  # image size; GT is 2x (subsampled back)
    for scene in ["0001", "0041"]:
        for cam in ["left", "right"]:
            d = root / scene / f"frame_{cam}"
            d.mkdir(parents=True)
            for i in range(1, 6):
                _write_png_sized(d / f"frame_{cam}_{i:04d}.png", rng, Hs, Ws)
            for tag, rng_ids in [("FW", range(1, 5)), ("BW", range(5, 1, -1))]:
                fd = root / scene / f"flow_{tag}_{cam}"
                fd.mkdir(parents=True)
                for i in rng_ids:
                    fl = rng.standard_normal((2 * Hs, 2 * Ws, 2)).astype(np.float32)
                    fl[0, 0] = np.nan  # NaN marks invalid GT
                    frame_utils.write_flo5(
                        fd / f"flow_{tag}_{cam}_{i:04d}.flo5", fl)

    ds = Spring(None, str(root), nframes=4, subsample_groundtruth=True,
                split=True)
    # split=True drops 0041; 1 scene x 2 cams x 2 dirs x 2 windows(5 frames,
    # stride 3 -> starts 0 and tail)
    assert all(r.scene.startswith("0001") for r in ds.records)
    s = ds.load(0)
    assert s["images"].shape == (4, Hs, Ws, 3)
    assert s["flows"].shape == (3, Hs, Ws, 2)  # [::2,::2] subsampled
    assert (s["valids"][:, 0, 0] == 0).all()  # NaN -> invalid

    val = SpringVal(str(root), nframes=4)
    assert len(val) > 0
    assert all(r.scene.startswith("0041") for r in val.records)


def _write_png_sized(path, rng, h, w):
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def test_bithings_consistent_bidirectional_augmentation(tmp_path):
    """BiFlyingThings3D: fw and bw flows must receive the SAME augmentation
    draw (repairing the reference's fresh second draw,
    core/mf_datasets.py:583-586). With bw files == fw files, augmented
    flows_bw must equal flows exactly; fetch_dataset('bithings') must load."""
    import numpy as np
    from PIL import Image
    from streamflow_tpu.data import frame_utils
    from streamflow_tpu.data.mf_datasets import (
        BiFlyingThings3DMultiFrame, fetch_dataset)

    rng = np.random.default_rng(0)
    root = tmp_path / "things"
    H, W, N = 96, 128, 5
    for dstype in ["frames_cleanpass", "frames_finalpass"]:
        idir = root / dstype / "TRAIN" / "A" / "0000" / "left"
        idir.mkdir(parents=True)
        for i in range(N):
            Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                            ).save(idir / f"{i:04d}.png")
    fdir = root / "optical_flow" / "TRAIN" / "A" / "0000"
    for sub in ["into_future", "into_past"]:
        (fdir / sub / "left").mkdir(parents=True)
    flows = [rng.standard_normal((H, W, 2)).astype(np.float32) * 3
             for _ in range(N)]
    for i in range(N):
        # identical fields in both directions -> augmented outputs must match
        frame_utils.write_pfm(
            str(fdir / "into_future" / "left" / f"{i:04d}.pfm"),
            np.concatenate([flows[i], np.zeros((H, W, 1), np.float32)], -1))
        frame_utils.write_pfm(
            str(fdir / "into_past" / "left" / f"{i:04d}.pfm"),
            np.concatenate([flows[i - 1], np.zeros((H, W, 1), np.float32)], -1))

    aug = {"crop_size": (64, 96), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": True}
    ds = BiFlyingThings3DMultiFrame(aug, str(root), nframes=4)
    assert len(ds) > 0
    s = ds.load(0, np.random.default_rng(3))
    assert s["images"].shape == (4, 64, 96, 3)
    assert s["flows"].shape == s["flows_bw"].shape == (3, 64, 96, 2)
    # pair p: fw = flow[p], bw file content = flow[p] as well (into_past at
    # p+1 was written as flows[p]) -> identical after the shared aug draw
    np.testing.assert_array_equal(s["flows"], s["flows_bw"])

    mix = fetch_dataset("bithings", T=4, image_size=(64, 96),
                        things_root=str(root))
    assert len(mix) == 2 * len(ds)
    s2 = mix.load(0, np.random.default_rng(5))
    assert "flows_bw" in s2 and "valids_bw" in s2


def test_hue_shift_matches_float_hsv_oracle():
    """Quantify the cv2 180-bin hue shift against an exact float HSV rotation
    (torchvision ``adjust_hue`` semantics — reference core/utils/augmentor.py
    uses torchvision ColorJitter). The only deviation is cv2's uint8 H channel
    (180 bins ~ 2 deg quantization): error must stay at the
    couple-of-intensity-levels scale, i.e. visually and statistically
    negligible for augmentation."""
    from streamflow_tpu.data.augmentor import _adjust_hue

    def hue_oracle(img, shift):
        x = img.astype(np.float64) / 255.0
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        mx, mn = x.max(-1), x.min(-1)
        d = mx - mn
        h = np.zeros_like(mx)
        m = d > 0
        rmax = m & (mx == r)
        gmax = m & (mx == g) & ~rmax
        bmax = m & (mx == b) & ~rmax & ~gmax
        h[rmax] = ((g - b)[rmax] / d[rmax]) % 6
        h[gmax] = (b - r)[gmax] / d[gmax] + 2
        h[bmax] = (r - g)[bmax] / d[bmax] + 4
        h = (h / 6 + shift) % 1.0
        v = mx
        s = np.where(mx > 0, d / np.maximum(mx, 1e-12), 0)
        i = np.floor(h * 6)
        f = h * 6 - i
        p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
        i = i.astype(int) % 6
        out = np.zeros_like(x)
        faces = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v),
                 (v, p, q)]
        for k, (rr, gg, bb) in enumerate(faces):
            mk = i == k
            out[..., 0][mk] = rr[mk]
            out[..., 1][mk] = gg[mk]
            out[..., 2][mk] = bb[mk]
        return (out * 255.0).astype(np.float32)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 128, 3)).astype(np.float32)
    for shift in (-0.159, -0.05, 0.05, 0.159):  # +-0.5/pi = jitter range
        ours = _adjust_hue(img, shift)
        ref = hue_oracle(img, shift)
        d = np.abs(ours - ref)
        assert d.mean() < 2.0, (shift, d.mean())
        assert np.percentile(d, 99) < 12.0, (shift, np.percentile(d, 99))
        assert d.max() < 30.0, (shift, d.max())
