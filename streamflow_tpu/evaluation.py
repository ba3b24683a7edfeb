"""Dataset validators (reference evaluate_mf.py): Sintel clean/final EPE +
threshold metrics, KITTI EPE + F1-all, Spring EPE + 1px by speed band, with
the tail-window dedup (-1 frame ids) exactly as the reference counts them.

TPU notes: one jitted forward per padded-shape bucket (static shapes keep the
jit cache warm across a whole dataset — every Sintel frame is 436x1024, every
KITTI eval frame is padded to one of the fixed kitti buckets). Per-pair EPE
reductions run on-device; only scalars come back to the host.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamflow_tpu.data import mf_datasets
from streamflow_tpu.ops.padding import InputPadder


class JittedForward:
    """Shape-bucketed jitted test-mode forward of a (model, params) pair."""

    def __init__(self, model, params, iters: int):
        self.model = model
        self.params = params
        self.iters = iters
        self._cache: Dict = {}

    def __call__(self, images: jax.Array) -> jax.Array:
        key = images.shape
        if key not in self._cache:
            it = self.iters

            @jax.jit
            def fwd(params, x):
                return self.model.apply(params, x, iters=it, test_mode=True)

            self._cache[key] = fwd
        return self._cache[key](self.params, images)


def _epe_map(flow, gt):
    return np.sqrt(((flow - gt) ** 2).sum(-1))


def validate_sintel(model, params, root="datasets/sintel", iters=15,
                    nframes=4, dstypes=("clean", "final"),
                    progress: bool = True) -> Dict[str, float]:
    """Reference validate_sintel_mf (evaluate_mf.py:469-503)."""
    fwd = JittedForward(model, params, iters)
    results = {}
    for dstype in dstypes:
        ds = mf_datasets.SintelMultiframeEval(split="training", dstype=dstype,
                                              root=root, nframes=nframes)
        epes = []
        t0 = time.time()
        for i in range(len(ds)):
            s = ds.load(i)
            imgs = s["images"][None]  # (1, T, H, W, 3)
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            flows = fwd(jnp.asarray(padder.pad(imgs)))
            flows = np.asarray(padder.unpad(flows))[0]
            for p in range(nframes - 1):
                if s["frame_ids"][p] != -1:
                    epes.append(_epe_map(flows[p], s["flows"][p]).reshape(-1))
            if progress and i % 50 == 0:
                print(f"  sintel-{dstype} {i}/{len(ds)} "
                      f"({time.time() - t0:.1f}s)", flush=True)
        epe_all = np.concatenate(epes)
        results[f"{dstype}_epe"] = float(epe_all.mean())
        results[f"{dstype}_1px"] = float((epe_all < 1).mean())
        results[f"{dstype}_3px"] = float((epe_all < 3).mean())
        results[f"{dstype}_5px"] = float((epe_all < 5).mean())
        print(f"Validation ({dstype}) EPE: {results[f'{dstype}_epe']:.4f}, "
              f"1px: {results[f'{dstype}_1px']:.4f}, "
              f"3px: {results[f'{dstype}_3px']:.4f}, "
              f"5px: {results[f'{dstype}_5px']:.4f}")
    return results


def validate_sintel_warm(model, params, root="datasets/sintel", iters=15,
                         nframes=4, dstypes=("clean", "final"), ratio=8,
                         progress: bool = True) -> Dict[str, float]:
    """Warm-start Sintel validation: each window is initialized with the
    forward-interpolated low-res flow of the previous window in the same
    scene (the submission-side warm start, evaluate_mf.py:288-322, applied
    to the training split — the reference's own eval-side warm function is
    dead code with undefined variables, evaluate_mf.py:596-632; repaired
    here rather than replicated)."""
    from streamflow_tpu.ops.warp import per_pair_warm_start

    cache: Dict = {}

    def fwd(images, flow_init):
        key = images.shape
        if key not in cache:
            @jax.jit
            def f(p, x, fi):
                return model.apply(p, x, iters=iters, test_mode=True,
                                   flow_init=fi)

            cache[key] = f
        return cache[key](params, images, flow_init)

    results = {}
    for dstype in dstypes:
        ds = mf_datasets.SintelMultiframeEval(split="training", dstype=dstype,
                                              root=root, nframes=nframes)
        epes = []
        prev_scene, warm = None, None
        for i in range(len(ds)):
            rec = ds.records[i]
            s = ds.load(i)
            imgs = s["images"][None]
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            ph, pw = padder.padded_shape
            if rec.scene != prev_scene or warm is None:
                warm = np.zeros((1, nframes - 1, ph // ratio, pw // ratio, 2),
                                np.float32)
            flows, lowres = fwd(jnp.asarray(padder.pad(imgs)),
                                jnp.asarray(warm))
            flows = np.asarray(padder.unpad(flows))[0]
            warm = per_pair_warm_start(np.asarray(lowres)[0])
            prev_scene = rec.scene
            for p in range(nframes - 1):
                if s["frame_ids"][p] != -1:
                    epes.append(_epe_map(flows[p], s["flows"][p]).reshape(-1))
            if progress and i % 50 == 0:
                print(f"  sintel-warm-{dstype} {i}/{len(ds)}", flush=True)
        epe_all = np.concatenate(epes)
        results[f"{dstype}_warm_epe"] = float(epe_all.mean())
        results[f"{dstype}_warm_1px"] = float((epe_all < 1).mean())
        print(f"Validation warm ({dstype}) EPE: "
              f"{results[f'{dstype}_warm_epe']:.4f}")
    return results


def validate_kitti(model, params, multi_root="datasets/multi-kitti", iters=15,
                   nframes=4) -> Dict[str, float]:
    """Reference validate_kitti_mf (evaluate_mf.py:107-142):
    F1-all = mean over valid px of (epe > 3 AND epe/mag > 0.05)."""
    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.KITTIMultiFrameEval(multi_root=multi_root,
                                         split="training", nframes=nframes)
    epe_list, out_list = [], []
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="kitti")
        flows = fwd(jnp.asarray(padder.pad(imgs)))
        flows = np.asarray(padder.unpad(flows))[0]
        p = nframes - 2  # final pair carries the GT
        gt, valid = s["flows"][p], s["valids"][p] >= 0.5
        epe = _epe_map(flows[p], gt).reshape(-1)
        mag = np.sqrt((gt ** 2).sum(-1)).reshape(-1)
        v = valid.reshape(-1)
        out = (epe > 3.0) & ((epe / np.maximum(mag, 1e-12)) > 0.05)
        epe_list.append(epe[v].mean())
        out_list.append(out[v])
    epe = float(np.mean(epe_list))
    f1 = float(100 * np.concatenate(out_list).mean())
    print(f"Validation KITTI: {epe:.4f}, {f1:.4f}")
    return {"kitti_epe": epe, "kitti_f1": f1}


def validate_spring(model, params, root="datasets/spring", iters=15,
                    nframes=4, progress: bool = True) -> Dict[str, float]:
    """Reference validate_spring_mf (evaluate_mf.py:51-102): NaN GT marks
    invalid pixels; 1px outlier rates split by speed band."""
    import os.path as osp

    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.SpringVal(root=osp.join(root, "train"), nframes=nframes,
                               subsample_groundtruth=True)
    epes, e10, e10_40, e40 = [], [], [], []
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="sintel")
        flows = fwd(jnp.asarray(padder.pad(imgs)))
        flows = np.asarray(padder.unpad(flows))[0]
        for p in range(nframes - 1):
            if s["frame_ids"][p] == -1:
                continue
            gt = s["flows"][p]
            valid = ~np.isnan(gt.sum(-1))
            mag = np.sqrt((np.nan_to_num(gt) ** 2).sum(-1))
            epe = _epe_map(flows[p], np.nan_to_num(gt))
            # Headline EPE/1px over VALID pixels only. Deviation from the
            # reference (evaluate_mf.py:74-90), whose unmasked mean lets the
            # NaN GT poison epe_all; counting pred magnitude against zeroed
            # GT would be equally wrong. Speed-band metrics below already
            # mask. Documented in PARITY.md.
            epes.append(epe[valid].reshape(-1))
            e10.append(epe[valid & (mag < 10)].reshape(-1))
            e10_40.append(epe[valid & (mag >= 10) & (mag < 40)].reshape(-1))
            e40.append(epe[valid & (mag >= 40)].reshape(-1))
        if progress and i % 20 == 0:
            print(f"  spring {i}/{len(ds)}", flush=True)
    epe_all = np.concatenate(epes)

    def _rate(parts):
        v = np.concatenate(parts)
        return float((v > 1).mean()) if v.size else float("nan")

    res = {
        "spring_epe": float(epe_all.mean()),
        "spring_1px": float((epe_all > 1).mean()),
        "spring_1px_s0_10": _rate(e10),
        "spring_1px_s10_40": _rate(e10_40),
        "spring_1px_s40": _rate(e40),
    }
    print(f"Spring EPE: {res['spring_epe']:.4f}, 1px: {res['spring_1px']:.4f} "
          f"(s0-10 {res['spring_1px_s0_10']:.4f}, "
          f"s10-40 {res['spring_1px_s10_40']:.4f}, "
          f"s40+ {res['spring_1px_s40']:.4f})")
    return res


class JittedForward2F:
    """Shape-bucketed jitted forward for the two-frame baselines (RAFT/GMA/
    SKFlow), returning the upsampled final flow."""

    def __init__(self, model, params, iters: int):
        self.model = model
        self.params = params
        self.iters = iters
        self._cache: Dict = {}

    def __call__(self, im1, im2):
        key = im1.shape
        if key not in self._cache:
            it = self.iters

            @jax.jit
            def fwd(params, a, b):
                _, up = self.model.apply(params, a, b, iters=it,
                                         test_mode=True)
                return up

            self._cache[key] = fwd
        return self._cache[key](self.params, im1, im2)


def validate_chairs(model, params, root="datasets/FlyingChairs_release/data",
                    iters=24) -> Dict[str, float]:
    """Two-frame FlyingChairs validation split (reference validate_chairs,
    evaluate_mf.py:375-400)."""
    from streamflow_tpu.data.datasets import FlyingChairs

    fwd = JittedForward2F(model, params, iters)
    ds = FlyingChairs(None, split="validation", root=root)
    epes = []
    for i in range(len(ds)):
        s = ds.load(i)
        im1 = jnp.asarray(s["images"][0][None], jnp.float32)
        im2 = jnp.asarray(s["images"][1][None], jnp.float32)
        flow = np.asarray(fwd(im1, im2))[0]
        epes.append(_epe_map(flow, s["flows"][0]).reshape(-1))
    epe = float(np.concatenate(epes).mean())
    print(f"Validation Chairs EPE: {epe:.4f}")
    return {"chairs_epe": epe}


def validate_things(model, params, root="datasets/flyingthings3d",
                    iters=24) -> Dict[str, float]:
    """Two-frame FlyingThings validation (TEST) split, clean+final
    (reference validate_things, evaluate_mf.py:396-429)."""
    from streamflow_tpu.data.datasets import FlyingThings3D

    fwd = JittedForward2F(model, params, iters)
    results = {}
    for dstype in ["frames_cleanpass", "frames_finalpass"]:
        ds = FlyingThings3D(None, root=root, dstype=dstype,
                            split="validation")
        epes = []
        for i in range(len(ds)):
            s = ds.load(i)
            imgs = s["images"]
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            im1 = jnp.asarray(padder.pad(imgs[0][None]), jnp.float32)
            im2 = jnp.asarray(padder.pad(imgs[1][None]), jnp.float32)
            flow = np.asarray(padder.unpad(fwd(im1, im2)))[0]
            epes.append(_epe_map(flow, s["flows"][0]).reshape(-1))
        epe_all = np.concatenate(epes)
        tag = dstype.replace("frames_", "").replace("pass", "")
        results[f"things_{tag}_epe"] = float(epe_all.mean())
        print(f"Validation ({dstype}) EPE: {epe_all.mean():.4f}, "
              f"1px: {(epe_all < 1).mean():.4f}, "
              f"3px: {(epe_all < 3).mean():.4f}, "
              f"5px: {(epe_all < 5).mean():.4f}")
    return results


def validate_things_mf(model, params, root="datasets/flyingthings3d",
                       iters=15, nframes=4) -> Dict[str, float]:
    """Multi-frame FlyingThings validation: T-frame windows over the TEST
    split, every pair's EPE counted once (the validator the reference's
    multi-frame model lacks — its validate_things is two-frame-only and
    cannot be called on SKFlow_MF8)."""
    fwd = JittedForward(model, params, iters)
    results = {}
    for dstype in ["frames_cleanpass", "frames_finalpass"]:
        ds = mf_datasets.FlyingThings3DMultiFrame(
            None, root=root, dstype=dstype, split="validation",
            nframes=nframes)
        # stride-1 windows duplicate pairs; evaluate each window's LAST pair
        # plus the leading pairs of each sequence's first window
        epes = []
        prev_scene = None
        for i in range(len(ds)):
            rec = ds.records[i]
            s = ds.load(i)
            imgs = s["images"][None]
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            flows = fwd(jnp.asarray(padder.pad(imgs)))
            flows = np.asarray(padder.unpad(flows))[0]
            pairs = (range(nframes - 1) if rec.scene != prev_scene
                     else [nframes - 2])
            for p in pairs:
                epes.append(_epe_map(flows[p], s["flows"][p]).reshape(-1))
            prev_scene = rec.scene
        epe_all = np.concatenate(epes)
        tag = dstype.replace("frames_", "").replace("pass", "")
        results[f"things_{tag}_epe"] = float(epe_all.mean())
        print(f"Validation mf ({dstype}) EPE: {epe_all.mean():.4f}, "
              f"1px: {(epe_all < 1).mean():.4f}")
    return results


def validate_sintel_2f(model, params, root="datasets/sintel", iters=32,
                       dstypes=("clean", "final")) -> Dict[str, float]:
    """Two-frame Sintel validation for the RAFT-family baselines (reference
    validate_sintel, evaluate_mf.py:405-440)."""
    from streamflow_tpu.data.datasets import MpiSintel

    fwd = JittedForward2F(model, params, iters)
    results = {}
    for dstype in dstypes:
        ds = MpiSintel(None, split="training", root=root, dstype=dstype)
        epes = []
        for i in range(len(ds)):
            s = ds.load(i)
            imgs = s["images"][:, None]  # (2, 1, H, W, 3)
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            im1, im2 = padder.pad(jnp.asarray(imgs[0], jnp.float32)), \
                padder.pad(jnp.asarray(imgs[1], jnp.float32))
            flow = np.asarray(padder.unpad(fwd(im1, im2)))[0]
            epes.append(_epe_map(flow, s["flows"][0]).reshape(-1))
        epe_all = np.concatenate(epes)
        results[f"{dstype}_epe_2f"] = float(epe_all.mean())
        print(f"Validation 2f ({dstype}) EPE: {results[f'{dstype}_epe_2f']:.4f}")
    return results


def validate_kitti_tiled(model, params, multi_root="datasets/multi-kitti",
                         iters=15, nframes=4, patch_size=(432, 960),
                         min_overlap=20, sigma=0.05) -> Dict[str, float]:
    """Tiled high-res KITTI validation: overlapping train-size patches with
    Gaussian blending (reference validate_kitti_mf_tile,
    evaluate_mf.py:985-1053)."""
    from streamflow_tpu.tiling import tiled_forward

    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.KITTIMultiFrameEval(multi_root=multi_root,
                                         split="training", nframes=nframes)
    epe_list, out_list = [], []
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="kitti432")
        padded = jnp.asarray(padder.pad(imgs))
        if padded.shape[2] < patch_size[0] or padded.shape[3] < patch_size[1]:
            flows = fwd(padded)
        else:
            flows = tiled_forward(lambda t: fwd(t), padded,
                                  patch_size=patch_size,
                                  min_overlap=min_overlap, sigma=sigma)
        flows = np.asarray(padder.unpad(flows))[0]
        p = nframes - 2
        gt, valid = s["flows"][p], s["valids"][p] >= 0.5
        epe = _epe_map(flows[p], gt).reshape(-1)
        mag = np.sqrt((gt ** 2).sum(-1)).reshape(-1)
        v = valid.reshape(-1)
        out = (epe > 3.0) & ((epe / np.maximum(mag, 1e-12)) > 0.05)
        epe_list.append(epe[v].mean())
        out_list.append(out[v])
    epe = float(np.mean(epe_list))
    f1 = float(100 * np.concatenate(out_list).mean())
    print(f"Validation KITTI (tiled): {epe:.4f}, {f1:.4f}")
    return {"kitti_tile_epe": epe, "kitti_tile_f1": f1}


def mine_worst_cases(model, params, root="datasets/sintel", iters=15,
                     nframes=4, dstypes=("clean", "final"), top_k=30,
                     save_root="worst_cases"):
    """Rank eval windows by mean EPE and dump the worst ones with input
    frames + predicted/GT flow visualizations (reference get_worst_case,
    evaluate_mf.py:172-248)."""
    import os

    from PIL import Image

    from streamflow_tpu.data.flow_viz import flow_to_image

    fwd = JittedForward(model, params, iters)
    for dstype in dstypes:
        ds = mf_datasets.SintelMultiframeEval(split="training", dstype=dstype,
                                              root=root, nframes=nframes)

        def run(i):
            s = ds.load(i)
            imgs = s["images"][None]
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            flows = fwd(jnp.asarray(padder.pad(imgs)))
            return s, np.asarray(padder.unpad(flows))[0]

        scores = []
        for i in range(len(ds)):
            s, flows = run(i)
            epes = [
                _epe_map(flows[p], s["flows"][p]).mean()
                for p in range(nframes - 1) if s["frame_ids"][p] != -1
            ]
            scores.append(float(np.mean(epes)) if epes else -1.0)

        worst = np.argsort(np.asarray(scores))[-top_k:][::-1]
        for rank, idx in enumerate(worst):
            s, flows = run(int(idx))
            out = os.path.join(save_root, dstype, f"{rank:02d}_{idx}")
            os.makedirs(out, exist_ok=True)
            for j in range(nframes):
                Image.fromarray(s["images"][j].astype(np.uint8)).save(
                    os.path.join(out, f"image{j}.png"))
            for p in range(nframes - 1):
                Image.fromarray(flow_to_image(flows[p])).save(
                    os.path.join(out, f"pred{p}.png"))
                Image.fromarray(flow_to_image(s["flows"][p])).save(
                    os.path.join(out, f"gt{p}.png"))
            with open(os.path.join(out, "epe.txt"), "w") as f:
                f.write(f"{scores[int(idx)]:.4f}\n")
        print(f"[{dstype}] worst-{top_k} windows written to {save_root}")


def validate_sintel_occlusion(model, params, root="datasets/sintel", iters=15,
                              nframes=4, dstype="final") -> Dict[str, float]:
    """Occluded / non-occluded EPE split (reference evaluate_mf.py:550-592)."""
    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.SintelMultiframeEval(split="training", dstype=dstype,
                                          root=root, nframes=nframes,
                                          occ_map=True)
    epe_occ, epe_noc, epe_all_l = [], [], []
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="sintel")
        flows = fwd(jnp.asarray(padder.pad(imgs)))
        flows = np.asarray(padder.unpad(flows))[0]
        for p in range(nframes - 1):
            if s["frame_ids"][p] == -1:
                continue
            epe = _epe_map(flows[p], s["flows"][p])
            occ = s["occlusions"][p]
            epe_all_l.append(epe.reshape(-1))
            epe_occ.append(epe[occ].reshape(-1))
            epe_noc.append(epe[~occ].reshape(-1))
    res = {
        f"{dstype}_epe": float(np.concatenate(epe_all_l).mean()),
        f"{dstype}_epe_occ": float(np.concatenate(epe_occ).mean()),
        f"{dstype}_epe_noc": float(np.concatenate(epe_noc).mean()),
    }
    print(res)
    return res
