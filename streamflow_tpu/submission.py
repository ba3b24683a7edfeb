"""Leaderboard submission writers (reference evaluate_mf.py:252-322, 26-48,
804-853; submit_mf.py): Sintel .flo (+ color viz), Sintel warm-start variant
via forward-interpolated low-res flow, KITTI 16-bit png, Spring .flo5.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np

from streamflow_tpu.data import frame_utils, mf_datasets
from streamflow_tpu.data.flow_viz import flow_to_image
from streamflow_tpu.evaluation import JittedForward
from streamflow_tpu.ops.padding import InputPadder
from streamflow_tpu.ops.warp import per_pair_warm_start


def create_sintel_submission(model, params, root="datasets/sintel",
                             output_path="sintel_submission", iters=20,
                             nframes=4, dstypes=("clean", "final"),
                             save_vis_flow=False):
    """Reference create_sintel_submission_mf (evaluate_mf.py:252-282)."""
    fwd = JittedForward(model, params, iters)
    for dstype in dstypes:
        ds = mf_datasets.SintelMultiframeEval(split="test", dstype=dstype,
                                              root=root, nframes=nframes)
        for i in range(len(ds)):
            rec = ds.records[i]
            s = ds.load(i)
            imgs = s["images"][None]
            padder = InputPadder(imgs.shape[-3:], mode="sintel")
            flows = fwd(jnp.asarray(padder.pad(imgs)))
            flows = np.asarray(padder.unpad(flows))[0]
            for p in range(nframes - 1):
                fid = int(s["frame_ids"][p])
                if fid == -1:
                    continue
                out_dir = osp.join(output_path, dstype, rec.scene)
                os.makedirs(out_dir, exist_ok=True)
                out = osp.join(out_dir, f"frame{fid + 1:04d}.flo")
                frame_utils.write_flo(out, flows[p])
                if save_vis_flow:
                    from PIL import Image

                    Image.fromarray(flow_to_image(flows[p])).save(
                        out.replace(".flo", ".png"))


def create_sintel_submission_warm(model, params, root="datasets/sintel",
                                  output_path="sintel_submission", iters=20,
                                  nframes=4, dstypes=("clean", "final"),
                                  ratio=8):
    """Warm-start variant (evaluate_mf.py:288-322): each window is initialized
    with the forward-interpolated low-res flows of the previous window."""
    fwd_cache = {}

    def fwd(images, flow_init):
        key = images.shape
        if key not in fwd_cache:
            import jax

            @jax.jit
            def f(p, x, fi):
                return model.apply(p, x, iters=iters, test_mode=True,
                                   flow_init=fi)

            fwd_cache[key] = f
        return fwd_cache[key](params, images, flow_init)

    for dstype in dstypes:
        ds = mf_datasets.SintelMultiframeEval(split="test", dstype=dstype,
                                              root=root, nframes=nframes)
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
                fid = int(s["frame_ids"][p])
                if fid == -1:
                    continue
                out_dir = osp.join(output_path, dstype, rec.scene)
                os.makedirs(out_dir, exist_ok=True)
                frame_utils.write_flo(
                    osp.join(out_dir, f"frame{fid + 1:04d}.flo"), flows[p])


def create_kitti_submission(model, params, multi_root="datasets/multi-kitti",
                            output_path="kitti_submission", iters=20,
                            nframes=4):
    """Reference create_kitti_submission_mf (evaluate_mf.py:804-853):
    prediction for the 10->11 pair written as 16-bit png."""
    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.KITTIMultiFrameEval(multi_root=multi_root,
                                         split="testing", nframes=nframes)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(ds)):
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="kitti")
        flows = fwd(jnp.asarray(padder.pad(imgs)))
        flows = np.asarray(padder.unpad(flows))[0]
        frame_utils.write_flow_kitti(
            osp.join(output_path, ds.records[i].scene), flows[nframes - 2])


def create_spring_submission(model, params, root="datasets/spring",
                             output_path="spring_submission", iters=20,
                             nframes=4):
    """Reference create_spring_submission_mf (evaluate_mf.py:26-48): full-res
    .flo5 HDF5 files; the model runs at half resolution of the 1080p GT grid,
    so predictions are written for the [::2,::2] grid upsampled x2."""
    fwd = JittedForward(model, params, iters)
    ds = mf_datasets.Spring(root=osp.join(root, "test"), nframes=nframes,
                            is_test=True)
    for i in range(len(ds)):
        rec = ds.records[i]
        s = ds.load(i)
        imgs = s["images"][None]
        padder = InputPadder(imgs.shape[-3:], mode="sintel")
        flows = fwd(jnp.asarray(padder.pad(imgs)))
        flows = np.asarray(padder.unpad(flows))[0]
        scene, cam, tag = rec.scene.split("/")
        for p in range(nframes - 1):
            fid = int(s["frame_ids"][p])
            if fid == -1:
                continue
            out_dir = osp.join(output_path, scene, f"flow_{tag}_{cam}")
            os.makedirs(out_dir, exist_ok=True)
            # The .flo5 index is the 1-based frame number of the pair's FIRST
            # frame (reference numbering: FW j+1 / BW len-j,
            # core/mf_datasets.py:63,79; evaluate_mf.py:47). Spring filenames
            # are 1-based contiguous, so it is exactly the number in the
            # pair's first image filename — in both directions.
            idx = int(re.findall(r"(\d+)", osp.basename(rec.images[p]))[-1])
            frame_utils.write_flo5(
                osp.join(out_dir, f"flow_{tag}_{cam}_{idx:04d}.flo5"),
                flows[p])
