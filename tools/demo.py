"""Video inference demo (reference demo.py): read a video, run sliding T=4
windows with 1-frame overlap (tail window deduped via -1 flags), render flow
with the Middlebury wheel, write an mp4.

  python tools/demo.py --video input.mp4 --ckpt params.npz --output flow.mp4
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def read_video(path, max_frames=None):
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1].copy())  # BGR -> RGB
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    return frames, fps


def write_video(path, frames, fps):
    import cv2

    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                          (w, h))
    for f in frames:
        out.write(f[:, :, ::-1])  # RGB -> BGR
    out.release()


def sliding_windows(n: int, t: int):
    """Start indices + per-pair keep flags (reference demo.py:514-532):
    step T-1 with the tail window re-anchored to the end, overlapping pairs
    flagged out."""
    wins = []
    i = 0
    while True:
        if i + t <= n:
            wins.append((i, [True] * (t - 1)))
        else:
            start = n - t
            keep = [start + j >= i for j in range(t - 1)]
            wins.append((start, keep))
        if i + t >= n:
            break
        i += t - 1
    return wins


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--output", default="flow_vis.mp4")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--attn_impl", default="auto", choices=["auto", "full", "flash"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.data.flow_viz import flow_to_image
    from streamflow_tpu.models import create_model
    from streamflow_tpu.ops.padding import InputPadder
    from streamflow_tpu.training.checkpoint import load_variables_npz

    frames, fps = read_video(args.video, args.max_frames)
    assert len(frames) >= args.T, f"need >= {args.T} frames"
    print(f"{len(frames)} frames @ {fps:.1f}fps, {frames[0].shape}")

    cfg = StreamFlowConfig(T=args.T, iters=args.iters,
                           attn_impl=args.attn_impl)
    model = create_model("streamflow", cfg=cfg)

    clip0 = jnp.asarray(
        np.stack(frames[: args.T])[None].astype(np.float32))
    padder = InputPadder(clip0.shape[-3:], mode="sintel")
    if args.ckpt:
        params = load_variables_npz(args.ckpt)
    else:
        print("WARNING: no --ckpt; running random weights")
        params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), padder.pad(clip0))

    fwd = jax.jit(lambda pr, x: model.apply(pr, x, test_mode=True))

    flows_out = []
    for start, keep in sliding_windows(len(frames), args.T):
        clip = jnp.asarray(
            np.stack(frames[start : start + args.T])[None].astype(np.float32))
        flows = fwd(params, padder.pad(clip))
        flows = np.asarray(padder.unpad(flows))[0]
        for j, k in enumerate(keep):
            if k:
                flows_out.append(flows[j])
        print(f"window @{start}: kept {sum(keep)} flows", flush=True)

    vis = [flow_to_image(f) for f in flows_out]
    write_video(args.output, vis, fps)
    print(f"wrote {len(vis)} flow frames -> {args.output}")


if __name__ == "__main__":
    main()
