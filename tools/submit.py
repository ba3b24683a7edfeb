"""Leaderboard submission harness (reference submit_mf.py, scripts/submit.sh):

  python tools/submit.py --dataset sintel --ckpt params.npz --iters 20
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["sintel", "sintel_warm", "kitti", "spring"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--output", default="submission")
    p.add_argument("--vis", action="store_true")
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--spring_root", default="datasets/spring")
    args = p.parse_args()

    from streamflow_tpu import submission
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.checkpoint import load_variables_npz

    cfg = StreamFlowConfig(T=args.T, iters=args.iters)
    model = create_model("streamflow", cfg=cfg)
    params = load_variables_npz(args.ckpt)

    if args.dataset == "sintel":
        submission.create_sintel_submission(
            model, params, args.sintel_root, args.output, args.iters, args.T,
            save_vis_flow=args.vis)
    elif args.dataset == "sintel_warm":
        submission.create_sintel_submission_warm(
            model, params, args.sintel_root, args.output, args.iters, args.T)
    elif args.dataset == "kitti":
        submission.create_kitti_submission(
            model, params, args.multi_root, args.output, args.iters, args.T)
    elif args.dataset == "spring":
        submission.create_spring_submission(
            model, params, args.spring_root, args.output, args.iters, args.T)


if __name__ == "__main__":
    main()
