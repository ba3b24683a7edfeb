"""Evaluation harness (reference evaluate_mf.py __main__, scripts/infer.sh):

  python tools/evaluate.py --dataset sintel --iters 15 \
      --ckpt output/streamflow/params.npz --sintel_root datasets/sintel
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["sintel", "kitti", "spring", "sintel_occ", "all"])
    p.add_argument("--ckpt", default=None, help=".npz params file")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--attn_impl", default="full", choices=["full", "flash"])
    p.add_argument("--corr_impl", default="xla", choices=["xla", "pallas"])
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--spring_root", default="datasets/spring")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from streamflow_tpu import evaluation
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.checkpoint import load_params_npz

    cfg = StreamFlowConfig(T=args.T, iters=args.iters,
                           attn_impl=args.attn_impl, corr_impl=args.corr_impl)
    model = create_model("streamflow", cfg=cfg)

    if args.ckpt:
        params = {"params": load_params_npz(args.ckpt)}
    else:
        print("WARNING: no --ckpt given; evaluating random init")
        x = jnp.zeros((1, args.T, 64, 96, 3))
        params = jax.jit(lambda k, a: model.init(k, a, test_mode=True))(
            jax.random.PRNGKey(0), x)

    results = {}
    if args.dataset in ("sintel", "all"):
        results.update(evaluation.validate_sintel(
            model, params, args.sintel_root, args.iters, args.T))
    if args.dataset in ("kitti", "all"):
        results.update(evaluation.validate_kitti(
            model, params, args.multi_root, args.iters, args.T))
    if args.dataset in ("spring", "all"):
        results.update(evaluation.validate_spring(
            model, params, args.spring_root, args.iters, args.T))
    if args.dataset == "sintel_occ":
        results.update(evaluation.validate_sintel_occlusion(
            model, params, args.sintel_root, args.iters, args.T))
    print(results)


if __name__ == "__main__":
    main()
