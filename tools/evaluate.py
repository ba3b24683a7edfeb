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
                   choices=["sintel", "kitti", "spring", "sintel_occ",
                            "things", "chairs", "things_2f", "all"])
    p.add_argument("--model", default="streamflow",
                   choices=["streamflow", "raft", "gma", "sk"],
                   help="two-frame baselines evaluate chairs/things_2f "
                        "(reference validate_chairs/things are two-frame, "
                        "evaluate_mf.py:375-429)")
    p.add_argument("--ckpt", default=None, help=".npz params file")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--attn_impl", default="auto", choices=["auto", "full", "flash"])
    p.add_argument("--corr_impl", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--spring_root", default="datasets/spring")
    p.add_argument("--things_root", default="datasets/flyingthings3d")
    p.add_argument("--chairs_root",
                   default="datasets/FlyingChairs_release/data")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from streamflow_tpu import evaluation
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.checkpoint import load_variables_npz

    two_frame = args.model != "streamflow"
    if two_frame:
        from streamflow_tpu.config import RAFTConfig

        cfg2 = RAFTConfig(iters=args.iters, update_block=args.model,
                          use_gma=args.model in ("gma", "sk"),
                          attn_impl=args.attn_impl)
        model = create_model("raft", cfg=cfg2)
    else:
        cfg = StreamFlowConfig(T=args.T, iters=args.iters,
                               attn_impl=args.attn_impl,
                               corr_impl=args.corr_impl)
        model = create_model("streamflow", cfg=cfg)

    if args.ckpt:
        params = load_variables_npz(args.ckpt)
    else:
        print("WARNING: no --ckpt given; evaluating random init")
        x = jnp.zeros((1, args.T, 64, 96, 3))
        if two_frame:
            params = jax.jit(lambda k, a, b: model.init(k, a, b,
                                                        test_mode=True))(
                jax.random.PRNGKey(0), x[:, 0], x[:, 1])
        else:
            params = jax.jit(lambda k, a: model.init(k, a, test_mode=True))(
                jax.random.PRNGKey(0), x)

    results = {}
    if args.dataset == "things":
        if two_frame:
            results.update(evaluation.validate_things(
                model, params, args.things_root, args.iters))
        else:
            results.update(evaluation.validate_things_mf(
                model, params, args.things_root, args.iters, args.T))
    if args.dataset == "things_2f":
        assert two_frame, "--dataset things_2f needs a two-frame --model"
        results.update(evaluation.validate_things(
            model, params, args.things_root, args.iters))
    if args.dataset == "chairs":
        assert two_frame, "--dataset chairs needs a two-frame --model"
        results.update(evaluation.validate_chairs(
            model, params, args.chairs_root, args.iters))
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
