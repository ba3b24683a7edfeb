"""Evaluate every checkpoint in a training run and report the best — the
reference's de-facto model-selection mechanism (scripts/infer_all_ckpts.sh
loop + SURVEY §5.4: the in-trainer best-ckpt path is dead code there).

  python tools/eval_all_ckpts.py --ckpt_dir output/streamflow/ckpts \
      --dataset sintel --sintel_root datasets/sintel
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True,
                   help="orbax CheckpointManager directory")
    p.add_argument("--dataset", default="sintel",
                   choices=["sintel", "kitti", "spring"])
    p.add_argument("--metric", default=None,
                   help="selection metric (default: first *_epe)")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--spring_root", default="datasets/spring")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from streamflow_tpu import evaluation
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.checkpoint import CheckpointManager
    from streamflow_tpu.training.optim import make_optimizer
    from streamflow_tpu.training.state import TrainState

    cfg = StreamFlowConfig(T=args.T, iters=args.iters)
    model = create_model("streamflow", cfg=cfg)
    x = jnp.zeros((1, args.T, 64, 96, 3))
    template_params = jax.jit(lambda k, a: model.init(k, a, test_mode=True))(
        jax.random.PRNGKey(0), x)
    tx = make_optimizer(1e-4, 100)
    template = TrainState.create(template_params, tx)

    mgr = CheckpointManager(args.ckpt_dir)
    steps = sorted(mgr._mgr.all_steps())
    if not steps:
        raise SystemExit(f"no checkpoints in {args.ckpt_dir}")

    results = {}
    for step in steps:
        state = mgr.restore(template, step=step)
        if args.dataset == "sintel":
            r = evaluation.validate_sintel(model, state.params,
                                           args.sintel_root, args.iters,
                                           args.T, progress=False)
        elif args.dataset == "kitti":
            r = evaluation.validate_kitti(model, state.params,
                                          args.multi_root, args.iters, args.T)
        else:
            r = evaluation.validate_spring(model, state.params,
                                           args.spring_root, args.iters,
                                           args.T, progress=False)
        results[step] = r
        print(f"step {step}: {r}")

    key = args.metric or next(k for k in next(iter(results.values()))
                              if k.endswith("_epe"))
    best = min(results, key=lambda s: results[s][key])
    print(json.dumps({"best_step": best, "metric": key,
                      "value": results[best][key],
                      "all": {str(s): results[s] for s in results}}, indent=2))


if __name__ == "__main__":
    main()
