"""Training harness (reference train_mf.py): three-stage pipeline
things -> sintel/kitti mix -> spring, AdamW + linear OneCycle, grad clip 1.0,
sequence loss with gamma weighting, periodic checkpointing + resume.

Example (stage 2 canonical config, scripts/train_sintel_kitti.sh):
  python tools/train.py --stage sintel --num_steps 180000 --batch_size 8 \
      --lr 1.75e-4 --image_size 432 960 --gamma 0.85 --T 4 --seed 3407
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="streamflow")
    p.add_argument("--stage", default="things",
                   choices=["things", "sintel", "sintel2", "sintel3",
                            "spring", "kitti"])
    p.add_argument("--output", default="output")
    p.add_argument("--restore_ckpt", default=None,
                   help=".npz params to warm-start from (stage transfer)")
    p.add_argument("--num_steps", type=int, default=120000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1.75e-4)
    p.add_argument("--wdecay", type=float, default=1e-5)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.85)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--image_size", type=int, nargs=2, default=[432, 960])
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--val_freq", type=int, default=5000)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--mixed_precision", action="store_true", default=True)
    p.add_argument("--no_mixed_precision", dest="mixed_precision",
                   action="store_false")
    # dataset roots
    p.add_argument("--things_root", default="datasets/flyingthings3d")
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--hd1k_root", default="datasets/HD1k")
    p.add_argument("--spring_root", default="datasets/spring")
    return p.parse_args()


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.data.loader import DataLoader
    from streamflow_tpu.data.mf_datasets import fetch_dataset
    from streamflow_tpu.models import create_model
    from streamflow_tpu.parallel import make_mesh, replicate, shard_batch
    from streamflow_tpu.training.checkpoint import (
        CheckpointManager, load_params_npz,
    )
    from streamflow_tpu.training.optim import make_optimizer, onecycle_linear
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import make_train_step, shard_train_step
    from streamflow_tpu.utils.logger import MetricsLogger, Tee

    out = Path(args.output) / args.name
    out.mkdir(parents=True, exist_ok=True)
    Tee(out / "log.txt").install()
    print(f"devices: {jax.devices()}")
    print(vars(args))

    cfg = StreamFlowConfig(T=args.T, iters=args.iters,
                           mixed_precision=args.mixed_precision)
    model = create_model("streamflow", cfg=cfg)

    dataset = fetch_dataset(
        args.stage, T=args.T, image_size=tuple(args.image_size),
        things_root=args.things_root, sintel_root=args.sintel_root,
        multi_root=args.multi_root, hd1k_root=args.hd1k_root,
        spring_root=args.spring_root,
    )
    print(f"training with {len(dataset)} clips")
    loader = DataLoader(dataset, args.batch_size,
                        num_workers=args.num_workers, seed=args.seed)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (
        f"batch {args.batch_size} must divide over {n_dev} devices")

    H, W = args.image_size
    sample = jnp.zeros((args.batch_size, args.T, H, W, 3), jnp.float32)
    params = jax.jit(
        lambda k, x: model.init(k, x, iters=args.iters, train=True)
    )(jax.random.PRNGKey(args.seed), sample)
    if args.restore_ckpt:
        params = {"params": load_params_npz(args.restore_ckpt)}
        print(f"restored params from {args.restore_ckpt}")
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    print(f"parameter count: {n_params / 1e6:.2f}M")

    tx = make_optimizer(args.lr, args.num_steps, args.wdecay, args.epsilon,
                        args.clip)
    schedule = onecycle_linear(args.lr, args.num_steps + 100)
    state = TrainState.create(params, tx)

    ckpt = CheckpointManager(str(out / "ckpts"), max_to_keep=5)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    kitti_only = args.stage == "kitti"
    step_fn = shard_train_step(
        make_train_step(model, tx, args.gamma, args.iters,
                        kitti_last_pair_only=kitti_only), mesh)

    with mesh:
        state = replicate(mesh, state)
        logger = MetricsLogger(str(out), args.num_steps, args.print_freq)
        logger.step = int(state.step)
        epoch = 0
        done = False
        while not done:
            for batch in loader.epoch(epoch):
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, batch)
                cur = int(state.step)
                logger.push(
                    {k: float(v) for k, v in metrics.items()},
                    lr=float(schedule(cur)),
                )
                if cur % args.val_freq == 0:
                    ckpt.save(state)
                    print(f"checkpointed at step {cur}")
                if cur >= args.num_steps:
                    done = True
                    break
            epoch += 1
        ckpt.save(state, wait=True)
    print("training complete")


if __name__ == "__main__":
    main()
