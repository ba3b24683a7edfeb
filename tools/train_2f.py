"""Two-frame training harness for the RAFT/GMA/SKFlow baselines over the
C+T+K+S+H stages (the reference trains these with the same train.py via
--model_name; here the two-frame loop gets its own entry point since batch
shapes differ).

  python tools/train_2f.py --stage chairs --model raft --num_steps 100000 \
      --batch_size 8 --lr 4e-4 --image_size 368 496
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="raft")
    p.add_argument("--model", default="raft", choices=["raft", "gma", "sk"])
    p.add_argument("--stage", default="chairs",
                   choices=["chairs", "things", "sintel", "kitti"])
    p.add_argument("--output", default="output")
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--wdecay", type=float, default=1e-4)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--image_size", type=int, nargs=2, default=[368, 496])
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--val_freq", type=int, default=5000)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--mixed_precision", action="store_true", default=True)
    p.add_argument("--no_mixed_precision", dest="mixed_precision",
                   action="store_false")
    p.add_argument("--chairs_root", default="datasets/FlyingChairs_release/data")
    p.add_argument("--things_root", default="datasets/flyingthings3d")
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--kitti_root", default="datasets/KITTI")
    p.add_argument("--hd1k_root", default="datasets/HD1k")
    return p.parse_args()


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import RAFTConfig
    from streamflow_tpu.data.datasets import fetch_dataset_2f
    from streamflow_tpu.data.loader import DataLoader, prefetch_to_device
    from streamflow_tpu.models import create_model
    from streamflow_tpu.parallel import make_mesh, replicate
    from streamflow_tpu.training.checkpoint import (
        CheckpointManager, load_params_npz,
    )
    from streamflow_tpu.training.optim import make_optimizer, onecycle_linear
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import (
        make_train_step_2f, shard_train_step,
    )
    from streamflow_tpu.utils.logger import MetricsLogger, Tee

    out = Path(args.output) / args.name
    out.mkdir(parents=True, exist_ok=True)
    Tee(out / "log.txt").install()
    print(vars(args))

    cfg = RAFTConfig(update_block=args.model,
                     use_gma=args.model in ("gma", "sk"), iters=args.iters,
                     mixed_precision=args.mixed_precision)
    model = create_model("raft", cfg=cfg)

    dataset = fetch_dataset_2f(
        args.stage, image_size=tuple(args.image_size),
        chairs_root=args.chairs_root, things_root=args.things_root,
        sintel_root=args.sintel_root, kitti_root=args.kitti_root,
        hd1k_root=args.hd1k_root)
    print(f"training with {len(dataset)} pairs")
    loader = DataLoader(dataset, args.batch_size,
                        num_workers=args.num_workers, seed=args.seed)

    mesh = make_mesh()
    assert args.batch_size % mesh.devices.size == 0

    H, W = args.image_size
    im = jnp.zeros((args.batch_size, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, iters=args.iters, train=True)
    )(jax.random.PRNGKey(args.seed), im, im)
    if args.restore_ckpt:
        variables = dict(variables, params=load_params_npz(args.restore_ckpt))
    n_params = sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"parameter count: {n_params / 1e6:.2f}M")

    tx = make_optimizer(args.lr, args.num_steps, args.wdecay, clip=args.clip)
    schedule = onecycle_linear(args.lr, args.num_steps + 100)
    state = TrainState.from_variables(variables, tx)

    ckpt = CheckpointManager(str(out / "ckpts"), max_to_keep=5)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    step_fn = shard_train_step(
        make_train_step_2f(model, tx, args.gamma, args.iters), mesh)

    with mesh:
        state = replicate(mesh, state)
        logger = MetricsLogger(str(out), args.num_steps, args.print_freq)
        cur = logger.step = int(state.step)
        epoch, done, pending = 0, False, []
        while not done:
            for batch in prefetch_to_device(loader.epoch(epoch), mesh):
                state, metrics = step_fn(state, batch)
                cur += 1
                pending.append((metrics, float(schedule(cur))))
                if cur % args.print_freq == 0:
                    for m, lr in pending:
                        logger.push({k: float(v) for k, v in m.items()}, lr=lr)
                    pending.clear()
                if cur % args.val_freq == 0:
                    ckpt.save(state)
                if cur >= args.num_steps:
                    done = True
                    break
            epoch += 1
        for m, lr in pending:
            logger.push({k: float(v) for k, v in m.items()}, lr=lr)
        ckpt.save(state, wait=True)
    print("training complete")


if __name__ == "__main__":
    main()
