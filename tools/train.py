"""Training harness (reference train_mf.py): multi-stage pipeline
things -> sintel/kitti mix -> spring (+ bithings), AdamW + linear OneCycle,
grad clip 1.0, sequence loss with gamma weighting, periodic checkpointing +
resume, in-training validation with best-checkpoint tracking (repairing the
reference's commented-out validate call, train_mf.py:274).

Per-stage presets pin the canonical hyperparameters of the reference's
scripts/train_things.sh, train_sintel_kitti.sh, train_spring.sh — one-command
stage reproduction:

  python tools/train.py --preset things
  python tools/train.py --preset sintel_kitti --restore_ckpt out/things.npz
  python tools/train.py --preset spring       --restore_ckpt out/sintel.npz

Any explicit flag overrides its preset value.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# Canonical per-stage configs (reference scripts/train_things.sh,
# train_sintel_kitti.sh, train_spring.sh).
PRESETS = {
    "things": dict(stage="things", num_steps=300_000, image_size=[400, 720],
                   lr=6e-4, batch_size=16, T=3, gamma=0.8,
                   validation="sintel"),
    "sintel_kitti": dict(stage="sintel", num_steps=180_000,
                         image_size=[432, 960], lr=1.75e-4, batch_size=8,
                         T=4, gamma=0.85, seed=3407, validation="kitti"),
    "spring": dict(stage="spring", num_steps=180_000, image_size=[432, 768],
                   lr=4e-4, batch_size=8, T=4, gamma=0.85, seed=3407,
                   validation="kitti"),
    "bithings": dict(stage="bithings", num_steps=300_000,
                     image_size=[400, 720], lr=6e-4, batch_size=16, T=3,
                     gamma=0.8, validation="sintel"),
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default=None, choices=sorted(PRESETS),
                   help="canonical stage config (reference scripts/*.sh); "
                        "explicit flags override preset values")
    p.add_argument("--name", default="streamflow")
    p.add_argument("--stage", default="things",
                   choices=["things", "sintel", "sintel2", "sintel3",
                            "spring", "kitti", "bithings"])
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
    p.add_argument("--validation", default="none",
                   choices=["none", "sintel", "kitti", "spring"],
                   help="validator run every val_freq steps; best EPE "
                        "checkpoint is kept as best.npz")
    p.add_argument("--val_iters", type=int, default=15)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--num_workers", type=int, default=8)
    # multi-host (TPU pod / multi-process): either pass all three, or rely
    # on the environment (pod metadata / JAX_COORDINATOR_ADDRESS)
    p.add_argument("--coordinator", default=None,
                   help="coordination-service address host:port (process 0)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--mixed_precision", action="store_true", default=True)
    p.add_argument("--no_mixed_precision", dest="mixed_precision",
                   action="store_false")
    # dataset roots
    p.add_argument("--things_root", default="datasets/flyingthings3d")
    p.add_argument("--sintel_root", default="datasets/sintel")
    p.add_argument("--multi_root", default="datasets/multi-kitti")
    p.add_argument("--hd1k_root", default="datasets/HD1k")
    p.add_argument("--spring_root", default="datasets/spring")

    args = p.parse_args()
    if args.preset:
        given = {a.option_strings[0].lstrip("-").replace("-", "_")
                 for a in p._actions if any(
                     s in sys.argv for s in a.option_strings)}
        for k, v in PRESETS[args.preset].items():
            if k not in given:
                setattr(args, k, v)
    return args


def run_validation(which, model, params, args):
    from streamflow_tpu import evaluation

    if which == "sintel":
        return evaluation.validate_sintel(
            model, params, root=args.sintel_root, iters=args.val_iters,
            nframes=args.T, dstypes=("clean",), progress=False)
    if which == "kitti":
        return evaluation.validate_kitti(
            model, params, multi_root=args.multi_root, iters=args.val_iters,
            nframes=args.T)
    if which == "spring":
        return evaluation.validate_spring(
            model, params, root=args.spring_root, iters=args.val_iters,
            nframes=args.T)
    return {}


VAL_KEY = {"sintel": "clean_epe", "kitti": "kitti_epe",
           "spring": "spring_epe"}


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax

    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.data.loader import DataLoader, prefetch_to_device
    from streamflow_tpu.data.mf_datasets import fetch_dataset
    from streamflow_tpu.models import create_model
    from streamflow_tpu.parallel import make_mesh, multihost, replicate
    from streamflow_tpu.training.checkpoint import (
        CheckpointManager, load_params_npz, save_params_npz,
    )
    from streamflow_tpu.training.optim import make_optimizer, onecycle_linear
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import make_train_step, shard_train_step
    from streamflow_tpu.utils.logger import MetricsLogger, Tee

    # Multi-host: must run before any device query. No-op single-process.
    proc_idx, proc_cnt = multihost.initialize(
        args.coordinator, args.num_processes, args.process_id)
    primary = proc_idx == 0

    out = Path(args.output) / args.name
    out.mkdir(parents=True, exist_ok=True)
    if primary:
        Tee(out / "log.txt").install()
        print(f"devices: {jax.devices()} "
              f"(process {proc_idx}/{proc_cnt}, "
              f"{jax.local_device_count()} local)")
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
    if primary:
        print(f"training with {len(dataset)} clips")
    # --batch_size is the GLOBAL batch; each host loads its slice.
    assert args.batch_size % proc_cnt == 0, (
        f"global batch {args.batch_size} must divide over {proc_cnt} hosts")
    loader = DataLoader(dataset, args.batch_size // proc_cnt,
                        num_workers=args.num_workers, seed=args.seed,
                        process_index=proc_idx, process_count=proc_cnt)

    # GLOBAL mesh over every process's devices.
    mesh = make_mesh(devices=jax.devices())
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (
        f"batch {args.batch_size} must divide over {n_dev} devices")

    H, W = args.image_size
    sample = jnp.zeros((args.batch_size, args.T, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init(k, x, iters=args.iters, train=True)
    )(jax.random.PRNGKey(args.seed), sample)
    if args.restore_ckpt:
        variables = dict(variables, params=load_params_npz(args.restore_ckpt))
        print(f"restored params from {args.restore_ckpt}")
    n_params = sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"parameter count: {n_params / 1e6:.2f}M")

    tx = make_optimizer(args.lr, args.num_steps, args.wdecay, args.epsilon,
                        args.clip)
    schedule = onecycle_linear(args.lr, args.num_steps + 100)
    state = TrainState.from_variables(variables, tx)

    ckpt = CheckpointManager(str(out / "ckpts"), max_to_keep=5)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    step_fn = shard_train_step(
        make_train_step(model, tx, args.gamma, args.iters,
                        kitti_last_pair_only=args.stage == "kitti",
                        bidirectional=args.stage == "bithings"), mesh)

    with mesh:
        state = replicate(mesh, state)
        multihost.barrier("pre_train")
        logger = MetricsLogger(str(out), args.num_steps, args.print_freq)
        cur = logger.step = int(state.step)
        best_val = float("inf")
        epoch = 0
        done = False
        pending = []  # (metrics-on-device, lr) — fetched only at print_freq
        while not done:
            for batch in prefetch_to_device(loader.epoch(epoch), mesh):
                state, metrics = step_fn(state, batch)
                cur += 1
                # No per-step host sync: keep device metrics queued so the
                # next step dispatches immediately; materialize the window
                # only when the logger actually prints (by which time the
                # values are long since computed).
                pending.append((metrics, float(schedule(cur))))
                if cur % args.print_freq == 0:
                    for m, lr in pending:
                        logger.push({k: float(v) for k, v in m.items()},
                                    lr=lr)
                    pending.clear()
                if cur % args.val_freq == 0:
                    ckpt.save(state)
                    if primary:
                        print(f"checkpointed at step {cur}")
                    if args.validation != "none" and primary:
                        res = run_validation(args.validation, model,
                                             jax.device_get(state.variables),
                                             args)
                        logger.push_val(cur, res)
                        print(f"val@{cur}: {res}")
                        key = VAL_KEY[args.validation]
                        if res.get(key, float("inf")) < best_val:
                            best_val = res[key]
                            save_params_npz(
                                str(out / "best.npz"),
                                jax.device_get(state.params)["params"])
                            print(f"new best {key}={best_val:.4f} "
                                  f"-> {out / 'best.npz'}")
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
