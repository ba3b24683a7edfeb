"""The jit-compiled training step, sharded over the device mesh.

Replaces the reference's per-step DataParallel scatter/replicate/gather
(train_mf.py:146,224-257): here the batch is sharded over the mesh's 'data'
axis, params are replicated, and XLA emits one gradient all-reduce over ICI.
Loss math follows train_mf.py:240-257 (per-frame sequence loss, grad-clip 1.0,
AdamW + OneCycle inside the optax chain).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from streamflow_tpu.training.loss import sequence_loss
from streamflow_tpu.training.state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    gamma: float = 0.8,
    iters: int = 12,
    kitti_last_pair_only: bool = False,
    bidirectional: bool = False,
):
    """Returns step(state, batch) -> (state, metrics).

    batch: {"images": (B,T,H,W,3), "flows": (B,F,H,W,2), "valids": (B,F,H,W)}.
    For the kitti stage the reference supervises only the final frame pair
    (train_mf.py:240-241).

    ``bidirectional`` (the bithings stage): the batch additionally carries
    "flows_bw"/"valids_bw" (into_past GT per pair); the model runs a second
    forward on the time-reversed clip, whose pair q predicts the backward
    flow of original pair F-1-q, and both directions are supervised. This is
    the TPU-native form of the reference's bidirectional supervision (its
    Bi_* decoder ablations, core/update.py:1157-1235, were never wired into
    a runnable train path — SURVEY §7.4)."""

    def supervise(preds, flows, valids):
        if kitti_last_pair_only:
            preds = preds[:, :, -1:]
            flows = flows[:, -1:]
            valids = valids[:, -1:]
        total = 0.0
        metrics = {}
        f = flows.shape[1]
        # Per-frame-pair sequence loss, summed (train_mf.py:243-249).
        for i in range(f):
            li, mi = sequence_loss(preds[:, :, i], flows[:, i], valids[:, i], gamma)
            total = total + li
            if i == 0:
                metrics = mi
        return total, metrics

    def loss_fn(params, model_state, batch):
        new_state = model_state

        def apply_fn(images):
            nonlocal new_state
            variables = {**params, **model_state}
            if model_state:
                # BatchNorm-bearing encoders: run with mutable batch_stats
                # so the running statistics update (and are NOT optimized).
                out, ups = model.apply(variables, images, iters=iters,
                                       train=True,
                                       mutable=list(model_state))
                new_state = ups
                return out
            return model.apply(variables, images, iters=iters, train=True)

        if bidirectional and not model_state:
            # Fold the time-reversed clip into the BATCH axis: ONE model
            # application on 2B clips instead of two applications. Exactly
            # equivalent for the flagship (no cross-batch coupling — Twins
            # is LayerNorm-only), tested by
            # tests/test_training_infra.py::test_bidirectional_fold_equals_two_applies.
            # One forward+backward graph instead of two: ~2x faster XLA
            # compile and better per-step device utilization.
            b = batch["images"].shape[0]
            preds = apply_fn(jnp.concatenate(
                [batch["images"], batch["images"][:, ::-1]], axis=0))
            total, metrics = supervise(preds[:, :b], batch["flows"],
                                       batch["valids"])
            # reversed-clip pair q <-> backward flow of original pair F-1-q
            bt, mb = supervise(preds[:, b:], batch["flows_bw"][:, ::-1],
                               batch["valids_bw"][:, ::-1])
            total = total + bt
            metrics = dict(metrics, epe_bw=mb["epe"])
            return total, (metrics, new_state)

        total, metrics = supervise(apply_fn(batch["images"]),
                                   batch["flows"], batch["valids"])
        if bidirectional:
            # BatchNorm-bearing encoders: keep two applications so each
            # direction normalizes over its own B clips (batch-folding
            # would change the train-mode batch statistics).
            bt, mb = supervise(apply_fn(batch["images"][:, ::-1]),
                               batch["flows_bw"][:, ::-1],
                               batch["valids_bw"][:, ::-1])
            total = total + bt
            metrics = dict(metrics, epe_bw=mb["epe"])
        return total, (metrics, new_state)

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, model_state)), grads = grad_fn(
            state.params, state.model_state, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1,
                          model_state=model_state), metrics

    return step


def make_train_step_2f(
    model,
    tx: optax.GradientTransformation,
    gamma: float = 0.8,
    iters: int = 12,
):
    """Two-frame (RAFT/GMA/SKFlow) training step: batch
    {"images": (B,2,H,W,3), "flows": (B,1,H,W,2), "valids": (B,1,H,W)}
    (reference RAFT training recipe, the two-frame analogue of
    train_mf.py:224-257)."""

    def loss_fn(params, model_state, batch):
        new_state = model_state
        variables = {**params, **model_state}
        im1 = batch["images"][:, 0]
        im2 = batch["images"][:, 1]
        if model_state:
            preds, new_state = model.apply(
                variables, im1, im2, iters=iters, train=True,
                mutable=list(model_state))
        else:
            preds = model.apply(variables, im1, im2, iters=iters, train=True)
        total, metrics = sequence_loss(preds, batch["flows"][:, 0],
                                       batch["valids"][:, 0], gamma)
        return total, (metrics, new_state)

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, model_state)), grads = grad_fn(
            state.params, state.model_state, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1,
                          model_state=model_state), metrics

    return step


def shard_train_step(step_fn, mesh: Mesh):
    """jit the step with params replicated and batch sharded over 'data'."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
