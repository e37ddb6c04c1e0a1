"""The fused jitted train step.

One compiled XLA program per step covering everything the reference's hot loop
does across ~15 Python-level CUDA launches (reference ``train_3d.py:109-151``):
on-device augmentation (optional hook), two global forwards, one concatenated
local forward, the 4-term loss, backward, gradient ``psum`` (implicit via
sharded-batch/replicated-param jit), the finite-loss guard, and the SGD update.

Parallelism: callers jit this with the batch sharded over the mesh ``data``
axis and params replicated (see ``pcrlv2_tpu.core.mesh``); XLA inserts the
gradient all-reduce over ICI.  Batch-norm statistics are then computed over the
*global* batch (sync-BN) — a strict improvement over the reference's
per-replica ``nn.DataParallel`` BN, documented as a deviation.

Local-view batching: the reference concatenates the 6 local views view-major
(``torch.cat(local_views, dim=0)``, ``train_3d.py:121``), i.e. rows
``[i·B:(i+1)·B]`` hold view i.  We receive locals as (B, V, …) and transpose to
(V·B, …) to preserve that layout for the per-view slicing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pcrlv2_tpu.train.losses import beta_schedule, cos_loss, mse_loss
from pcrlv2_tpu.train.optimizer import apply_lr


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(model, tx, key, sample_batch, **apply_kwargs) -> TrainState:
    """Initialize params/batch_stats from a sample input and wrap with opt state.

    ``model.init`` runs under jit: one compiled program instead of hundreds of
    eager per-op dispatches (which on CPU each compile separately).
    """
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=True, **apply_kwargs)
    )(key, sample_batch)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _flatten_locals(locals_bv):
    """(B, V, *spatial, C) → (V·B, *spatial, C), view-major like torch.cat."""
    b, v = locals_bv.shape[:2]
    lv = jnp.swapaxes(locals_bv, 0, 1)  # (V, B, ...)
    return lv.reshape((v * b,) + locals_bv.shape[2:]), b, v


def make_loss_fn(model, *, dim: int = 3, beta_period: float = 240.0,
                 mixup_alpha: Optional[float] = None):
    """The 4-term PCRLv2 loss as a standalone function — used by the train
    step's grad and jitted value-only for evaluation.

    Returns ``loss_fn(params, batch_stats, views, key, epoch) ->
    (loss, (new_batch_stats, metrics))``.
    """

    def unpack(outs):
        if dim == 3:
            out, feats, masks = outs
        else:
            feats, out, masks = outs
        return out, feats, masks

    def loss_fn(params, batch_stats, views, key, epoch):
        x1, x2, gt, local_views = (
            views["x1"], views["x2"], views["gt"], views["locals"])

        if mixup_alpha is not None:
            key, kmix = jax.random.split(key)
            lam = jax.random.beta(kmix, mixup_alpha, mixup_alpha)
            lam = jnp.maximum(lam, 1.0 - lam)
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, x1.shape[0])
            mix = lambda t: lam * t + (1.0 - lam) * t[perm]
            x1, x2, gt = mix(x1), mix(x2), mix(gt)

        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"]

        outs1, upd1 = model.apply(variables, x1, train=True, mutable=mutable)
        out1, feats1, masks1 = unpack(outs1)
        variables = {"params": params, "batch_stats": upd1["batch_stats"]}
        outs2, upd2 = model.apply(variables, x2, train=True, mutable=mutable)
        _, feats2, _ = unpack(outs2)
        variables = {"params": params, "batch_stats": upd2["batch_stats"]}

        local_flat, b, n_views = _flatten_locals(local_views)
        outsL, updL = model.apply(variables, local_flat, local=True, train=True,
                                  mutable=mutable)
        _, featsL, _ = unpack(outsL)

        # SimSiam global↔global term at one sampled level (train_3d.py:119).
        key, k2 = jax.random.split(key)
        loss2, index2 = cos_loss(k2, feats1, feats2)

        # 12 local terms, each at its own sampled level (train_3d.py:127-134).
        keys = jax.random.split(key, 2 * n_views)
        local_loss = 0.0
        for i in range(n_views):
            feats_i = [
                (pro[b * i: b * (i + 1)], pre[b * i: b * (i + 1)])
                for pro, pre in featsL
            ]
            l1, _ = cos_loss(keys[2 * i], feats1, feats_i)
            l2, _ = cos_loss(keys[2 * i + 1], feats2, feats_i)
            local_loss = local_loss + l1 + l2
        local_loss = local_loss / (2 * n_views)

        # Pixel restoration + β-decayed deep-supervision MSE (train_3d.py:135-137).
        loss1 = mse_loss(out1, gt)
        beta = beta_schedule(epoch, beta_period)
        if masks1[0].shape == gt.shape:
            # in-model upsampled masks (reference API): stack + dynamic index.
            # XLA cannot DCE the unselected levels' upsample forwards or their
            # backward paths (the index is traced), so every level pays.
            stacked_masks = jnp.stack(masks1)
            loss4 = beta * mse_loss(stacked_masks[index2], gt)
        else:
            # native-res masks (model built with upsample_masks=False): only
            # the SELECTED level's upsample + MSE + backward runs — the
            # unselected levels' gradients are exactly zero in both forms
            # (torch autograd also only walks the selected path,
            # train_3d.py:137), so the trajectory is identical and the
            # unselected heads' BN stats still update in the model forward.
            from pcrlv2_tpu.ops import upsample_linear

            def mask_branch(mask):
                scale = gt.shape[1] // mask.shape[1]
                return lambda _: mse_loss(upsample_linear(mask, scale), gt)

            loss4 = beta * jax.lax.switch(
                index2, [mask_branch(m) for m in masks1], None)

        total = loss1 + loss2 + loss4 + local_loss
        metrics = {
            "loss": total,
            "mg_loss": loss1,
            "cos_loss": loss2,
            "local_loss": local_loss,
            "mask_loss": loss4,
            "level": index2,
        }
        return total, (updL["batch_stats"], metrics)

    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    dim: int = 3,
    aug_fn: Optional[Callable] = None,
    loss_guard: Optional[float] = 1000.0,
    guard_warmup_epochs: int = 10,
    beta_period: float = 240.0,
    mixup_alpha: Optional[float] = None,
):
    """Build the fused train step for the 3D (``train_3d.py:95-151``) or 2D
    (``train_2d.py:120-172``) pipeline.

    Args:
      model: ``PCRLv23d`` (dim=3) or ``PCRLv2`` (dim=2).  The two differ in
        top-level output order — 3D returns ``(out, feats, masks)``
        (``pcrlv2_model_3d.py:133``), 2D ``(feats, masks_out, masks)``
        (``pcrlv2_model.py:209``).
      tx: optimizer core (``pcrlv2_tpu.train.optimizer.sgd``); LR is applied
        per step from the traced ``lr`` argument.
      aug_fn: optional on-device augmentation: ``aug_fn(key, raw_batch) ->
        dict(x1, x2, gt, locals)``.  When None the batch must already contain
        those views.
      loss_guard: the reference's anomaly skip — drop the update if
        ``loss > 1000 and epoch > 10`` (``train_3d.py:140-142``; 2D has no
        guard, pass ``None``).
      mixup_alpha: opt-in input mixup.  The reference defines ``mixup_data``
        (``train_2d.py:44-59``) but never calls it; when set, both global
        views are mixed with the same permutation/λ and the restoration GT is
        mixed consistently.

    Returns a function ``step(state, batch, key, lr, epoch) -> (state, metrics)``
    suitable for ``jax.jit`` (donate ``state``).
    """

    loss_fn = make_loss_fn(model, dim=dim, beta_period=beta_period,
                           mixup_alpha=mixup_alpha)

    def step(state: TrainState, batch, key, lr, epoch):
        if aug_fn is not None:
            key, kaug = jax.random.split(key)
            views = aug_fn(kaug, batch)
        else:
            views = batch

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, views, key, epoch)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, apply_lr(updates, lr))

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )

        # Finite-loss guard: skip the whole update (params, momentum, stats,
        # AND the int32 step counter) on loss spikes / non-finite loss, like
        # the reference's `if loss > 1000 and epoch > 10: continue`
        # (train_3d.py:140-142) — extended to always skip NaN/Inf.  Every
        # leaf reverts so a skipped update leaves the state indistinguishable
        # from no step at all (the reference's `continue` advances nothing).
        bad = ~jnp.isfinite(loss)
        if loss_guard is not None:
            bad = bad | ((loss > loss_guard) & (epoch > guard_warmup_epochs))
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bad, old, new), new_state, state)
        metrics["skipped"] = bad.astype(jnp.float32)
        return new_state, metrics

    return step


def make_pipelined_train_step(
    model,
    tx: optax.GradientTransformation,
    aug_fn: Callable,
    *,
    dim: int = 3,
    loss_guard: Optional[float] = 1000.0,
    guard_warmup_epochs: int = 10,
    beta_period: float = 240.0,
    mixup_alpha: Optional[float] = None,
):
    """The fused step PLUS the NEXT batch's augmentation in one program.

    One dispatch per training step instead of two.  Device time is unchanged
    when the host keeps the queue fed (measured neutral in the saturated
    bench loop), but the single-program form hides host-side gaps — in a
    loop with per-iteration Python work (key derivation, metering, logging)
    it measured 621 → 536 ms per aug+step pair on the tunneled v5e.
    Numerics are identical to the sequential path: same ops, same keys
    (tested leaf-exactly).

    NB: this is NOT the known-pathological "fuse aug into the grad program"
    (BENCHMARKS.md) — the next batch's aug is an independent subgraph whose
    output feeds the FOLLOWING step, so XLA cannot tangle it into the loss
    schedule.

    Returns ``step(state, views, raw_next, key, key_aug_next, lr, epoch) ->
    (state, metrics, next_views)``.  Prime the first ``views`` with a plain
    jitted ``aug_fn``; at epoch end the trailing ``next_views`` is discarded.
    """
    base = make_train_step(model, tx, dim=dim, aug_fn=None,
                           loss_guard=loss_guard,
                           guard_warmup_epochs=guard_warmup_epochs,
                           beta_period=beta_period, mixup_alpha=mixup_alpha)

    def step(state, views, raw_next, key, key_aug_next, lr, epoch):
        new_state, metrics = base(state, views, key, lr, epoch)
        next_views = aug_fn(key_aug_next, raw_next)
        return new_state, metrics, next_views

    return step
