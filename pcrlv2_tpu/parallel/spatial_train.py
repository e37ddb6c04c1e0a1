"""Spatially-sharded TRAINING step — the full 4-term PCRLv2 objective with the
global views' volume depth-sharded across chips.

``spatial_apply`` (spatial_model.py) covers the sharded *forward*; this module
closes the loop for training: loss, gradients, and the optimizer update, so
volumes (or batch x volume products) that exceed one device's HBM can be
*pretrained on*, not just evaluated.  The reference has no story for this at
all — its only parallelism is batch replication (``nn.DataParallel``,
reference ``train_3d.py:54``).

Design (one ``shard_map`` over a ``(data, spatial)`` mesh inside the jitted
step):

* x1/x2/gt enter sharded ``P(data, spatial)`` — batch over ``data``, volume
  depth over ``spatial``.  Local 16³ views are tiny and enter ``P(data)``
  (replicated over ``spatial``).
* The two global forwards run under ``spatial_scope(spatial, batch_axes=
  (data,))``: 3³ convs halo-exchange one plane (``ppermute`` over ICI), GAP
  heads ``pmean``, BatchNorm reduces statistics over BOTH axes — so the math
  is bit-for-bit the global-batch, full-volume computation.
* The local forward runs under ``spatial_scope(None, batch_axes=(data,))`` —
  no halos, but BN still sees global-batch statistics.
* Every loss term is a mean over equal-size shards, so ``pmean`` over the
  mesh axes reproduces the exact global value on every device.
* ``jax.grad`` differentiates *through the collectives* (ppermute/pmean
  transpose to their duals), leaving each device with its local gradient
  contribution; one ``psum`` over the mesh yields the exact global gradient,
  and the optimizer update is computed replicated.

Equivalence with the unsharded fused step (``train/step.py``) is exact to fp
tolerance — tested on the virtual CPU mesh (``tests/test_spatial_train.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcrlv2_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS
from pcrlv2_tpu.parallel.context import spatial_scope
from pcrlv2_tpu.train.losses import beta_schedule, cos_loss, mse_loss
from pcrlv2_tpu.train.optimizer import apply_lr
from pcrlv2_tpu.train.step import TrainState, _flatten_locals



def _make_local_loss_fn(model, data_axis: str, spatial_axis: str,
                        beta_period: float):
    """Per-shard 4-term loss (inside shard_map): every term pmean'd to the
    exact global value.  Shared by the train step and the sharded eval."""
    axes = (data_axis, spatial_axis)

    def unpack(outs):
        out, feats, masks = outs
        return out, feats, masks

    def local_loss_fn(params, batch_stats, views, key, epoch):
        x1, x2, gt, local_views = (
            views["x1"], views["x2"], views["gt"], views["locals"])
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"]

        with spatial_scope(spatial_axis, batch_axes=(data_axis,)):
            outs1, upd1 = model.apply(variables, x1, train=True,
                                      mutable=mutable)
            out1, feats1, masks1 = unpack(outs1)
            variables = {"params": params,
                         "batch_stats": upd1["batch_stats"]}
            outs2, upd2 = model.apply(variables, x2, train=True,
                                      mutable=mutable)
            _, feats2, _ = unpack(outs2)
            variables = {"params": params,
                         "batch_stats": upd2["batch_stats"]}

        local_flat, b, n_views = _flatten_locals(local_views)
        with spatial_scope(None, batch_axes=(data_axis,)):
            outsL, updL = model.apply(variables, local_flat, local=True,
                                      train=True, mutable=mutable)
            _, featsL, _ = unpack(outsL)

        gmean = lambda t: lax.pmean(t, axes)

        # SimSiam global<->global at one sampled level (train_3d.py:119).
        # cos_loss means over the LOCAL batch rows; pmean over `data`
        # restores the global batch mean (pmean over `spatial` is an
        # identity — the GAP'd features are replicated across depth shards).
        key, k2 = jax.random.split(key)
        loss2_local, index2 = cos_loss(k2, feats1, feats2)
        loss2 = gmean(loss2_local)

        # 12 local terms at their own sampled levels (train_3d.py:127-134).
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
        local_loss = gmean(local_loss / (2 * n_views))

        # Pixel restoration + beta-decayed deep-supervision MSE over the
        # sharded output volume: equal shard extents make the pmean of the
        # local means the exact global mean (train_3d.py:135-137).
        loss1 = gmean(mse_loss(out1, gt))
        beta = beta_schedule(epoch, beta_period)
        stacked_masks = jnp.stack(masks1)
        loss4 = beta * gmean(mse_loss(stacked_masks[index2], gt))

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

    return local_loss_fn


def make_spatial_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    dim: int = 3,
    data_axis: str = DATA_AXIS,
    spatial_axis: str = SPATIAL_AXIS,
    loss_guard: Optional[float] = 1000.0,
    guard_warmup_epochs: int = 10,
    beta_period: float = 240.0,
):
    """Build the depth-sharded train step.

    Returns ``step(state, views, key, lr, epoch) -> (state, metrics)`` for
    ``jax.jit(..., donate_argnums=(0,))``.  ``views`` must hold the already-
    augmented ``x1/x2/gt`` (B, D, H, W, C) and ``locals`` (B, V, d, h, w, C);
    B must divide by the ``data`` axis size and D by ``spatial``·8 (three 2×
    pools).  Parameters stay replicated; only activations are sharded.
    """
    if dim != 3:
        raise ValueError("spatial sharding applies to the 3D volume pipeline")
    axes = (data_axis, spatial_axis)
    local_loss_fn = _make_local_loss_fn(model, data_axis, spatial_axis,
                                        beta_period)

    def shard_body(params, batch_stats, views, key, epoch):
        grad_fn = jax.value_and_grad(local_loss_fn, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            params, batch_stats, views, key, epoch)
        # Each device differentiates the replicated global loss: under
        # check_vma=False the psum inside the loss's pmean transposes to a
        # psum, so every device's cotangent is UNscaled — device k holds
        # d(t_k)/dparams for its shard term t_k (cross-shard paths routed by
        # the ppermute transposes).  The global gradient d(mean_k t_k)/dp is
        # therefore the MEAN of the per-device grads, not the sum (verified
        # leaf-exactly in tests/test_spatial_train.py).  Cross-device BN
        # makes new_stats replicated already.
        grads = lax.pmean(grads, axes)
        return loss, grads, new_stats, metrics

    view_specs = {
        "x1": P(data_axis, spatial_axis),
        "x2": P(data_axis, spatial_axis),
        "gt": P(data_axis, spatial_axis),
        "locals": P(data_axis),
    }
    sharded_grads = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), view_specs, P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    def step(state: TrainState, views, key, lr, epoch):
        views = {k: views[k] for k in ("x1", "x2", "gt", "locals")}
        n_sp = mesh.shape[spatial_axis]
        assert views["x1"].shape[1] % (n_sp * 8) == 0, (
            f"volume depth {views['x1'].shape[1]} must divide by "
            f"spatial shards*8 = {n_sp * 8} (three 2x pools per shard)")
        loss, grads, new_stats, metrics = sharded_grads(
            state.params, state.batch_stats, views, key, epoch)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, apply_lr(updates, lr))
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )

        # Finite-loss guard (train_3d.py:140-142), as in train/step.py:
        # every leaf (incl. the int32 step) reverts on a skipped update.
        bad = ~jnp.isfinite(loss)
        if loss_guard is not None:
            bad = bad | ((loss > loss_guard) & (epoch > guard_warmup_epochs))
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bad, old, new), new_state, state)
        metrics["skipped"] = bad.astype(jnp.float32)
        return new_state, metrics

    return step


def make_spatial_eval_fn(model, mesh: Mesh, *, data_axis: str = DATA_AXIS,
                         spatial_axis: str = SPATIAL_AXIS,
                         beta_period: float = 240.0):
    """Depth-sharded eval: the 4-term loss value only, same sharding as the
    train step — so `--eval_every` works in exactly the regime `--spatial`
    exists for (volumes/batches beyond one chip's HBM).

    Returns ``eval_fn(params, batch_stats, views, key) -> metrics`` (views
    pre-sharded with :func:`shard_views`).
    """
    local_loss_fn = _make_local_loss_fn(model, data_axis, spatial_axis,
                                        beta_period)

    def body(params, batch_stats, views, key):
        _, (_, metrics) = local_loss_fn(params, batch_stats, views, key,
                                        jnp.int32(0))
        return metrics

    view_specs = {
        "x1": P(data_axis, spatial_axis),
        "x2": P(data_axis, spatial_axis),
        "gt": P(data_axis, spatial_axis),
        "locals": P(data_axis),
    }
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), view_specs, P()),
                   out_specs=P(), check_vma=False)

    def eval_fn(params, batch_stats, views, key):
        views = {k: views[k] for k in ("x1", "x2", "gt", "locals")}
        return fn(params, batch_stats, views, key)

    return eval_fn


def shard_views(views, mesh: Mesh, *, data_axis: str = DATA_AXIS,
                spatial_axis: str = SPATIAL_AXIS):
    """device_put augmented views with batch over ``data`` and the global
    volumes' depth over ``spatial`` (locals replicated over ``spatial``)."""
    put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
    return {
        "x1": put(views["x1"], P(data_axis, spatial_axis)),
        "x2": put(views["x2"], P(data_axis, spatial_axis)),
        "gt": put(views["gt"], P(data_axis, spatial_axis)),
        "locals": put(views["locals"], P(data_axis)),
    }
