"""Downstream fine-tuning (``--phase finetune``).

The reference branch contains no finetune *code* — only the consumption
recipe (reference ``README.md:29-55``): load the pretrained ``.pt`` into an
smp ResNet-18 (2D, encoder-only with the ``fc.*`` patch, ``README.md:40-44``)
or into ``PCRLv23d`` (3D, full model, ``README.md:50-54``) and train a
downstream task.  Its ``main.py`` silently no-ops on ``--phase finetune``
(``main.py:47-50``).  This module implements that documented consumption
path as a first-class trainer:

* **2D (chest)**: pretrained encoder → the smp aux classification head the
  README configures (``pooling='avg', dropout=0.2, activation='sigmoid',
  classes=n``, ``README.md:31-38``) → multi-label BCE on the 14 NIH labels
  that ``chest_train.txt`` already carries (reference ``utils.py:7-19``).
  The saved ``state_dict`` is a COMPLETE torchvision ResNet-18 schema
  (encoder keys + ``fc.weight/fc.bias`` from the classifier head), so it
  loads ``strict=True`` into ``torchvision.models.resnet18(num_classes=n)``.
* **3D (luna)**: the full pretrained ``PCRLv23d`` → its existing sigmoid
  segmentation output (``out_tr``, reference ``pcrlv2_model_3d.py:75-83``)
  → Dice+BCE against a voxel mask.  No segmentation ground truth ships with
  the reference repo, so without real masks the task is an
  intensity-threshold pseudo-segmentation (documented placeholder; the
  load→train→save plumbing is the point).  Finetune UIDs come from the
  semi-supervised complement split ``get_luna_finetune_list`` (reference
  ``utils.py:30-35``), which exists upstream exactly for this phase.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pcrlv2_tpu.core.precision import DEFAULT_POLICY, Policy
from pcrlv2_tpu.models.resnet import ResNet18Encoder
from pcrlv2_tpu.train import checkpoint as ckpt_lib
from pcrlv2_tpu.train.optimizer import apply_lr, cosine_lr, sgd
from pcrlv2_tpu.train.step import TrainState
from pcrlv2_tpu.utils.meters import MetricLogger


class ChestClassifier(nn.Module):
    """ResNet-18 + the smp aux classification head (``README.md:31-38``):
    global average pooling → dropout 0.2 → linear → (sigmoid lives in the
    loss/predict, not the trunk — BCE-with-logits is the stable form).

    Parameter layout is torchvision-complete: ``encoder`` maps to the
    torchvision ResNet-18 trunk and ``fc`` to its classifier, so checkpoint
    export round-trips through ``torchvision.models.resnet18``.
    """

    n_class: int = 14
    dropout: float = 0.2
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = ResNet18Encoder(policy=self.policy, name="encoder")(x, train)
        h = feats[-1].mean(axis=(1, 2))  # GAP over H, W → (B, 512)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # classifier math in f32: a 512×14 matmul is free, logits are loss-side
        logits = nn.Dense(self.n_class, dtype=jnp.float32, name="fc")(
            h.astype(jnp.float32))
        return logits


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def bce_with_logits(logits, labels):
    """Mean multi-label binary cross-entropy (torch BCEWithLogitsLoss)."""
    z = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    # log(1+e^-|z|) + max(z,0) - z*y  — the numerically-stable form
    return jnp.mean(jnp.logaddexp(0.0, -jnp.abs(z))
                    + jnp.maximum(z, 0.0) - z * y)


def dice_loss(probs, target, eps: float = 1e-5):
    """Soft Dice over the whole batch (standard 3D-segmentation form)."""
    p = probs.astype(jnp.float32).reshape(-1)
    t = target.astype(jnp.float32).reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)


def seg_loss(probs, target):
    """Dice + BCE on sigmoid probabilities — the common 3D downstream combo."""
    p = jnp.clip(probs.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
    t = target.astype(jnp.float32)
    bce = -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return dice_loss(probs, target) + bce


def pseudo_mask(volume, threshold: float = 0.5):
    """Intensity-threshold placeholder target for 3D finetune without real
    segmentation ground truth (none ships with the reference repo)."""
    return (volume > threshold).astype(jnp.float32)


def mean_roc_auc(scores, labels) -> float:
    """Mean per-class ROC-AUC — the field's metric for NIH ChestX-ray14
    multi-label classification (and the PCRLv2 paper's, arXiv:2301.00772).

    Rank-based (Mann-Whitney U) with tie-averaged ranks, pure NumPy.
    Classes with no positives or no negatives in the evaluated set are
    skipped (AUC is undefined there); returns NaN when no class is
    scoreable.  Thresholded accuracy is NOT a substitute on this heavily
    imbalanced task (all-negative predictions score ~0.9 accuracy).
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels) > 0.5
    n = scores.shape[0]
    aucs = []
    for c in range(scores.shape[1]):
        y = labels[:, c]
        n_pos = int(y.sum())
        n_neg = n - n_pos
        if n_pos == 0 or n_neg == 0:
            continue
        s = scores[:, c]
        order = np.argsort(s, kind="mergesort")
        # tie-averaged ranks: each run of equal scores gets its mean rank
        _, inv, counts = np.unique(s[order], return_inverse=True,
                                   return_counts=True)
        cum = np.cumsum(counts)
        mean_rank_of_unique = (cum - counts + 1 + cum) / 2.0
        ranks = np.empty(n, np.float64)
        ranks[order] = mean_rank_of_unique[inv]
        aucs.append((ranks[y].sum() - n_pos * (n_pos + 1) / 2.0)
                    / (n_pos * n_neg))
    return float(np.mean(aucs)) if aucs else float("nan")


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------


def create_finetune_state(model, tx, key, sample_batch, **apply_kwargs):
    """Like ``create_train_state`` but threads a dropout RNG (the classifier
    head has one; ``model.init`` without it would fail)."""
    kp, kd = jax.random.split(key)
    variables = jax.jit(
        lambda kp, kd, x: model.init({"params": kp, "dropout": kd}, x,
                                     train=True, **apply_kwargs)
    )(kp, kd, sample_batch)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _norm_images(images):
    """Raw host batch → model input, INSIDE the jitted program: uint8 stays
    uint8 over the host→device transfer (4× fewer bytes; 12× with the
    single-channel cache) and the normalize/replicate fuses into the first
    conv.  Also keeps a sharded batch sharded (elementwise + channel tile)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if images.shape[-1] == 1:
        images = jnp.tile(images, (1, 1, 1, 3))
    return images


def make_finetune_step_2d(model, tx):
    """(state, images, labels, key, lr) → (state, metrics) — one program."""

    def loss_fn(params, batch_stats, images, labels, key):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _norm_images(images),
            train=True, mutable=["batch_stats"], rngs={"dropout": key})
        loss = bce_with_logits(logits, labels)
        acc = jnp.mean(((logits > 0) == (labels > 0.5)).astype(jnp.float32))
        return loss, (mutated["batch_stats"], {"loss": loss, "acc": acc})

    def step(state: TrainState, images, labels, key, lr):
        grads, (stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, labels, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params,
                              apply_lr(updates, lr))
        return state.replace(params=params, batch_stats=stats,
                             opt_state=opt_state, step=state.step + 1), metrics

    return step


def make_finetune_step_3d(model, tx):
    """(state, volumes, masks, lr) → (state, metrics).

    ``model`` is the full pretrained ``PCRLv23d``; the step trains its
    sigmoid segmentation output (``local=True`` skips the SSL middle-mask
    upsampling — the pro/pre heads still run but are loss-free, so their
    gradients are exactly zero).
    """

    def loss_fn(params, batch_stats, volumes, masks):
        (out, _feats, _masks), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, volumes,
            local=True, train=True, mutable=["batch_stats"])
        loss = seg_loss(out, masks)
        dice = 1.0 - dice_loss(out, masks)
        return loss, (mutated["batch_stats"], {"loss": loss, "dice": dice})

    def step(state: TrainState, volumes, masks, lr):
        grads, (stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, volumes, masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params,
                              apply_lr(updates, lr))
        return state.replace(params=params, batch_stats=stats,
                             opt_state=opt_state, step=state.step + 1), metrics

    return step


def make_finetune_eval_2d(model):
    """(params, batch_stats, images, labels) → metrics; eval mode (no
    dropout, running BN statistics), no state mutation."""

    def step(params, batch_stats, images, labels):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             _norm_images(images), train=False)
        loss = bce_with_logits(logits, labels)
        acc = jnp.mean(((logits > 0) == (labels > 0.5)).astype(jnp.float32))
        # logits ride back to host so evaluate() can compute per-class
        # ROC-AUC over the WHOLE eval set (AUC does not decompose into
        # per-batch means) — B×n_class floats, negligible transfer
        return {"loss": loss, "acc": acc, "logits": logits}

    return step


def make_finetune_eval_3d(model):
    """(params, batch_stats, volumes, masks) → metrics; eval mode."""

    def step(params, batch_stats, volumes, masks):
        out, _feats, _masks = model.apply(
            {"params": params, "batch_stats": batch_stats}, volumes,
            local=True, train=False)
        loss = seg_loss(out, masks)
        dice = 1.0 - dice_loss(out, masks)
        return {"loss": loss, "dice": dice}

    return step


# ---------------------------------------------------------------------------
# the driver
# ---------------------------------------------------------------------------


class FinetuneTrainer:
    """Minimal epoch driver: load pretrained → train downstream → save.

    2D saves a torchvision-complete ResNet-18 ``state_dict`` (+head) in the
    reference ``{'opt','state_dict','optimizer','epoch'}`` schema; 3D saves
    the full PCRLv23d exactly like the pretask trainer (``train_3d.py:74``).
    """

    def __init__(self, cfg, *, dim: int, n_class: int = 14,
                 policy: Policy = DEFAULT_POLICY, weight: Optional[str] = None,
                 mesh=None):
        self.cfg = cfg
        self.dim = dim
        self.n_class = n_class
        self.mesh = mesh  # data-axis DP: replicated state, sharded batches
        self.tx = sgd(momentum=cfg.momentum, weight_decay=cfg.weight_decay)
        key = jax.random.key(cfg.seed)
        if dim == 2:
            self.model = ChestClassifier(n_class=n_class, policy=policy)
            sample = jnp.zeros((cfg.b, 224, 224, 3), jnp.float32)
            self.state = create_finetune_state(self.model, self.tx, key, sample)
            self._step = jax.jit(make_finetune_step_2d(self.model, self.tx),
                                 donate_argnums=(0,))
        elif dim == 3:
            from pcrlv2_tpu.models import PCRLv23d

            self.model = PCRLv23d(policy=policy)
            sample = jnp.zeros((cfg.b, 64, 64, 32, 1), jnp.float32)
            from pcrlv2_tpu.train.step import create_train_state

            self.state = create_train_state(self.model, self.tx, key, sample)
            self._step = jax.jit(make_finetune_step_3d(self.model, self.tx),
                                 donate_argnums=(0,))
        else:
            raise ValueError(f"unsupported dim {dim}")
        self._eval_step = jax.jit(
            make_finetune_eval_2d(self.model) if dim == 2
            else make_finetune_eval_3d(self.model))
        if weight:
            self.load_pretrained(weight)
            print(f"==> finetune initialized from {weight}")
        else:
            print("WARNING: finetuning FROM SCRATCH — pass --weight "
                  "<pretrained.pt> (ours or the reference's) for the "
                  "documented downstream recipe (README.md:29-55)")
        if mesh is not None:
            # replicate the train state once; the batch-sharded inputs make
            # plain jit partition the step SPMD with an automatic gradient
            # psum over the data axis — the nn.DataParallel analog, same as
            # the pretask trainer (core/mesh.py)
            from pcrlv2_tpu.core.mesh import replicated_sharding

            self.state = jax.device_put(self.state,
                                        replicated_sharding(mesh))
        os.makedirs(cfg.output, exist_ok=True)
        from pcrlv2_tpu.utils.meters import metrics_path

        self.logger = MetricLogger(metrics_path(cfg.output))

    def load_pretrained(self, path: str) -> None:
        if self.dim == 2:
            # encoder-only checkpoint (pretask convention, train_2d.py:99) or
            # a bare torchvision state_dict; fc.* is patched out on import
            # exactly as README.md:42-43 patches it in
            enc_vars, _ = ckpt_lib.import_resnet18_encoder(path)
            params = dict(self.state.params)
            stats = dict(self.state.batch_stats)
            params["encoder"] = enc_vars["params"]
            stats["encoder"] = enc_vars["batch_stats"]
            self.state = self.state.replace(params=params, batch_stats=stats)
        else:
            variables, _ = ckpt_lib.import_pcrlv23d(path)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"])

    def _put(self, x, sharded: bool = True):
        """Host array → device; with a mesh, leading-dim sharded over
        ``data`` (``sharded=False`` for ragged eval tail batches that do not
        divide the data axis — plain put, jit handles the odd shape)."""
        if self.mesh is not None and sharded:
            from pcrlv2_tpu.core.mesh import shard_batch

            return shard_batch(self.mesh, x)
        return jnp.asarray(x)

    def _prep(self, batch, sharded: bool = True):
        """Host batch → (inputs, targets) device arrays (shared by the train
        and eval paths).  2D images transfer RAW (uint8 if cached) — the
        normalize/replicate happens inside the jitted step."""
        if self.dim == 2:
            return (self._put(np.asarray(batch["image"]), sharded),
                    self._put(np.asarray(batch["label"], np.float32), sharded))
        vol = self._put(
            np.ascontiguousarray(np.asarray(batch["pair"],
                                            np.float32)[:, 0][..., None]),
            sharded)
        masks = (self._put(np.asarray(batch["mask"], np.float32), sharded)
                 if "mask" in batch else pseudo_mask(vol))
        return vol, masks

    def train_epoch(self, epoch: int, batch_iter) -> dict:
        cfg = self.cfg
        lr = jnp.float32(cosine_lr(epoch, cfg.lr, cfg.epochs))
        # per-batch metrics stay on device (tiny scalars, keeps dispatch
        # async); ONE device_get at epoch end yields the true epoch mean —
        # syncing only the last batch would log an arbitrary sample of the
        # training curve
        collected = []
        for i, batch in enumerate(batch_iter):
            x, y = self._prep(batch)
            if self.dim == 2:
                key = jax.random.fold_in(jax.random.key(cfg.seed),
                                         epoch * 100003 + i)
                self.state, metrics = self._step(self.state, x, y, key, lr)
            else:
                self.state, metrics = self._step(self.state, x, y, lr)
            collected.append(metrics)
        if collected:
            vals = jax.device_get(collected)
            loss = float(np.mean([v["loss"] for v in vals]))
            metric = float(np.mean(
                [v.get("acc", v.get("dice", 0.0)) for v in vals]))
        else:
            loss = metric = 0.0
        out = {"epoch": epoch, "lr": float(lr), "loss": loss,
               "metric": metric}
        self.logger.log(out)
        return out

    def evaluate(self, batch_iter, max_batches: int = 0) -> dict:
        """Fixed-order eval pass (no dropout, running BN statistics, no
        state mutation) → metrics keyed ``eval_*``.

        Scalar metrics are batch-size-weighted means (eval loaders run
        ``drop_last=False``, so the tail batch may be ragged); 2D also
        reports ``eval_auc`` — mean per-class ROC-AUC over the WHOLE
        evaluated set, computed host-side from the collected logits
        (``mean_roc_auc``), the task's actual metric.
        """
        collected = []   # (batch_size, device metrics)
        labels_all = []  # host labels for the 2D AUC
        multihost = jax.process_count() > 1
        data_size = 1
        if self.mesh is not None:
            from pcrlv2_tpu.core.mesh import DATA_AXIS

            data_size = self.mesh.shape.get(DATA_AXIS, 1)
        for i, batch in enumerate(batch_iter):
            if max_batches and i >= max_batches:
                break
            bsz = int(jax.tree.leaves(batch)[0].shape[0])
            # GLOBAL-batch divisibility (local × world) — see
            # core.mesh.batch_not_shardable
            from pcrlv2_tpu.core.mesh import batch_not_shardable

            ragged = batch_not_shardable(bsz, data_size, jax.process_count())
            if ragged and multihost:
                print(f"WARNING: eval tail batch of {bsz} samples skipped "
                      f"(global batch not divisible by the data axis "
                      f"{data_size} under multihost sharding)")
                continue
            x, y = self._prep(batch, sharded=not ragged)
            collected.append((bsz, self._eval_step(
                self.state.params, self.state.batch_stats, x, y)))
            if self.dim == 2:
                labels_all.append(np.asarray(batch["label"], np.float32))
        if not collected:
            return {}
        vals_dev = [m for _, m in collected]
        if multihost:
            # the per-sample logits are sharded over the GLOBAL data axis;
            # device_get on non-addressable shards would raise, and pairing
            # global logits with process-local labels would mis-align —
            # drop them and keep the scalar metrics (the CLI currently
            # refuses multihost finetune anyway; this keeps the method
            # safe if that changes)
            vals_dev = [{k: v for k, v in m.items() if k != "logits"}
                        for m in vals_dev]
        vals = jax.device_get(vals_dev)
        weights = np.asarray([b for b, _ in collected], np.float64)
        out = {f"eval_{k}": float(np.average([v[k] for v in vals],
                                             weights=weights))
               for k in vals[0] if k != "logits"}
        if self.dim == 2 and "logits" in vals[0]:
            auc = mean_roc_auc(np.concatenate([v["logits"] for v in vals]),
                               np.concatenate(labels_all))
            if np.isfinite(auc):
                out["eval_auc"] = auc
        return out

    def save(self, epoch: int) -> str:
        cfg = self.cfg
        path = os.path.join(cfg.output, cfg.ckpt_name(epoch))
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        if self.dim == 2:
            enc = {"params": variables["params"]["encoder"],
                   "batch_stats": variables["batch_stats"]["encoder"]}
            sd = ckpt_lib.flax_to_torch_state(
                enc, ckpt_lib.resnet18_encoder_mapping())
            # the classifier head completes the torchvision schema
            fc = variables["params"]["fc"]
            sd["fc.weight"] = np.asarray(fc["kernel"]).T
            sd["fc.bias"] = np.asarray(fc["bias"])
            ckpt_lib.save_reference_checkpoint(path, sd, opt=vars(cfg),
                                               epoch=epoch)
        else:
            ckpt_lib.export_pcrlv23d(variables, path, opt=vars(cfg),
                                     epoch=epoch)
        return path


def run_finetune(cfg, loader, *, dim: int, n_class: int = 14,
                 policy: Policy = DEFAULT_POLICY, weight: Optional[str] = None,
                 epochs: Optional[int] = None, eval_loader=None,
                 mesh=None) -> FinetuneTrainer:
    """Load → train → save (the driver-facing entry for ``--phase finetune``)."""
    if getattr(cfg, "resume", None):
        # finetune checkpoints are reference-schema .pt weights (no optimizer
        # state / Orbax tree) — accepting --resume and ignoring it would
        # silently restart from scratch
        raise SystemExit(
            "--resume is not supported with --phase finetune: its "
            "checkpoints are reference-schema .pt weight files. Restart "
            "from the last saved .pt via --weight instead "
            "(use --save_every N for a finer checkpoint cadence).")
    chip_lock = None
    if jax.default_backend() != "cpu":
        from pcrlv2_tpu.utils import chiplock
        chip_lock = chiplock.guard_warn(f"finetune d={dim} n={cfg.n}")
    trainer = FinetuneTrainer(cfg, dim=dim, n_class=n_class, policy=policy,
                              weight=weight, mesh=mesh)
    total = cfg.epochs if epochs is None else epochs
    for epoch in range(total + 1):
        t0 = time.time()
        stats = trainer.train_epoch(epoch, loader.epoch(epoch))
        print(f"epoch {epoch}, total time {time.time() - t0:.2f}, "
              f"loss {stats['loss']:.4f}")
        if (eval_loader is not None and cfg.eval_every
                and epoch % cfg.eval_every == 0):
            # epoch(0): the held-out set in the SAME fixed order every pass,
            # so the metric tracks the model, not the sample
            ev = trainer.evaluate(eval_loader.epoch(0), cfg.eval_batches)
            if ev:
                trainer.logger.log({"epoch": epoch, **ev})
                print(f"eval: {ev}")
        # same cadence contract as the pretask trainer: a long run killed
        # mid-way loses at most save_every epochs instead of everything
        if cfg.save_every and epoch % cfg.save_every == 0 and epoch < total:
            print(f"==> checkpoint: {trainer.save(epoch)}")
    path = trainer.save(total)
    print(f"==> saved finetuned checkpoint: {path}")
    if chip_lock is not None:
        chip_lock.release()
    return trainer
