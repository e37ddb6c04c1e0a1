"""Epoch-loop trainers mirroring the reference engines.

``train_pcrlv2_3d`` (reference ``train_3d.py:42-83``) and ``train_pcrlv2``
(reference ``train_2d.py:62-108``): cosine LR per epoch, fused step per batch,
meters printed every 10 iterations, checkpoints at ``epoch % 100 == 0`` or
``epoch == 240`` under the reference filename convention
``{model}_{n}_{phase}_{ratio}_{epoch}.pt`` — 3D saves the full model, 2D saves
the encoder only (``train_3d.py:74`` vs ``train_2d.py:99``).  On top of the
reference's save-only story this trainer also writes Orbax train state for
exact resume (optimizer + step included).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcrlv2_tpu.core import mesh as mesh_lib
from pcrlv2_tpu.core.rng import step_key
from pcrlv2_tpu.train import checkpoint as ckpt_lib
from pcrlv2_tpu.train.optimizer import cosine_lr, sgd
from pcrlv2_tpu.train.step import TrainState, create_train_state, make_train_step
from pcrlv2_tpu.utils.meters import AverageMeter, MetricLogger, metrics_path


@dataclass
class TrainConfig:
    """CLI-parity hyperparameters (reference ``main.py:22-40``)."""

    model: str = "pcrlv2"
    n: str = "luna"
    phase: str = "pretask"
    d: int = 3
    b: int = 16
    epochs: int = 240
    lr: float = 1e-3
    output: str = "./out"
    ratio: float = 1.0
    momentum: float = 0.9
    weight_decay: float = 1e-4
    seed: int = 42
    amp: bool = True  # bf16 compute (the TPU analog of apex O1)
    workers: int = 4
    # extensions beyond the reference surface
    mixup: Optional[float] = None  # mixup_data exists-but-unused upstream
    resume: Optional[str] = None
    log_every: int = 10
    orbax_dir: Optional[str] = None
    profile_dir: Optional[str] = None  # jax.profiler trace output (opt-in)
    eval_every: int = 0  # epochs between eval passes; 0 disables
    save_every: int = 0  # extra ckpt cadence; 0 = reference cadence only
    eval_batches: int = 0  # cap batches per eval pass; 0 = the full fold
    spatial: int = 1  # >1: depth-shard the global views over `spatial` chips

    def __post_init__(self):
        # --log_every 0 would ZeroDivisionError at the (idx+1) % log_every
        # check on the first iteration; clamp to every-step logging
        self.log_every = max(1, int(self.log_every))

    def ckpt_name(self, epoch: int) -> str:
        return (f"{self.model}_{self.n}_{self.phase}_{self.ratio}_{epoch}.pt")


class Trainer:
    """Drives the fused step over epochs for either pipeline."""

    def __init__(self, model, cfg: TrainConfig, aug_fn=None, *,
                 dim: int = 3, sample_batch=None, mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.dim = dim
        self.tx = sgd(momentum=cfg.momentum, weight_decay=cfg.weight_decay)
        self.state = create_train_state(
            self.model, self.tx, jax.random.key(cfg.seed), sample_batch)
        loss_guard = 1000.0 if dim == 3 else None  # train_3d.py:140 only
        # The augmentation runs as its own jitted program feeding the step:
        # fusing it into the grad program makes XLA schedule it ~40× slower
        # (measured 1613 ms vs 690 ms per step at b=32 on v5e).
        self._aug_fn = jax.jit(aug_fn) if aug_fn is not None else None
        self._shard_views = None
        self._pipe_fn = None
        if cfg.spatial > 1:
            # depth-sharded training: the full 4-term objective with the
            # global views' volume split over the mesh's `spatial` axis
            # (parallel/spatial_train.py) — for volumes/batches beyond one
            # chip's HBM.  Exact-equivalent to the fused step (tested).
            if dim != 3:
                raise ValueError("--spatial applies to the 3D pipeline")
            if mesh is None or mesh_lib.SPATIAL_AXIS not in mesh.axis_names:
                raise ValueError("spatial>1 needs a mesh with a spatial axis")
            if cfg.mixup is not None:
                raise ValueError(
                    "--mixup is not supported with --spatial (the sharded "
                    "step has no mixup path yet)")
            from functools import partial

            from pcrlv2_tpu.parallel.spatial_train import (
                make_spatial_train_step, shard_views)

            self._step_fn = jax.jit(
                make_spatial_train_step(self.model, self.tx, mesh,
                                        loss_guard=loss_guard),
                donate_argnums=(0,),
            )
            self._shard_views = partial(shard_views, mesh=mesh)
        else:
            self._step_fn = jax.jit(
                make_train_step(self.model, self.tx, dim=dim, aug_fn=None,
                                loss_guard=loss_guard, mixup_alpha=cfg.mixup),
                donate_argnums=(0,),
            )
            if aug_fn is not None:
                # production fast path: the step and the NEXT batch's
                # augmentation in one program — one dispatch per step,
                # hiding the loop's host-side work (numerics identical —
                # see make_pipelined_train_step)
                from pcrlv2_tpu.train.step import make_pipelined_train_step

                self._pipe_fn = jax.jit(
                    make_pipelined_train_step(
                        self.model, self.tx, aug_fn, dim=dim,
                        loss_guard=loss_guard, mixup_alpha=cfg.mixup),
                    donate_argnums=(0, 1),
                )
        os.makedirs(cfg.output, exist_ok=True)
        self.logger = MetricLogger(metrics_path(cfg.output))
        self._global_step = 0
        self._eval_fn = None

    # -- evaluation ----------------------------------------------------------

    def _build_eval_fn(self):
        """Jitted eval: the same 4-term loss on un-corrupted views — the
        loss forward only, no grad/optimizer program compiled.

        Fills the reference's gap — its eval DataLoader is built but would
        crash if iterated (``transform=None`` yet ``__getitem__`` applies it,
        reference ``lunaDataset.py:37``, ``data.py:59``).

        Under ``--spatial`` the eval forward is depth-sharded too — an
        unsharded eval would replicate the full volume per device and OOM in
        exactly the regime spatial sharding exists for.
        """
        if self._shard_views is not None:
            from pcrlv2_tpu.parallel.spatial_train import make_spatial_eval_fn

            return jax.jit(make_spatial_eval_fn(self.model, self.mesh))

        from pcrlv2_tpu.train.step import make_loss_fn

        loss_fn = make_loss_fn(self.model, dim=self.dim)

        def eval_step(params, batch_stats, views, key):
            _, (_, metrics) = loss_fn(params, batch_stats, views, key,
                                      jnp.int32(0))
            return metrics

        return jax.jit(eval_step)

    @staticmethod
    def raw_batch_to_views(batch, dim: int):
        """Un-augmented eval views from a raw batch (identity restoration).

        Built with NumPy on host so callers can device_put each view straight
        to its target sharding — no transient unsharded staging copy on the
        default device (that copy is exactly what OOMs in the beyond-one-chip
        regime ``--spatial`` exists for).
        """
        if dim == 3:
            pair = np.asarray(batch["pair"], np.float32)
            locals_ = np.asarray(batch["locals"], np.float32)
            return {
                "x1": pair[:, 0][..., None],
                "x2": pair[:, 1][..., None],
                "gt": pair[:, 0][..., None],
                "gt2": pair[:, 1][..., None],
                "locals": locals_[..., None],
            }
        raise NotImplementedError("2D eval uses the aug_fn views directly")

    def evaluate(self, batch_iter, max_batches: Optional[int] = None) -> dict:
        """Average eval loss over ``batch_iter``.

        3D: un-corrupted views built directly from the raw crop pairs.
        2D: views from the augmentation pipeline under a FIXED key per batch
        index — deterministic, and mirrors the reference's chest eval loader,
        which aliases the train pipeline (reference ``data.py:58-59``).

        ``max_batches``: defaults to ``cfg.eval_batches`` (0 = the full fold).
        """
        if max_batches is None:
            max_batches = self.cfg.eval_batches
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        multihost = jax.process_count() > 1
        data_size = (self.mesh.shape.get(mesh_lib.DATA_AXIS, 1)
                     if self.mesh is not None else 1)
        meters = {k: AverageMeter() for k in
                  ("loss", "mg_loss", "cos_loss", "local_loss")}
        for i, batch in enumerate(batch_iter):
            if max_batches and i >= max_batches:
                break
            # eval loaders run drop_last=False so the held-out metric sees
            # every sample; a ragged tail batch may not divide the mesh's
            # data axis — single-host falls back to an unsharded put (one
            # extra compile for the tail shape), multihost/spatial skips it
            # loudly (global-array assembly needs divisibility).  NB the
            # divisibility check is on the GLOBAL batch (local × world).
            bsz_raw = int(jax.tree.leaves(batch)[0].shape[0])
            ragged = mesh_lib.batch_not_shardable(
                bsz_raw, data_size, jax.process_count())
            if ragged and (multihost or self._shard_views is not None):
                print(f"WARNING: eval tail batch of {bsz_raw} samples "
                      f"skipped (not divisible by the data axis "
                      f"{data_size} under "
                      f"{'multihost' if multihost else 'spatial'} sharding)")
                continue
            if self.dim == 2:
                if self._aug_fn is None:
                    raise ValueError("2D eval needs the augmentation fn")
                views = self._aug_fn(step_key(self.cfg.seed, i, 2), batch)
                if multihost:
                    # process-local aug output → global mesh arrays (the
                    # eval jit runs over the global mesh; feeding local
                    # host/device arrays straight in would crash)
                    views = mesh_lib.shard_batch(self.mesh,
                                                 jax.device_get(views))
                elif ragged:
                    # the aug jit committed these to one device; host
                    # arrays let the tail-shape eval program co-locate
                    # them with the mesh-sharded params
                    views = jax.device_get(views)
            else:
                views = self.raw_batch_to_views(batch, self.dim)
                if self._shard_views is None and self.mesh is not None \
                        and not ragged:
                    views = mesh_lib.shard_batch(self.mesh, views)
            if self._shard_views is not None:
                views = self._shard_views(views)
            metrics = jax.device_get(
                self._eval_fn(self.state.params, self.state.batch_stats,
                              views, step_key(self.cfg.seed, i)))
            bsz = int(views["x1"].shape[0])
            for k in meters:
                meters[k].update(float(metrics[k]), bsz)
        return {k: m.avg for k, m in meters.items()}

    # -- checkpointing -----------------------------------------------------

    def save_reference_ckpt(self, epoch: int):
        # single-writer: params are replicated, so every process would write
        # an identical .pt — on a shared --output that is a same-path write
        # race.  Process 0 writes; other ranks return None.  (Orbax saves
        # stay collective — all processes must call save_orbax.)
        if jax.process_index() != 0:
            return None
        cfg = self.cfg
        os.makedirs(cfg.output, exist_ok=True)
        path = os.path.join(cfg.output, cfg.ckpt_name(epoch))
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        if self.dim == 3:
            ckpt_lib.export_pcrlv23d(variables, path, opt=vars(cfg), epoch=epoch)
        else:
            enc_vars = {"params": variables["params"]["encoder"],
                        "batch_stats": variables["batch_stats"]["encoder"]}
            ckpt_lib.export_resnet18_encoder(enc_vars, path, opt=vars(cfg),
                                             epoch=epoch)
        return path

    def load_encoder_weights(self, path: str) -> None:
        """Initialize the 2D encoder from a torch ResNet-18 checkpoint —
        the ImageNet-init analog of the reference's smp default."""
        enc_vars, _ = ckpt_lib.import_resnet18_encoder(path)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params["encoder"] = enc_vars["params"]
        stats["encoder"] = enc_vars["batch_stats"]
        self.state = self.state.replace(params=params, batch_stats=stats)

    def save_orbax(self, epoch: int):
        if self.cfg.orbax_dir:
            ckpt_lib.save_train_state(self.cfg.orbax_dir, epoch, self.state)

    def restore_orbax(self, step: Optional[int] = None) -> int:
        """Restore params/opt/batch-stats AND the training position: the
        global step resumes from the saved state and the returned epoch tells
        the caller where the epoch loop (LR/β schedules, key stream) should
        continue (the reference has no resume at all)."""
        restored, saved_epoch = ckpt_lib.restore_train_state(
            self.cfg.orbax_dir, step, template=self.state)
        self.state = restored
        self._global_step = int(jax.device_get(restored.step))
        return int(saved_epoch)

    # -- the loop -----------------------------------------------------------

    def train_epoch(self, epoch: int, batch_iter) -> dict:
        cfg = self.cfg
        lr = float(cosine_lr(epoch, cfg.lr, cfg.epochs))
        meters = {k: AverageMeter() for k in
                  ("batch_time", "data_time", "cos_loss", "mg_loss",
                   "local_loss", "loss")}
        end = time.time()
        win_start = end  # wall-clock start of the current log window
        metrics = None
        sentinel = object()
        it = iter(batch_iter)
        raw = next(it, sentinel)
        views = None  # pipelined mode: aug(raw) from the previous program
        idx = -1
        time_loop = os.environ.get("PCRL_TIME_LOOP")  # per-phase loop timing
        while raw is not sentinel:
            idx += 1
            meters["data_time"].update(time.time() - end)
            t0 = time.time()
            raw_next = next(it, sentinel)
            t_next = time.time()
            key = step_key(cfg.seed, self._global_step)
            bsz = int(jax.tree.leaves(raw)[0].shape[0])
            if self._pipe_fn is not None:
                if views is None:  # prime the first batch's views
                    views = self._aug_fn(
                        step_key(cfg.seed, self._global_step, 1), raw)
                # last batch feeds itself as a dummy; its views are discarded
                feed = raw if raw_next is sentinel else raw_next
                self.state, metrics, views = self._pipe_fn(
                    self.state, views, feed, key,
                    step_key(cfg.seed, self._global_step + 1, 1),
                    jnp.float32(lr), jnp.int32(epoch))
                if time_loop:
                    print(f"[loop] iter {idx} next(it) {t_next-t0:.3f}s "
                          f"dispatch {time.time()-t_next:.3f}s", flush=True)
            else:
                batch = raw
                if self._aug_fn is not None:
                    kaug = step_key(cfg.seed, self._global_step, 1)
                    batch = self._aug_fn(kaug, batch)
                if self._shard_views is not None:
                    batch = self._shard_views(batch)
                self.state, metrics = self._step_fn(
                    self.state, batch, key, jnp.float32(lr), jnp.int32(epoch))
            self._global_step += 1
            raw = raw_next
            if (idx + 1) % cfg.log_every == 0:
                # sync once per report, like the reference's
                # torch.cuda.synchronize before timing (train_3d.py:157)
                metrics = jax.device_get(metrics)
                for k in ("cos_loss", "mg_loss", "local_loss", "loss"):
                    meters[k].update(float(metrics[k]), bsz)
                # BT = TRUE wall time per step over the window — data wait,
                # H2D, dispatch, device execution, and this sync all included
                # (dispatch is async; the device_get above drains the queue)
                now = time.time()
                meters["batch_time"].update(
                    (now - win_start) / cfg.log_every, cfg.log_every)
                win_start = now
                self.logger.log({
                    "epoch": epoch, "iter": idx + 1, "lr": lr,
                    "BT": meters["batch_time"].avg,
                    "DT": meters["data_time"].avg,
                    "cos_loss": meters["cos_loss"].avg,
                    "mg_loss": meters["mg_loss"].avg,
                    "local_loss": meters["local_loss"].avg,
                    "loss": meters["loss"].avg,
                })
                end = time.time()
            else:
                end = time.time()
        if idx >= 0 and meters["loss"].count == 0:
            # epoch shorter than log_every: sync once so the epoch summary
            # carries the real final-step losses instead of zeros
            metrics = jax.device_get(metrics)
            for k in ("cos_loss", "mg_loss", "local_loss", "loss"):
                meters[k].update(float(metrics[k]), bsz)
        return {k: m.avg for k, m in meters.items()}


def run_training(model, cfg: TrainConfig, loader, aug_fn, dim: int,
                 sample_batch, mesh=None, epochs: Optional[int] = None,
                 eval_loader=None, encoder_weights: Optional[str] = None):
    """Full pretraining run (reference epoch loop ``train_3d.py:60-83``)."""
    import contextlib

    chip_lock = None
    if jax.default_backend() != "cpu":
        # single-chip contention guard: makes bench.py refuse to time while
        # this run trains (and warns if someone else already holds the chip)
        from pcrlv2_tpu.utils import chiplock
        chip_lock = chiplock.guard_warn(
            f"trainer d={dim} n={cfg.n} output={cfg.output}")

    trainer = Trainer(model, cfg, aug_fn, dim=dim, sample_batch=sample_batch,
                      mesh=mesh)
    if encoder_weights:
        if dim != 2:
            raise ValueError("--encoder_weights applies to the 2D pipeline")
        trainer.load_encoder_weights(encoder_weights)
        print(f"==> encoder initialized from {encoder_weights}")
    elif dim == 2 and cfg.phase == "pretask" and not cfg.resume:
        # the reference's smp encoder defaults to ImageNet weights
        # (reference models/pcrlv2_model.py:200, smp encoder_weights=
        # 'imagenet'); without --encoder_weights this run pretrains the 2D
        # encoder FROM SCRATCH — a different init than the reference's
        # out-of-box behavior. Make that deviation impossible to miss.
        print("WARNING: 2D encoder initialized FROM SCRATCH — the reference "
              "starts from ImageNet weights. For reference-equivalent init:\n"
              "  python -c \"import torch,torchvision; torch.save("
              "torchvision.models.resnet18(weights='IMAGENET1K_V1')"
              ".state_dict(), 'resnet18.pt')\"   # on any online machine\n"
              "  then pass --encoder_weights resnet18.pt")
    start_epoch = 0
    if cfg.resume:
        # continue AFTER the saved epoch: LR/β schedules, the PRNG stream
        # (via the restored global step) and checkpoint numbering all resume
        start_epoch = trainer.restore_orbax() + 1
        print(f"==> resumed at epoch {start_epoch} "
              f"(global step {trainer._global_step})")
    total = cfg.epochs if epochs is None else epochs
    profile = (jax.profiler.trace(cfg.profile_dir)
               if cfg.profile_dir else contextlib.nullcontext())
    with profile:
        for epoch in range(start_epoch, total + 1):
            print("==> training...")
            t0 = time.time()
            from pcrlv2_tpu.data.pipeline import device_prefetch

            it = device_prefetch(loader.epoch(epoch), mesh=mesh)
            with jax.profiler.StepTraceAnnotation("epoch", step_num=epoch):
                stats = trainer.train_epoch(epoch, it)
            epoch_time = time.time() - t0
            print(f"epoch {epoch}, total time {epoch_time:.2f}")
            # epoch summary always lands in metrics.jsonl, even when the
            # epoch is shorter than log_every iterations
            trainer.logger.log(
                {"epoch": epoch, "epoch_time": epoch_time,
                 **{k: v for k, v in stats.items() if v == v}},
                console=False)
            if (eval_loader is not None and cfg.eval_every
                    and epoch % cfg.eval_every == 0):
                ev = trainer.evaluate(eval_loader.epoch(epoch))
                trainer.logger.log({"epoch": epoch, "eval": ev})
                print(f"eval: {ev}")
            on_ref_cadence = epoch % 100 == 0 or epoch == 240
            if on_ref_cadence or (cfg.save_every
                                  and epoch % cfg.save_every == 0):
                print("==> Saving...")
                if on_ref_cadence:  # .pt artifacts only at reference epochs
                    trainer.save_reference_ckpt(epoch)
                trainer.save_orbax(epoch)
    if chip_lock is not None:
        chip_lock.release()
    return trainer
