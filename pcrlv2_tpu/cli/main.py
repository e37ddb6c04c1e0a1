"""Command-line entry point — flag/dispatch parity with reference ``main.py``.

The reference parses 16 flags (``main.py:22-40``), builds the method name
``f"{args.model}_{args.n}_{args.phase}"`` and ``getattr``s it off a
``DataGenerator`` (``main.py:15-17``) — the de-facto experiment registry —
then selects a trainer by ``(model=='pcrlv2', phase=='pretask', d∈{2,3})``
(``main.py:47-50``).  This module keeps that exact surface:

* same flag names/defaults (``--data --model --phase --b --epochs --lr
  --output --n --d --workers --gpus --ratio --momentum --weight_decay --seed
  --amp``),
* same ``DataGenerator`` registry pattern (as an explicit dict, not
  ``getattr`` string-plumbing),
* same checkpoint filenames (``{model}_{n}_{phase}_{ratio}_{epoch}.pt``).

TPU differences (documented deviations):

* ``--gpus`` selects how many local TPU devices join the ``data`` mesh axis
  (the reference sets ``CUDA_VISIBLE_DEVICES``, ``main.py:44``),
* ``--seed`` is actually applied — threaded through every PRNG consumer
  (the reference parses it but never calls ``torch.manual_seed``,
  ``main.py:38``),
* ``--amp`` selects the bf16 compute policy (apex O1 analog, no loss scaling
  needed on TPU).
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Dict

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    """Reference ``main.py:22-40`` flag surface (types fixed where the
    reference forgot them: ``--momentum``/``--weight_decay`` were untyped
    strings upstream, ``main.py:36-37``)."""
    parser = argparse.ArgumentParser(description="PCRLv2 TPU-native pretraining")
    parser.add_argument("--data", metavar="DIR", default=None,
                        help="path to dataset (processed LUNA tree or chest image dir)")
    parser.add_argument("--model", default="pcrlv2", help="model family")
    parser.add_argument("--phase", default="pretask", help="pretask | finetune")
    parser.add_argument("--b", default=16, type=int, help="batch size")
    parser.add_argument("--epochs", default=100, type=int, help="epochs to train")
    parser.add_argument("--lr", default=1e-3, type=float, help="base learning rate")
    parser.add_argument("--output", default="./out", help="output (checkpoint) dir")
    parser.add_argument("--n", default="luna", help="dataset name: luna | chest")
    parser.add_argument("--d", default=3, type=int, help="2d or 3d pipeline")
    parser.add_argument("--workers", default=4, type=int, help="host loader threads")
    parser.add_argument("--gpus", default="0", help="device list, e.g. 0,1,2,3 "
                        "(selects that many local TPU devices for the data axis)")
    parser.add_argument("--ratio", default=1.0, type=float,
                        help="fraction of the train set used for pretraining")
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--weight_decay", default=1e-4, type=float)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--amp", action="store_true", default=False,
                        help="bf16 compute policy (apex AMP O1 analog)")
    # extensions beyond the reference surface (all optional)
    parser.add_argument("--resume", default=None,
                        help="Orbax train-state dir to resume from")
    parser.add_argument("--mixup", default=None, type=float,
                        help="feature-mixup alpha (reference defines "
                             "mixup_data but never calls it, train_2d.py:44)")
    parser.add_argument("--train_list", default="train_val_txt/luna_train.txt",
                        help="UID / image list file")
    parser.add_argument("--steps_per_epoch", default=None, type=int,
                        help="cap batches per epoch (smoke runs)")
    parser.add_argument("--encoder_weights", default=None,
                        help="torch ResNet-18 state_dict (.pt) to initialize "
                             "the 2D encoder — the ImageNet-init analog of "
                             "the reference's smp default (no download here)")
    parser.add_argument("--weight", default=None,
                        help="pretrained .pt for --phase finetune (ours or "
                             "the reference's): 2D loads the encoder with "
                             "the fc.* patch (README.md:40-44), 3D loads the "
                             "full PCRLv23d (README.md:50-54)")
    parser.add_argument("--mask_dir", default=None, metavar="DIR",
                        help="3D finetune: segmentation mask tree mirroring "
                             "the processed crop tree (subset{i}/"
                             "{uid}_mask_{k}.npy; pass the --data root "
                             "itself when masks live beside the crops). "
                             "Without it the 3D finetune target falls back "
                             "to the documented intensity-threshold "
                             "pseudo-mask placeholder")
    parser.add_argument("--n_class", default=14, type=int,
                        help="finetune classes: 2D classifier labels "
                             "(14 = NIH ChestX-ray), 3D segmentation "
                             "channels (1)")
    parser.add_argument("--use_painting", action="store_true", default=False,
                        help="enable in/out-painting corruption (the "
                             "Model-Genesis ops dormant in the reference, "
                             "lunaDataset.py:45-55)")
    parser.add_argument("--paint_rate", default=0.5, type=float,
                        help="probability of painting when --use_painting")
    parser.add_argument("--use_pixel_shuffle", action="store_true",
                        default=False,
                        help="enable local pixel shuffling (dormant upstream, "
                             "lunaDataset.py:43-44)")
    parser.add_argument("--eval_every", default=0, type=int,
                        help="epochs between eval-loss passes (0 = off; the "
                             "reference builds an eval loader it never uses)")
    parser.add_argument("--eval_batches", default=0, type=int,
                        help="cap batches per eval pass (0 = the full fold)")
    parser.add_argument("--save_every", default=0, type=int,
                        help="also checkpoint every N epochs (0 = only the "
                             "reference cadence, epoch%%100==0 or 240, "
                             "train_3d.py:71-80) — finer cadence makes "
                             "kill+--resume lose at most N epochs")
    parser.add_argument("--chest_canvas", default=0, type=int,
                        help="host-side decode canvas for chest X-rays. "
                             "0 (default) = auto-detect the native size from "
                             "the first image (1024 for NIH) — ZERO "
                             "resolution loss vs the reference's "
                             "native-resolution CPU crops "
                             "(chestDataset.py:31-48). Set 512 for the fast "
                             "mode: 1/4 the H2D bytes but halves source "
                             "resolution before cropping — measured "
                             "deviation in BENCHMARKS.md")
    parser.add_argument("--chest_cache", default="auto",
                        help="decode-once uint8 cache dir for chest X-rays "
                             "('auto' = <output>/chest_cache, 'off' = decode "
                             "every epoch like the reference). First epoch "
                             "decodes+caches; later epochs read raw arrays "
                             "at memcpy speed — single-core PIL decode "
                             "cannot feed the TPU otherwise (BENCHMARKS.md "
                             "'Input pipeline at rate')")
    parser.add_argument("--h2d_dtype", default="auto",
                        choices=("auto", "f32", "f16"),
                        help="host->device dtype for raw 3D batches. f16 "
                             "halves transfer bytes (36.7->18.4 MB at b=32); "
                             "quantization is <=2^-11 relative on the "
                             "[0,1]-normalized crops, below the bf16 compute "
                             "policy's own rounding. auto = f16 when --amp, "
                             "f32 otherwise (exact-parity mode)")
    parser.add_argument("--log_every", default=10, type=int,
                        help="iterations between metric syncs/log lines "
                             "(the reference prints every 10, train_3d.py:153)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--synthetic", action="store_true", default=False,
                        help="train on synthetic data (no dataset needed)")
    parser.add_argument("--spatial", default=1, type=int,
                        help="depth-shard each 3D volume over this many chips "
                             "(halo-exchanged convs; for volumes/batches "
                             "beyond one chip's HBM — no reference analog)")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="initialize jax.distributed for multi-host "
                             "(DCN) training — run one process per host; "
                             "coordinator auto-detects on Cloud TPU. --b is "
                             "the GLOBAL batch; each process loads its "
                             "interleaved dataset slice and b/world samples "
                             "(2- and 3-process gloo tests cover the fused "
                             "step, the full Trainer epoch loop, "
                             "single-writer checkpoints, and resume; more "
                             "processes / real DCN untested in this "
                             "environment)")
    return parser


def _process_slice(args) -> tuple:
    """(process_index, process_count) for multi-host dataset sharding —
    (0, 1) unless ``--multihost`` initialized jax.distributed."""
    if not getattr(args, "multihost", False):
        return 0, 1
    import jax

    return jax.process_index(), jax.process_count()


def _shard_for_process(args, *lists):
    """Multi-host: interleaved per-process dataset slices + a local args copy
    with the b/world per-process batch (``--b`` is the GLOBAL batch;
    ``shard_batch`` assembles the global array over DCN).  Single-host:
    passthrough.

    Every process's slice is trimmed to the common ``len(lst)//world`` length:
    with the raw ``lst[rank::world]`` slices, processes whose slice is one
    longer would run extra steps per epoch and the gradient collectives would
    deadlock over DCN waiting on the shorter processes."""
    rank, world = _process_slice(args)
    if world == 1:
        return args, lists
    if args.b % world:
        raise SystemExit(
            f"global batch {args.b} not divisible by {world} processes")
    local = argparse.Namespace(**{**vars(args), "b": args.b // world})
    return local, tuple(lst[rank::world][: len(lst) // world]
                        for lst in lists)


def _detect_chest_canvas(names, output_dir: str) -> int:
    """Max source dimension over the chest list, with a sidecar cache.

    The scan opens every file (header read only) — measured ~0.1 ms/file on
    local disk, i.e. ~10 s cold at the 78k-image NIH scale and potentially
    minutes on networked storage.  The detected canvas is persisted as
    ``chest_canvas.<hash>.json`` in the run dir, keyed by a hash of the
    exact name list, so repeat launches (same output dir + same list) cost
    one stat per file instead of a PIL header open; the sidecar also
    stores a fingerprint over every file's (size, mtime) — regenerated
    sources under the same names invalidate the cache instead of silently
    reusing a stale canvas (the exact silent-downsampling failure the
    exhaustive scan exists to prevent).
    """
    import hashlib
    import json
    import time

    tag = hashlib.blake2s("\n".join(names).encode(),
                          digest_size=8).hexdigest()

    def file_fingerprint() -> str:
        h = hashlib.blake2s(digest_size=8)
        for name in names:
            try:
                st = os.stat(name)
                h.update(f"{st.st_size}:{st.st_mtime_ns};".encode())
            except OSError:
                h.update(b"missing;")
        return h.hexdigest()

    fp = file_fingerprint()
    sidecar = os.path.join(output_dir, f"chest_canvas.{tag}.json")
    try:
        with open(sidecar) as f:
            cached = json.load(f)
        if cached.get("fingerprint") != fp:
            raise ValueError("stale sidecar: sources changed on disk")
        canvas = int(cached["canvas"])
        print(f"==> chest canvas {canvas} from cache {sidecar} "
              f"({cached.get('n_sources', '?')} sources, fingerprint "
              f"match; delete the sidecar to force a rescan)")
        return canvas
    except (OSError, ValueError, KeyError, TypeError, AttributeError):
        pass  # miss, corrupt, non-dict JSON, or stale — rescan
    from PIL import Image

    t0 = time.time()
    sizes = set()
    for name in names:
        with Image.open(name) as im:  # header read only — cheap
            sizes.add(max(im.size))
    dt = time.time() - t0
    canvas = max(sizes)
    note = (f" (sources disagree: {sorted(sizes)} — using the max "
            "so nothing is downsampled)"
            if len(sizes) > 1 else "")
    print(f"==> chest canvas auto-detected from {len(names)} "
          f"sources in {dt:.1f}s, {len(sizes)} distinct size(s): "
          f"{canvas}{note} (native; pass --chest_canvas 512 for the "
          f"reduced-resolution fast mode)")
    tmp = f"{sidecar}.tmp.{os.getpid()}"
    try:  # atomic write: concurrent multi-host processes race benignly
        with open(tmp, "w") as f:
            json.dump({"canvas": canvas, "n_sources": len(names),
                       "scan_seconds": round(dt, 2),
                       "fingerprint": fp,
                       "distinct_sizes": sorted(sizes)}, f)
        os.replace(tmp, sidecar)
    except OSError:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return canvas


def _chest_reader(args, canvas: int):
    """Per-sample chest reader honoring ``--chest_cache`` (decode-once raw
    uint8 cache; the cache key carries the canvas, so e.g. a 224 finetune
    cache coexists with a native-res pretask cache in one dir)."""
    from functools import partial

    from pcrlv2_tpu.data.pipeline import CachedChestReader, load_chest_sample

    cache = getattr(args, "chest_cache", "auto")
    if cache and cache != "off":
        if cache == "auto":
            cache = os.path.join(args.output, "chest_cache")
        print(f"==> chest decode cache: {cache} (canvas {canvas}; "
              f"--chest_cache off to disable)")
        return CachedChestReader(cache, canvas)
    return partial(load_chest_sample, canvas=canvas)


class DataGenerator:
    """Per-(dataset, phase) loader builders (reference ``data.py:9-99``).

    Each method returns ``{'train': HostLoader, 'eval': HostLoader|None}``.
    Unlike the reference — whose eval loader would crash if iterated
    (``lunaDataset.py:37`` with ``transform=None``) — eval here is a plain
    un-augmented loader.
    """

    def __init__(self, args):
        self.args = args

    # registry: {model}_{n}_{phase} — explicit dict instead of getattr strings
    @classmethod
    def registry(cls) -> Dict[str, Callable]:
        return {
            "pcrlv2_luna_pretask": cls.pcrlv2_luna_pretask,
            "pcrlv2_chest_pretask": cls.pcrlv2_chest_pretask,
            "pcrlv2_luna_finetune": cls.pcrlv2_luna_finetune,
            "pcrlv2_chest_finetune": cls.pcrlv2_chest_finetune,
        }

    def build(self, name: str):
        reg = self.registry()
        if name not in reg:
            raise SystemExit(
                f"unknown experiment '{name}' — choose from {sorted(reg)}")
        return reg[name](self)

    def pcrlv2_luna_pretask(self):
        from pcrlv2_tpu.data.manifests import get_luna_list, get_luna_pretrain_list
        from pcrlv2_tpu.data.pipeline import HostLoader, load_luna_sample

        args = self.args
        if not os.path.exists(args.train_list):
            # the manifest is a dataset-release artifact; a fresh
            # preprocessed tree carries the same information, so derive the
            # UID list from it (and persist for reproducibility) rather than
            # dying on the missing default path.  When the user never chose
            # a path (parser default), persist into the run's output dir —
            # not the source checkout's train_val_txt/
            from pcrlv2_tpu.data.make_manifests import write_luna_manifest

            if args.train_list == "train_val_txt/luna_train.txt":
                args.train_list = os.path.join(args.output, "luna_train.txt")
            if os.path.exists(args.train_list):
                uids_all = None
            else:
                uids_all = write_luna_manifest(args.data, args.train_list)
                print(f"==> train list not found; derived "
                      f"{len(uids_all)} UIDs from {args.data} into "
                      f"{args.train_list}")
        uids = get_luna_pretrain_list(args.ratio, args.train_list)
        x_train, x_valid, _ = get_luna_list(
            args.data, train_fold=range(7), valid_fold=range(7, 10),
            test_fold=range(7, 10), suffix="_global_", file_list=uids)
        print(f"total train images {len(x_train)}, validation images {len(x_valid)}")
        args, (x_train, x_valid) = _shard_for_process(args, x_train, x_valid)
        from functools import partial

        import numpy as np

        from pcrlv2_tpu import native
        from pcrlv2_tpu.data.pipeline import LunaBatchReader

        h2d = getattr(args, "h2d_dtype", "auto")
        if h2d == "auto":
            h2d = "f16" if args.amp else "f32"
        dtype = np.float16 if h2d == "f16" else np.float32
        if dtype == np.float16:
            print("==> h2d_dtype f16: raw batches transfer at half width "
                  "(--h2d_dtype f32 for the exact-parity path)")
        read_fn = partial(load_luna_sample, dtype=dtype)
        batch_read = (LunaBatchReader(args.b, n_threads=max(args.workers, 2),
                                      dtype=dtype)
                      if native.available() else None)
        train = HostLoader(x_train, args.b, read_fn,
                           shuffle=True, seed=args.seed,
                           num_workers=args.workers, batch_read_fn=batch_read)
        # drop_last=False: eval batches need not be uniform, and dropping the
        # ragged tail would silently exclude up to b-1 held-out samples (or
        # ALL of them when the fold is smaller than --b)
        evaluate = (HostLoader(x_valid, args.b, read_fn,
                               shuffle=False, seed=args.seed,
                               num_workers=args.workers, drop_last=False)
                    if x_valid else None)
        return {"train": train, "eval": evaluate}

    def pcrlv2_chest_pretask(self):
        from functools import partial

        from pcrlv2_tpu.data.manifests import get_chest_list
        from pcrlv2_tpu.data.pipeline import HostLoader, load_chest_sample

        args = self.args
        txt = args.train_list
        if "luna" in os.path.basename(txt):
            txt = os.path.join(os.path.dirname(txt) or ".", "chest_train.txt")
        names, _labels = get_chest_list(txt, args.data)
        names = names[: int(len(names) * args.ratio)]
        print(f"total train images {len(names)}")
        canvas = getattr(args, "chest_canvas", 0)
        if canvas <= 0:
            # native-resolution default: decode on the sources' canvas so the
            # on-device crops see the reference's full source resolution
            # (chestDataset.py:31-48 crops native-res CPU arrays).  Detect
            # from the UNSHARDED list (every multi-host process must agree on
            # the batch shape or global-array assembly breaks) over EVERY
            # image — a sample could miss a larger source later in the list
            # and silently downsample it.  PIL's open reads only the header,
            # but ~78k serial opens at NIH scale is minutes of launch cost —
            # so the result is persisted in a sidecar keyed by a hash of the
            # name list; every later run (and every other multi-host
            # process) skips the scan entirely.
            canvas = _detect_chest_canvas(names, args.output)
        args, (names,) = _shard_for_process(args, names)
        read = _chest_reader(args, canvas)
        train = HostLoader(names, args.b, read,
                           shuffle=True, seed=args.seed,
                           num_workers=args.workers)
        # The reference's chest eval loader aliases the (shuffled) train
        # pipeline (reference data.py:58-59 — dead code there).  A working
        # eval metric must track the SAME samples every epoch, so eval gets
        # its own UNshuffled loader over the same list (eval views use a
        # fixed PRNG key per batch index, Trainer.evaluate).
        evaluate = HostLoader(names, args.b, read,
                              shuffle=False, seed=args.seed,
                              num_workers=args.workers, drop_last=False)
        return {"train": train, "eval": evaluate}


    def pcrlv2_luna_finetune(self):
        """3D finetune loader: the COMPLEMENT of the pretrain UID split
        (reference ``utils.py:30-35`` exists exactly for this phase) over the
        same processed crop tree.  Masks: ``--mask_dir`` loads real
        segmentation GT from a tree mirroring the crops (the reference
        world's downstream task, reference ``README.md:50-55``); without it
        the trainer derives intensity-threshold pseudo-masks (documented
        placeholder, ``train/finetune.py``)."""
        from pcrlv2_tpu.data.manifests import (get_luna_finetune_list,
                                               get_luna_list)
        from pcrlv2_tpu.data.pipeline import (HostLoader, load_luna_sample,
                                              make_luna_mask_reader)

        args = self.args
        if not os.path.exists(args.train_list):
            raise SystemExit(f"train list not found: {args.train_list}")
        uids = get_luna_finetune_list(args.ratio, args.train_list)
        if not uids:
            raise SystemExit(
                f"--ratio {args.ratio} leaves no finetune UIDs (the finetune "
                "split is the COMPLEMENT of the pretrain split; use "
                "--ratio < 1.0)")
        # the valid folds (7-9, reference data.py:67-68) are scanned only
        # when --eval_every asks for an eval pass — otherwise they would be
        # dead directory walks implying a split that is never consumed
        eval_folds = range(7, 10) if args.eval_every > 0 else ()
        x_train, x_valid, _ = get_luna_list(
            args.data, train_fold=range(7), valid_fold=eval_folds,
            test_fold=(), suffix="_global_", file_list=uids)
        msg = f"finetune train images {len(x_train)}"
        if eval_folds:
            msg += f", validation images {len(x_valid)}"
        print(msg)
        args, (x_train,) = _shard_for_process(args, x_train)
        mask_dir = getattr(args, "mask_dir", None)
        if mask_dir:
            if not os.path.isdir(mask_dir):
                raise SystemExit(f"--mask_dir not found: {mask_dir}")
            read_fn = make_luna_mask_reader(args.data, mask_dir)
            print(f"==> 3D finetune against REAL masks from {mask_dir}")
        else:
            read_fn = load_luna_sample
            print("==> 3D finetune against intensity-threshold pseudo-masks "
                  "(documented placeholder; pass --mask_dir <tree> for real "
                  "segmentation GT)")
        train = HostLoader(x_train, args.b, read_fn, shuffle=True,
                           seed=args.seed, num_workers=args.workers)
        evald = (HostLoader(x_valid, args.b, read_fn, shuffle=False,
                            seed=args.seed, num_workers=args.workers,
                            drop_last=False)
                 if x_valid else None)
        return {"train": train, "eval": evald}

    def pcrlv2_chest_finetune(self):
        """2D finetune loader: images + the 14 NIH labels the manifest
        already carries (reference ``utils.py:7-19``) — the documented
        downstream classification task (README.md:31-38)."""
        from functools import partial

        from pcrlv2_tpu.data.manifests import get_chest_list
        from pcrlv2_tpu.data.pipeline import HostLoader, load_chest_sample

        args = self.args
        txt = args.train_list
        if "luna" in os.path.basename(txt):
            txt = os.path.join(os.path.dirname(txt) or ".", "chest_train.txt")
        names, labels = get_chest_list(txt, args.data)
        # --ratio is the label-efficiency knob (and is baked into the saved
        # checkpoint's filename): slice the labeled set like the pretask
        # path does, or a "10%-label" run would silently use 100%
        keep = max(1, int(len(names) * args.ratio))
        names, labels = names[:keep], labels[:keep]
        print(f"finetune train images {len(names)} (ratio {args.ratio})")
        args, (names, labels) = _shard_for_process(args, names, labels)
        label_of = {n: np.asarray(l, np.float32) for n, l in zip(names, labels)}
        base = _chest_reader(args, canvas=224)  # classifier input res

        def read(path):
            return {**base(path), "label": label_of[path]}

        train = HostLoader(names, args.b, read, shuffle=True, seed=args.seed,
                           num_workers=args.workers)
        evald = None
        if args.eval_every > 0:
            # the reference ships chest_valid.txt beside chest_train.txt
            # (same name+14-labels format); a fixed-order pass over it is
            # the held-out classification metric
            vtxt = os.path.join(os.path.dirname(txt) or ".",
                                "chest_valid.txt")
            if os.path.exists(vtxt):
                vnames, vlabels = get_chest_list(vtxt, args.data)
                print(f"finetune validation images {len(vnames)}")
                vlabel_of = {n: np.asarray(l, np.float32)
                             for n, l in zip(vnames, vlabels)}

                def vread(path):
                    return {**base(path), "label": vlabel_of[path]}

                evald = HostLoader(vnames, args.b, vread, shuffle=False,
                                   seed=args.seed, num_workers=args.workers,
                                   drop_last=False)
            else:
                print(f"WARNING: --eval_every set but {vtxt} not found — "
                      "finetune runs without an eval pass")
        return {"train": train, "eval": evald}


def _synthetic_loader(args, dim: int):
    """In-memory loader with the exact preprocessed shapes — lets every CLI
    path run end-to-end without the LUNA16/NIH downloads."""
    from pcrlv2_tpu.data.pipeline import (synthetic_chest_batch,
                                          synthetic_luna_batch)

    n_batches = args.steps_per_epoch or 4

    class _Loader:
        def __len__(self):
            return n_batches

        def epoch(self, epoch: int):
            finetune = getattr(args, "phase", "pretask") == "finetune"
            for i in range(n_batches):
                seed = args.seed + epoch * n_batches + i
                if dim == 3:
                    yield synthetic_luna_batch(args.b, seed=seed)
                else:
                    # synthetic data has no native size; 0/auto means the
                    # NIH-native 1024 canvas the real default would detect
                    # (finetune classifies at the 224 input resolution)
                    canvas = (getattr(args, "chest_canvas", 0)
                              or (224 if finetune else 1024))
                    batch = synthetic_chest_batch(args.b, canvas=canvas,
                                                  seed=seed)
                    if finetune:
                        rng = np.random.RandomState(seed)
                        batch["label"] = rng.randint(
                            0, 2, (args.b, args.n_class)).astype(np.float32)
                    yield batch

    # finetune + --eval_every: a second loader instance serves as the eval
    # split (run_finetune always iterates it as epoch 0 → fixed content)
    evald = (_Loader()
             if (getattr(args, "phase", "pretask") == "finetune"
                 and getattr(args, "eval_every", 0) > 0) else None)
    return {"train": _Loader(), "eval": evald}


def _limit(loader_dict, steps):
    if steps is None:
        return loader_dict
    inner = loader_dict["train"]

    class _Capped:
        def __len__(self):
            return min(steps, len(inner))

        def epoch(self, epoch: int):
            for i, b in enumerate(inner.epoch(epoch)):
                if i >= steps:
                    return
                yield b

    return {"train": _Capped(), "eval": loader_dict.get("eval")}


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.multihost and args.phase == "finetune":
        # the finetune trainer is plain single-process jit — no mesh, no
        # cross-process gradient sync.  Accepting --multihost would have
        # each process train a divergent replica on its data slice and race
        # on the same checkpoint filename.  Refuse before jax.distributed
        # even initializes.
        raise SystemExit(
            "--phase finetune does not support --multihost (the finetune "
            "trainer runs single-process); launch it on one host")
    if not os.path.exists(args.output):
        print(f"Create the output dir: {args.output}")
        os.makedirs(args.output, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS, create_mesh

    if args.multihost:
        from pcrlv2_tpu.core.mesh import init_distributed

        init_distributed()
        print(f"==> multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.device_count()} global devices")
    from pcrlv2_tpu.core.precision import DEFAULT_POLICY, PARITY_POLICY
    from pcrlv2_tpu.data.augment2d import make_chest_aug_fn
    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.models import PCRLv2, PCRLv23d
    from pcrlv2_tpu.train.trainer import TrainConfig, run_training

    # device selection: reference pins CUDA_VISIBLE_DEVICES (main.py:44);
    # here --gpus picks how many local devices join the data axis.
    n_req = len([g for g in str(args.gpus).split(",") if g != ""])
    if args.multihost:
        # the mesh must span every process's devices; jax multi-process
        # requires all addressable devices to participate
        if max(n_req, 1) != jax.local_device_count():
            raise SystemExit(
                f"--multihost requires --gpus to name all "
                f"{jax.local_device_count()} local devices")
        n_dev = jax.device_count()
        if args.b % jax.process_count():
            raise SystemExit(f"global batch {args.b} not divisible by "
                             f"{jax.process_count()} processes")
    else:
        n_dev = min(max(n_req, 1), jax.local_device_count())
    if args.spatial > 1:
        if n_dev % args.spatial:
            raise SystemExit(
                f"--spatial {args.spatial} must divide the {n_dev} devices")
        n_data = n_dev // args.spatial
        mesh = create_mesh((DATA_AXIS, SPATIAL_AXIS),
                           shape=(n_data, args.spatial),
                           devices=jax.devices()[:n_dev])
    else:
        n_data = n_dev
        mesh = (create_mesh((DATA_AXIS,), shape=(n_dev,),
                            devices=jax.devices()[:n_dev])
                if (n_dev > 1 or args.multihost) else None)
    if args.b % n_data:
        raise SystemExit(f"batch {args.b} not divisible by {n_data} "
                         "data-parallel devices")

    cfg = TrainConfig(
        model=args.model, n=args.n, phase=args.phase, d=args.d, b=args.b,
        epochs=args.epochs, lr=args.lr, output=args.output, ratio=args.ratio,
        momentum=args.momentum, weight_decay=args.weight_decay,
        seed=args.seed, amp=args.amp, workers=args.workers,
        mixup=args.mixup, resume=args.resume, spatial=args.spatial,
        orbax_dir=os.path.join(os.path.abspath(args.output), "orbax"),
        profile_dir=args.profile_dir, eval_every=args.eval_every,
        eval_batches=args.eval_batches, log_every=args.log_every,
        save_every=args.save_every,
    )

    policy = DEFAULT_POLICY if args.amp else PARITY_POLICY
    name = f"{args.model}_{args.n}_{args.phase}"

    if args.synthetic:
        loaders = _synthetic_loader(args, args.d)
    else:
        if not args.data:
            raise SystemExit("--data is required (or pass --synthetic)")
        loaders = _limit(DataGenerator(args).build(name), args.steps_per_epoch)

    if args.model == "pcrlv2" and args.phase == "pretask":
        # upsample_masks=False (lazy deep-supervision upsample via
        # lax.switch) measured SLOWER on v5e despite doing strictly less
        # work — the conditional's control-flow barrier costs more than the
        # unselected levels' zero-grad backward (59.2 vs 61.7 vols/s,
        # BENCHMARKS.md) — so the reference-API eager form stays the default.
        if args.d == 3:
            model = PCRLv23d(policy=policy)
            aug_fn = make_luna_aug_fn(
                use_painting=args.use_painting, paint_rate=args.paint_rate,
                use_pixel_shuffle=args.use_pixel_shuffle)
            sample = jnp.zeros((args.b, 64, 64, 32, 1), jnp.float32)
            print("training pcrlv2 3d")
        elif args.d == 2:
            model = PCRLv2(policy=policy)
            aug_fn = make_chest_aug_fn()
            sample = jnp.zeros((args.b, 224, 224, 3), jnp.float32)
            print("training pcrlv2 2d")
        else:
            raise SystemExit(f"unsupported --d {args.d}")
        run_training(model, cfg, loaders["train"], aug_fn, dim=args.d,
                     sample_batch=sample, mesh=mesh,
                     eval_loader=loaders.get("eval"),
                     encoder_weights=args.encoder_weights)
    elif args.model == "pcrlv2" and args.phase == "finetune":
        # the reference's main.py silently no-ops here (main.py:47-50); its
        # README documents the consumption recipe instead (README.md:29-55)
        # — implemented as a first-class trainer (train/finetune.py)
        from pcrlv2_tpu.train.finetune import run_finetune

        if args.d not in (2, 3):
            raise SystemExit(f"unsupported --d {args.d}")
        if args.spatial > 1:
            raise SystemExit("--phase finetune does not support --spatial")
        n_class = args.n_class if args.d == 2 else 1
        print(f"finetuning pcrlv2 {args.d}d (n_class={n_class})")
        run_finetune(cfg, loaders["train"], dim=args.d, n_class=n_class,
                     policy=policy, weight=args.weight,
                     eval_loader=loaders.get("eval"), mesh=mesh)
    else:
        # reference behavior: any other combination silently does nothing
        # after building the dataloader (main.py:47-50) — be loud instead.
        raise SystemExit(
            f"no trainer for (model={args.model}, phase={args.phase})")


if __name__ == "__main__":
    main()
