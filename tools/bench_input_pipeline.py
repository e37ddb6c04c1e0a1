"""Input-pipeline rate test: can the HOST side sustain the device's step rate?

The device-only bench (bench.py) times a synthetic, device-resident batch; this
script measures the other half — the disk→host-batch pipeline the real CLI
uses — against the device's measured consumption rate:

* 3D (LUNA): HostLoader + native C++ LunaBatchReader over an on-disk npy tree
  (the layout ``luna_preprocess.py`` emits).  Device consumes 61.6 vols/s/chip
  (BENCH_r02) → the loader must sustain >= ~62 vols/s.
* 2D (chest): HostLoader + PIL PNG decode at a given canvas.  Device consumes
  ~567 imgs/s at canvas 512 (BENCHMARKS.md) → decode must sustain that, and
  the native-1024 default costs 4x the pixels.

Usage:  python tools/bench_input_pipeline.py [3d|2d|both] [--samples N]
        [--workers N] [--canvas N] [--batches N] [--tree DIR]

Prints one JSON line per measurement.  Host-only: no TPU needed (transfers are
measured separately by the end-to-end CLI run — tools/run_e2e_rate.sh).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_luna_tree(root: str, n_samples: int, seed: int = 0) -> list:
    """Materialize ``n_samples`` crop pairs with the exact shapes/dtype
    ``luna_preprocess.py:144-145`` writes (~1.1 MB/sample)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n_samples):
        g = os.path.join(root, f"1.2.{i}_global_0.npy")
        if not os.path.exists(g):
            np.save(g, rng.rand(2, 64, 64, 32).astype(np.float32))
            np.save(os.path.join(root, f"1.2.{i}_local_0.npy"),
                    rng.rand(6, 16, 16, 16).astype(np.float32))
        paths.append(g)
    return paths


def _mk_chest_tree(root: str, n_samples: int, size: int = 1024,
                   seed: int = 0) -> list:
    """NIH-like PNGs: 1024x1024 8-bit grayscale (the real dataset's format)."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    # realistic compressibility: smooth anatomy + noise, not pure noise
    base = rng.rand(size // 8, size // 8)
    base = np.kron(base, np.ones((8, 8)))  # smooth structure
    paths = []
    for i in range(n_samples):
        p = os.path.join(root, f"x{i:05d}.png")
        if not os.path.exists(p):
            img = np.clip(base * 200 + rng.randn(size, size) * 10, 0,
                          255).astype(np.uint8)
            Image.fromarray(img, "L").save(p)
        paths.append(p)
    return paths


def bench_3d(tree: str, n_samples: int, batch: int, workers: int,
             n_batches: int) -> dict:
    from pcrlv2_tpu import native
    from pcrlv2_tpu.data.pipeline import (HostLoader, LunaBatchReader,
                                          load_luna_sample)

    paths = _mk_luna_tree(tree, n_samples)
    use_native = native.available()
    batch_read = (LunaBatchReader(batch, n_threads=max(workers, 2))
                  if use_native else None)
    loader = HostLoader(paths, batch, load_luna_sample, shuffle=True,
                        seed=0, num_workers=workers, batch_read_fn=batch_read)
    # warm page cache + pool
    for i, b in enumerate(loader.epoch(0)):
        if i >= 2:
            break
    n_done, t0, epoch = 0, time.perf_counter(), 1
    while n_done < n_batches:
        for b in loader.epoch(epoch):
            n_done += 1
            if n_done >= n_batches:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    rate = n_done * batch / dt
    return {"metric": "3d_input_pipeline_vols_per_sec", "value": round(rate, 1),
            "unit": "volumes/sec", "native_reader": use_native,
            "workers": workers, "batch": batch,
            "device_demand": 61.6, "headroom_x": round(rate / 61.6, 2)}


def bench_2d(tree: str, n_samples: int, batch: int, workers: int,
             n_batches: int, canvas: int, cache: str | None = None) -> dict:
    from functools import partial

    from pcrlv2_tpu.data.pipeline import (CachedChestReader, HostLoader,
                                          load_chest_sample)

    paths = _mk_chest_tree(tree, n_samples)
    read = (CachedChestReader(cache, canvas) if cache
            else partial(load_chest_sample, canvas=canvas))
    loader = HostLoader(paths, batch, read, shuffle=True, seed=0,
                        num_workers=workers)
    if cache:  # populate: the steady state being measured is epochs 2+
        for s in paths:
            read(s)
    for i, b in enumerate(loader.epoch(0)):
        if i >= 2:
            break
    n_done, t0, epoch = 0, time.perf_counter(), 1
    while n_done < n_batches:
        for b in loader.epoch(epoch):
            n_done += 1
            if n_done >= n_batches:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    rate = n_done * batch / dt
    return {"metric": "2d_input_pipeline_imgs_per_sec", "value": round(rate, 1),
            "unit": "imgs/sec", "canvas": canvas, "workers": workers,
            "batch": batch, "cached": bool(cache), "device_demand": 567.0,
            "headroom_x": round(rate / 567.0, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="both",
                    choices=["3d", "2d", "both"])
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--canvas", type=int, default=0,
                    help="2D canvas; 0 = measure both 1024 (native default) "
                         "and 512 (fast mode)")
    ap.add_argument("--tree", default="/tmp/pcrl_rate")
    args = ap.parse_args(argv)

    if args.mode in ("3d", "both"):
        r = bench_3d(os.path.join(args.tree, "luna"), args.samples,
                     batch=32, workers=args.workers, n_batches=args.batches)
        print(json.dumps(r))
    if args.mode in ("2d", "both"):
        canvases = [args.canvas] if args.canvas else [1024, 512]
        for cv in canvases:
            for cache in (None, os.path.join(args.tree, f"cache{cv}")):
                r = bench_2d(os.path.join(args.tree, "chest"), args.samples,
                             batch=64, workers=args.workers,
                             n_batches=args.batches, canvas=cv, cache=cache)
                print(json.dumps(r))


if __name__ == "__main__":
    main()
