"""Host→HBM input pipeline.

The reference feeds the GPU from 4 torch ``DataLoader`` worker processes that
decode + augment on CPU (reference ``data.py:95-98``).  Here augmentation is
on-device (see ``augment2d/3d``), so the host pipeline only has to (1) read
raw crops/images, (2) batch them, (3) keep the next batches in flight while
the device computes.  That is a thread pool over ``np.load``/PNG-decode plus a
double-buffered device prefetch — cheap enough that the input pipeline stops
being the bottleneck (SURVEY.md §7 hard part #6).

A native C++ loader (``pcrlv2_tpu.native``) accelerates the npy read path when
the shared library is built; the pure-NumPy path is always available.
"""

from __future__ import annotations

import collections
import concurrent.futures
import os
import queue
import threading
from typing import Callable, Iterator, List, Sequence

import jax
import numpy as np


# ---------------------------------------------------------------------------
# sample readers
# ---------------------------------------------------------------------------


def load_luna_sample(global_path: str, dtype=np.float32) -> dict:
    """Read one preprocessed LUNA crop pair + its local crops
    (``{uid}_global_{k}.npy`` → (2, X, Y, Z); ``_local_`` → (V, x, y, z);
    reference ``lunaDataset.py:30-56``).

    ``dtype=np.float16`` halves host→device bytes (36.7 → 18.4 MB per b=32
    batch); values are [0,1]-normalized HU, so f16 quantization is ≤2⁻¹¹
    relative — below the bf16 compute policy's own 2⁻⁸ rounding.  The device
    aug promotes back to f32 at entry (``make_luna_aug_fn``)."""
    pair = np.load(global_path)
    local = np.load(global_path.replace("global", "local"))
    return {"pair": np.asarray(pair, dtype),
            "locals": np.asarray(local, dtype)}


def mask_path_for(global_path: str, mask_dir: str, data_root: str) -> str:
    """``--mask_dir`` convention: a tree mirroring the processed crop tree
    (``subset{i}/…``) with ``_global_`` → ``_mask_`` in the filename.
    Passing the data root itself as ``mask_dir`` therefore means "masks
    live beside the crops"."""
    rel = os.path.relpath(global_path, data_root)
    return os.path.join(mask_dir, rel.replace("_global_", "_mask_"))


def make_luna_mask_reader(data_root: str, mask_dir: str,
                          dtype=np.float32) -> Callable[[str], dict]:
    """Sample reader for 3D finetune against REAL segmentation masks.

    The reference world's downstream task is segmentation against real GT
    (reference ``README.md:50-55``) but no masks ship with the repo; this
    reader makes the path real the day they exist: each crop's mask loads
    from the ``--mask_dir`` tree (see :func:`mask_path_for`) and rides the
    batch as ``mask`` — ``FinetuneTrainer._prep`` already prefers it over
    the intensity-threshold ``pseudo_mask`` fallback.

    Mask files hold either ``(2, X, Y, Z)`` (one mask per crop of the pair,
    matching the ``_global_`` layout) or ``(X, Y, Z)``; the trainer consumes
    crop 0, channel-last.
    """

    def read(global_path: str) -> dict:
        sample = load_luna_sample(global_path, dtype)
        mpath = mask_path_for(global_path, mask_dir, data_root)
        try:
            mask = np.load(mpath)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"--mask_dir: no mask for {global_path} "
                f"(expected {mpath}; the mask tree must mirror the crop "
                "tree with _global_ → _mask_)") from None
        if mask.ndim == 4:  # (2, X, Y, Z): mask per crop of the pair
            mask = mask[0]
        sample["mask"] = np.asarray(mask, np.float32)[..., None]
        return sample

    return read


def load_chest_sample(image_path: str, canvas: int = 512) -> dict:
    """Decode a chest X-ray onto a fixed square canvas, uint8.

    The reference decodes with PIL and augments at native resolution on CPU
    workers (``chestDataset.py:33``); we resize host-side to a fixed canvas so
    the random crops are cut on device from one static-shape transfer.

    Host/transfer cost is minimized: pixels stay uint8 (the [0,1] float
    normalize runs on device, ``make_chest_aug_fn``), every source collapses
    to ONE channel (replicated to RGB on device), and the resize is skipped
    when the image is already on the canvas — at the native-1024 default this
    is 12x fewer H2D bytes than the float32-RGB form.

    ALL modes convert to 'L', including RGB/RGBA/P containers: chest X-rays
    are single-channel content whatever the container (NIH ChestX-ray14 mixes
    L and RGBA PNGs), and a uniform (H, W, 1) output is load-bearing — a
    dataset mixing 1- and 3-channel samples would crash np.stack mid-epoch
    in HostLoader (and the decode cache would persist the mix).  For true
    gray content, L-from-RGB is numerically the content itself; uint8/255
    and channel replication commute with every aug op.
    """
    from PIL import Image

    with Image.open(image_path) as im:
        im = im.convert("L")
        if im.size != (canvas, canvas):
            im = im.resize((canvas, canvas), Image.BILINEAR)
        arr = np.asarray(im, np.uint8)
    return {"image": arr[..., None]}


class CachedChestReader:
    """Decode-once PNG cache: the first epoch decodes + canvas-resizes each
    X-ray and writes the raw uint8 array as ``<cache>/<name>.c<canvas>.npy``;
    every later epoch is a straight np.load (page-cache memcpy, ~50-100x a
    PNG decode on this class of host).

    Rationale: the reference re-decodes every PNG every epoch in DataLoader
    workers (``chestDataset.py:33``) — at 240 pretraining epochs that is 239
    redundant decodes per image.  PIL decode of a 1024² PNG is ~20-50 ms of
    single-core CPU, which cannot feed a TPU consuming hundreds of imgs/s;
    the raw-uint8 cache is the same offline-materialization move the
    reference itself makes for LUNA (``luna_preprocess.py``).  Cache size:
    canvas² bytes/image (1 MB at 1024) — comparable to the PNGs themselves.

    Concurrency-safe: writes are atomic (tmp + rename), so multi-process
    trainers sharing a cache dir at worst decode an image twice.
    """

    def __init__(self, cache_dir: str, canvas: int):
        self.cache_dir = cache_dir
        self.canvas = canvas
        os.makedirs(cache_dir, exist_ok=True)

    def _cache_path(self, image_path: str) -> str:
        # basename + a short hash of the FULL source path: chest lists may
        # carry relative subdir paths, and two `img.png`s in different
        # subdirs keyed by basename alone would collide — the second would
        # silently train on the first's pixels
        import hashlib

        base = os.path.splitext(os.path.basename(image_path))[0]
        tag = hashlib.blake2s(os.path.abspath(image_path).encode(),
                              digest_size=4).hexdigest()
        return os.path.join(self.cache_dir,
                            f"{base}.{tag}.c{self.canvas}.npy")

    def __call__(self, image_path: str) -> dict:
        cpath = self._cache_path(image_path)
        try:
            arr = np.load(cpath)
            if arr.shape == (self.canvas, self.canvas, 1):
                return {"image": arr}
            # stale entry from an older cache layout (e.g. 3-channel) —
            # fall through and re-decode so one epoch never mixes shapes
        except (FileNotFoundError, ValueError, EOFError):
            pass  # miss, or a torn write from a crashed run — re-decode
        sample = load_chest_sample(image_path, canvas=self.canvas)
        tmp = f"{cpath}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:  # file handle: np.save(str) would
                np.save(f, sample["image"])  # append a second .npy suffix
            os.replace(tmp, cpath)
        except OSError:  # read-only / full cache dir: degrade to decoding
            if os.path.exists(tmp):
                os.unlink(tmp)
        return sample


class LunaBatchReader:
    """Batch-level reader for the processed LUNA tree using the native C++
    thread pool (``native/pcrl_io.cpp``): whole batches of ``_global_``/
    ``_local_`` npy pairs land in two preallocated float32 buffers with one
    call, no per-sample Python allocation.  Transparent NumPy fallback."""

    def __init__(self, batch_size: int, pair_shape=(2, 64, 64, 32),
                 local_shape=(6, 16, 16, 16), n_threads: int = 8,
                 dtype=np.float32):
        self.n_threads = n_threads
        self.dtype = np.dtype(dtype)
        # the on-disk npy files are float32 (luna_preprocess output); the C++
        # reader fills f32 scratch, and a non-f32 ``dtype`` converts on the
        # way out (one vectorized astype, ~ms — buys 2x fewer H2D bytes)
        self._pair = np.empty((batch_size, *pair_shape), np.float32)
        self._local = np.empty((batch_size, *local_shape), np.float32)

    def __call__(self, global_paths: Sequence[str]) -> dict:
        from pcrlv2_tpu import native

        n = len(global_paths)
        local_paths = [p.replace("global", "local") for p in global_paths]
        native.read_batch(global_paths, self._pair[:n], self.n_threads)
        native.read_batch(local_paths, self._local[:n], self.n_threads)
        # copies (astype always copies): buffers are reused across batches,
        # consumers keep the returned arrays
        return {"pair": self._pair[:n].astype(self.dtype, copy=True),
                "locals": self._local[:n].astype(self.dtype, copy=True)}


# ---------------------------------------------------------------------------
# batching iterator with background workers + device prefetch
# ---------------------------------------------------------------------------


class HostLoader:
    """Threaded batch loader: shuffle file list per epoch, read samples with a
    thread pool, stack into pinned host batches."""

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        read_fn: Callable[[str], dict],
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        batch_read_fn: Callable[[Sequence[str]], dict] | None = None,
    ):
        if not paths:
            raise ValueError("empty path list")
        self.paths = list(paths)
        self.batch_size = batch_size
        self.read_fn = read_fn
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        # batch-level reader (e.g. the native C++ thread pool) — reads a whole
        # chunk of paths at once; overlapped one batch ahead in epoch().
        self.batch_read_fn = batch_read_fn

    def __len__(self) -> int:
        n = len(self.paths) // self.batch_size
        if not self.drop_last and len(self.paths) % self.batch_size:
            n += 1
        return n

    def epoch(self, epoch: int) -> Iterator[dict]:
        order = np.arange(len(self.paths))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        paths = [self.paths[i] for i in order]
        if self.batch_read_fn is not None:
            yield from self._epoch_batched(paths)
            return
        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending: collections.deque = collections.deque()
            ahead = self.num_workers * 2
            idx = 0
            n_batches = len(self)
            for b in range(n_batches):
                start = b * self.batch_size
                chunk = paths[start:start + self.batch_size]
                while idx < len(paths) and len(pending) < ahead + len(chunk):
                    pending.append(pool.submit(self.read_fn, paths[idx]))
                    idx += 1
                samples = [pending.popleft().result() for _ in range(len(chunk))]
                yield {
                    k: np.stack([s[k] for s in samples])
                    for k in samples[0]
                }

    def _epoch_batched(self, paths: List[str]) -> Iterator[dict]:
        """Batch-level reads, one batch ahead of the consumer."""
        n_batches = len(self)
        chunks = [paths[b * self.batch_size:(b + 1) * self.batch_size]
                  for b in range(n_batches)]
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            fut = pool.submit(self.batch_read_fn, chunks[0]) if chunks else None
            for b in range(n_batches):
                batch = fut.result()
                if b + 1 < n_batches:
                    fut = pool.submit(self.batch_read_fn, chunks[b + 1])
                yield batch


def device_prefetch(iterator: Iterator[dict], mesh=None, buffer_size: int = 2):
    """Move host batches to device ahead of compute (double buffering).

    With a mesh, each array is device_put with the leading dim sharded over the
    ``data`` axis; otherwise a plain single-device transfer.
    """
    from pcrlv2_tpu.core.mesh import shard_batch

    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return jax.device_put(batch)

    def worker():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


# ---------------------------------------------------------------------------
# synthetic data (tests / benchmarking without the LUNA16 download)
# ---------------------------------------------------------------------------


def synthetic_luna_batch(batch_size: int = 32, size=(64, 64, 32),
                         local=(16, 16, 16), n_views: int = 6, seed: int = 0):
    """A raw batch with the exact shapes ``luna_preprocess.py`` emits
    (``:144-145``): pair (B,2,64,64,32), locals (B,6,16,16,16), values [0,1]."""
    rng = np.random.RandomState(seed)
    return {
        "pair": rng.rand(batch_size, 2, *size).astype(np.float32),
        "locals": rng.rand(batch_size, n_views, *local).astype(np.float32),
    }


def synthetic_chest_batch(batch_size: int = 64, canvas: int = 512, seed: int = 0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(batch_size, canvas, canvas, 3).astype(np.float32),
    }


def _structured_phantom(rng: np.random.RandomState, shape=(80, 80, 48)):
    """One blob/stripe phantom volume + its blob mask.

    Construction (all [0,1] intensities, like the HU-normalized crops):

    * background — smooth low-frequency noise around 0.15 (coarse grid,
      nearest-upsampled; cheap and featureless).
    * **blobs** (the segmentation foreground): 2–5 Gaussian bumps, random
      centers/σ∈[3,7]/amplitude∈[0.5,0.8].  ``mask`` = voxels where the
      summed blob field exceeds 0.25.
    * **distractor stripes** (NOT in the mask): 1–2 bright axis-aligned
      slabs at blob-like intensity.  These make the task *structural*:
      thresholding the input lights up both blobs and stripes, so a model
      must learn shape — a pure intensity rule cannot reach high Dice.
      (That is exactly the vacuity the round-4 ``pseudo_mask`` task had.)
    """
    X, Y, Z = shape
    coarse = rng.rand(X // 8, Y // 8, Z // 8).astype(np.float32)
    bg = 0.1 + 0.1 * np.repeat(np.repeat(np.repeat(coarse, 8, 0), 8, 1), 8, 2)
    xs, ys, zs = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij")
    blob_field = np.zeros(shape, np.float32)
    for _ in range(rng.randint(2, 6)):
        cx, cy, cz = (rng.uniform(8, X - 8), rng.uniform(8, Y - 8),
                      rng.uniform(6, Z - 6))
        sigma = rng.uniform(3.0, 7.0)
        amp = rng.uniform(0.5, 0.8)
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        blob_field += amp * np.exp(-d2 / (2 * sigma * sigma)).astype(np.float32)
    mask = (blob_field > 0.25).astype(np.float32)
    vol = bg + blob_field
    for _ in range(rng.randint(1, 3)):
        axis = rng.randint(0, 3)
        pos = rng.randint(4, shape[axis] - 4)
        thick = rng.randint(2, 4)
        sl = [slice(None)] * 3
        sl[axis] = slice(pos, pos + thick)
        vol[tuple(sl)] += rng.uniform(0.5, 0.8)
    return np.clip(vol, 0.0, 1.0).astype(np.float32), mask


def write_structured_luna_tree(root: str, n_subsets: int = 10,
                               uids_per_subset: int = 2,
                               pairs_per_uid: int = 2, seed: int = 0,
                               size=(64, 64, 32), local=(16, 16, 16),
                               n_views: int = 6) -> List[str]:
    """A processed-LUNA-layout tree of STRUCTURED phantoms with matched
    segmentation masks — the learnable synthetic task for pretrained-vs-
    from-scratch ablations (real LUNA16 is env-blocked).

    Layout matches ``luna_preprocess.py`` output exactly, plus masks:
    ``subset{i}/{uid}_global_{k}.npy`` (2, 64, 64, 32) — two overlapping
    crops of one phantom (the pretask pair), ``{uid}_local_{k}.npy``
    (6, 16, 16, 16), and ``{uid}_mask_{k}.npy`` (2, 64, 64, 32) — the blob
    mask for each crop (consumed via ``--mask_dir``, :func:`mask_path_for`).
    """
    rng = np.random.RandomState(seed)
    X, Y, Z = size
    uids = []
    for s in range(n_subsets):
        d = os.path.join(root, f"subset{s}")
        os.makedirs(d, exist_ok=True)
        for u in range(uids_per_subset):
            uid = f"1.2.{s}.{u}"
            uids.append(uid)
            for k in range(pairs_per_uid):
                vol, mask = _structured_phantom(rng)
                # two overlapping crops of the same phantom (the IoU>0.3
                # pair analog, luna_preprocess.py:186-191)
                crops, mcrops = [], []
                base = [rng.randint(0, vol.shape[i] - size[i] - 8)
                        for i in range(3)]
                for _ in range(2):
                    off = [min(b + rng.randint(0, 9),
                               vol.shape[i] - size[i])
                           for i, b in enumerate(base)]
                    sl = tuple(slice(o, o + size[i])
                               for i, o in enumerate(off))
                    crops.append(vol[sl])
                    mcrops.append(mask[sl])
                np.save(os.path.join(d, f"{uid}_global_{k}.npy"),
                        np.stack(crops))
                np.save(os.path.join(d, f"{uid}_mask_{k}.npy"),
                        np.stack(mcrops))
                locs = []
                for _ in range(n_views):
                    off = [rng.randint(0, size[i] - local[i])
                           for i in range(3)]
                    sl = tuple(slice(o, o + local[i])
                               for i, o in enumerate(off))
                    locs.append(crops[0][sl])
                np.save(os.path.join(d, f"{uid}_local_{k}.npy"),
                        np.stack(locs))
    return uids


def write_synthetic_luna_tree(root: str, n_subsets: int = 10,
                              uids_per_subset: int = 2, pairs_per_uid: int = 2,
                              seed: int = 0) -> List[str]:
    """Materialize a fake processed-LUNA tree (for integration tests / demos)."""
    rng = np.random.RandomState(seed)
    uids = []
    for s in range(n_subsets):
        d = os.path.join(root, f"subset{s}")
        os.makedirs(d, exist_ok=True)
        for u in range(uids_per_subset):
            uid = f"1.2.{s}.{u}"
            uids.append(uid)
            for k in range(pairs_per_uid):
                np.save(os.path.join(d, f"{uid}_global_{k}.npy"),
                        rng.rand(2, 64, 64, 32).astype(np.float32))
                np.save(os.path.join(d, f"{uid}_local_{k}.npy"),
                        rng.rand(6, 16, 16, 16).astype(np.float32))
    return uids
