"""CLI-surface tests: reference ``main.py`` flag parity, the experiment
registry, and the ``luna_preprocess.py`` CLI end-to-end on a tiny MHD tree."""

import os

import numpy as np
import pytest

from pcrlv2_tpu.cli.main import DataGenerator, build_parser


def test_parser_reference_flags_and_defaults():
    """All 16 reference flags parse (reference ``main.py:22-40``)."""
    args = build_parser().parse_args([
        "--data", "/tmp/x", "--model", "pcrlv2", "--phase", "pretask",
        "--b", "32", "--epochs", "240", "--lr", "1e-3", "--output", "/tmp/o",
        "--n", "luna", "--d", "3", "--workers", "4", "--gpus", "0,1,2,3",
        "--ratio", "1.0", "--momentum", "0.9", "--weight_decay", "1e-4",
        "--seed", "42", "--amp",
    ])
    assert args.b == 32 and args.epochs == 240 and args.lr == 1e-3
    assert args.d == 3 and args.n == "luna" and args.amp is True
    assert args.momentum == 0.9 and args.weight_decay == 1e-4  # typed floats


def test_parser_defaults_match_reference():
    args = build_parser().parse_args([])
    assert args.model == "pcrlv2" and args.phase == "pretask"
    assert args.b == 16 and args.epochs == 100 and args.seed == 42
    assert args.amp is False


def test_registry_names():
    reg = DataGenerator.registry()
    assert "pcrlv2_luna_pretask" in reg
    assert "pcrlv2_chest_pretask" in reg


def test_registry_unknown_experiment_is_loud():
    args = build_parser().parse_args(["--data", "/tmp"])
    with pytest.raises(SystemExit):
        DataGenerator(args).build("pcrlv2_luna_nosuchphase")


def test_luna_pretask_loader_from_synthetic_tree(tmp_path):
    from pcrlv2_tpu.data.pipeline import write_synthetic_luna_tree

    uids = write_synthetic_luna_tree(str(tmp_path), n_subsets=8,
                                     uids_per_subset=2, pairs_per_uid=2)
    listfile = tmp_path / "luna_train.txt"
    listfile.write_text("\n".join(uids) + "\n")
    args = build_parser().parse_args([
        "--data", str(tmp_path), "--b", "4", "--ratio", "1.0",
        "--train_list", str(listfile), "--workers", "2",
    ])
    loaders = DataGenerator(args).build("pcrlv2_luna_pretask")
    batch = next(loaders["train"].epoch(0))
    assert batch["pair"].shape == (4, 2, 64, 64, 32)
    assert batch["locals"].shape == (4, 6, 16, 16, 16)
    assert loaders["eval"] is not None


def test_luna_pretask_derives_missing_manifest(tmp_path, capsys):
    """A missing --train_list is derived from the processed tree (and
    persisted) instead of crashing — run3d.sh works on a fresh tree."""
    from pcrlv2_tpu.data.pipeline import write_synthetic_luna_tree

    write_synthetic_luna_tree(str(tmp_path / "d"), n_subsets=8,
                              uids_per_subset=2, pairs_per_uid=2)
    listfile = tmp_path / "lists" / "luna_train.txt"
    args = build_parser().parse_args([
        "--data", str(tmp_path / "d"), "--b", "4", "--ratio", "1.0",
        "--train_list", str(listfile), "--workers", "2",
    ])
    loaders = DataGenerator(args).build("pcrlv2_luna_pretask")
    assert listfile.exists()  # persisted for reproducibility
    assert "derived" in capsys.readouterr().out
    batch = next(loaders["train"].epoch(0))
    assert batch["pair"].shape == (4, 2, 64, 64, 32)


def test_luna_pretask_default_manifest_derives_into_output(tmp_path, capsys):
    """With the parser-default --train_list absent, the derived manifest
    lands in the run's --output dir — never in the source checkout's
    train_val_txt/."""
    import os

    from pcrlv2_tpu.data.pipeline import write_synthetic_luna_tree

    write_synthetic_luna_tree(str(tmp_path / "d"), n_subsets=8,
                              uids_per_subset=2, pairs_per_uid=2)
    out = tmp_path / "run"
    out.mkdir()
    args = build_parser().parse_args([
        "--data", str(tmp_path / "d"), "--b", "4", "--ratio", "1.0",
        "--output", str(out), "--workers", "2",
    ])
    cwd = os.getcwd()
    os.chdir(tmp_path)  # a stray default would land under tmp_path, not repo
    try:
        DataGenerator(args).build("pcrlv2_luna_pretask")
    finally:
        os.chdir(cwd)
    assert (out / "luna_train.txt").exists()
    assert not (tmp_path / "train_val_txt").exists()
    assert "derived" in capsys.readouterr().out


def test_synthetic_loader_shapes():
    from pcrlv2_tpu.cli.main import _synthetic_loader

    args = build_parser().parse_args(["--b", "2", "--steps_per_epoch", "2"])
    loaders = _synthetic_loader(args, dim=3)
    batches = list(loaders["train"].epoch(0))
    assert len(batches) == 2
    assert batches[0]["pair"].shape == (2, 2, 64, 64, 32)
    args2 = build_parser().parse_args(["--b", "2", "--steps_per_epoch", "1"])
    b2 = next(_synthetic_loader(args2, dim=2)["train"].epoch(0))
    assert b2["image"].shape == (2, 1024, 1024, 3)  # 0/auto → NIH-native
    args3 = build_parser().parse_args(["--b", "2", "--steps_per_epoch", "1",
                                       "--chest_canvas", "512"])
    b3 = next(_synthetic_loader(args3, dim=2)["train"].epoch(0))
    assert b3["image"].shape == (2, 512, 512, 3)


def _fake_luna_tree(root: str, n_subsets=1):
    """Tiny LUNA-like MHD tree: anisotropic int16 volumes."""
    rng = np.random.RandomState(0)
    for s in range(n_subsets):
        d = os.path.join(root, f"subset{s}")
        os.makedirs(d, exist_ok=True)
        # (z, y, x) int16, spacing chosen so the 1mm volume is croppable:
        # z: 60·2 = 120, y/x: 170·1.5 = 255
        arr = (rng.rand(60, 170, 170) * 600 - 900).astype(np.int16)
        raw = os.path.join(d, "1.3.6.1.4.1.fake.raw")
        arr.tofile(raw)
        with open(os.path.join(d, "1.3.6.1.4.1.fake.mhd"), "w") as f:
            f.write(
                "ObjectType = Image\nNDims = 3\n"
                "DimSize = 170 170 60\n"
                "ElementSpacing = 1.5 1.5 2.0\n"
                "ElementType = MET_SHORT\n"
                "ElementDataFile = 1.3.6.1.4.1.fake.raw\n")


def test_luna_preprocess_cli_end_to_end(tmp_path):
    import luna_preprocess

    data = tmp_path / "raw"
    save = tmp_path / "processed"
    _fake_luna_tree(str(data))
    luna_preprocess.main([
        "--fold", "0", "--data", str(data), "--save", str(save),
        "--scale", "2", "--procs", "1",
    ])
    out = sorted(os.listdir(save / "subset0"))
    assert "1.3.6.1.4.1.fake_global_0.npy" in out
    assert "1.3.6.1.4.1.fake_local_1.npy" in out
    g = np.load(save / "subset0" / "1.3.6.1.4.1.fake_global_0.npy")
    assert g.shape == (2, 64, 64, 32)
    assert g.min() >= 0.0 and g.max() <= 1.0


def test_full_product_loop(tmp_path):
    """The complete user journey in one test: raw MHD tree → preprocessing
    CLI → training CLI on the produced tree → reference-schema checkpoint
    that strict-loads shapes (the round-trip the README documents)."""
    import torch

    import luna_preprocess
    from pcrlv2_tpu.cli.main import main as train_main

    data = tmp_path / "raw"
    save = tmp_path / "processed"
    _fake_luna_tree(str(data))
    luna_preprocess.main([
        "--fold", "0", "--data", str(data), "--save", str(save),
        "--scale", "2", "--procs", "1",
    ])
    lst = tmp_path / "uids.txt"
    lst.write_text("1.3.6.1.4.1.fake\n")
    out = tmp_path / "out"
    train_main([
        "--data", str(save), "--train_list", str(lst), "--ratio", "1.0",
        "--d", "3", "--n", "luna", "--b", "2", "--epochs", "0",
        "--steps_per_epoch", "1", "--workers", "1", "--output", str(out),
    ])
    ckpt = out / "pcrlv2_luna_pretask_1.0_0.pt"
    assert ckpt.exists()
    sd = torch.load(str(ckpt), map_location="cpu", weights_only=False)
    assert set(sd) >= {"opt", "state_dict", "epoch"}
    assert sd["epoch"] == 0
    assert sd["state_dict"]["down_tr64.ops.0.conv1.weight"].shape == \
        (32, 1, 3, 3, 3)


def test_chest_loader_canvas_plumbing(tmp_path):
    """--chest_canvas reaches the host decoder: real PNG files on disk →
    fixed-order eval loader + shuffled train loader, both decoding to the
    requested canvas (the aug pipeline is canvas-agnostic,
    test_augment2d.py)."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 255, (96, 80), np.uint8), "L").save(
                img_dir / f"x{i}.png")
    lst = tmp_path / "chest_train.txt"
    lst.write_text("".join(f"x{i}.png" + " 0" * 14 + "\n" for i in range(4)))

    args = build_parser().parse_args([
        "--n", "chest", "--d", "2", "--data", str(img_dir),
        "--train_list", str(lst), "--b", "2", "--ratio", "1.0",
        "--chest_canvas", "160", "--workers", "1", "--chest_cache", "off",
    ])
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    batch = next(loaders["train"].epoch(0))
    # grayscale PNGs stay single-channel uint8 on host (normalize +
    # RGB-replication run on device, make_chest_aug_fn)
    assert batch["image"].shape == (2, 160, 160, 1)
    assert batch["image"].dtype == np.uint8
    # eval loader: fixed order (unshuffled) so the eval metric tracks the
    # same samples every epoch
    e1 = next(loaders["eval"].epoch(0))
    e2 = next(loaders["eval"].epoch(1))
    np.testing.assert_array_equal(e1["image"], e2["image"])


def test_chest_canvas_auto_detects_native_size(tmp_path):
    """Default --chest_canvas (0) decodes on the first image's native canvas
    — zero resolution loss vs the reference's native-res CPU crops
    (chestDataset.py:31-48); 512 stays available as the fast mode."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (96, 80), np.uint8), "L").save(
                img_dir / f"x{i}.png")
    lst = tmp_path / "chest_train.txt"
    lst.write_text("".join(f"x{i}.png" + " 0" * 14 + "\n" for i in range(2)))

    args = build_parser().parse_args([
        "--n", "chest", "--d", "2", "--data", str(img_dir),
        "--train_list", str(lst), "--b", "2", "--ratio", "1.0",
        "--workers", "1", "--chest_cache", "off",
    ])
    assert args.chest_canvas == 0  # auto is the default
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    batch = next(loaders["train"].epoch(0))
    # native canvas = max(width=80, height=96) = 96; grayscale → 1 channel
    assert batch["image"].shape == (2, 96, 96, 1)


def test_chest_canvas_scans_every_source(tmp_path):
    """Auto-detect takes the max over the WHOLE list (PIL header reads are
    cheap): a larger source deep in the list must set the canvas, or it
    would be silently downsampled — the exact outcome native-resolution
    mode exists to prevent."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(12):  # image 11 of 12 is 2x the rest
        side = 128 if i == 11 else 64
        Image.fromarray(
            rng.randint(0, 255, (side, side), np.uint8), "L").save(
                img_dir / f"x{i:02d}.png")
    lst = tmp_path / "chest_train.txt"
    lst.write_text("".join(f"x{i:02d}.png" + " 0" * 14 + "\n"
                           for i in range(12)))
    args = build_parser().parse_args([
        "--n", "chest", "--d", "2", "--data", str(img_dir),
        "--train_list", str(lst), "--b", "12", "--ratio", "1.0",
        "--workers", "1", "--chest_cache", "off",
    ])
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    batch = next(loaders["train"].epoch(0))
    assert batch["image"].shape == (12, 128, 128, 1)


def test_chest_canvas_sidecar_cache(tmp_path):
    """The canvas auto-scan persists its result: a second launch with the
    same list + output dir reads the sidecar instead of re-opening every
    source (proven by editing the cached value and seeing the edit take
    effect — only a cache read could produce it)."""
    import glob
    import json

    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 64), np.uint8), "L").save(
            img_dir / f"x{i}.png")
    lst = tmp_path / "chest_train.txt"
    lst.write_text("".join(f"x{i}.png" + " 0" * 14 + "\n" for i in range(3)))
    argv = ["--n", "chest", "--d", "2", "--data", str(img_dir),
            "--train_list", str(lst), "--b", "2", "--ratio", "1.0",
            "--workers", "1", "--chest_cache", "off", "--output", str(out)]
    args = build_parser().parse_args(argv)
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    assert next(loaders["train"].epoch(0))["image"].shape == (2, 64, 64, 1)
    sidecars = glob.glob(str(out / "chest_canvas.*.json"))
    assert len(sidecars) == 1
    cached = json.load(open(sidecars[0]))
    assert cached["canvas"] == 64
    # edit the cached value (fingerprint intact); a rebuild must USE it —
    # only a cache read could produce a 48 canvas
    json.dump({**cached, "canvas": 48}, open(sidecars[0], "w"))
    args = build_parser().parse_args(argv)
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    assert next(loaders["train"].epoch(0))["image"].shape == (2, 48, 48, 1)
    # regenerated sources under the SAME names invalidate the cache
    # (fingerprint covers size+mtime): the stale 48 must NOT survive
    from PIL import Image as _Image

    rng2 = np.random.RandomState(9)
    _Image.fromarray(rng2.randint(0, 255, (96, 96), np.uint8), "L").save(
        img_dir / "x0.png")
    args = build_parser().parse_args(argv)
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    assert next(loaders["train"].epoch(0))["image"].shape == (2, 96, 96, 1)
    # a corrupt / non-dict sidecar degrades to a rescan, not a crash
    open(sidecars[0], "w").write("42")
    args = build_parser().parse_args(argv)
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    assert next(loaders["train"].epoch(0))["image"].shape == (2, 96, 96, 1)
    # a DIFFERENT list keys a different sidecar → fresh scan
    lst.write_text("".join(f"x{i}.png" + " 0" * 14 + "\n" for i in range(2)))
    args = build_parser().parse_args(argv)
    loaders = DataGenerator(args).build("pcrlv2_chest_pretask")
    assert next(loaders["train"].epoch(0))["image"].shape == (2, 96, 96, 1)
    assert len(glob.glob(str(out / "chest_canvas.*.json"))) == 2


def test_chest_decode_cache_round_trip(tmp_path):
    """CachedChestReader: first call decodes + writes the raw uint8 array,
    second call loads it byte-identically; a torn cache file re-decodes."""
    from PIL import Image

    from pcrlv2_tpu.data.pipeline import (CachedChestReader,
                                          load_chest_sample)

    p = tmp_path / "a.png"
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (70, 50), np.uint8), "L").save(p)

    cache = tmp_path / "cache"
    reader = CachedChestReader(str(cache), canvas=64)
    first = reader(str(p))["image"]
    direct = load_chest_sample(str(p), canvas=64)["image"]
    np.testing.assert_array_equal(first, direct)
    from pathlib import Path
    cpath = Path(reader._cache_path(str(p)))
    assert cpath.exists()
    second = reader(str(p))["image"]
    np.testing.assert_array_equal(second, first)
    # torn write from a crashed run: unreadable cache entry self-heals
    cpath.write_bytes(b"\x93NUMPY junk")
    healed = reader(str(p))["image"]
    np.testing.assert_array_equal(healed, direct)
    assert np.load(cpath).shape == first.shape  # rewritten


def test_chest_decode_mixed_modes_single_channel(tmp_path):
    """A dataset mixing L / RGB / RGBA / P containers decodes to a uniform
    (H, W, 1) uint8 — mixed channel counts would crash np.stack mid-epoch
    in HostLoader (NIH ChestX-ray14 really does mix L and RGBA PNGs)."""
    from PIL import Image

    from pcrlv2_tpu.data.pipeline import HostLoader, load_chest_sample

    rng = np.random.RandomState(0)
    paths = []
    for mode in ("L", "RGB", "RGBA", "P"):
        shape = (40, 40) if mode == "L" else (40, 40, len(mode))
        arr = rng.randint(0, 255, shape, np.uint8)
        im = Image.fromarray(arr.squeeze(), mode if mode != "P" else "L")
        if mode == "P":
            im = im.convert("P")
        p = tmp_path / f"img_{mode}.png"
        im.save(p)
        paths.append(str(p))
    for p in paths:
        assert load_chest_sample(p, canvas=32)["image"].shape == (32, 32, 1)
    # and the whole mixed-mode epoch stacks fine
    loader = HostLoader(paths, 4, lambda p: load_chest_sample(p, canvas=32),
                        shuffle=False, num_workers=2)
    batch = next(loader.epoch(0))
    assert batch["image"].shape == (4, 32, 32, 1)
    assert batch["image"].dtype == np.uint8


def test_chest_cache_no_basename_collision(tmp_path):
    """Two images named `img.png` in different subdirs must cache under
    different keys — a basename-keyed cache would silently serve the first
    image's pixels for the second."""
    from PIL import Image

    from pcrlv2_tpu.data.pipeline import CachedChestReader

    a = tmp_path / "sub_a" / "img.png"
    b = tmp_path / "sub_b" / "img.png"
    a.parent.mkdir()
    b.parent.mkdir()
    Image.fromarray(np.zeros((16, 16), np.uint8), "L").save(a)
    Image.fromarray(np.full((16, 16), 200, np.uint8), "L").save(b)

    reader = CachedChestReader(str(tmp_path / "cache"), canvas=16)
    assert reader._cache_path(str(a)) != reader._cache_path(str(b))
    pa = reader(str(a))["image"]
    pb = reader(str(b))["image"]  # cache now warm for both
    assert pa.max() == 0 and pb.min() == 200
    # second pass serves each image its OWN pixels from cache
    np.testing.assert_array_equal(reader(str(a))["image"], pa)
    np.testing.assert_array_equal(reader(str(b))["image"], pb)


def test_chest_cache_stale_shape_self_heals(tmp_path):
    """A cache entry with a pre-fix layout (3-channel) is re-decoded, not
    served — one epoch must never mix channel counts."""
    from PIL import Image

    from pcrlv2_tpu.data.pipeline import CachedChestReader

    p = tmp_path / "x.png"
    Image.fromarray(np.full((16, 16), 7, np.uint8), "L").save(p)
    reader = CachedChestReader(str(tmp_path / "cache"), canvas=16)
    cpath = reader._cache_path(str(p))
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    np.save(open(cpath, "wb"), np.zeros((16, 16, 3), np.uint8))  # stale 3ch
    out = reader(str(p))["image"]
    assert out.shape == (16, 16, 1) and out.max() == 7
    assert np.load(cpath).shape == (16, 16, 1)  # rewritten in current layout


def test_luna_preprocess_multiprocess(tmp_path):
    """--procs 2 takes the multiprocessing.Pool path (reference
    `luna_preprocess.py:350-351` uses Pool(5)); both folds' outputs land,
    and concurrent first-use of the native .so goes through the flock-
    serialized build."""
    import luna_preprocess

    data = tmp_path / "raw"
    save = tmp_path / "processed"
    _fake_luna_tree(str(data), n_subsets=2)
    luna_preprocess.main([
        "--data", str(data), "--save", str(save),
        "--scale", "1", "--procs", "2",
    ])
    for s in (0, 1):
        out = os.listdir(save / f"subset{s}")
        assert any(f.endswith("_global_0.npy") for f in out)
        assert any("_local_" in f for f in out)
