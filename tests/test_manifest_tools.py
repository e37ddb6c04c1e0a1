"""Manifest generator (data/make_manifests.py): LUNA UID scan over both tree
shapes, chest split writing, and the CLI's auto-derive fallback for a missing
``--train_list`` (the reference ships its lists as release artifacts,
reference ``train_val_txt/``, ``utils.py:7-27``)."""

import os

import numpy as np
import pytest

from pcrlv2_tpu.data.make_manifests import (chest_images_from_dir,
                                            luna_uids_from_tree, main,
                                            write_chest_manifests,
                                            write_luna_manifest)
from pcrlv2_tpu.data.manifests import (get_chest_list, get_luna_list,
                                       get_luna_pretrain_list)
from pcrlv2_tpu.data.pipeline import write_synthetic_luna_tree


def test_luna_uids_from_processed_tree(tmp_path):
    uids = write_synthetic_luna_tree(str(tmp_path), n_subsets=3,
                                     uids_per_subset=2, pairs_per_uid=1)
    got = luna_uids_from_tree(str(tmp_path))
    assert got == sorted(uids)


def test_luna_uids_from_raw_tree(tmp_path):
    for s in range(2):
        d = tmp_path / f"subset{s}"
        d.mkdir()
        for u in range(3):
            (d / f"1.3.{s}.{u}.mhd").write_text("x")
            (d / f"1.3.{s}.{u}.raw").write_text("x")  # ignored
    got = luna_uids_from_tree(str(tmp_path))
    assert got == sorted(f"1.3.{s}.{u}" for s in range(2) for u in range(3))


def test_write_luna_manifest_roundtrip(tmp_path):
    write_synthetic_luna_tree(str(tmp_path / "data"), n_subsets=10,
                              uids_per_subset=1, pairs_per_uid=1)
    out = tmp_path / "lists" / "luna_train.txt"
    uids = write_luna_manifest(str(tmp_path / "data"), str(out))
    # manifests.get_luna_pretrain_list parses what we wrote, ratio applies
    assert get_luna_pretrain_list(1.0, str(out)) == uids
    assert get_luna_pretrain_list(0.5, str(out)) == uids[:5]
    # and the full pipeline scan finds the train-fold files
    x_train, x_valid, _ = get_luna_list(
        str(tmp_path / "data"), train_fold=range(7), valid_fold=range(7, 10),
        test_fold=range(7, 10), suffix="_global_", file_list=uids)
    assert len(x_train) == 7 and len(x_valid) == 3


def test_write_chest_manifests(tmp_path):
    img_dir = tmp_path / "imgs"
    (img_dir / "sub").mkdir(parents=True)
    for i in range(10):
        (img_dir / f"a_{i}.png").write_bytes(b"x")
    (img_dir / "sub" / "b.jpg").write_bytes(b"x")
    (img_dir / "notes.txt").write_text("skip me")
    tr, va, te = write_chest_manifests(str(img_dir), str(tmp_path / "out"),
                                       splits=(0.6, 0.2), seed=1)
    assert len(tr) + len(va) + len(te) == 11
    assert len(tr) == 6
    names, labels = get_chest_list(
        str(tmp_path / "out" / "chest_train.txt"), str(img_dir))
    assert len(names) == 6 and all(len(l) == 14 for l in labels)
    assert all(os.path.isabs(n) or n.startswith(str(img_dir)) for n in names)


def test_cli_main_entrypoint(tmp_path, capsys):
    write_synthetic_luna_tree(str(tmp_path / "d"), n_subsets=1,
                              uids_per_subset=2, pairs_per_uid=1)
    main(["--n", "luna", "--data", str(tmp_path / "d"),
          "--out", str(tmp_path / "o")])
    assert (tmp_path / "o" / "luna_train.txt").exists()
    assert "wrote 2 UIDs" in capsys.readouterr().out


def test_empty_tree_is_loud(tmp_path):
    with pytest.raises(SystemExit):
        write_luna_manifest(str(tmp_path), str(tmp_path / "x.txt"))
    with pytest.raises(SystemExit):
        write_chest_manifests(str(tmp_path), str(tmp_path / "o"))


def test_sample_lists_parse():
    """The checked-in smoke-run samples stay parseable and match the
    synthetic tree's UID scheme."""
    uids = get_luna_pretrain_list(1.0, "train_val_txt/luna_train.sample.txt")
    assert len(uids) == 20 and all(u.startswith("1.2.") for u in uids)
    names, labels = get_chest_list("train_val_txt/chest_train.sample.txt", ".")
    assert len(names) == 8 and all(len(l) == 14 for l in labels)
