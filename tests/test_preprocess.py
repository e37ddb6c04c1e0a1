"""Preprocessing subsystem tests: MHD IO, isotropic resample, vectorized
thickness maps, IoU, crop-pair generation (reference ``luna_preprocess.py``)."""

import os
import random

import numpy as np
import pytest

from pcrlv2_tpu.preprocess import (
    PreprocessConfig,
    cal_iou,
    crop_pair,
    generate_pairs_from_volume,
    normalize_hu,
    thickness_maps,
)
from pcrlv2_tpu.preprocess.luna import resize3d
from pcrlv2_tpu.preprocess.mhd import (
    MetaImage,
    load_volume_1mm,
    read_mhd,
    resample_isotropic,
)


def _write_mhd(tmp_path, arr_zyx, spacing_xyz, name="vol", compressed=False):
    raw_name = f"{name}.zraw" if compressed else f"{name}.raw"
    blob = arr_zyx.tobytes()
    if compressed:
        import zlib

        blob = zlib.compress(blob)
    with open(os.path.join(tmp_path, raw_name), "wb") as f:
        f.write(blob)
    dims = " ".join(str(s) for s in arr_zyx.shape[::-1])
    sp = " ".join(str(s) for s in spacing_xyz)
    header = (
        "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        "BinaryDataByteOrderMSB = False\n"
        f"CompressedData = {compressed}\n"
        "TransformMatrix = 1 0 0 0 1 0 0 0 1\n"
        "Offset = -195 -195 -378\n"
        f"ElementSpacing = {sp}\nDimSize = {dims}\n"
        "ElementType = MET_SHORT\n"
        f"ElementDataFile = {raw_name}\n"
    )
    path = os.path.join(tmp_path, f"{name}.mhd")
    with open(path, "w") as f:
        f.write(header)
    return path


def test_read_mhd_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(-1000, 1000, size=(10, 12, 14), dtype=np.int16)
    path = _write_mhd(str(tmp_path), arr, (0.7, 0.7, 2.5))
    img = read_mhd(path)
    np.testing.assert_array_equal(img.array, arr)
    assert img.spacing == [0.7, 0.7, 2.5]
    assert img.size == [14, 12, 10]
    assert img.origin == [-195.0, -195.0, -378.0]


def test_read_mhd_compressed(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(-50, 50, size=(4, 5, 6), dtype=np.int16)
    path = _write_mhd(str(tmp_path), arr, (1, 1, 1), compressed=True)
    np.testing.assert_array_equal(read_mhd(path).array, arr)


def test_resample_isotropic_linear_ramp_exact(tmp_path):
    """Linear resampling of a linear field is exact: value at output voxel i
    must equal the ramp evaluated at physical position i·1mm."""
    # ramp over z with spacing 2.5mm: value(z_index) = 10·z_index
    nz, ny, nx = 20, 8, 8
    arr = (10 * np.arange(nz, dtype=np.float32))[:, None, None] * np.ones(
        (nz, ny, nx), np.float32)
    img = MetaImage(array=arr, spacing=[1.0, 1.0, 2.5])
    out = resample_isotropic(img)
    assert out.array.shape == (50, 8, 8)  # round(20·2.5)
    # physical z of output voxel k is k mm → input index k/2.5 → value 10·k/2.5
    for k in (0, 7, 30, 47):
        np.testing.assert_allclose(out.array[k, 0, 0], 10 * k / 2.5,
                                   rtol=1e-5, atol=1e-4)


def test_resample_output_size_rounding():
    arr = np.zeros((10, 10, 10), np.float32)
    img = MetaImage(array=arr, spacing=[0.703125, 0.703125, 1.25])
    out = resample_isotropic(img)
    # int(size·spacing + 0.5) per axis — SimpleITK convention
    assert out.array.shape == (int(10 * 1.25 + 0.5),
                               int(10 * 0.703125 + 0.5),
                               int(10 * 0.703125 + 0.5))


def test_load_volume_1mm_transposes(tmp_path):
    arr = np.arange(3 * 4 * 5, dtype=np.int16).reshape(3, 4, 5)  # (z,y,x)
    path = _write_mhd(str(tmp_path), arr, (1, 1, 1))
    vol = load_volume_1mm(path)
    assert vol.shape == (5, 4, 3)  # (x,y,z)
    np.testing.assert_allclose(vol[2, 1, 0], float(arr[0, 1, 2]))


def test_normalize_hu():
    img = np.array([-2000.0, -1000.0, 0.0, 1000.0, 3000.0])
    out = normalize_hu(img)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_cal_iou_basic():
    b = (0, 10, 0, 10, 0, 10)
    assert cal_iou(b, b) == 1.0
    assert cal_iou(b, (10, 20, 0, 10, 0, 10)) == 0.0
    # half-overlap in x only: inter=500, union=1500
    assert abs(cal_iou(b, (5, 15, 0, 10, 0, 10)) - 500 / 1500) < 1e-9


def _thickness_loop(window, hu_thred, input_depth, len_depth):
    """Direct transcription of the reference's 4-deep loop
    (``luna_preprocess.py:217-243``) as ground truth."""
    rows, cols = window.shape[:2]
    t = np.zeros((rows, cols, input_depth), np.float32)
    d = np.zeros((rows, cols, input_depth), np.float32)
    for dep in range(input_depth):
        for i in range(rows):
            for j in range(cols):
                for k in range(len_depth):
                    if window[i, j, dep + k] >= hu_thred:
                        t[i, j, dep] = window[i, j, dep + k]
                        d[i, j, dep] = k
                        break
                    if k == len_depth - 1:
                        d[i, j, dep] = k
    d = 1.0 - d / (len_depth - 1)
    return t, d


def test_thickness_maps_match_reference_loop():
    rng = np.random.RandomState(3)
    window = rng.rand(6, 7, 11).astype(np.float32)
    cfg = PreprocessConfig()
    t_fast, d_fast = thickness_maps(window, cfg.hu_thred, 8, cfg.len_depth)
    t_ref, d_ref = _thickness_loop(window, cfg.hu_thred, 8, cfg.len_depth)
    np.testing.assert_allclose(t_fast, t_ref)
    np.testing.assert_allclose(d_fast, d_ref)


def test_resize3d_identity_and_linear():
    rng = np.random.RandomState(4)
    arr = rng.rand(8, 8, 8).astype(np.float32)
    np.testing.assert_allclose(resize3d(arr, (8, 8, 8)), arr)
    # upsampling a constant is exact
    const = np.full((4, 4, 4), 0.37, np.float32)
    np.testing.assert_allclose(resize3d(const, (9, 9, 9)), 0.37, rtol=1e-6)
    # downsampling a linear ramp stays linear in the interior
    ramp = np.broadcast_to(
        np.arange(16, dtype=np.float32)[:, None, None], (16, 16, 16)).copy()
    small = resize3d(ramp, (8, 8, 8))
    diffs = np.diff(small[2:6, 4, 4])
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-3)


def _lung_volume(shape=(240, 240, 120), seed=5):
    """A volume dense enough in sub-threshold voxels to pass the air filter."""
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * 0.3).astype(np.float32)  # all < HU_thred 0.425


def test_crop_pair_shapes_and_range():
    cfg = PreprocessConfig()
    c1, c2, loc = crop_pair(_lung_volume(), cfg, random.Random(0),
                            np.random.RandomState(0))
    assert c1.shape == (64, 64, 32)
    assert c2.shape == (64, 64, 32)
    assert loc.shape == (6, 16, 16, 16)
    for a in (c1, c2, loc):
        assert np.isfinite(a).all()
        assert a.min() >= -1e-4 and a.max() <= 1.0 + 1e-4


def test_crop_pair_thin_volume_padded():
    cfg = PreprocessConfig()
    thin = _lung_volume((240, 240, 60), seed=6)  # below min z of 98
    c1, c2, loc = crop_pair(thin, cfg, random.Random(1),
                            np.random.RandomState(1))
    assert c1.shape == (64, 64, 32)


def test_generate_pairs_writes_reference_layout(tmp_path):
    cfg = PreprocessConfig(scale=2)
    vol = (_lung_volume((200, 200, 110), seed=7) * 2000 - 1000)  # HU range
    n = generate_pairs_from_volume(vol, str(tmp_path), "1.2.3", cfg,
                                   random.Random(2), np.random.RandomState(2))
    assert n == 2
    for k in range(2):
        g = np.load(tmp_path / f"1.2.3_global_{k}.npy")
        l = np.load(tmp_path / f"1.2.3_local_{k}.npy")
        assert g.shape == (2, 64, 64, 32) and g.dtype == np.float32
        assert l.shape == (6, 16, 16, 16) and l.dtype == np.float32


def test_air_filter_rejects_dense_volume():
    """A volume entirely above the HU threshold has d_img ≡ 1 everywhere and
    must trip the lung_max filter."""
    cfg = PreprocessConfig()
    window = np.ones((64, 64, 35), np.float32)  # all ≥ 0.425
    _, d_img = thickness_maps(window, cfg.hu_thred, 32, cfg.len_depth)
    assert d_img.sum() == 64 * 64 * 32
    assert d_img.sum() > cfg.lung_max * 64 * 64 * 32
