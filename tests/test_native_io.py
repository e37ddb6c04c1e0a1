"""Native C++ data-plane tests (``native/pcrl_io.cpp`` via ctypes) and the
batch-read integration in the host pipeline."""

import os

import numpy as np
import pytest

from pcrlv2_tpu import native


def _write_npys(tmp_path, n=6, shape=(2, 8, 8, 4), seed=0):
    rng = np.random.RandomState(seed)
    paths, arrays = [], []
    for i in range(n):
        a = rng.rand(*shape).astype(np.float32)
        p = str(tmp_path / f"x_global_{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_read_npy_float32_exact(tmp_path):
    paths, arrays = _write_npys(tmp_path, n=1)
    out = native.read_npy(paths[0], count=arrays[0].size)
    np.testing.assert_array_equal(out, arrays[0].reshape(-1))


def test_read_npy_converts_float64(tmp_path):
    p = str(tmp_path / "d.npy")
    np.save(p, np.linspace(0, 1, 100, dtype=np.float64))
    out = native.read_npy(p, count=100)
    np.testing.assert_allclose(out, np.linspace(0, 1, 100, dtype=np.float32),
                               rtol=1e-7)


def test_read_npy_converts_int16(tmp_path):
    p = str(tmp_path / "h.npy")
    np.save(p, np.array([-1000, 0, 999], np.int16))
    out = native.read_npy(p, count=3)
    np.testing.assert_array_equal(out, [-1000.0, 0.0, 999.0])


def test_read_batch_matches_numpy(tmp_path):
    paths, arrays = _write_npys(tmp_path, n=6)
    out = np.empty((6, 2, 8, 8, 4), np.float32)
    native.read_batch(paths, out, n_threads=4)
    for i in range(6):
        np.testing.assert_array_equal(out[i], arrays[i])


def test_read_batch_wrong_size_errors(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable (fallback has no size check)")
    paths, _ = _write_npys(tmp_path, n=2)
    np.save(paths[1], np.zeros((3, 3), np.float32))  # wrong element count
    out = np.empty((2, 2, 8, 8, 4), np.float32)
    with pytest.raises(IOError):
        native.read_batch(paths, out)


def test_luna_batch_reader_in_host_loader(tmp_path):
    from pcrlv2_tpu.data.pipeline import HostLoader, LunaBatchReader, load_luna_sample

    rng = np.random.RandomState(1)
    paths = []
    for i in range(8):
        g = str(tmp_path / f"1.2.3_global_{i}.npy")
        np.save(g, rng.rand(2, 16, 16, 8).astype(np.float32))
        np.save(str(tmp_path / f"1.2.3_local_{i}.npy"),
                rng.rand(6, 8, 8, 8).astype(np.float32))
        paths.append(g)
    reader = LunaBatchReader(4, pair_shape=(2, 16, 16, 8),
                             local_shape=(6, 8, 8, 8), n_threads=2)
    loader = HostLoader(paths, 4, load_luna_sample, shuffle=True, seed=0,
                        batch_read_fn=reader)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["pair"].shape == (4, 2, 16, 16, 8)
    assert batches[0]["locals"].shape == (4, 6, 8, 8, 8)
    # batch-level reads must agree with the per-sample path
    plain = HostLoader(paths, 4, load_luna_sample, shuffle=True, seed=0)
    plain_batches = list(plain.epoch(0))
    np.testing.assert_array_equal(batches[0]["pair"], plain_batches[0]["pair"])
    np.testing.assert_array_equal(batches[1]["locals"],
                                  plain_batches[1]["locals"])


def test_native_resample_matches_numpy_path():
    """The fused C++ resample+transpose (pcrl_resample.cpp) must agree with
    the NumPy separable resampler to fp rounding, int16 and float32."""
    if not native.available():
        pytest.skip("native library unavailable")
    from pcrlv2_tpu.preprocess import mhd

    rng = np.random.RandomState(3)
    for dtype in (np.int16, np.float32):
        vol = (rng.rand(20, 24, 28) * 2000 - 1000).astype(dtype)
        img = mhd.MetaImage(array=vol, spacing=[0.7, 0.8, 1.3])
        ref = np.ascontiguousarray(
            mhd.resample_isotropic(img).array.transpose(2, 1, 0))
        in_sp = img.spacing[::-1]
        out_size = [int(vol.shape[d] * in_sp[d] + 0.5) for d in range(3)]
        out = native.resample_to_xyz(vol, [1.0 / s for s in in_sp], out_size)
        assert out is not None and out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-3)


def test_load_volume_1mm_native_equals_fallback(tmp_path, monkeypatch):
    """load_volume_1mm takes the native path when available and matches the
    NumPy fallback."""
    if not native.available():
        pytest.skip("native library unavailable")
    from pcrlv2_tpu.preprocess import mhd

    rng = np.random.RandomState(4)
    vol = (rng.rand(12, 16, 18) * 2000 - 1000).astype(np.int16)
    raw = tmp_path / "case.raw"
    raw.write_bytes(vol.tobytes())
    (tmp_path / "case.mhd").write_text(
        "ObjectType = Image\nNDims = 3\nDimSize = 18 16 12\n"
        "ElementType = MET_SHORT\nElementSpacing = 0.9 1.1 1.4\n"
        "ElementDataFile = case.raw\n")
    got = mhd.load_volume_1mm(str(tmp_path / "case.mhd"))
    monkeypatch.setattr(native, "resample_to_xyz", lambda *a, **k: None)
    ref = mhd.load_volume_1mm(str(tmp_path / "case.mhd"))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_f16_h2d_path(tmp_path):
    """--h2d_dtype f16: readers emit float16 at <=2^-11 relative error, and
    the device aug (which promotes to f32 at entry) stays within the same
    bound of the f32 path."""
    from functools import partial

    import jax

    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import (HostLoader, LunaBatchReader,
                                          load_luna_sample)

    rng = np.random.RandomState(7)
    paths = []
    for i in range(4):
        g = str(tmp_path / f"1.2.3_global_{i}.npy")
        np.save(g, rng.rand(2, 16, 16, 8).astype(np.float32))
        np.save(str(tmp_path / f"1.2.3_local_{i}.npy"),
                rng.rand(6, 8, 8, 8).astype(np.float32))
        paths.append(g)

    loaders = {"plain": HostLoader(
        paths, 4, partial(load_luna_sample, dtype=np.float16),
        shuffle=False, seed=0)}
    if native.available():
        loaders["native"] = HostLoader(
            paths, 4, load_luna_sample, shuffle=False, seed=0,
            batch_read_fn=LunaBatchReader(4, pair_shape=(2, 16, 16, 8),
                                          local_shape=(6, 8, 8, 8),
                                          n_threads=2, dtype=np.float16))
    f32 = next(iter(HostLoader(paths, 4, load_luna_sample,
                               shuffle=False, seed=0).epoch(0)))
    for name, loader in loaders.items():
        b16 = next(iter(loader.epoch(0)))
        assert b16["pair"].dtype == np.float16, name
        assert b16["locals"].dtype == np.float16, name
        np.testing.assert_allclose(b16["pair"].astype(np.float32),
                                   f32["pair"], rtol=2 ** -11, atol=2 ** -12)

    aug = jax.jit(make_luna_aug_fn())
    key = jax.random.key(0)
    v32 = aug(key, f32)
    v16 = aug(key, next(iter(loaders["plain"].epoch(0))))
    for k in v32:
        assert v16[k].dtype == v32[k].dtype  # promoted to f32 on device
        a, b = np.asarray(v32[k]), np.asarray(v16[k])
        # Z-norm/gamma amplify the 2^-11 input quantization; bound it
        # relative to the tensor's own scale (measured worst case ~1.3% on
        # the Z-normalized views — a couple of bf16 roundings' worth)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() <= 0.02 * scale, k
        assert np.percentile(np.abs(a - b), 99) <= 0.006 * scale, k
