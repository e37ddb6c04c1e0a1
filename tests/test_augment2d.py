"""2D augmentation tests: crop/resize numerics vs jax.image, shear-rotation
geometry vs the exact gather path, corruption semantics, full-pipeline shapes
(reference transform stack ``data.py:19-44``).  Core ops are channels-first
(see augment2d's layout note); the batch aug fn stays NHWC."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcrlv2_tpu.data import augment2d as A


def test_crop_and_resize_matches_jax_image():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(128, 128, 3).astype(np.float32))
    img_chw = jnp.transpose(img, (2, 0, 1))
    for box in [(10.3, 20.7, 60.2, 80.9), (0.0, 0.0, 128.0, 128.0),
                (5.5, 3.3, 20.0, 30.0)]:
        got = A.crop_and_resize(img_chw, tuple(jnp.float32(v) for v in box),
                                64)
        scale = jnp.array([64 / box[2], 64 / box[3]])
        ref = jax.image.scale_and_translate(
            img, (64, 64, 3), (0, 1), scale,
            -jnp.array(box[:2]) * scale, method="linear", antialias=True)
        np.testing.assert_allclose(np.asarray(jnp.transpose(got, (1, 2, 0))),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_resized_crop_box_within_bounds():
    for seed in range(5):
        i, j, h, w = A.sample_resized_crop_box(
            jax.random.key(seed), (512, 512), (0.3, 1.0))
        assert 0 <= float(i) and float(i) + float(h) <= 512
        assert 0 <= float(j) and float(j) + float(w) <= 512
        area_frac = float(h) * float(w) / 512 ** 2
        assert 0.2 < area_frac <= 1.01  # sampled scale (.3, 1) ± aspect


def test_rotate_shear_geometry_matches_exact():
    """Off-center point features land on the same pixel in both backends."""
    x = np.zeros((1, 65, 65), np.float32)
    x[0, 45, 30] = 1.0
    for deg in (-9.0, 4.0, 9.5):
        th = jnp.float32(np.deg2rad(deg))
        a = np.asarray(A._rotate_shear(jnp.asarray(x), th, 10.0))[0]
        b = np.asarray(A._rotate_exact(jnp.asarray(x), th))[0]
        pa = np.unravel_index(a.argmax(), a.shape)
        pb = np.unravel_index(b.argmax(), b.shape)
        assert pa == pb, f"{deg}°: shear peak {pa} != exact peak {pb}"
        np.testing.assert_allclose(a.sum(), 1.0, atol=1e-4)  # mass preserved


def test_rotate_shear_close_to_exact_on_smooth_field():
    gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    sm = ((np.sin(gy / 9) * np.cos(gx / 7) + 1) / 2).astype(np.float32)[None]
    th = jnp.float32(np.deg2rad(7))
    a = np.asarray(A._rotate_shear(jnp.asarray(sm), th, 10.0))[0]
    b = np.asarray(A._rotate_exact(jnp.asarray(sm), th))[0]
    ctr = (slice(16, 48), slice(16, 48))
    # bounded by nearest-vs-linear interpolation difference (~0.5px · |∇|)
    assert np.abs(a - b)[ctr].max() < 0.06


def test_rotate_zero_angle_is_identity():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
    out = A._rotate_shear(img, jnp.float32(0.0), 10.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_cutout_zeroes_holes():
    img = jnp.ones((3, 64, 64))
    out = np.asarray(A.cutout(jax.random.key(0), img))
    assert out.min() == 0.0 and out.max() == 1.0
    assert (out == 0).mean() > 0.01  # some area removed


def test_full_chest_aug_shapes():
    from pcrlv2_tpu.data.pipeline import synthetic_chest_batch

    aug = jax.jit(A.make_chest_aug_fn())
    batch = jax.tree.map(jnp.asarray, synthetic_chest_batch(2, canvas=256))
    views = aug(jax.random.key(0), batch)
    assert views["x1"].shape == (2, 224, 224, 3)
    assert views["x2"].shape == (2, 224, 224, 3)
    assert views["gt"].shape == (2, 224, 224, 3)
    assert views["locals"].shape == (2, 6, 96, 96, 3)
    for v in jax.tree.leaves(views):
        assert np.isfinite(np.asarray(v)).all()


def test_chest_aug_uint8_gray_matches_float_rgb():
    """The production host format (uint8, single channel for grayscale
    sources — 12x fewer H2D bytes) matches the legacy float32-RGB form to
    one ulp: uint8/255 and channel replication happen on device before any
    aug op (XLA may canonicalize the /255 to a reciprocal-multiply, hence
    allclose rather than array_equal)."""
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (2, 160, 160, 1), np.uint8)
    f32 = np.broadcast_to(u8, (2, 160, 160, 3)).astype(np.float32) / 255.0

    aug = jax.jit(A.make_chest_aug_fn())
    k = jax.random.key(7)
    v_u8 = aug(k, {"image": jnp.asarray(u8)})
    v_f32 = aug(k, {"image": jnp.asarray(f32)})
    for a, b in zip(jax.tree.leaves(v_u8), jax.tree.leaves(v_f32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-6)
