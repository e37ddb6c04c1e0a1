"""Tests for the on-device 3D augmentation stack (torchio-equivalent).

torchio itself is not installed, so these pin semantics via golden properties
(what each transform must preserve/do) plus scipy-free numeric checks against
torch where a primitive exists.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcrlv2_tpu.data import augment3d as A

SHAPE = (16, 16, 8)


def vol(seed=0, shape=SHAPE):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape).astype(np.float32))


class TestSpatial:
    def test_flip_is_exact_flip_or_identity(self):
        x = vol()
        outs = {bool(np.allclose(np.asarray(A.random_flip(jax.random.key(i), x)),
                                 np.asarray(x)))
                for i in range(20)}
        assert outs == {True, False}  # both branches occur
        flipped = A.random_flip(jax.random.key(3), x)
        ok_id = np.allclose(np.asarray(flipped), np.asarray(x))
        ok_flip = np.allclose(np.asarray(flipped), np.asarray(jnp.flip(x, 0)))
        assert ok_id or ok_flip

    def test_affine_identity_when_no_randomness(self):
        """degrees=0, scales=(1,1) must be the identity resample."""
        x = vol(1)
        out = A.random_affine(jax.random.key(0), x, degrees=0.0, scales=(1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_affine_pure_scale_matches_torch_grid_sample(self):
        """Pure isotropic scaling vs torch.nn.functional affine_grid/grid_sample
        (align_corners=True matches our center-based index mapping)."""
        x = vol(2, (12, 12, 12))
        s = 1.1
        # degrees=0 and a degenerate scale range pin the sampled transform
        out = A.random_affine(jax.random.key(0), x, degrees=0.0, scales=(s, s))

        t = torch.from_numpy(np.asarray(x))[None, None]  # (1,1,D,H,W)
        theta = torch.zeros(1, 3, 4)
        # grid_sample maps output->input: input = theta @ output; our map is
        # in = (1/s)·(out-c)+c in index space == same in normalized space.
        theta[0, 0, 0] = 1.0 / s
        theta[0, 1, 1] = 1.0 / s
        theta[0, 2, 2] = 1.0 / s
        grid = torch.nn.functional.affine_grid(theta, t.shape, align_corners=True)
        ref = torch.nn.functional.grid_sample(t, grid, mode="bilinear",
                                              padding_mode="zeros",
                                              align_corners=True)
        ref = ref[0, 0].numpy()
        got = np.asarray(out)
        # interior comparison (border handling differs: min-pad vs zeros)
        sl = slice(2, -2)
        np.testing.assert_allclose(got[sl, sl, sl], ref[sl, sl, sl],
                                   rtol=1e-3, atol=1e-3)


    def test_affine_shear_matches_exact_in_center(self):
        """The MXU shear-decomposition path agrees with the gather-based
        trilinear path away from the boundary-fill zones (both drive the same
        sampled transform; see _affine_shear's documented tolerance)."""
        X, Y, Z = 32, 32, 16
        gi, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                                 indexing="ij")
        smooth = jnp.asarray(
            ((np.sin(6 * gi / X) * np.cos(5 * gy / Y) * np.sin(4 * gz / Z))
             + 1).astype(np.float32) / 2)
        for seed in range(3):
            k = jax.random.key(seed)
            a = A.random_affine(k, smooth, impl="shear")
            b = A.random_affine(k, smooth, impl="exact")
            ctr = (slice(8, 24), slice(8, 24), slice(4, 12))
            d = np.abs(np.asarray(a) - np.asarray(b))[ctr]
            # ~1e-2 on O(1) signal at this small volume (boundary effects
            # reach further relative to a 32³ extent than the 64³ training
            # crops, where the central agreement is ~3e-3)
            assert d.max() < 2e-2, f"seed {seed}: central max diff {d.max()}"

    def test_affine_shear_rotation_geometry(self):
        """A pure z-rotation by the shear path moves a point feature to where
        the exact path moves it (geometry, not just smoothness)."""
        x = np.zeros((17, 17, 9), np.float32)
        x[12, 8, 4] = 1.0  # off-center spike
        minv = np.eye(3, dtype=np.float32)
        th = np.deg2rad(10.0)
        minv[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        a = np.asarray(A._affine_shear(jnp.asarray(x), jnp.asarray(minv)))
        b = np.asarray(A._affine_exact(jnp.asarray(x), jnp.asarray(minv)))
        pa = np.unravel_index(np.argmax(a), a.shape)
        pb = np.unravel_index(np.argmax(b), b.shape)
        assert pa == pb, f"peak moved to {pa}, exact says {pb}"


class TestIntensity:
    def test_blur_zero_sigma_is_identity(self):
        x = vol(3)
        out = A.random_blur(jax.random.key(0), x, std=(0.0, 0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_blur_preserves_mean_and_reduces_variance(self):
        x = vol(4)
        out = A.random_blur(jax.random.key(1), x, std=(1.5, 2.0))
        assert abs(float(out.mean()) - float(x.mean())) < 1e-3
        assert float(out.std()) < float(x.std())

    def test_blur_matches_scipy_style_torch_conv(self):
        """1-axis Gaussian vs torch conv1d with the same kernel + reflect pad."""
        x = vol(5)
        sigma = 1.3
        k = np.asarray(A._gaussian_kernel(jnp.float32(sigma)))
        got = np.asarray(A._blur_axis(x, jnp.asarray(k), 0))
        t = torch.from_numpy(np.asarray(x)).permute(2, 1, 0).reshape(-1, 1, SHAPE[0])
        t = torch.nn.functional.pad(t, (8, 8), mode="reflect")
        ref = torch.nn.functional.conv1d(t, torch.from_numpy(k)[None, None])
        ref = ref.reshape(SHAPE[2], SHAPE[1], SHAPE[0]).permute(2, 1, 0).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_noise_statistics(self):
        x = jnp.zeros((32, 32, 32))
        out = A.random_noise(jax.random.key(2), x, std=(0.25, 0.25))
        assert 0.2 < float(out.std()) < 0.3
        assert abs(float(out.mean())) < 0.01

    def test_gamma_monotone_on_unit_interval(self):
        x = vol(6)
        out = A.random_gamma(jax.random.key(3), x)
        assert float(out.min()) >= 0.0
        assert float(out.max()) <= 1.0 + 1e-6
        # order preserved
        flat_in = np.asarray(x).ravel()
        flat_out = np.asarray(out).ravel()
        order = np.argsort(flat_in)
        assert np.all(np.diff(flat_out[order]) >= -1e-6)

    def test_swap_permutes_voxels(self):
        """Swap preserves the multiset of voxel values but moves them."""
        x = vol(7, (16, 8, 8))
        out = A.random_swap(jax.random.key(4), x, patch_size=(4, 2, 2),
                            num_iterations=10)
        assert not np.allclose(np.asarray(out), np.asarray(x))
        np.testing.assert_allclose(np.sort(np.asarray(out).ravel()),
                                   np.sort(np.asarray(x).ravel()), atol=1e-6)

    def test_znorm(self):
        x = vol(8)
        out = A.z_normalize(x)
        assert abs(float(out.mean())) < 1e-5
        n = np.asarray(x).size
        np.testing.assert_allclose(float(out.std(ddof=1)), 1.0, rtol=1e-4)


class TestDormantOps:
    def test_bezier_fixed_points(self):
        """Curve passes through (0,0) and (1,1): extremes map to extremes."""
        x = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(4, 4, 4))
        out = A.bezier_intensity_map(jax.random.key(0), x, n_points=1000)
        assert float(out.min()) >= -1e-4
        assert float(out.max()) <= 1.0 + 1e-4

    def test_local_pixel_shuffling_preserves_values(self):
        x = vol(9)
        out = A.local_pixel_shuffling(jax.random.key(1), x, num_block=8)
        np.testing.assert_allclose(np.sort(np.asarray(out).ravel()),
                                   np.sort(np.asarray(x).ravel()), atol=1e-6)

    def test_in_painting_changes_interior_box(self):
        x = vol(10, (24, 24, 24))
        out = A.image_in_painting(jax.random.key(2), x, cnt=5)
        assert not np.allclose(np.asarray(out), np.asarray(x))

    def test_out_painting_keeps_some_original(self):
        x = vol(11, (28, 28, 28))
        out = A.image_out_painting(jax.random.key(3), x, cnt=4)
        same = np.isclose(np.asarray(out), np.asarray(x)).mean()
        assert 0.0 < same < 1.0


class TestBatchAugFn:
    def test_shapes_and_gt_semantics(self):
        """GT is spatially-augmented but NOT intensity-corrupted/Z-normalized
        (reference ``lunaDataset.py:37-42``): its value range stays [min,max]
        of the input while x1 is Z-normalized (≈zero mean)."""
        aug = A.make_luna_aug_fn()
        rng = np.random.RandomState(0)
        batch = {
            "pair": jnp.asarray(rng.rand(2, 2, 16, 16, 8).astype(np.float32)),
            "locals": jnp.asarray(rng.rand(2, 3, 8, 8, 8).astype(np.float32)),
        }
        views = jax.jit(aug)(jax.random.key(0), batch)
        assert views["x1"].shape == (2, 16, 16, 8, 1)
        assert views["gt"].shape == (2, 16, 16, 8, 1)
        assert views["locals"].shape == (2, 3, 8, 8, 8, 1)
        # x1 z-normalized per volume, gt not
        x1 = np.asarray(views["x1"][0])
        gt = np.asarray(views["gt"][0])
        assert abs(x1.mean()) < 0.05
        assert gt.min() >= -1e-3 and gt.max() <= 1.0 + 1e-3

    def test_deterministic_per_key(self):
        aug = A.make_luna_aug_fn()
        rng = np.random.RandomState(1)
        batch = {
            "pair": jnp.asarray(rng.rand(1, 2, 16, 16, 8).astype(np.float32)),
            "locals": jnp.asarray(rng.rand(1, 2, 8, 8, 8).astype(np.float32)),
        }
        v1 = aug(jax.random.key(7), batch)
        v2 = aug(jax.random.key(7), batch)
        v3 = aug(jax.random.key(8), batch)
        np.testing.assert_array_equal(np.asarray(v1["x1"]), np.asarray(v2["x1"]))
        assert not np.allclose(np.asarray(v1["x1"]), np.asarray(v3["x1"]))
