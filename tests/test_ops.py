"""Numerics tests for ops vs the torch ops the reference uses.

Torch (CPU build) is available in the image and serves as the golden
implementation of cuDNN semantics; every op the models rely on is pinned here
(SURVEY.md §4 test strategy).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pcrlv2_tpu import ops

RTOL, ATOL = 1e-4, 1e-5


def _np(x):
    return np.asarray(x, dtype=np.float32)


class TestConv3d:
    @pytest.mark.parametrize("cin,cout,k", [(3, 8, 3), (8, 4, 1)])
    def test_matches_torch(self, cin, cout, k):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 6, 6, 4, cin).astype(np.float32)  # NDHWC
        w = rng.randn(k, k, k, cin, cout).astype(np.float32)  # DHWIO
        b = rng.randn(cout).astype(np.float32)

        got = _np(ops.conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCDHW
        tw = torch.from_numpy(w).permute(4, 3, 0, 1, 2)  # OIDHW
        ref = F.conv3d(tx, tw, torch.from_numpy(b), padding=k // 2)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestConv2d:
    @pytest.mark.parametrize("k,stride", [(3, 1), (1, 1), (3, 2), (7, 2)])
    def test_matches_torch(self, k, stride):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 16, 16, 5).astype(np.float32)
        w = rng.randn(k, k, 5, 7).astype(np.float32)

        got = _np(ops.conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride))

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tw = torch.from_numpy(w).permute(3, 2, 0, 1)
        ref = F.conv2d(tx, tw, stride=stride, padding=k // 2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestConvTranspose3d:
    def test_k2s2_matches_torch(self):
        """The reference's only transpose conv: k=2, s=2 (pcrlv2_model_3d.py:52)."""
        rng = np.random.RandomState(2)
        x = rng.randn(2, 4, 4, 3, 6).astype(np.float32)
        w = rng.randn(2, 2, 2, 6, 5).astype(np.float32)  # DHWIO
        b = rng.randn(5).astype(np.float32)

        got = _np(ops.conv_transpose3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        tw = torch.from_numpy(w).permute(3, 4, 0, 1, 2)  # (Ci, Co, kd, kh, kw)
        ref = F.conv_transpose3d(tx, tw, torch.from_numpy(b), stride=2)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_k3s2_general_path(self):
        rng = np.random.RandomState(3)
        x = rng.randn(1, 4, 4, 4, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 3, 2).astype(np.float32)

        got = _np(ops.conv_transpose3d(jnp.asarray(x), jnp.asarray(w), stride=2))

        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        tw = torch.from_numpy(w).permute(3, 4, 0, 1, 2)
        ref = F.conv_transpose3d(tx, tw, stride=2)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestPooling:
    def test_max_pool3d(self):
        rng = np.random.RandomState(4)
        x = rng.randn(2, 8, 8, 4, 3).astype(np.float32)
        got = _np(ops.max_pool3d(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = F.max_pool3d(tx, 2).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    def test_global_avg_pool(self):
        rng = np.random.RandomState(5)
        x = rng.randn(2, 8, 8, 4, 3).astype(np.float32)
        got = _np(ops.global_avg_pool(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = F.adaptive_avg_pool3d(tx, 1).flatten(1).numpy()
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


class TestResize:
    def test_nearest2x_2d(self):
        rng = np.random.RandomState(6)
        x = rng.randn(2, 7, 7, 3).astype(np.float32)
        got = _np(ops.upsample_nearest2x_2d(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, scale_factor=2, mode="nearest")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("scale", [2, 4])
    def test_trilinear(self, scale):
        """Matches torch trilinear align_corners=False (pcrlv2_model_3d.py:125-126)."""
        rng = np.random.RandomState(7)
        x = rng.randn(2, 4, 4, 2, 3).astype(np.float32)
        got = _np(ops.upsample_linear(jnp.asarray(x), scale))
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = F.interpolate(tx, scale_factor=scale, mode="trilinear",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_bilinear(self):
        """Matches torch bilinear align_corners=False (pcrlv2_model.py:192)."""
        rng = np.random.RandomState(8)
        x = rng.randn(2, 7, 7, 3).astype(np.float32)
        got = _np(ops.upsample_linear(jnp.asarray(x), 4))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, scale_factor=4, mode="bilinear",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_remat_model_matches_plain():
    """PCRLv23d(remat=True) computes identical outputs and gradients —
    rematerialization only changes what's saved for backward."""
    import jax
    import jax.numpy as jnp
    from pcrlv2_tpu.core.precision import PARITY_POLICY
    from pcrlv2_tpu.models import PCRLv23d

    x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 8, 1))
    plain = PCRLv23d(policy=PARITY_POLICY)
    remat = PCRLv23d(policy=PARITY_POLICY, remat=True)
    v = jax.jit(lambda: plain.init(jax.random.key(1), x, train=True))()

    def loss(model, v, x):
        (out, feats, masks), _ = model.apply(v, x, train=True,
                                             mutable=["batch_stats"])
        return jnp.sum(out ** 2) + sum(jnp.sum(p ** 2) for p, _ in feats)

    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: loss(plain, {**v, "params": p}, x)))(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(
        lambda p: loss(remat, {**v, "params": p}, x)))(v["params"])
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_conv_transpose_dilated_matches_einsum(monkeypatch):
    """Both k2s2 transpose-conv formulations agree (PCRL_CONVT3D)."""
    import jax
    import jax.numpy as jnp
    from pcrlv2_tpu.ops import conv_transpose3d

    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 2, 6), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (2, 2, 2, 6, 3), jnp.float32)
    b = jax.random.normal(jax.random.key(2), (3,), jnp.float32)
    monkeypatch.setenv("PCRL_CONVT3D", "einsum")
    a = conv_transpose3d(x, w, b)
    monkeypatch.setenv("PCRL_CONVT3D", "dilated")
    c = conv_transpose3d(x, w, b)
    assert a.shape == (2, 8, 8, 4, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=1e-5, atol=1e-5)


class TestHeadConvTapMajor:
    """Tap-major Co=1 conv (ops/head_conv.py) vs XLA's conv, fwd + VJP."""

    def _setup(self, ci=6, shape=(2, 6, 8, 4)):
        import jax

        kx, kw, kg = jax.random.split(jax.random.key(7), 3)
        x = jax.random.normal(kx, shape + (ci,), jnp.float32)
        w = jax.random.normal(kw, (3, 3, 3, ci, 1), jnp.float32) * 0.2
        g = jax.random.normal(kg, shape + (1,), jnp.float32)
        return x, w, g

    @pytest.mark.parametrize("variant", ["tapA", "tapD", "tapDx", "tapP", "tapPx"])
    def test_fwd_and_grads_match_xla(self, variant, monkeypatch):
        import jax
        from pcrlv2_tpu.ops.head_conv import conv3d_co1_tapmajor

        monkeypatch.setenv("PCRL_HEADCONV", variant)
        x, w, g = self._setup()

        def loss(fn):
            return lambda x_, w_: jnp.sum(fn(x_, w_) * g)

        # The monkeypatched env routes ops.conv3d to tap-major too, so the
        # reference must call lax directly.
        from jax import lax

        def ref_conv(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        out = jax.jit(conv3d_co1_tapmajor)(x, w)
        ref = jax.jit(ref_conv)(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        got_dx, got_dw = jax.jit(jax.grad(loss(conv3d_co1_tapmajor),
                                          argnums=(0, 1)))(x, w)
        ref_dx, ref_dw = jax.jit(jax.grad(loss(ref_conv),
                                          argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("variant", ["tapP", "tapPx"])
    def test_row_banded_kernel_matches_xla(self, variant, monkeypatch):
        """A plane big enough that (h+2)(w+2) exceeds the one-band threshold
        drives the in-kernel row banding (the fix for the 64³-level Mosaic
        scoped-VMEM OOM, BENCHMARKS.md) — fwd + VJP still match XLA."""
        import jax
        from jax import lax

        from pcrlv2_tpu.ops.head_conv import (_fwd_row_band,
                                              conv3d_co1_tapmajor)

        monkeypatch.setenv("PCRL_HEADCONV", variant)
        h, wd = 32, 48
        assert _fwd_row_band(h, wd) < h  # really multi-band
        x, w, g = self._setup(ci=4, shape=(1, 3, h, wd))

        def ref_conv(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        np.testing.assert_allclose(
            np.asarray(jax.jit(conv3d_co1_tapmajor)(x, w)),
            np.asarray(jax.jit(ref_conv)(x, w)), rtol=1e-5, atol=1e-5)

        def loss(fn):
            return lambda x_, w_: jnp.sum(fn(x_, w_) * g)

        got_dx, got_dw = jax.jit(jax.grad(loss(conv3d_co1_tapmajor),
                                          argnums=(0, 1)))(x, w)
        ref_dx, ref_dw = jax.jit(jax.grad(loss(ref_conv),
                                          argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                                   rtol=1e-4, atol=1e-4)

    def test_conv3d_dispatch(self, monkeypatch):
        """conv3d routes Co=1 3^3 convs through tap-major when enabled,
        bias included."""
        import jax

        x, w, _ = self._setup()
        b = jnp.asarray([0.37], jnp.float32)
        monkeypatch.setenv("PCRL_HEADCONV", "xla")
        ref = ops.conv3d(x, w, b)
        monkeypatch.setenv("PCRL_HEADCONV", "tapA")
        got = ops.conv3d(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
