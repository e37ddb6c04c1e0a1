"""Pallas conv3d kernel numerics vs the lax reference (interpret mode on CPU;
the same kernels compile for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pcrlv2_tpu.ops.pallas_conv import (
    conv3d_pallas,
    conv3d_reference,
)


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * 0.5


SHAPES = [
    # (B, D, H, W, Ci, Co) — model stages (SURVEY.md §3.4)
    (2, 8, 8, 8, 4, 8),
    (1, 16, 16, 8, 1, 16),     # first layer: Ci=1
    (2, 4, 4, 4, 32, 16),
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_lax(shape):
    b, d, h, w, ci, co = shape
    x = _rand(0, b, d, h, w, ci)
    wt = _rand(1, 3, 3, 3, ci, co) * 0.2
    bias = _rand(2, co)
    with pltpu.force_tpu_interpret_mode():
        out = conv3d_pallas(x, wt, bias)
    ref = conv3d_reference(x, wt, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_lax():
    b, d, h, w, ci, co = 2, 4, 6, 4, 3, 5
    x = _rand(3, b, d, h, w, ci)
    wt = _rand(4, 3, 3, 3, ci, co) * 0.2
    bias = _rand(5, co)

    def loss_pallas(x, wt, bias):
        return jnp.sum(conv3d_pallas(x, wt, bias) ** 2)

    def loss_ref(x, wt, bias):
        return jnp.sum(conv3d_reference(x, wt, bias) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, wt, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wt, bias)
    for a, b_, name in zip(gp, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dispatch_env_var(monkeypatch):
    from pcrlv2_tpu.ops import convolution

    monkeypatch.setenv("PCRL_CONV3D", "pallas")
    assert convolution.conv_impl() == "pallas"
    monkeypatch.delenv("PCRL_CONV3D")
    assert convolution.conv_impl() == "xla"


def test_auto_dispatch_is_xla_off_tpu():
    """On CPU (tests), auto must stay on the lax path for every shape."""
    from pcrlv2_tpu.ops import convolution

    assert not convolution._on_tpu()
    assert convolution._im2col_wins((32, 32, 32, 16, 64), (3, 3, 3, 64, 128))


@pytest.mark.parametrize("shape", [(2, 4, 8, 8, 4, 8),
                                   (1, 4, 4, 4, 8, 16)])
def test_im2col_matches_lax(shape):
    """The im2col-packed kernel (auto-dispatched on TPU for these shapes)
    vs lax, fwd + grads (interpret mode; backward is the lax transpose)."""
    from pcrlv2_tpu.ops.pallas_conv import conv3d_im2col

    b, d, h, w, ci, co = shape
    x = _rand(8, b, d, h, w, ci)
    wt = _rand(9, 3, 3, 3, ci, co) * 0.1
    bias = _rand(10, co)
    with pltpu.force_tpu_interpret_mode():
        out = conv3d_im2col(x, wt, bias)
    ref = conv3d_reference(x, wt, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda x, wt, bias: jnp.sum(fn(x, wt, bias) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(conv3d_im2col), argnums=(0, 1, 2))(x, wt, bias)
    gr = jax.grad(loss(conv3d_reference), argnums=(0, 1, 2))(x, wt, bias)
    for a, b_, name in zip(gp, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dispatch_runs_model_layer(monkeypatch):
    """ops.conv3d routes 3³ SAME convs to the Pallas kernel under the flag."""
    from pcrlv2_tpu.ops import conv3d

    monkeypatch.setenv("PCRL_CONV3D", "pallas")
    x = _rand(6, 1, 4, 4, 4, 4)
    wt = _rand(7, 3, 3, 3, 4, 8) * 0.2
    with pltpu.force_tpu_interpret_mode():
        out = conv3d(x, wt, None)
    monkeypatch.delenv("PCRL_CONV3D")
    ref = conv3d(x, wt, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
