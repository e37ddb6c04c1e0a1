"""Unit tests for the loss terms (numpy goldens pin torch semantics)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pcrlv2_tpu.train.losses import (
    beta_schedule,
    cos_loss,
    cosine_similarity,
    mse_loss,
)


def test_cosine_similarity_matches_torch():
    rng = np.random.RandomState(0)
    a = rng.randn(8, 32).astype(np.float32)
    b = rng.randn(8, 32).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    ref = nn.CosineSimilarity()(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mse_matches_torch():
    rng = np.random.RandomState(1)
    a = rng.randn(4, 8, 8, 2).astype(np.float32)
    b = rng.randn(4, 8, 8, 2).astype(np.float32)
    got = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_cos_loss_selects_single_level_and_stops_gradient():
    """cos_loss semantics (reference train_3d.py:86-92): the loss at the
    sampled level equals -½[cos(pre1, sg(pro2)) + cos(pre2, sg(pro1))], and
    gradients flow to `pre` of both sides but not to the stop-gradient `pro`."""
    rng = np.random.RandomState(2)
    dims = (16, 8, 4)
    outs1 = [tuple(jnp.asarray(rng.randn(6, d).astype(np.float32))
                   for _ in range(2)) for d in dims]
    outs2 = [tuple(jnp.asarray(rng.randn(6, d).astype(np.float32))
                   for _ in range(2)) for d in dims]

    key = jax.random.key(3)
    loss, idx = cos_loss(key, outs1, outs2)
    idx = int(idx)

    pro1, pre1 = outs1[idx]
    pro2, pre2 = outs2[idx]
    expected = -0.5 * (
        float(cosine_similarity(pre1, pro2).mean())
        + float(cosine_similarity(pre2, pro1).mean())
    )
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    # gradient topology
    def f(o1, o2):
        return cos_loss(key, o1, o2)[0]

    g1, g2 = jax.grad(f, argnums=(0, 1))(outs1, outs2)
    for lvl in range(3):
        pro_g, pre_g = g1[lvl]
        if lvl == idx:
            assert np.all(np.asarray(pro_g) == 0), "stop-gradient violated on pro"
            assert np.any(np.asarray(pre_g) != 0), "no gradient through pre"
        else:
            assert np.all(np.asarray(pro_g) == 0)
            assert np.all(np.asarray(pre_g) == 0)


def test_cos_loss_index_distribution():
    """Level sampling is uniform over levels and PRNG-driven (not Python random)."""
    outs = [tuple(jnp.ones((2, d)) for _ in range(2)) for d in (4, 4, 4)]
    idxs = [int(cos_loss(jax.random.key(i), outs, outs)[1]) for i in range(60)]
    assert set(idxs) == {0, 1, 2}


def test_beta_schedule():
    np.testing.assert_allclose(float(beta_schedule(0)), 1.0)
    np.testing.assert_allclose(float(beta_schedule(120)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(beta_schedule(240)), 0.0, atol=1e-6)


def test_legacy_moco_helpers():
    """The reference's defined-but-unused MoCo helpers (train_2d.py:23-41)."""
    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.train.legacy import (get_shuffle_ids, moment_update,
                                         normalize)

    p = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    e = {"w": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = moment_update(p, e, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.9 * np.ones(2),
                               rtol=1e-6)

    fwd, bwd = get_shuffle_ids(jax.random.key(0), 8)
    x = jnp.arange(8)
    np.testing.assert_array_equal(np.asarray(x[fwd][bwd]), np.asarray(x))

    v = jnp.array([[3.0, 4.0], [0.0, 0.0]])
    n = normalize(v)
    np.testing.assert_allclose(np.asarray(n[0]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0.0, 0.0], atol=1e-6)
