"""Fixed-weight forward parity: our Flax PCRLv23d vs the PyTorch reference.

The reference model file (``/root/reference/models/pcrlv2_model_3d.py``) is
imported as the golden oracle (it depends only on torch).  Weights transfer
through the checkpoint interop shim, so this test pins both the architecture
and the torch↔flax mapping at once.  Skipped if the reference tree is absent.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import PARITY_POLICY
from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.train.checkpoint import (
    flax_to_torch_state,
    pcrlv23d_mapping,
    torch_state_to_flax,
)

REF = "/root/reference/models/pcrlv2_model_3d.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not mounted")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_pcrlv2_model_3d", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    mod = _load_reference_module()
    model = mod.PCRLv23d()
    model.train()
    return model


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    model = PCRLv23d(policy=PARITY_POLICY)
    variables = torch_state_to_flax(torch_model.state_dict(), pcrlv23d_mapping())
    return model, variables


def test_param_count_matches(torch_model):
    n_torch = sum(p.numel() for p in torch_model.parameters())
    model = PCRLv23d(policy=PARITY_POLICY)
    # eval_shape: no compute, no eager per-op compilation
    v = jax.eval_shape(lambda k: model.init(k, jnp.zeros((1, 16, 16, 16, 1)),
                                            train=True), jax.random.key(0))
    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n_flax == n_torch


def test_mapping_covers_all_torch_params(torch_model):
    sd = torch_model.state_dict()
    mapped = {k for k, _, _ in pcrlv23d_mapping()}
    missing = {k for k in sd if k not in mapped
               and not k.endswith("num_batches_tracked")}
    assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


@pytest.mark.parametrize("local", [False, True])
def test_forward_parity(torch_model, flax_setup, local):
    model, variables = flax_setup
    rng = np.random.RandomState(42)
    shape = (2, 16, 16, 16) if local else (2, 32, 32, 16)
    x = rng.rand(*shape).astype(np.float32)

    with torch.no_grad():
        t_out, t_feats, t_masks = torch_model(
            torch.from_numpy(x).unsqueeze(1), local=local)

    # jit: one compiled program (eager per-op dispatch on CPU compiles each
    # op separately and takes minutes at this size)
    fwd = jax.jit(lambda v, x: model.apply(v, x, local=local, train=True,
                                           mutable=["batch_stats"]))
    (f_out, f_feats, f_masks), _ = fwd(variables, jnp.asarray(x[..., None]))

    np.testing.assert_allclose(
        np.asarray(f_out)[..., 0], t_out.squeeze(1).numpy(), rtol=1e-3, atol=1e-4)
    assert len(f_feats) == len(t_feats) == 3
    # pro/pre sit behind train-mode BatchNorms normalizing over a batch of 2:
    # (x−μ)/σ with a tiny cross-sample σ amplifies f32 accumulation-order
    # differences between XLA and torch (observed worst case ~1e-2 relative).
    # The restoration masks above — the actual training signal path — match
    # at rtol 1e-3.
    for (f_pro, f_pre), (t_pro, t_pre) in zip(f_feats, t_feats):
        np.testing.assert_allclose(np.asarray(f_pro), t_pro.numpy(),
                                   rtol=3e-2, atol=6e-3)
        np.testing.assert_allclose(np.asarray(f_pre), t_pre.numpy(),
                                   rtol=3e-2, atol=6e-3)
    assert len(f_masks) == len(t_masks) == (0 if local else 3)
    for f_m, t_m in zip(f_masks, t_masks):
        np.testing.assert_allclose(
            np.asarray(f_m)[..., 0], t_m.squeeze(1).numpy(), rtol=1e-3, atol=1e-4)


def test_checkpoint_roundtrip(torch_model):
    """flax → torch state_dict → flax is the identity.

    Uses a fresh snapshot of the torch state (not the module-scoped fixture):
    the forward-parity tests above mutate BN running statistics in place.
    """
    variables = torch_state_to_flax(torch_model.state_dict(),
                                    pcrlv23d_mapping())
    sd = flax_to_torch_state(variables, pcrlv23d_mapping())
    back = torch_state_to_flax(sd, pcrlv23d_mapping())
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and matches the original torch tensors bit-exactly — except the
    # num_batches_tracked step counters, which Flax does not carry and the
    # export re-emits as int64 0 so torch's strict load finds the buffer
    ref_sd = torch_model.state_dict()
    assert set(sd) == set(ref_sd)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            assert v.dtype == np.int64 and v.shape == ()
        else:
            np.testing.assert_array_equal(v, ref_sd[k].numpy())


@pytest.mark.parametrize("act,norm", [("prelu", "in"), ("elu", "in")])
def test_forward_parity_norm_act_variants(act, norm):
    """The reference's norm/act menu (``pcrlv2_model_3d.py:11-30``):
    InstanceNorm(affine) with PReLU/ELU forward-matches the reference model
    file with transferred weights (no running stats for in; PReLU carries
    per-channel α).  norm='gn' cannot be pinned at full-model level: the
    REFERENCE ITSELF crashes there (GroupNorm(8 groups) on the 1-channel
    deep-supervision head, ``pcrlv2_model_3d.py:14,60``) — its gn parity is
    pinned per-LUConv below instead."""
    torch.manual_seed(3)
    mod = _load_reference_module()
    tmodel = mod.PCRLv23d(act=act, norm=norm)
    tmodel.train()

    mapping = pcrlv23d_mapping(norm=norm, act=act)
    sd = tmodel.state_dict()
    mapped = {k for k, _, _ in mapping}
    missing = {k for k in sd if k not in mapped
               and not k.endswith("num_batches_tracked")}
    assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"

    model = PCRLv23d(policy=PARITY_POLICY, act=act, norm=norm)
    variables = torch_state_to_flax(sd, mapping)
    if not variables.get("batch_stats"):
        # gn/in: only the GAP-head BatchNorm1d layers carry stats
        pass

    rng = np.random.RandomState(7)
    x = rng.rand(2, 32, 32, 16).astype(np.float32)
    with torch.no_grad():
        t_out, t_feats, t_masks = tmodel(torch.from_numpy(x).unsqueeze(1))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                           mutable=["batch_stats"]))
    (f_out, f_feats, f_masks), _ = fwd(variables, jnp.asarray(x[..., None]))
    np.testing.assert_allclose(np.asarray(f_out)[..., 0],
                               t_out.squeeze(1).numpy(), rtol=1e-3, atol=1e-4)
    for f_m, t_m in zip(f_masks, t_masks):
        np.testing.assert_allclose(np.asarray(f_m)[..., 0],
                                   t_m.squeeze(1).numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_luconv_groupnorm_parity():
    """gn at the LUConv level (the reference's full-model gn is unbuildable —
    see above): torch GroupNorm(8)+PReLU vs ours, weights transferred."""
    import torch.nn as tnn

    mod = _load_reference_module()
    torch.manual_seed(5)
    tblock = mod.LUConv(16, 32, "prelu", "gn")
    tblock.train()

    from pcrlv2_tpu.models.unet3d import LUConv as FlaxLUConv

    block = FlaxLUConv(32, act="prelu", norm="gn", policy=PARITY_POLICY)
    sd = tblock.state_dict()
    variables = {"params": {
        "conv1": {
            "kernel": jnp.asarray(
                sd["conv1.weight"].numpy().transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(sd["conv1.bias"].numpy()),
        },
        "bn1": {
            "scale": jnp.asarray(sd["bn1.weight"].numpy()),
            "bias": jnp.asarray(sd["bn1.bias"].numpy()),
        },
        "PReLU_0": {"alpha": jnp.asarray(sd["activation.weight"].numpy())},
    }}
    rng = np.random.RandomState(2)
    x = rng.rand(2, 8, 8, 4, 16).astype(np.float32)
    with torch.no_grad():
        t_y = tblock(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    f_y = jax.jit(lambda v, x: block.apply(v, x, train=True))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(f_y),
                               t_y.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-5)
