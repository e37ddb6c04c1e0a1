"""2D training-trajectory parity: N SGD steps of the full 4-term chest loss
(reference ``train_2d.py:120-172``), our PCRLv2 stack vs a torch oracle that
replicates the reference 2D model exactly (reference ``pcrlv2_model.py``:
smp ResNet-18 encoder + ``PCRLv2Decoder`` + segmentation head).

smp / torchvision are absent from this image, so the oracle is built
test-locally with the reference's exact module structure AND state_dict key
names (smp ``Conv2dReLU`` = Sequential[conv(bias=False), bn, relu]; heads as
Sequentials, ``pcrlv2_model.py:78-111``; torchvision names under
``model.encoder.``) — the same naming real reference checkpoints carry, so
this also pins ``checkpoint.pcrlv2_2d_mapping`` against the real schema.

The random decoder level is pinned per step and β is pinned at 0.5 on both
sides so the stochastic graphs coincide (as in the 3D trajectory test).

Run in float64 on BOTH sides: the 2D step map is measurably chaotic — the
batch-2 BatchNorm1d on ``x_pro`` amplifies rounding noise by ~10³ per SGD
step (measured: f64 loss relerr 4.5e-8 → 2.5e-5 → 3.4e-2 over steps 0-2;
f32 reaches 2.5e-2 by step 1), so f32 can pin only step 0 while f64 pins
steps 0-1 to 1e-3.  Step 2+ diverges in ANY precision — the tail is a
boundedness check by construction, not a loose tolerance.

The amplifier is the BATCH SIZE, not the learning rate: measured ladders
(same seed, 6 steps) —
  lr=1e-2 B=2: 5e-8, 2.5e-5, 3.4e-2, ...          (the original config)
  lr=1e-6 B=2: 5e-8, 7e-9, 3e-5, 5e-4, 2e-2, 4e-2 (tiny lr does NOT fix it)
  lr=1e-4 B=8: 3e-7, 9e-8, 8e-7, 1e-6, 6e-8, 1.4e-3
— batch-8 BN has sane std gradients and the trajectory pins for 5+ steps, so
the long-horizon test below runs B=8 and pins steps 0-4 at 1e-4."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from pcrlv2_tpu.core.precision import PARITY_POLICY
from pcrlv2_tpu.models import PCRLv2
from pcrlv2_tpu.train.checkpoint import pcrlv2_2d_mapping, torch_state_to_flax
from pcrlv2_tpu.train.losses import _pair_loss, mse_loss
from pcrlv2_tpu.train.optimizer import apply_lr, sgd

from tests.test_model2d_parity import _ResNet18

B, SIZE, LOCAL_SIZE = 2, 64, 32
LR, MOMENTUM, WD = 1e-2, 0.9, 1e-4
LEVELS = [0, 2, 4]  # pinned per-step decoder level (5 levels in 2D)
BETA = 0.5


def _conv2drelu(cin, cout):
    """smp ``md.Conv2dReLU``: Sequential[conv3x3(bias=False), bn, relu]."""
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
        tnn.BatchNorm2d(cout), tnn.ReLU(inplace=True))


class _DecoderBlock(tnn.Module):
    """Reference ``DecoderBlock`` (``pcrlv2_model.py:68-128``), attention
    omitted (``attention_type=None`` == identity, reference ``:85,93,141``)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = _conv2drelu(cin, cout)
        self.conv2 = _conv2drelu(cout, cout)
        self.bn = tnn.BatchNorm1d(cout)
        self.deep_supervision_head = tnn.Sequential(
            tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True), tnn.Conv2d(cout, 3, 1))
        self.predictor_head = tnn.Sequential(
            tnn.Linear(cout, 2 * cout), tnn.BatchNorm1d(2 * cout),
            tnn.ReLU(inplace=True), tnn.Linear(2 * cout, cout))

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = self.conv1(x)
        x = self.conv2(x)
        x_mask = self.deep_supervision_head(x)
        x_pro = self.bn(F.adaptive_avg_pool2d(x, (1, 1)).view(x.shape[0], -1))
        x_pre = self.predictor_head(x_pro)
        return x, x_pro, x_pre, x_mask


class _PCRLv2Torch(tnn.Module):
    """The full reference 2D model with the real state_dict key names."""

    def __init__(self):
        super().__init__()
        channels = (256, 128, 64, 32, 16)
        ins = (512,) + channels[:-1]
        decoder = tnn.Module()
        decoder.blocks = tnn.ModuleList(
            [_DecoderBlock(i, o) for i, o in zip(ins, channels)])
        self.model = tnn.Module()
        self.model.encoder = _ResNet18()
        self.model.decoder = decoder
        self.model.segmentation_head = tnn.Sequential(
            tnn.Conv2d(16, 3, 3, padding=1))

    def forward(self, x, local=False):
        feats = self.model.encoder(x)
        x = feats[-1]  # head feature; skips unused (pcrlv2_model.py:115-117)
        decoder_outs, middle_masks = [], []
        for i, block in enumerate(self.model.decoder.blocks):
            x, x_pro, x_pre, x_mask = block(x)
            decoder_outs.append((x_pro, x_pre))
            if not local:
                middle_masks.append(F.interpolate(
                    x_mask, scale_factor=2 ** (4 - i), mode="bilinear"))
        masks = self.model.segmentation_head(x) if not local else None
        return decoder_outs, masks, middle_masks


def _views(seed=11, dtype=np.float64, b=B):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, SIZE, SIZE, 3).astype(dtype),
            rng.rand(b, SIZE, SIZE, 3).astype(dtype),
            rng.rand(b, SIZE, SIZE, 3).astype(dtype),
            rng.rand(6 * b, LOCAL_SIZE, LOCAL_SIZE, 3).astype(dtype))


F64_POLICY = PARITY_POLICY.__class__(
    param_dtype=jnp.float64, compute_dtype=jnp.float64,
    output_dtype=jnp.float64)


def _torch_trajectory(model, lr=LR, levels=LEVELS, b=B):
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=MOMENTUM,
                          weight_decay=WD)
    cos = torch.nn.CosineSimilarity(dim=1)
    mse = torch.nn.MSELoss()
    x1np, x2np, gtnp, locnp = _views(b=b)
    nchw = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2)).contiguous()
    x1, x2, gt, loc = nchw(x1np), nchw(x2np), nchw(gtnp), nchw(locnp)

    def cos_term(f1, f2, idx):
        (pro1, pre1), (pro2, pre2) = f1[idx], f2[idx]
        return -(cos(pre1, pro2.detach()).mean()
                 + cos(pre2, pro1.detach()).mean()) * 0.5

    losses = []
    for idx in levels:
        f1, mask1, mm1 = model(x1)
        f2, _, _ = model(x2)
        fl, _, _ = model(loc, local=True)
        local_loss = 0.0
        for i in range(6):
            fi = [(pro[b * i: b * (i + 1)], pre[b * i: b * (i + 1)])
                  for pro, pre in fl]
            local_loss = local_loss + cos_term(f1, fi, idx)
            local_loss = local_loss + cos_term(f2, fi, idx)
        local_loss = local_loss / 12
        loss = (mse(mask1, gt) + cos_term(f1, f2, idx)
                + BETA * mse(mm1[idx], gt) + local_loss)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _jax_trajectory(torch_state_dict, lr=LR, levels=LEVELS, b=B):
    model = PCRLv2(policy=F64_POLICY)
    variables = torch_state_to_flax(torch_state_dict, pcrlv2_2d_mapping())
    variables = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables)
    tx = sgd(momentum=MOMENTUM, weight_decay=WD)

    x1np, x2np, gtnp, locnp = _views(b=b)
    x1, x2 = jnp.asarray(x1np), jnp.asarray(x2np)
    gt, loc = jnp.asarray(gtnp), jnp.asarray(locnp)

    def loss_fn(params, stats, idx):
        v = {"params": params, "batch_stats": stats}
        (f1, mask1, mm1), u1 = model.apply(v, x1, train=True,
                                           mutable=["batch_stats"])
        v = {"params": params, "batch_stats": u1["batch_stats"]}
        (f2, _, _), u2 = model.apply(v, x2, train=True,
                                     mutable=["batch_stats"])
        v = {"params": params, "batch_stats": u2["batch_stats"]}
        (fl, _, _), u3 = model.apply(v, loc, local=True, train=True,
                                     mutable=["batch_stats"])
        local_loss = 0.0
        for i in range(6):
            fi = [(pro[b * i: b * (i + 1)], pre[b * i: b * (i + 1)])
                  for pro, pre in fl]
            local_loss = local_loss + _pair_loss(f1[idx], fi[idx])
            local_loss = local_loss + _pair_loss(f2[idx], fi[idx])
        local_loss = local_loss / 12
        loss = (mse_loss(mask1, gt) + _pair_loss(f1[idx], f2[idx])
                + BETA * mse_loss(mm1[idx], gt) + local_loss)
        return loss, u3["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                      static_argnums=(2,))
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    losses = []
    for idx in levels:
        (loss, stats), grads = grad_fn(params, stats, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, apply_lr(updates, lr))
        losses.append(float(loss))
    return losses


def test_2d_training_trajectory_matches_reference():
    """Same protocol as the 3D trajectory test, in f64: steps 0-1 track
    tightly (forward + all four 2D loss terms + backward + SGD); step 2 is a
    boundedness check — it diverges ~3% in ANY precision (the batch-of-2 BN
    on x_pro + SimSiam makes the step map chaotic, ~10³ noise amplification
    per step; see module docstring for the measured ladder)."""
    torch.manual_seed(5)
    tmodel = _PCRLv2Torch().double()
    init_state = {k: v.clone() for k, v in tmodel.state_dict().items()}
    torch_losses = _torch_trajectory(tmodel)
    with jax.enable_x64(True):  # scoped: the rest of the suite stays x32
        jax_losses = _jax_trajectory(init_state)

    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-6)
    np.testing.assert_allclose(jax_losses[1], torch_losses[1], rtol=1e-3)
    assert max(jax_losses) < 2 * max(np.abs(torch_losses)) + 0.1
    assert np.isfinite(jax_losses).all()


def test_2d_training_trajectory_long_horizon():
    """6-step f64 trajectory pin at B=8, lr=1e-4 — steps 0-4 at rtol 1e-4
    (measured relerr <= 1e-6, see module docstring), step 5 at 1e-2
    (measured 1.4e-3).  This makes the 2D pin longer and tighter than the
    3D test's 3-step 1e-3 pin; the 3-step B=2 test above keeps covering the
    reference operating regime's first steps."""
    levels = [0, 2, 4, 1, 3, 0]  # every decoder level + a revisit
    torch.manual_seed(5)
    tmodel = _PCRLv2Torch().double()
    init_state = {k: v.clone() for k, v in tmodel.state_dict().items()}
    torch_losses = _torch_trajectory(tmodel, lr=1e-4, levels=levels, b=8)
    with jax.enable_x64(True):
        jax_losses = _jax_trajectory(init_state, lr=1e-4, levels=levels, b=8)

    np.testing.assert_allclose(jax_losses[:5], torch_losses[:5], rtol=1e-4)
    np.testing.assert_allclose(jax_losses[5], torch_losses[5], rtol=1e-2)


def test_2d_mapping_covers_oracle_state_dict():
    """Every tensor in the reference-named state_dict maps, and every flax
    leaf of our PCRLv2 is written — no silent drops either way."""
    torch.manual_seed(1)
    sd = _PCRLv2Torch().state_dict()
    mapping = pcrlv2_2d_mapping()
    tkeys = {k for k, _, _ in mapping}
    missing = {k for k in sd if k not in tkeys
               and "num_batches_tracked" not in k}
    assert not missing, f"unmapped torch keys: {sorted(missing)[:8]}"

    variables = torch_state_to_flax(sd, mapping)
    model = PCRLv2(policy=PARITY_POLICY)
    ref = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                     train=False)
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(
                      {"params": ref["params"],
                       "batch_stats": ref["batch_stats"]})[0]}
    assert got_paths == want_paths, (
        f"missing: {sorted(want_paths - got_paths)[:6]} "
        f"extra: {sorted(got_paths - want_paths)[:6]}")
