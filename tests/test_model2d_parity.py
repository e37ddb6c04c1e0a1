"""2D encoder parity: the flax ResNet18Encoder must reproduce a torch
ResNet-18 forward (per stage) when loaded from its state_dict through the
checkpoint import path — the interop the README's fine-tuning recipe relies
on (reference ``README.md:29-45``, smp ResNet-18 encoder).

The reference's own 2D model file needs ``segmentation_models_pytorch``
(absent from this image), and torchvision is absent too, so the torch side
is a minimal ResNet-18 replica with torchvision's exact architecture and
state_dict naming (the format ImageNet weights ship in)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import PARITY_POLICY
from pcrlv2_tpu.models.resnet import ResNet18Encoder
from pcrlv2_tpu.train import checkpoint as ckpt_lib


class _BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class _ResNet18(tnn.Module):
    """torchvision ``resnet18`` minus avgpool/fc, emitting smp's stages."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        for i, (cin, cout, s) in enumerate(
                [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)],
                start=1):
            setattr(self, f"layer{i}", tnn.Sequential(
                _BasicBlock(cin, cout, s), _BasicBlock(cout, cout, 1)))

    def forward(self, x):
        feats = [x]
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats


def test_encoder_matches_torch_resnet18(tmp_path):
    torch.manual_seed(0)
    tmodel = _ResNet18().eval()
    # randomize running stats so eval-mode BN is non-trivial
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.5)

    pt = tmp_path / "resnet18.pt"
    torch.save(tmodel.state_dict(), str(pt))
    variables, _ = ckpt_lib.import_resnet18_encoder(str(pt))

    enc = ResNet18Encoder(policy=PARITY_POLICY)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    feats = enc.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(feats) == len(tfeats) == 6
    for i, (f, tf) in enumerate(zip(feats, tfeats)):
        got = np.asarray(f)
        want = tf.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, f"stage {i}"
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"stage {i}")


def test_encoder_export_roundtrip(tmp_path):
    """flax → torch-schema .pt → flax must be the identity."""
    enc = ResNet18Encoder(policy=PARITY_POLICY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.key(0), x, train=False)
    pt = tmp_path / "enc.pt"
    ckpt_lib.export_resnet18_encoder(variables, str(pt))
    back, _ = ckpt_lib.import_resnet18_encoder(str(pt))
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(variables)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(back)[0],
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7,
                                   err_msg=str(pa))
