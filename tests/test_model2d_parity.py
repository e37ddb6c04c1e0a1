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


def _resnet18_with_fc():
    """The replica extended with torchvision's trailing ``fc`` so its
    state_dict is key-for-key the schema real ImageNet weights ship in
    (torchvision defines conv1, bn1, relu, maxpool, layer1-4, avgpool, fc;
    relu/maxpool/avgpool carry no parameters)."""
    m = _ResNet18()
    m.fc = tnn.Linear(512, 1000)
    return m


def test_torchvision_schema_fixture_pinned():
    """The checked-in schema fixture is exactly the replica's state_dict:
    122 keys (20 convs, 20 BN×5 incl. num_batches_tracked, fc.weight/bias),
    in torchvision's definition order, with torchvision's shapes/dtypes.
    This is what `--encoder_weights` receives from
    ``torchvision.models.resnet18(weights='IMAGENET1K_V1').state_dict()``."""
    import os
    sd = _resnet18_with_fc().state_dict()
    got = [f"{k} {tuple(v.shape)} {str(v.dtype).replace('torch.', '')}"
           for k, v in sd.items()]
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "torchvision_resnet18_schema.txt")
    with open(fixture) as f:
        want = [ln.strip() for ln in f if ln.strip()
                and not ln.startswith("#")]
    assert got == want
    assert len(got) == 122


def test_import_consumes_full_torchvision_schema(tmp_path):
    """Every tensor in the real torchvision schema must be either loaded
    numerically into the Flax encoder or be one of the documented drops
    (``fc.*`` — README.md:42-43 patches them to zero anyway — and the BN
    ``num_batches_tracked`` step counters, which have no Flax analog).
    Round-trips import→export and checks exact value equality per key, so a
    silently-ignored or layout-mangled weight cannot pass."""
    torch.manual_seed(3)
    tmodel = _resnet18_with_fc()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.5)
    sd = tmodel.state_dict()
    pt = tmp_path / "resnet18_imagenet_schema.pt"
    torch.save(sd, str(pt))

    variables, _ = ckpt_lib.import_resnet18_encoder(str(pt))
    back = ckpt_lib.flax_to_torch_state(
        variables, ckpt_lib.resnet18_encoder_mapping())

    # everything except the fc head round-trips; num_batches_tracked is
    # re-emitted as the int64-0 buffer torch's strict load requires (no Flax
    # analog carries the counter)
    dropped = {k for k in sd if k not in back}
    assert dropped == {"fc.weight", "fc.bias"}
    for k, v in back.items():
        if k.endswith("num_batches_tracked"):
            assert v.dtype == np.int64 and v.shape == ()
        else:
            np.testing.assert_array_equal(v, sd[k].numpy(), err_msg=k)


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
