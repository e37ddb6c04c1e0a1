"""Measure the PyTorch reference's 3D pretrain throughput (the baseline).

The reference repo publishes no numbers (BASELINE.md), so the baseline must be
measured.  This harness reproduces the reference hot loop exactly — PCRLv23d
from ``/root/reference/models/pcrlv2_model_3d.py`` (imported as the oracle, not
copied), SGD(momentum .9, wd 1e-4), the 4-term loss of ``train_3d.py:109-151``
— on synthetic batches with the published operating shapes (b=32 pairs of
64×64×32 + 6×16³ locals), and reports volumes/sec.

Run it on the reference's own hardware class (4× CUDA GPU with
``nn.DataParallel``) for the true baseline:

    python bench_reference.py --device cuda --gpus 4 --b 32

On this TPU host only CPU torch is available; ``--device cpu`` still runs
(tiny default steps) so the harness itself stays tested.

Prints one JSON line {"metric", "value", "unit", "device"}.

NB: the measurement excludes the torchio CPU dataloader augmentation the
reference pays per sample (4 workers, ``data.py:95-98``) — including it would
only lower the baseline, so this is a *generous* baseline.
"""

import argparse
import importlib.util
import json
import random
import time

import numpy as np
import torch


def load_reference_model():
    spec = importlib.util.spec_from_file_location(
        "ref_pcrlv2_model_3d", "/root/reference/models/pcrlv2_model_3d.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.PCRLv23d()


def cos_loss_torch(feats1, feats2, index):
    """The reference ``cos_loss`` (train_3d.py:86-92): −½[cos(pre₁, sg(pro₂))
    + cos(pre₂, sg(pro₁))] at one decoder level."""
    cos = torch.nn.CosineSimilarity(dim=1)
    (pro1, pre1), (pro2, pre2) = feats1[index], feats2[index]
    return -(cos(pre1, pro2.detach()).mean()
             + cos(pre2, pro1.detach()).mean()) * 0.5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="cpu", choices=["cpu", "cuda"])
    p.add_argument("--gpus", type=int, default=1)
    p.add_argument("--b", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--warmup", type=int, default=None)
    args = p.parse_args()

    cuda = args.device == "cuda" and torch.cuda.is_available()
    b = args.b or (32 if cuda else 2)
    steps = args.steps or (20 if cuda else 2)
    warmup = args.warmup or (3 if cuda else 1)

    torch.manual_seed(42)
    model = load_reference_model()
    mse = torch.nn.MSELoss()
    if cuda:
        model = model.cuda()
        if args.gpus > 1:
            model = torch.nn.DataParallel(
                model, device_ids=list(range(args.gpus)))
    opt = torch.optim.SGD(model.parameters(), lr=1e-3, momentum=0.9,
                          weight_decay=1e-4)

    rng = np.random.RandomState(0)
    x1 = torch.from_numpy(rng.rand(b, 1, 64, 64, 32).astype(np.float32))
    x2 = torch.from_numpy(rng.rand(b, 1, 64, 64, 32).astype(np.float32))
    gt = torch.from_numpy(rng.rand(b, 1, 64, 64, 32).astype(np.float32))
    locals_ = torch.from_numpy(
        rng.rand(6 * b, 1, 16, 16, 16).astype(np.float32))
    if cuda:
        x1, x2, gt, locals_ = (t.cuda() for t in (x1, x2, gt, locals_))

    def step():
        # the reference hot loop (train_3d.py:109-151)
        out1, feats1, masks1 = model(x1)
        _, feats2, _ = model(x2)
        index = random.randint(0, 2)
        loss2 = cos_loss_torch(feats1, feats2, index)
        _, featsl, _ = model(locals_, local=True)
        local_loss = 0.0
        for i in range(6):
            fl = [(pro[b * i: b * (i + 1)], pre[b * i: b * (i + 1)])
                  for pro, pre in featsl]
            local_loss = local_loss + cos_loss_torch(feats1, fl, index)
            local_loss = local_loss + cos_loss_torch(feats2, fl, index)
        local_loss = local_loss / 12
        loss1 = mse(out1, gt)
        loss4 = 0.5 * mse(masks1[index], gt)
        total = loss1 + loss2 + loss4 + local_loss
        opt.zero_grad()
        total.backward()
        opt.step()

    for _ in range(warmup):
        step()
    if cuda:
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    if cuda:
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    n_dev = args.gpus if cuda else 1
    print(json.dumps({
        "metric": "3d_pretrain_volumes_per_sec_per_device",
        "value": round(b * steps / dt / n_dev, 3),
        "unit": "volumes/sec/device",
        "device": f"{args.device}x{n_dev}",
        "batch": b,
    }))


if __name__ == "__main__":
    main()
