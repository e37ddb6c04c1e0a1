"""pcrlv2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) self-supervised medical-imaging
pre-training framework with the capabilities of RL4M/PCRLv2.

The reference implementation (PyTorch/CUDA, see /root/reference) is a pair of
self-supervised pre-training pipelines — 2D chest X-ray (ResNet-18 U-Net) and 3D
lung CT (3D U-Net) — built on cuDNN convs, apex AMP and single-process
``nn.DataParallel``.  This package re-owns the whole stack TPU-first:

* ``core``       — device mesh / sharding, bf16 precision policy, PRNG threading
* ``ops``        — channels-last conv kernels (XLA + Pallas), pooling, resize
* ``models``     — Flax models: ``PCRLv23d`` (3D UNet) and ``PCRLv2`` (2D ResNet18-UNet)
* ``data``       — manifests, on-device augmentation, host→HBM prefetch pipeline
* ``train``      — one fused jitted train step (multi-crop SSL loss), SGD, trainer
* ``preprocess`` — vectorized LUNA16 MHD → crop-pair preprocessing
* ``cli``        — ``main.py``-parity command line

Design stance: augmentation moves on-device into the jitted step, the input
pipeline feeds raw crops with double-buffered prefetch, and the whole train step
(two global forwards + concatenated local forward + 4-term loss + grad + psum +
SGD) is a single compiled XLA program running in bf16 on the MXU.
"""

__version__ = "0.1.0"

from pcrlv2_tpu.core import mesh, precision, rng  # noqa: F401
