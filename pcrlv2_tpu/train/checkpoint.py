"""Checkpointing: Orbax-native save/resume plus a PyTorch-schema interop shim.

The reference persists ``{'opt': args, 'state_dict', 'optimizer', 'epoch'}``
via ``torch.save`` at epochs 0/100/200/240 (reference ``train_3d.py:71-80``,
``train_2d.py:96-107``), with the filename
``{model}_{n}_{phase}_{ratio}_{epoch}.pt`` (``train_2d.py:102-104``).
Downstream fine-tuning loads those checkpoints per ``README.md:29-55``:

* 2D saves the **encoder only** (``model.module.model.encoder.state_dict()``,
  ``train_2d.py:99``) with torchvision-ResNet18 key names; consumers patch
  ``fc.{weight,bias}=0`` before ``encoder.load_state_dict`` (``README.md:42-43``).
* 3D saves the full ``PCRLv23d`` state_dict (``train_3d.py:74``).

This module converts between those torch state_dicts and our Flax variable
trees so a user of the reference can fine-tune from checkpoints we produce
(and vice versa: reference checkpoints import losslessly for parity tests).
The native path (full train state incl. optimizer) uses Orbax.

Weight layout conversions (torch ↔ flax, channels-last):
  Conv3d   (O,I,kd,kh,kw) ↔ (kd,kh,kw,I,O)     Conv2d  (O,I,kh,kw) ↔ (kh,kw,I,O)
  ConvT3d  (I,O,kd,kh,kw) ↔ (kd,kh,kw,I,O)     Linear  (O,I)       ↔ (I,O)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def _t2f_conv3d(w):  # (O,I,kd,kh,kw) -> (kd,kh,kw,I,O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _f2t_conv3d(w):
    return np.transpose(w, (4, 3, 0, 1, 2))


def _t2f_convT3d(w):  # (I,O,kd,kh,kw) -> (kd,kh,kw,I,O)
    return np.transpose(w, (2, 3, 4, 0, 1))


def _f2t_convT3d(w):
    return np.transpose(w, (3, 4, 0, 1, 2))


def _t2f_conv2d(w):  # (O,I,kh,kw) -> (kh,kw,I,O)
    return np.transpose(w, (2, 3, 1, 0))


def _f2t_conv2d(w):
    return np.transpose(w, (3, 2, 0, 1))


def _t2f_linear(w):  # (O,I) -> (I,O)
    return np.transpose(w)


_f2t_linear = _t2f_linear


# ---------------------------------------------------------------------------
# PCRLv23d mapping (reference models/pcrlv2_model_3d.py)
# ---------------------------------------------------------------------------

def _luconv_entries(tprefix: str, fpath: Tuple[str, ...], norm: str = "bn",
                    act: str = "relu"):
    """(torch_key, flax_path, kind) triples for one LUConv (conv1 + norm
    [+ PReLU α]).  The reference's norm menu (``pcrlv2_model_3d.py:11-18``)
    names the module ``bn1`` for all three kinds; gn/in carry affine
    weight/bias but no running stats, and ``act='prelu'`` adds the
    per-channel ``activation.weight`` (``:23``)."""
    entries = [
        (f"{tprefix}.conv1.weight", fpath + ("conv1", "kernel"), "conv3d"),
        (f"{tprefix}.conv1.bias", fpath + ("conv1", "bias"), "id"),
        (f"{tprefix}.bn1.weight", fpath + ("bn1", "scale"), "id"),
        (f"{tprefix}.bn1.bias", fpath + ("bn1", "bias"), "id"),
    ]
    if norm == "bn":
        entries += [
            (f"{tprefix}.bn1.running_mean", fpath + ("bn1", "mean"), "stat"),
            (f"{tprefix}.bn1.running_var", fpath + ("bn1", "var"), "stat"),
        ]
    if act == "prelu":
        entries.append((f"{tprefix}.activation.weight",
                        fpath + ("PReLU_0", "alpha"), "id"))
    return entries


def _bn_entries(tprefix: str, fpath: Tuple[str, ...]):
    return [
        (f"{tprefix}.weight", fpath + ("scale",), "id"),
        (f"{tprefix}.bias", fpath + ("bias",), "id"),
        (f"{tprefix}.running_mean", fpath + ("mean",), "stat"),
        (f"{tprefix}.running_var", fpath + ("var",), "stat"),
    ]


def pcrlv23d_mapping(norm: str = "bn", act: str = "relu"):
    """Full (torch_key, flax_path, kind) mapping for PCRLv23d.

    ``norm``/``act`` mirror the reference constructor's menu
    (``pcrlv2_model_3d.py:98``) so checkpoints of every variant
    interoperate; the GAP/predictor BatchNorm1d heads stay BN regardless
    (reference ``:57``), and the deep-supervision heads' sigmoid carries no
    parameters."""
    entries = []
    for name in ["down_tr64", "down_tr128", "down_tr256", "down_tr512"]:
        for i in (0, 1):
            entries += _luconv_entries(f"{name}.ops.{i}", (name, f"ops{i}"),
                                       norm, act)
    for name, depth in [("up_tr256", 2), ("up_tr128", 1), ("up_tr64", 0)]:
        entries += [
            (f"{name}.up_conv.weight", (name, "up_conv", "kernel"), "convT3d"),
            (f"{name}.up_conv.bias", (name, "up_conv", "bias"), "id"),
        ]
        for i in (0, 1):
            entries += _luconv_entries(f"{name}.ops.{i}", (name, f"ops{i}"),
                                       norm, act)
        entries += _bn_entries(f"{name}.bn", (name, "bn"))
        entries += [
            (f"{name}.predictor_head.0.weight",
             (name, "predictor_head", "fc1", "kernel"), "linear"),
            (f"{name}.predictor_head.0.bias",
             (name, "predictor_head", "fc1", "bias"), "id"),
        ]
        entries += _bn_entries(f"{name}.predictor_head.1",
                               (name, "predictor_head", "bn"))
        entries += [
            (f"{name}.predictor_head.3.weight",
             (name, "predictor_head", "fc2", "kernel"), "linear"),
            (f"{name}.predictor_head.3.bias",
             (name, "predictor_head", "fc2", "bias"), "id"),
        ]
        entries += _luconv_entries(f"{name}.deep_supervision_head",
                                   (name, "deep_supervision_head"),
                                   norm, "sigmoid")
    entries += [
        ("out_tr.final_conv.weight", ("out_tr", "final_conv", "kernel"), "conv3d"),
        ("out_tr.final_conv.bias", ("out_tr", "final_conv", "bias"), "id"),
    ]
    return entries


_T2F = {
    "conv3d": _t2f_conv3d,
    "convT3d": _t2f_convT3d,
    "conv2d": _t2f_conv2d,
    "linear": _t2f_linear,
    "id": lambda x: x,
    "stat": lambda x: x,
}
_F2T = {
    "conv3d": _f2t_conv3d,
    "convT3d": _f2t_convT3d,
    "conv2d": _f2t_conv2d,
    "linear": _f2t_linear,
    "id": lambda x: x,
    "stat": lambda x: x,
}


def _set_path(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def torch_state_to_flax(state_dict: Mapping[str, Any], mapping) -> Dict[str, dict]:
    """Convert a torch state_dict to ``{'params': …, 'batch_stats': …}``."""
    params: dict = {}
    batch_stats: dict = {}
    for tkey, fpath, kind in mapping:
        val = state_dict[tkey]
        if hasattr(val, "detach"):  # torch tensor
            val = val.detach().cpu().numpy()
        val = _T2F[kind](np.asarray(val, dtype=np.float32))
        target = batch_stats if kind == "stat" else params
        _set_path(target, fpath, jax.numpy.asarray(val))
    return {"params": params, "batch_stats": batch_stats}


def flax_to_torch_state(variables: Mapping[str, Any], mapping) -> Dict[str, np.ndarray]:
    """Convert Flax variables to a torch-layout state_dict (numpy values).

    Every BatchNorm also gets its ``num_batches_tracked`` step counter
    (int64 scalar, no Flax analog — emitted as 0): torch registers it as a
    buffer, so ``load_state_dict(strict=True)`` into the reference models
    (the README consumption recipe, ``README.md:40-54``) requires the key.
    """
    out: Dict[str, np.ndarray] = {}
    for tkey, fpath, kind in mapping:
        src = variables["batch_stats"] if kind == "stat" else variables["params"]
        val = np.asarray(jax.device_get(_get_path(src, fpath)), dtype=np.float32)
        out[tkey] = _F2T[kind](val)
        if kind == "stat" and tkey.endswith(".running_var"):
            out[tkey[: -len("running_var")] + "num_batches_tracked"] = (
                np.zeros((), np.int64))
    return out


# ---------------------------------------------------------------------------
# ResNet-18 encoder mapping (2D checkpoints save encoder only, train_2d.py:99)
# ---------------------------------------------------------------------------

def resnet18_encoder_mapping():
    """torchvision resnet18 keys ↔ our ``ResNet18Encoder`` paths."""
    entries = [
        ("conv1.weight", ("conv1", "kernel"), "conv2d"),
    ]
    entries += _bn_entries("bn1", ("bn1",))
    for stage in range(1, 5):
        for blk in range(2):
            t = f"layer{stage}.{blk}"
            f = f"layer{stage}_{blk}"
            entries += [
                (f"{t}.conv1.weight", (f, "conv1", "kernel"), "conv2d"),
                (f"{t}.conv2.weight", (f, "conv2", "kernel"), "conv2d"),
            ]
            entries += _bn_entries(f"{t}.bn1", (f, "bn1"))
            entries += _bn_entries(f"{t}.bn2", (f, "bn2"))
            if stage > 1 and blk == 0:
                entries += [
                    (f"{t}.downsample.0.weight",
                     (f, "downsample_conv", "kernel"), "conv2d"),
                ]
                entries += _bn_entries(f"{t}.downsample.1", (f, "downsample_bn"))
    return entries


# ---------------------------------------------------------------------------
# Full 2D PCRLv2 mapping (reference models/pcrlv2_model.py:197-209: smp
# ResNet-18 encoder + PCRLv2Decoder + segmentation head).  The reference's 2D
# *checkpoints* persist the encoder only (train_2d.py:99), but the full
# mapping enables whole-model interop — parity tests and full-state export.
# torch key names follow the reference model exactly: smp's encoder uses
# torchvision resnet18 names under `model.encoder.`, smp's Conv2dReLU is
# Sequential[conv, bn, relu], the heads are Sequentials (pcrlv2_model.py:
# 78-111), and the smp segmentation head is Sequential[conv] at
# `model.segmentation_head.0`.
# ---------------------------------------------------------------------------


def _conv2drelu_entries(tprefix: str, fpath: Tuple[str, ...]):
    """smp ``md.Conv2dReLU`` = Sequential(conv2d(bias=False), bn, relu)."""
    return ([(f"{tprefix}.0.weight", fpath + ("conv", "kernel"), "conv2d")]
            + _bn_entries(f"{tprefix}.1", fpath + ("bn",)))


def pcrlv2_2d_mapping():
    """(torch_key, flax_path, kind) mapping for the full 2D PCRLv2."""
    entries = [("model.encoder." + tkey, ("encoder",) + fpath, kind)
               for tkey, fpath, kind in resnet18_encoder_mapping()]
    for i in range(5):
        t = f"model.decoder.blocks.{i}"
        f = (f"block{i}",)
        entries += _conv2drelu_entries(f"{t}.conv1", f + ("conv1",))
        entries += _conv2drelu_entries(f"{t}.conv2", f + ("conv2",))
        entries += _bn_entries(f"{t}.bn", f + ("bn",))
        # deep_supervision_head: Sequential[conv3x3, bn, relu, conv1x1]
        # (pcrlv2_model.py:103-106)
        entries += [
            (f"{t}.deep_supervision_head.0.weight",
             f + ("ds_conv1", "kernel"), "conv2d"),
            (f"{t}.deep_supervision_head.0.bias",
             f + ("ds_conv1", "bias"), "id"),
        ]
        entries += _bn_entries(f"{t}.deep_supervision_head.1", f + ("ds_bn",))
        entries += [
            (f"{t}.deep_supervision_head.3.weight",
             f + ("ds_conv2", "kernel"), "conv2d"),
            (f"{t}.deep_supervision_head.3.bias",
             f + ("ds_conv2", "bias"), "id"),
        ]
        # predictor_head: Sequential[linear, bn1d, relu, linear]
        # (pcrlv2_model.py:108-111)
        entries += [
            (f"{t}.predictor_head.0.weight",
             f + ("predictor_head", "fc1", "kernel"), "linear"),
            (f"{t}.predictor_head.0.bias",
             f + ("predictor_head", "fc1", "bias"), "id"),
        ]
        entries += _bn_entries(f"{t}.predictor_head.1",
                               f + ("predictor_head", "bn"))
        entries += [
            (f"{t}.predictor_head.3.weight",
             f + ("predictor_head", "fc2", "kernel"), "linear"),
            (f"{t}.predictor_head.3.bias",
             f + ("predictor_head", "fc2", "bias"), "id"),
        ]
    entries += [
        ("model.segmentation_head.0.weight",
         ("segmentation_head", "kernel"), "conv2d"),
        ("model.segmentation_head.0.bias",
         ("segmentation_head", "bias"), "id"),
    ]
    return entries


# ---------------------------------------------------------------------------
# torch .pt schema save/load
# ---------------------------------------------------------------------------

def save_reference_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                              opt: Any = None, optimizer: Any = None,
                              epoch: int = 0) -> None:
    """Write the reference's ``{'opt','state_dict','optimizer','epoch'}`` schema
    (``train_3d.py:74-75``) via ``torch.save`` so smp / PCRLv23d consumers can
    load it unchanged."""
    import torch

    # np.array(copy=True): jax exports read-only views torch warns about.
    # .reshape(v.shape): the copy promotes 0-d arrays to (1,), which would
    # corrupt BN num_batches_tracked scalars
    tensors = {k: torch.from_numpy(np.array(v, copy=True)).reshape(v.shape)
               for k, v in state_dict.items()}
    torch.save({"opt": opt, "state_dict": tensors, "optimizer": optimizer,
                "epoch": epoch}, path)


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def export_pcrlv23d(variables, path: str, opt=None, epoch: int = 0) -> None:
    """Export a PCRLv23d Flax state as a reference-schema ``.pt``."""
    sd = flax_to_torch_state(variables, pcrlv23d_mapping())
    save_reference_checkpoint(path, sd, opt=opt, epoch=epoch)


def import_pcrlv23d(path: str):
    """Import a reference PCRLv23d ``.pt`` into Flax variables."""
    ckpt = load_reference_checkpoint(path)
    return torch_state_to_flax(ckpt["state_dict"], pcrlv23d_mapping()), ckpt


def export_resnet18_encoder(variables, path: str, opt=None, epoch: int = 0) -> None:
    """Export the 2D encoder in the reference's encoder-only convention
    (``train_2d.py:99``).  ``variables`` are the *encoder* subtree."""
    sd = flax_to_torch_state(variables, resnet18_encoder_mapping())
    save_reference_checkpoint(path, sd, opt=opt, epoch=epoch)


def import_resnet18_encoder(path: str):
    """Import encoder weights from a reference-schema ``.pt``
    (``{'state_dict': …}``) or a bare torchvision ResNet-18 state_dict —
    the latter is how ImageNet weights arrive (smp's default init,
    reference ``pcrlv2_model.py:200``)."""
    ckpt = load_reference_checkpoint(path)
    sd = dict(ckpt["state_dict"]) if "state_dict" in ckpt else dict(ckpt)
    sd.pop("fc.weight", None)  # README.md:42-43 patches these in/out
    sd.pop("fc.bias", None)
    return torch_state_to_flax(sd, resnet18_encoder_mapping()), ckpt


# ---------------------------------------------------------------------------
# Orbax-native full-train-state checkpoints (save + resume; the reference has
# no resume path — SURVEY.md §5)
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, step: int, state) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def restore_train_state(ckpt_dir: str, step: int | None = None, template=None):
    """Restore a train state; returns ``(state, saved_step)`` where
    ``saved_step`` is the checkpoint's key (the epoch it was saved at)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if template is not None:
            return mgr.restore(
                step, args=ocp.args.StandardRestore(template)), step
        return mgr.restore(step), step
