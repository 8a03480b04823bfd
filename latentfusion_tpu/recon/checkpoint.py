"""PyTorch checkpoint interop.

The reference ships self-describing checkpoints: ``{name, epoch, args,
modules: {sculptor, fuser, photographer, discriminator, generator}}`` with
each module as ``{args, state_dict}`` (reference: trainutils.py:274-285,
models.py:172-196). The public API contract is
``LatentFusionModel.from_checkpoint(<path.pth>)`` consuming those exact
files (reference: inference.py:14-29).

Because our flax modules store conv weights in torch layout (O, I, *K) and
mirror the reference's attribute naming, conversion is a mechanical key
rename:

    torch ``image_encoder.down_blocks.0.conv1.module.weight``
    ->  flax ``params/image_encoder/down_blocks_0/conv1/weight``
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

import numpy as np

import jax.numpy as jnp

from . import fusion
from .models import Photographer, Sculptor


def _merge_digit_parts(parts):
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return merged


def convert_torch_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a torch ``state_dict`` into a flax ``{'params': ...}`` tree."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        key = key.replace(".module.weight", ".weight")
        parts = _merge_digit_parts(key.split("."))
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        node[parts[-1]] = jnp.asarray(arr, dtype=jnp.float32)
    return {"params": params}


def export_torch_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict` (keys in torch naming,
    numpy values) so natively-trained checkpoints round-trip to the
    reference format."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk(v, prefix + [k])
            else:
                parts = []
                for p in prefix + [k]:
                    # split trailing _<digit> back into torch list indexing
                    segs = p.split("_")
                    if len(segs) > 1 and segs[-1].isdigit():
                        parts.extend(["_".join(segs[:-1]), segs[-1]])
                    else:
                        parts.append(p)
                if parts[-1] == "weight" and np.asarray(v).ndim >= 2:
                    parts = parts[:-1] + ["module", "weight"]
                flat[".".join(parts)] = np.asarray(v)

    walk(params.get("params", params), [])
    return flat


def _filter_args(cls, args: Mapping[str, Any]) -> Dict[str, Any]:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in args.items() if k in fields}


def _to_block_config(cfg):
    """Checkpoint block configs are (lists of) lists; normalize to tuples so
    they are hashable flax module fields."""
    if isinstance(cfg, (list, tuple)):
        return tuple(_to_block_config(c) for c in cfg)
    return cfg


def sculptor_from_checkpoint(ckpt: Mapping[str, Any]) -> Tuple[Sculptor, Any]:
    """(reference: models.py:172-176)"""
    args = dict(ckpt["args"])
    for k in ("image_config", "camera_config", "object_config"):
        if k in args:
            args[k] = _to_block_config(args[k])
    model = Sculptor(**_filter_args(Sculptor, args))
    params = convert_torch_state_dict(ckpt["state_dict"])
    return model, params


def photographer_from_checkpoint(ckpt: Mapping[str, Any]) -> Tuple[Photographer, Any]:
    """(reference: models.py:350-354)"""
    args = dict(ckpt["args"])
    for k in ("image_config", "camera_config", "object_config",
              "occlusion_config"):
        if k in args and args[k]:
            args[k] = _to_block_config(args[k])
    model = Photographer(**_filter_args(Photographer, args))
    params = convert_torch_state_dict(ckpt["state_dict"])
    return model, params


def fuser_from_checkpoint(ckpt: Mapping[str, Any]):
    """(reference: fusion.py:41-42)"""
    args = dict(ckpt.get("args", {}))
    if "block_config" in args:
        args["block_config"] = _to_block_config(args["block_config"])
    model = fusion.fuser_from_checkpoint_args(ckpt["type"], args)
    if "state_dict" in ckpt:
        params = convert_torch_state_dict(ckpt["state_dict"])
    else:
        params = {}
    return model, params


def patch_legacy_args(checkpoint: Mapping[str, Any]) -> Mapping[str, Any]:
    """Fix legacy checkpoints in place (reference: models.py:36-51)."""
    kwargs = checkpoint["args"]
    sc = checkpoint["modules"]["sculptor"]
    if "input_color" not in sc["args"]:
        sc["args"]["input_color"] = True
    if "input_depth" not in sc["args"]:
        sc["args"]["input_depth"] = kwargs["generator_input_depth"]
    if "input_mask" not in sc["args"]:
        sc["args"]["input_mask"] = kwargs["generator_input_mask"]
    ph = checkpoint["modules"]["photographer"]
    if "predict_color" not in ph["args"]:
        ph["args"]["predict_color"] = kwargs["predict_color"]
    if "predict_depth" not in ph["args"]:
        ph["args"]["predict_depth"] = kwargs["predict_depth"]
    if "predict_mask" not in ph["args"]:
        ph["args"]["predict_mask"] = kwargs["predict_mask"]
    return checkpoint


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint file (requires torch, CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_models(checkpoint, kwargs=None, return_generator: bool = False):
    """Reconstruct all modules from a full checkpoint dict
    (reference: models.py:32-70). Returns (module, params) pairs:
    ``(sculptor, photographer, fuser[, discriminator[, generator]])``.
    """
    checkpoint = patch_legacy_args(checkpoint)
    if kwargs is None:
        kwargs = checkpoint["args"]

    sculptor = sculptor_from_checkpoint(checkpoint["modules"]["sculptor"])
    photographer = photographer_from_checkpoint(
        checkpoint["modules"]["photographer"])
    fuser = fuser_from_checkpoint(checkpoint["modules"]["fuser"])

    discriminator = None
    if not kwargs.get("no_discriminator", False) and \
            "discriminator" in checkpoint.get("modules", {}):
        from ..pggan import MultiScaleDiscriminator

        d_ckpt = checkpoint["modules"]["discriminator"]
        args = dict(d_ckpt["args"])
        if args.get("block_config"):
            args["block_config"] = _to_block_config(args["block_config"])
        discriminator = (MultiScaleDiscriminator(**args),
                         convert_torch_state_dict(d_ckpt["state_dict"]))

    if return_generator:
        generator = None
        gen_ckpt = checkpoint.get("modules", {}).get("generator")
        if gen_ckpt is not None:
            from ..modules import unet

            args = dict(gen_ckpt["args"])
            args.pop("conv_module", None)
            if args.get("block_config"):
                args["block_config"] = _to_block_config(args["block_config"])
            generator = (unet.UNet2d(**args),
                         convert_torch_state_dict(gen_ckpt["state_dict"]))
        return sculptor, fuser, photographer, discriminator, generator

    return sculptor, fuser, photographer, discriminator
