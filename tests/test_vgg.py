"""VGG16 feature extractor parity vs a torch-built stack."""
import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from latentfusion_tpu.modules.vgg import (VGG16Features,
                                          params_from_torchvision_state_dict)


def build_torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_ch = v
    return tnn.Sequential(*layers).eval()


def test_matches_torch_layerwise(rng):
    feat = build_torch_vgg16_features()
    sd = {f"features.{k}": v for k, v in feat.state_dict().items()}
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        torch_outs = []
        for i, m in enumerate(feat):
            t = m(t)
            if i in (3, 8, 15, 22, 27):
                torch_outs.append(t.numpy())
    params = params_from_torchvision_state_dict(sd)
    ours = VGG16Features().apply(params, jnp.asarray(x))
    assert len(ours) == 5
    for a, b in zip(ours, torch_outs):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-5)


def test_perceptual_loss_runs(rng):
    from latentfusion_tpu.modules.vgg import build_perceptual_loss

    feat = build_torch_vgg16_features()
    sd = {f"features.{k}": v for k, v in feat.state_dict().items()}
    params = params_from_torchvision_state_dict(sd)
    loss = build_perceptual_loss(params)
    a = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
    out = loss(a, b)
    assert out.shape == (2,)
    zero = loss(a, a)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-8)
