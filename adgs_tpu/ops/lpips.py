"""LPIPS perceptual metric in JAX (eval-only, like the reference).

Parity with lpipsPyTorch/ (modules/lpips.py:8-36, modules/networks.py:12-96):
scaling-layer normalization, VGG16 or AlexNet feature trunk, unit-normalized
channel activations, 1x1 linear heads, spatial mean, sum over stages.

Pretrained weights cannot be downloaded in a zero-egress environment; they
are loaded from an .npz exported by `export_weights_from_torch` (run once on
any machine with torchvision + the official lpips linear heads), or directly
from torch checkpoints when torch/torchvision are importable with cached
weights. `lpips_fn(...)` returns None when no weights are available so eval
pipelines can skip the metric gracefully (results.json then omits LPIPS).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

# ImageNet scaling layer (lpipsPyTorch/modules/networks.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv architecture: (out_channels, n_convs) per stage
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# AlexNet features: (out_ch, kernel, stride, pad)
_ALEX_LAYERS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                (256, 3, 1, 1), (256, 3, 1, 1)]


def _conv(x, w, b, stride=1, pad=1):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # TPU default matmul/conv precision truncates f32 operands to
        # bf16; the metric is validated against torch at f32
        precision="highest")
    return y + b[None, :, None, None]


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")


def _vgg_features(params, x):
    feats = []
    i = 0
    for stage, (_, n_convs) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            x = jax.nn.relu(_conv(x, params[f"conv{i}_w"],
                                  params[f"conv{i}_b"]))
            i += 1
        feats.append(x)
        if stage < len(_VGG_STAGES) - 1:
            x = _maxpool(x)
    return feats


def _alex_features(params, x):
    feats = []
    for i, (_, k, s, p) in enumerate(_ALEX_LAYERS):
        x = jax.nn.relu(_conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"],
                              stride=s, pad=p))
        feats.append(x)
        if i in (0, 1):
            x = _maxpool(x, 3, 2)
    return feats


def _normalize_activation(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (n + eps)


def lpips_from_params(params: dict, net_type: str,
                      x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: [3,H,W] or [B,3,H,W] in [0,1] (the reference feeds [0,1] images
    straight in; the scaling layer maps to the networks' input stats)."""
    if x.ndim == 3:
        x = x[None]
        y = y[None]
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    # [0,1] -> [-1,1] -> scaling layer
    xs = ((2 * x - 1) - shift) / scale
    ys = ((2 * y - 1) - shift) / scale
    trunk = _vgg_features if net_type == "vgg" else _alex_features
    fx = trunk(params, xs)
    fy = trunk(params, ys)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize_activation(a) - _normalize_activation(b)) ** 2
        lin = params[f"lin{i}_w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(-2, -1))
    return jnp.mean(total)


def load_weights(path: str) -> dict:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


_N_CONVS = {"vgg": 13, "alex": 5}


def load_weights_torch(trunk_path: str, heads_path: str,
                       net_type: str) -> dict:
    """Ingest the reference's OWN weight files directly (no torchvision):

    - `trunk_path`: a torchvision trunk checkpoint (the cached
      `vgg16-*.pth` / `alexnet-*.pth` state dict, keys
      `features.{i}.weight/.bias` or bare `{i}.weight/.bias`);
    - `heads_path`: the richzhang linear heads the reference downloads
      (lpipsPyTorch/modules/utils.py:11-30), keys `lin{i}.model.1.weight`
      (raw) or `{i}.1.weight` (after the reference's key rename).

    Only `torch.load` is needed — state-dict pickles parse without
    torchvision installed."""
    import torch

    def _np(t):
        return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)

    trunk = torch.load(trunk_path, map_location="cpu", weights_only=True)
    convs = {}
    for k, v in trunk.items():
        digits = [p for p in k.split(".") if p.isdigit()]
        if not digits or v.ndim == 0:
            continue
        idx = int(digits[0])
        if k.endswith(".weight") and v.ndim == 4:
            convs.setdefault(idx, {})["w"] = _np(v)
        elif k.endswith(".bias") and v.ndim == 1:
            convs.setdefault(idx, {})["b"] = _np(v)
    conv_idx = sorted(i for i, d in convs.items() if "w" in d and "b" in d)
    n = _N_CONVS[net_type]
    # a full-model checkpoint also carries classifier linears (2-D) — the
    # 4-D filter requirement above drops them; the first `n` conv layers
    # in index order are the feature trunk
    conv_idx = conv_idx[:n]
    if len(conv_idx) != n:
        raise ValueError(
            f"{trunk_path}: found {len(conv_idx)} conv layers, "
            f"expected {n} for net_type={net_type!r}")
    params = {}
    for j, i in enumerate(conv_idx):
        params[f"conv{j}_w"] = convs[i]["w"]
        params[f"conv{j}_b"] = convs[i]["b"]

    heads = torch.load(heads_path, map_location="cpu", weights_only=True)
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"{i}.1.weight"):
            if key in heads:
                params[f"lin{i}_w"] = _np(heads[key])
                break
        else:
            raise ValueError(f"{heads_path}: missing linear head {i} "
                             f"(keys: {sorted(heads)[:4]}...)")
    return {k: jnp.asarray(v) for k, v in params.items()}


def _find_torch_weights(net_type: str) -> Optional[tuple]:
    """Locate (trunk, heads) torch checkpoints: env overrides first, then
    the torch hub cache the reference populates when it runs."""
    trunk = os.environ.get("ADGS_LPIPS_TORCH_TRUNK")
    heads = os.environ.get("ADGS_LPIPS_TORCH_HEADS")
    if trunk and heads and os.path.exists(trunk) and os.path.exists(heads):
        return trunk, heads
    import glob
    hub = os.environ.get(
        "TORCH_HOME", os.path.expanduser("~/.cache/torch"))
    ckpt_dir = os.path.join(hub, "hub", "checkpoints")
    pattern = "vgg16-*.pth" if net_type == "vgg" else "alexnet-*.pth"
    trunks = sorted(glob.glob(os.path.join(ckpt_dir, pattern)))
    heads_p = os.path.join(ckpt_dir, f"{net_type}.pth")
    if trunks and os.path.exists(heads_p):
        return trunks[0], heads_p
    return None


def lpips_fn(net_type: str = "vgg",
             weights_path: Optional[str] = None) -> Optional[Callable]:
    """Returns a jitted lpips(x, y) or None if weights are unavailable.

    Weight resolution order: the given/env npz path
    (tools/export_lpips_weights.py output), then the reference's own torch
    checkpoints (torchvision trunk + richzhang heads, see
    `load_weights_torch`) — so a user migrating from the reference gets
    LPIPS in results.json with zero extra steps if their torch hub cache
    is present."""
    path = weights_path or os.environ.get(
        "ADGS_LPIPS_WEIGHTS", f"weights/lpips_{net_type}.npz")
    if os.path.exists(path):
        params = load_weights(path)
    else:
        found = _find_torch_weights(net_type)
        if found is None:
            return None
        try:
            params = load_weights_torch(found[0], found[1], net_type)
        except Exception as e:  # torch missing / malformed file: loud skip
            import sys
            print(f"[adgs_tpu] LPIPS({net_type}) torch weights at "
                  f"{found[0]} unusable: {e}", file=sys.stderr)
            return None
    return jax.jit(lambda x, y: lpips_from_params(params, net_type, x, y))


def export_weights_from_torch(out_path: str, net_type: str = "vgg") -> None:
    """One-time export on a machine with torchvision + lpips weights."""
    import torch
    import torchvision

    if net_type == "vgg":
        net = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
        conv_idx = [i for i, m in enumerate(net)
                    if isinstance(m, torch.nn.Conv2d)]
    else:
        net = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
        conv_idx = [i for i, m in enumerate(net)
                    if isinstance(m, torch.nn.Conv2d)]
    params = {}
    for j, i in enumerate(conv_idx):
        params[f"conv{j}_w"] = net[i].weight.detach().numpy()
        params[f"conv{j}_b"] = net[i].bias.detach().numpy()
    # linear heads from the official lpips release
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           f"master/lpips/weights/v0.1/{net_type}.pth")
    state = torch.hub.load_state_dict_from_url(url, progress=False,
                                               map_location="cpu")
    for i in range(5):
        params[f"lin{i}_w"] = state[f"lin{i}.model.1.weight"].numpy()
    np.savez(out_path, **params)
