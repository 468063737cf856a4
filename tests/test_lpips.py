"""LPIPS numerical validation.

Pretrained VGG/Alex weights cannot be downloaded here (zero egress), so the
architecture is validated against a hand-built PyTorch twin of the
reference trunks (lpipsPyTorch/modules/networks.py:12-96) loaded with the
SAME random weights: if every conv stride/pad/pool, the scaling layer, the
unit-normalization, the 1x1 linear heads, and the stage means match torch
numerically, dropping in the official weight export (tools/
export_lpips_weights.py) yields the official metric.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adgs_tpu.ops import lpips as lp


def _rand_params(rng, net_type):
    params = {}
    if net_type == "vgg":
        in_ch = 3
        i = 0
        for out_ch, n_convs in lp._VGG_STAGES:
            for _ in range(n_convs):
                params[f"conv{i}_w"] = rng.normal(
                    size=(out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
                params[f"conv{i}_b"] = rng.normal(
                    size=(out_ch,)).astype(np.float32) * 0.05
                in_ch = out_ch
                i += 1
        chans = [s[0] for s in lp._VGG_STAGES]
    else:
        in_ch = 3
        for i, (out_ch, k, s, p) in enumerate(lp._ALEX_LAYERS):
            params[f"conv{i}_w"] = rng.normal(
                size=(out_ch, in_ch, k, k)).astype(np.float32) * 0.05
            params[f"conv{i}_b"] = rng.normal(
                size=(out_ch,)).astype(np.float32) * 0.05
            in_ch = out_ch
        chans = [l[0] for l in lp._ALEX_LAYERS]
    for i, c in enumerate(chans):
        params[f"lin{i}_w"] = np.abs(rng.normal(
            size=(1, c, 1, 1))).astype(np.float32)
    return params


def _torch_trunk(params, net_type, x):
    """The reference trunk rebuilt in torch from the same weight dict."""
    feats = []
    t = torch.from_numpy(x)
    if net_type == "vgg":
        i = 0
        for stage, (_, n_convs) in enumerate(lp._VGG_STAGES):
            for _ in range(n_convs):
                t = torch.nn.functional.conv2d(
                    t, torch.from_numpy(params[f"conv{i}_w"]),
                    torch.from_numpy(params[f"conv{i}_b"]), padding=1)
                t = torch.relu(t)
                i += 1
            feats.append(t)
            if stage < len(lp._VGG_STAGES) - 1:
                t = torch.nn.functional.max_pool2d(t, 2, 2)
    else:
        for i, (_, k, s, p) in enumerate(lp._ALEX_LAYERS):
            t = torch.nn.functional.conv2d(
                t, torch.from_numpy(params[f"conv{i}_w"]),
                torch.from_numpy(params[f"conv{i}_b"]), stride=s, padding=p)
            t = torch.relu(t)
            feats.append(t)
            if i in (0, 1):
                t = torch.nn.functional.max_pool2d(t, 3, 2)
    return feats


def _torch_lpips(params, net_type, x, y):
    """lpipsPyTorch/modules/lpips.py:8-36 forward, rebuilt in torch."""
    shift = torch.tensor(lp._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(lp._SCALE).view(1, 3, 1, 1)
    xs = ((2 * torch.from_numpy(x) - 1) - shift) / scale
    ys = ((2 * torch.from_numpy(y) - 1) - shift) / scale
    fx = _torch_trunk(params, net_type, xs.numpy())
    fy = _torch_trunk(params, net_type, ys.numpy())
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        lin = torch.from_numpy(params[f"lin{i}_w"])
        total = total + (d * lin).sum(1).mean(dim=(-2, -1))
    return float(total.mean())


@pytest.mark.parametrize("net_type", ["vgg", "alex"])
def test_matches_torch_twin(net_type):
    rng = np.random.default_rng(7)
    params = _rand_params(rng, net_type)
    size = 64 if net_type == "vgg" else 96  # alex stride-4 conv needs room
    x = rng.uniform(size=(1, 3, size, size)).astype(np.float32)
    y = rng.uniform(size=(1, 3, size, size)).astype(np.float32)

    ours = float(lp.lpips_from_params(
        {k: np.asarray(v) for k, v in params.items()}, net_type, x, y))
    ref = _torch_lpips(params, net_type, x, y)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-6)


def test_identical_images_zero():
    rng = np.random.default_rng(3)
    params = _rand_params(rng, "alex")
    x = rng.uniform(size=(1, 3, 96, 96)).astype(np.float32)
    val = float(lp.lpips_from_params(
        {k: np.asarray(v) for k, v in params.items()}, "alex", x, x))
    assert abs(val) < 1e-7


def test_weight_roundtrip(tmp_path):
    """load_weights restores an exported npz exactly and lpips_fn builds a
    callable from it (the zero-egress deployment path)."""
    rng = np.random.default_rng(5)
    params = _rand_params(rng, "alex")
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **params)
    fn = lp.lpips_fn("alex", weights_path=path)
    assert fn is not None
    x = rng.uniform(size=(3, 96, 96)).astype(np.float32)
    y = rng.uniform(size=(3, 96, 96)).astype(np.float32)
    direct = float(lp.lpips_from_params(params, "alex", x, y))
    np.testing.assert_allclose(float(fn(x, y)), direct, rtol=1e-5)
    assert lp.lpips_fn("alex", weights_path=str(tmp_path / "nope.npz")) is None


class TestTorchWeightIngestion:
    """load_weights_torch must parse the reference's own checkpoint formats
    (torchvision trunk state dict + richzhang linear heads) without
    torchvision, and lpips_fn must pick them up from the hub-cache layout."""

    def _synthetic_alex_files(self, tmp_path, rng):
        # torchvision alexnet state dict: convs at features.{0,3,6,8,10}
        trunk = {}
        in_ch = 3
        for idx, (out_ch, k, s, p) in zip((0, 3, 6, 8, 10), lp._ALEX_LAYERS):
            trunk[f"features.{idx}.weight"] = torch.from_numpy(
                rng.normal(size=(out_ch, in_ch, k, k)).astype(np.float32)
                * 0.05)
            trunk[f"features.{idx}.bias"] = torch.from_numpy(
                rng.normal(size=(out_ch,)).astype(np.float32) * 0.05)
            in_ch = out_ch
        # a classifier linear that must be ignored (2-D weight)
        trunk["classifier.1.weight"] = torch.zeros(10, 256)
        trunk["classifier.1.bias"] = torch.zeros(10)
        trunk_p = str(tmp_path / "alexnet-owt-7be5be79.pth")
        torch.save(trunk, trunk_p)
        heads = {}
        chans = [l[0] for l in lp._ALEX_LAYERS]
        for i, c in enumerate(chans):
            heads[f"lin{i}.model.1.weight"] = torch.from_numpy(
                np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
        heads_p = str(tmp_path / "alex.pth")
        torch.save(heads, heads_p)
        return trunk_p, heads_p, trunk, heads

    def test_parse_and_evaluate(self, tmp_path):
        rng = np.random.default_rng(7)
        trunk_p, heads_p, trunk, heads = self._synthetic_alex_files(
            tmp_path, rng)
        params = lp.load_weights_torch(trunk_p, heads_p, "alex")
        np.testing.assert_array_equal(
            np.asarray(params["conv0_w"]),
            trunk["features.0.weight"].numpy())
        np.testing.assert_array_equal(
            np.asarray(params["lin4_w"]),
            heads["lin4.model.1.weight"].numpy())
        x = rng.uniform(size=(3, 40, 48)).astype(np.float32)
        y = rng.uniform(size=(3, 40, 48)).astype(np.float32)
        v = float(lp.lpips_from_params(params, "alex", x, y))
        assert np.isfinite(v) and v > 0

    def test_lpips_fn_discovers_hub_cache(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(8)
        ckpt_dir = tmp_path / "hub" / "checkpoints"
        ckpt_dir.mkdir(parents=True)
        self._synthetic_alex_files(ckpt_dir, rng)
        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        monkeypatch.delenv("ADGS_LPIPS_WEIGHTS", raising=False)
        fn = lp.lpips_fn("alex", weights_path=str(tmp_path / "absent.npz"))
        assert fn is not None
        x = np.zeros((3, 40, 48), np.float32)
        y = np.ones((3, 40, 48), np.float32) * 0.5
        assert np.isfinite(float(fn(x, y)))

    def test_renamed_heads_format(self, tmp_path):
        rng = np.random.default_rng(9)
        trunk_p, heads_p, _, heads = self._synthetic_alex_files(
            tmp_path, rng)
        renamed = {k.replace("lin", "").replace("model.", ""): v
                   for k, v in heads.items()}
        torch.save(renamed, heads_p)
        params = lp.load_weights_torch(trunk_p, heads_p, "alex")
        assert params["lin0_w"].shape == (1, 64, 1, 1)
