"""Image-branch model tests.

The key test is numerical parity of our NHWC flax ResNet against torchvision's
NCHW implementation under *converted random weights* — the weight-conversion
oracle from SURVEY.md §7.2 step 1 (works offline; pretrained weights use the
same code path).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.models.resnet import ResNetFeatures
from agplace_tpu.models.image_fe import ImageFE
from agplace_tpu.models.pooling import GeM, MAC, SPoC, NetVLAD, GlobalHead
from agplace_tpu.models.dbvanilla2d import DBVanilla2D, MLP
from agplace_tpu.config import DBConfig
from agplace_tpu.utils.torch_convert import convert_resnet


def _build_torch_resnet(arch, num_stages):
    """Minimal torch ResNet with torchvision-identical module naming
    (torchvision itself is not in the image; torch-CPU is).  Serves as the
    numerical oracle for the NHWC/HWIO conversion."""
    import torch
    import torch.nn as tnn

    stage_blocks = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}[arch]

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for s in range(num_stages):
                cout = 64 * 2 ** s
                blocks = []
                for b in range(stage_blocks[s]):
                    blocks.append(
                        BasicBlock(cin if b == 0 else cout, cout,
                                   (1 if s == 0 else 2) if b == 0 else 1))
                setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
                cin = cout

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            maps = []
            for s in range(num_stages):
                x = getattr(self, f"layer{s + 1}")(x)
                maps.append(x)
            return maps

    net = Net().eval()
    # randomise BN stats so the test actually checks them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    return net


@pytest.mark.parametrize("arch,num_stages", [("resnet18", 3),
                                             ("resnet18", 4),
                                             ("resnet34", 2)])
def test_resnet_matches_torch_oracle(arch, num_stages):
    torch = pytest.importorskip("torch")
    tv = _build_torch_resnet(arch, num_stages)
    params, stats = convert_resnet(tv.state_dict(), arch, num_stages)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    model = ResNetFeatures(arch=arch, num_stages=num_stages, train=False)
    out, maps = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))

    with torch.no_grad():
        torch_maps = [m.numpy() for m in
                      tv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))]

    assert len(maps) == num_stages
    for ours, theirs in zip(maps, torch_maps):
        theirs = np.transpose(theirs, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=2e-4, atol=2e-4)


def test_gem_matches_torch_formula():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    gem = GeM()
    params = gem.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = gem.apply(params, jnp.asarray(x))
    p = 3.0
    ref = (np.clip(x, 1e-6, None) ** p).mean(axis=(1, 2)) ** (1 / p)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    assert out.shape == (2, 16)


def test_simple_poolings():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 4, 4, 8)),
        dtype=jnp.float32)
    for mod, ref in [(SPoC(), np.mean), (MAC(), np.max)]:
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), ref(np.asarray(x), axis=(1, 2)), rtol=1e-5,
            atol=1e-5)


def test_netvlad_shape_and_norm():
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 4, 4, 32)),
        dtype=jnp.float32)
    m = NetVLAD(clusters_num=8, dim=32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 8 * 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               rtol=1e-5)


@pytest.mark.parametrize("agg", ["gem", "spoc", "mac", "rmac", "convap",
                                 "cosplace", "mixvpr", "rrm"])
def test_global_head_registry(agg):
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 8, 8, 64)),
        dtype=jnp.float32)
    m = GlobalHead(aggregation=agg, features_dim=64)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.ndim == 2 and out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_dbvanilla2d_train_and_cache_modes():
    cfg = DBConfig()
    b, ndb, nmap, hw = 2, 3, 1, 32
    model_train = DBVanilla2D(config=cfg, dim=64, nmap=nmap, train=False)
    x6 = jnp.asarray(
        np.random.default_rng(5).standard_normal((b, ndb, nmap, hw, hw, 3)),
        dtype=jnp.float32)
    variables = model_train.init(jax.random.PRNGKey(0), x6)
    out6 = model_train.apply(variables, x6)
    assert out6.shape == (b, ndb, 64)

    # cache/test entry: same params, 5D input
    x5 = x6[:, 0]
    out5 = model_train.apply(variables, x5)
    assert out5.shape == (b, 64)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out6[:, 0]),
                               rtol=1e-5, atol=1e-5)

    # per-map L2 then mean: norms bounded by 1
    assert np.all(np.linalg.norm(np.asarray(out5), axis=-1) <= 1.0 + 1e-5)


def test_imagefe_stage_dims():
    assert ImageFE.last_dim("resnet18", (2, 2, 2)) == 256
    assert ImageFE.last_dim("resnet18", (2, 2, 2, 2)) == 512
    assert ImageFE.stage_dims("resnet18", (2, 2, 2)) == (64, 128, 256)
    assert ImageFE.last_dim("resnet50", (2, 2, 2)) == 1024
