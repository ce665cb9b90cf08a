"""Measured PyTorch baseline (SURVEY.md §6 / VERDICT r1 item 5).

The reference publishes no numbers and its full stack (MinkowskiEngine,
torchvision, CUDA) is not installable here, so this measures the CPU-runnable
slice — the reference's image query branch (truncated ResNet18 @256px + GeM +
L2, ``network_mm/image_fe.py`` + ``image_pooling.py``) — in BOTH frameworks
on the SAME host CPU:

    python scripts/baseline_torch.py

Prints one JSON line: torch desc/s, jax-CPU desc/s, and the ratio.  This
anchors the BASELINE.md GPU-estimate with a measured like-for-like data
point; it is NOT a TPU-vs-GPU comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

BATCH, IMG, ITERS, WARM = 8, 256, 6, 2


def build_torch_image_tower():
    import torch
    import torch.nn as tnn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_models_image import _build_torch_resnet

    net = _build_torch_resnet("resnet18", 3)

    class GeM(tnn.Module):
        def __init__(self, p=3.0, eps=1e-6):
            super().__init__()
            self.p, self.eps = p, eps

        def forward(self, x):
            return torch.nn.functional.avg_pool2d(
                x.clamp(min=self.eps).pow(self.p),
                (x.size(-2), x.size(-1))).pow(1.0 / self.p)

    class Tower(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net, self.gem = net, GeM()

        def forward(self, x):
            maps = self.net(x)
            v = self.gem(maps[-1]).flatten(1)
            return torch.nn.functional.normalize(v, dim=-1)

    return Tower().eval(), net.state_dict()


def main() -> None:
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    tower, sd = build_torch_image_tower()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, 3, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        for _ in range(WARM):
            tower(xt)
        t0 = time.perf_counter()
        for i in range(ITERS):
            tower(xt * (1 + i * 1e-6))
        torch_dt = (time.perf_counter() - t0) / ITERS
    torch_dps = BATCH / torch_dt

    # same math in this framework, same weights, same host CPU
    import jax
    import jax.numpy as jnp

    from agplace_tpu.models.pooling import GeM as JGeM
    from agplace_tpu.models.resnet import ResNetFeatures
    from agplace_tpu.utils.torch_convert import convert_resnet

    params, stats = convert_resnet(sd, "resnet18", 3)
    mod = ResNetFeatures(arch="resnet18", num_stages=3)
    gem = JGeM()
    gvars = gem.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 8, 8, 256), jnp.float32))

    @jax.jit
    def embed(img):
        out, _ = mod.apply({"params": params, "batch_stats": stats}, img)
        v = gem.apply(gvars, out)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    for _ in range(WARM):
        embed(xj).block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        embed(xj * (1 + i * 1e-6)).block_until_ready()
    jax_dt = (time.perf_counter() - t0) / ITERS
    jax_dps = BATCH / jax_dt

    print(json.dumps({
        "config": "image-only query tower (resnet18x3 @256 + GeM + L2)",
        "host": f"cpu x{os.cpu_count()}",
        "torch_desc_per_sec": round(torch_dps, 2),
        "jax_cpu_desc_per_sec": round(jax_dps, 2),
        "jax_over_torch": round(jax_dps / torch_dps, 3),
    }))


if __name__ == "__main__":
    main()
