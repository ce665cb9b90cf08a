"""ResNet backbones in flax.linen (NHWC, TPU-native layout).

Structurally equivalent to ``torchvision.models.resnet{18,34,50}`` as used by
the reference image feature extractors (``/root/reference/network_mm/image_fe.py:18-44``,
``network/image_fe.py``), so a weight converter can map torchvision
checkpoints 1:1 (see ``agplace_tpu/utils/torch_convert.py``).  Differences
from a port:

* NHWC layout (XLA's preferred conv layout on TPU; torchvision is NCHW).
* Returns the per-stage feature-map list the towers consume
  (``image_fe.py:97-113``) instead of classification logits.
* BatchNorm is cross-replica "for free" under pjit data parallelism (stats
  are computed over the logical global batch); an optional ``axis_name``
  supports shard_map/pmap execution — this replaces the 760-LoC vendored
  SyncBN package (``model/sync_batchnorm/``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = self.norm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = self.norm(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


_RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
}


class ResNetFeatures(nn.Module):
    """ResNet stem + the first ``num_stages`` residual stages; returns the
    list of per-stage feature maps (NHWC).

    ``num_stages=3`` reproduces the reference's truncated resnet18 with
    ``layers='2_2_2'`` -> 256-ch final map (``image_fe.py:24-26``).
    """

    arch: str = "resnet18"
    num_stages: int = 3
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # fused BN-affine+relu+maxpool stem tail (ops/pallas/stem_pool.py):
    # one VMEM pass over the full-res conv1 output instead of two XLA
    # passes.  OPT-IN — the full-forward A/B measures it a loss in
    # context (BASELINE.md r5 stem table; see config.py stem_pallas).
    # Engages only in eval mode on TPU with bf16 activations;
    # parity-tested (tests/test_pallas_stem_pool.py).
    use_pallas_stem: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        block_cls, stage_sizes, expansion = _RESNET_SPECS[self.arch]

        from agplace_tpu.models.norm import BatchNorm2D

        def norm(name=None):
            # fp32 statistics, fused affine in the activation dtype (flax
            # BN with dtype=f32 would round-trip the whole buffer to fp32)
            return BatchNorm2D(
                use_running_average=not self.train,
                momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if self.train else None,
                name=name,
            )

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        bn1 = norm(name="bn1")
        from agplace_tpu.sparse.bev_grid import _pallas_backend_ok
        if (self.use_pallas_stem and not self.train
                and not self.is_initializing()
                and x.dtype == jnp.bfloat16
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and _pallas_backend_ok()):
            from agplace_tpu.ops.pallas.stem_pool import \
                fused_affine_relu_maxpool
            eff_scale, eff_bias = bn1(x, return_affine=True)
            x = fused_affine_relu_maxpool(x, eff_scale, eff_bias)
        else:
            x = bn1(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        maps = []
        in_ch = 64
        for stage in range(self.num_stages):
            planes = 64 * (2 ** stage)
            n_blocks = stage_sizes[stage]
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                need_ds = (b == 0) and (
                    stride != 1 or in_ch != planes * expansion
                )
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=need_ds,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            in_ch = planes * expansion
            maps.append(x)
        return x, maps

    @staticmethod
    def last_dim(arch: str, num_stages: int) -> int:
        _, _, expansion = _RESNET_SPECS[arch]
        return 64 * (2 ** (num_stages - 1)) * expansion
