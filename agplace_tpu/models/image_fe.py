"""Image feature extractors (reference ``network_mm/image_fe.py:10-174`` and
``network/image_fe.py``) — truncated CNN backbones returning the final map
plus the per-stage map list that the fusion blocks consume.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from agplace_tpu.models.resnet import ResNetFeatures


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Dense(4 * self.dim, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        gamma = self.param("gamma",
                           lambda k: jnp.full((self.dim,), self.layer_scale))
        return x + gamma * y


class ConvNeXtTinyFeatures(nn.Module):
    """convnext_tiny truncated per reference semantics
    (``image_fe.py:59-88,118-150``): stage depths clipped to ``layers`` and
    maps collected after stages 1..3 (dims 96/192/384)."""

    layers: Tuple[int, ...] = (2, 2, 2)
    train: bool = False

    @nn.compact
    def __call__(self, x):
        depths = (3, 3, 9, 3)
        dims = (96, 192, 384, 768)
        maps = []
        # stem: 4x4 stride-4 conv + LN
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="stem_conv")(x)
        x = nn.LayerNorm(name="stem_norm")(x)
        n_stages = min(len(self.layers), 4)
        for s in range(n_stages):
            if s > 0:
                x = nn.LayerNorm(name=f"down_norm{s}")(x)
                x = nn.Conv(dims[s], (2, 2), strides=(2, 2), padding="VALID",
                            name=f"down_conv{s}")(x)
            depth = min(self.layers[s], depths[s])
            for i in range(depth):
                x = ConvNeXtBlock(dims[s], name=f"stage{s}_block{i}")(x)
            maps.append(x)
        return x, maps


def _ceil_max_pool(x, window: int = 3, stride: int = 2):
    """torch ``MaxPool2d(3, 2, ceil_mode=True)`` (torchvision squeezenet
    trunks): pad bottom/right with -inf so partial windows count."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class FireModule(nn.Module):
    """SqueezeNet fire module: squeeze 1x1 -> expand 1x1 + 3x3 concat."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1,
                             name="expand3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """squeezenet1_0 / 1_1 conv trunks + the reference's 1x1 512->256 head
    (``image_fe.py:48-55``)."""

    version: str = "1_1"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        # torchvision-exact geometry: stem conv has NO padding and the
        # maxpools are ceil_mode=True (torchvision squeezenet1_0/1_1)
        maps = []
        if self.version == "1_0":
            x = nn.relu(nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                                name="conv0")(x))
            x = _ceil_max_pool(x)
            for i, (s, e) in enumerate([(16, 64), (16, 64), (32, 128)]):
                x = FireModule(s, e, name=f"fire{i}")(x)
            maps.append(x)
            x = _ceil_max_pool(x)
            for i, (s, e) in enumerate([(32, 128), (48, 192), (48, 192),
                                        (64, 256)]):
                x = FireModule(s, e, name=f"fire{i + 3}")(x)
            maps.append(x)
            x = _ceil_max_pool(x)
            x = FireModule(64, 256, name="fire7")(x)
        else:
            x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                                name="conv0")(x))
            x = _ceil_max_pool(x)
            x = FireModule(16, 64, name="fire0")(x)
            x = FireModule(16, 64, name="fire1")(x)
            maps.append(x)
            x = _ceil_max_pool(x)
            x = FireModule(32, 128, name="fire2")(x)
            x = FireModule(32, 128, name="fire3")(x)
            maps.append(x)
            x = _ceil_max_pool(x)
            for i, (s, e) in enumerate([(48, 192), (48, 192), (64, 256),
                                        (64, 256)]):
                x = FireModule(s, e, name=f"fire{i + 4}")(x)
        # reference adds a 1x1 512->256 head (image_fe.py:50,54)
        x = nn.Conv(256, (1, 1), name="fc")(x)
        maps.append(x)
        return x, maps


class ImageFE(nn.Module):
    """Backbone registry keyed by the reference's ``--mm_imgfe`` /
    ``--dbimage_fe`` flags.  ``layers`` controls truncation: len(layers)
    stages are kept (``image_fe.py:18-44``).
    """

    fe_type: str = "resnet18"
    layers: Tuple[int, ...] = (2, 2, 2)
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    use_pallas_stem: bool = False  # fused stem tail (resnet archs only)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        if self.fe_type in ("resnet18", "resnet34", "resnet50"):
            return ResNetFeatures(
                arch=self.fe_type,
                num_stages=len(self.layers),
                train=self.train,
                axis_name=self.axis_name,
                dtype=self.dtype,
                use_pallas_stem=self.use_pallas_stem,
                name="fe",
            )(x)
        if self.fe_type == "convnext_tiny":
            return ConvNeXtTinyFeatures(layers=self.layers, train=self.train,
                                        name="fe")(x)
        if self.fe_type in ("squeezenet10", "squeezenet11"):
            return SqueezeNetFeatures(
                version="1_0" if self.fe_type == "squeezenet10" else "1_1",
                train=self.train, name="fe")(x)
        raise NotImplementedError(f"fe_type={self.fe_type}")

    @staticmethod
    def last_dim(fe_type: str, layers: Tuple[int, ...]) -> int:
        if fe_type in ("resnet18", "resnet34", "resnet50"):
            return ResNetFeatures.last_dim(fe_type, len(layers))
        if fe_type == "convnext_tiny":
            return (96, 192, 384, 768)[min(len(layers), 4) - 1]
        if fe_type in ("squeezenet10", "squeezenet11"):
            return 256
        raise NotImplementedError(fe_type)

    @staticmethod
    def stage_dims(fe_type: str, layers: Tuple[int, ...]):
        n = len(layers)
        if fe_type in ("resnet18", "resnet34"):
            return tuple(64 * 2 ** i for i in range(n))
        if fe_type == "resnet50":
            return tuple(256 * 2 ** i for i in range(n))
        if fe_type == "convnext_tiny":
            return (96, 192, 384, 768)[:n]
        raise NotImplementedError(fe_type)
