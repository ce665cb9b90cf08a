"""MinkLoc model family — reference ``models/minkloc.py`` /
``models/minkloc_multimodal.py`` (shipped broken: undefined ``args``, missing
``tools.utils`` imports — SURVEY.md §2.3; rebuilt here with the *intended*
behaviour per §7.5).

* ``MinkLoc``: sparse FPN backbone -> global pooling (GeM/MAC/SPoC) ->
  optional linear head, on ``SparseVoxels``.
* ``ResnetFPN``: image FPN with lateral 1x1s + transposed-conv top-down path
  over ResNet stages (``minkloc_multimodal.py:197-280``).
* ``MinkLocMultimodal``: cloud (+) image descriptors fused by concat or add.
* ``ExtraBlock``: strided sparse conv -> multi-head GeM (``minkloc.py:26-45``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agplace_tpu.models.pooling import GeM
from agplace_tpu.models.resnet import ResNetFeatures
from agplace_tpu.sparse.minkfpn import MinkFPN
from agplace_tpu.sparse.modules import (
    MinkGeM,
    SparseConv,
)
from agplace_tpu.sparse.voxels import (
    SparseVoxels,
    masked_global_avg,
    masked_global_max,
    sort_by_key,
)


class ExtraBlock(nn.Module):
    """Strided sparse conv widening to num_heads*C, then GeM pooled and
    reshaped to [B, num_heads, C]."""

    in_features: int
    num_heads: int = 4
    kernel_size: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, sv: SparseVoxels, keys):
        out, keys = SparseConv(self.num_heads * self.in_features,
                               kernel_size=self.kernel_size,
                               stride=self.stride, name="conv")(sv, keys)
        pooled = MinkGeM(name="gem")(out)  # [B, H*C]
        return pooled.reshape(-1, self.num_heads, self.in_features)


class MinkLoc(nn.Module):
    """Sparse place-recognition tower (``minkloc.py:56-160``)."""

    feature_size: int = 256
    output_dim: int = 256
    planes: Tuple[int, ...] = (32, 64, 64)
    layers: Tuple[int, ...] = (1, 1, 1)
    num_top_down: int = 1
    conv0_kernel_size: int = 5
    block: str = "eca"  # basic | eca
    pooling_method: str = "GeM"  # GeM | MAC | SPoC
    linear_block: bool = False
    dropout_p: Optional[float] = None
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, vox: SparseVoxels) -> jnp.ndarray:
        feat_map, keys, _ = MinkFPN(
            out_channels=self.feature_size,
            planes=self.planes,
            layers=self.layers,
            num_top_down=self.num_top_down,
            conv0_kernel_size=self.conv0_kernel_size,
            block=self.block,
            train=self.train,
            axis_name=self.axis_name,
            name="backbone",
        )(vox)
        if self.pooling_method == "GeM":
            x = MinkGeM(name="pooling")(feat_map)
        elif self.pooling_method == "MAC":
            x = masked_global_max(feat_map)
        elif self.pooling_method == "SPoC":
            x = masked_global_avg(feat_map)
        else:
            raise NotImplementedError(self.pooling_method)
        if self.dropout_p is not None and self.train:
            x = nn.Dropout(self.dropout_p, deterministic=False)(x)
        if self.linear_block:
            x = nn.Dense(self.output_dim, name="linear")(
                nn.relu(nn.LayerNorm(name="ln")(x)))
        return x


class ResnetFPN(nn.Module):
    """Image FPN: ResNet bottom-up + lateral 1x1s + tconv top-down, pooled
    to a global descriptor (``minkloc_multimodal.py:197-300``)."""

    out_channels: int = 256
    lateral_dim: int = 256
    arch: str = "resnet18"
    fh_num_bottom_up: int = 4
    fh_num_top_down: int = 1
    add_fc_block: bool = False
    pool_method: str = "gem"
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:  # [B, H, W, 3]
        _, maps = ResNetFeatures(arch=self.arch,
                                 num_stages=self.fh_num_bottom_up,
                                 train=self.train, axis_name=self.axis_name,
                                 name="fe")(x)
        # top-down with lateral 1x1s
        feat = nn.Conv(self.lateral_dim, (1, 1),
                       name=f"lat_{self.fh_num_bottom_up}")(maps[-1])
        for step in range(self.fh_num_top_down):
            lvl = self.fh_num_bottom_up - 1 - step
            feat = nn.ConvTranspose(self.lateral_dim, (2, 2),
                                    strides=(2, 2),
                                    name=f"tconv_{lvl + 1}")(feat)
            lateral = nn.Conv(self.lateral_dim, (1, 1),
                              name=f"lat_{lvl}")(maps[lvl - 1])
            feat = feat + lateral
        if self.pool_method == "gem":
            v = GeM(name="pool")(feat)
        elif self.pool_method == "spoc":
            v = jnp.mean(feat, axis=(1, 2))
        elif self.pool_method == "max":
            v = jnp.max(feat, axis=(1, 2))
        else:
            raise NotImplementedError(self.pool_method)
        if self.add_fc_block:
            v = nn.Dense(self.out_channels, name="fc")(v)
        return v


class MinkLocMultimodal(nn.Module):
    """Cloud + image fusion (``minkloc_multimodal.py:19-130``): each branch
    produces a descriptor; fused by concat (default) or add.  Returns
    (fused, cloud, image) like the reference's multi-output dict."""

    cloud_fe_size: int = 256
    image_fe_size: int = 256
    output_dim: int = 512
    fuse_method: str = "concat"  # concat | add
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, vox: Optional[SparseVoxels], image: Optional[Any]):
        cloud_v = None
        image_v = None
        if vox is not None:
            cloud_v = MinkLoc(feature_size=self.cloud_fe_size,
                              output_dim=self.cloud_fe_size,
                              train=self.train, axis_name=self.axis_name,
                              name="cloud_fe")(vox)
        if image is not None:
            image_v = ResnetFPN(out_channels=self.image_fe_size,
                                lateral_dim=self.image_fe_size,
                                train=self.train, axis_name=self.axis_name,
                                name="image_fe")(image)
        if cloud_v is not None and image_v is not None:
            if self.fuse_method == "concat":
                fused = jnp.concatenate([cloud_v, image_v], axis=-1)
            elif self.fuse_method == "add":
                assert cloud_v.shape == image_v.shape
                fused = cloud_v + image_v
            else:
                raise NotImplementedError(self.fuse_method)
        else:
            fused = cloud_v if cloud_v is not None else image_v
        return {"embedding": fused, "cloud_embedding": cloud_v,
                "image_embedding": image_v}
