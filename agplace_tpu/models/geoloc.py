"""GeoLocalizationNet — the DVGLB backbone+aggregation family the reference
vendors (``/root/reference/model/network.py:29-213``).  ALT path reachable via
``--backbone``/``--aggregation``; rebuilt as a flax module with the backbone
registry (resnet{18,50,101}conv{4,5}, vgg16, alexnet, vit) and the
aggregation registry from ``pooling.GlobalHead``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agplace_tpu.models.pooling import GlobalHead
from agplace_tpu.models.resnet import ResNetFeatures


def _l2(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class VGG16Features(nn.Module):
    """VGG16 conv trunk exactly as DVGLB truncates it:
    ``features.children()[:-2]`` (``model/network.py:144``) — 13 convs with
    four interior maxpools, ending at conv5_3 with NO trailing ReLU and no
    final pool."""

    train: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        n_convs = sum(1 for v in cfg if v != "M")
        i = 0
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{i}")(x)
                if i < n_convs - 1:  # [:-2] drops the final ReLU
                    x = nn.relu(x)
                i += 1
        return x


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk exactly as DVGLB truncates it:
    ``features.children()[:-2]`` (``model/network.py:149-152``) — all five
    convs, ending at conv4 (256 ch) with NO trailing ReLU and no final
    maxpool."""

    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=2,
                            name="conv0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=2, name="conv1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, name="conv2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv3")(x))
        return nn.Conv(256, (3, 3), padding=1, name="conv4")(x)


class ViTBackbone(nn.Module):
    """Plain ViT-B/16 token backbone (the reference wraps HF ViT,
    ``model/network.py:34-57``); returns tokens [B, 1+N, C] with CLS first."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 16
    trunc_te: Optional[int] = None  # truncate encoder at layer N
    ln_eps: float = 1e-12  # HF ViT layer_norm_eps (vit-base-patch16-*)
    train: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="embed")(x)
        x = x.reshape(b, -1, self.hidden)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.hidden))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.hidden))
        x = x + pos
        n_layers = self.trunc_te or self.layers
        for i in range(n_layers):
            y = nn.LayerNorm(epsilon=self.ln_eps, name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn_{i}")(y, y)
            x = x + y
            y = nn.LayerNorm(epsilon=self.ln_eps, name=f"ln2_{i}")(x)
            y = nn.Dense(self.hidden * 4, name=f"mlp1_{i}")(y)
            y = nn.Dense(self.hidden, name=f"mlp2_{i}")(nn.gelu(y))
            x = x + y
        return nn.LayerNorm(epsilon=self.ln_eps, name="ln_f")(x)


_RESNET_BACKBONES = {
    "resnet18conv4": ("resnet18", 3, 256),
    "resnet18conv5": ("resnet18", 4, 512),
    "resnet50conv4": ("resnet50", 3, 1024),
    "resnet50conv5": ("resnet50", 4, 2048),
    "resnet101conv4": ("resnet101", 3, 1024),
    "resnet101conv5": ("resnet101", 4, 2048),
}


def backbone_output_dim(backbone: str) -> int:
    if backbone in _RESNET_BACKBONES:
        return _RESNET_BACKBONES[backbone][2]
    if backbone == "vgg16":
        return 512
    if backbone == "alexnet":
        return 256  # features[:-2] ends at conv4 (network.py:149-152)
    if backbone in ("vit", "cct384"):
        return 768 if backbone == "vit" else 384
    raise NotImplementedError(backbone)


class GeoLocalizationNet(nn.Module):
    """backbone -> (L2) -> aggregation -> (L2 / FC) per the reference wiring
    (``model/network.py:38-55``)."""

    backbone: str = "resnet18conv4"
    aggregation: str = "gem"
    features_dim: int = 256
    netvlad_clusters: int = 64
    fc_output_dim: Optional[int] = None
    l2: str = "before_pool"
    trunc_te: Optional[int] = None
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] NHWC
        work_with_tokens = self.backbone.startswith(("vit", "cct"))
        if self.backbone in _RESNET_BACKBONES:
            arch, stages, dim = _RESNET_BACKBONES[self.backbone]
            feat, _ = ResNetFeatures(arch=arch, num_stages=stages,
                                     train=self.train,
                                     axis_name=self.axis_name,
                                     name="backbone")(x)
        elif self.backbone == "vgg16":
            feat = VGG16Features(train=self.train, name="backbone")(x)
            dim = 512
        elif self.backbone == "alexnet":
            feat = AlexNetFeatures(train=self.train, name="backbone")(x)
            dim = 256
        elif self.backbone == "vit":
            tokens = ViTBackbone(trunc_te=self.trunc_te, train=self.train,
                                 name="backbone")(x)
            if self.aggregation == "cls":
                out = tokens[:, 0]
                return _l2(out)
            # reshape patch tokens back to a map for CNN-style aggregation
            b = tokens.shape[0]
            n = tokens.shape[1] - 1
            side = int(n ** 0.5)
            feat = tokens[:, 1:].reshape(b, side, side, -1)
            dim = feat.shape[-1]
        elif self.backbone == "cct384":
            # cct_14_7x2_384 wrapped like model/network.py:154-169; trunc_te
            # truncates the encoder stack (blocks[:trunc_te], :159)
            from agplace_tpu.models.cct import CCT

            tokens, pooled = CCT(
                num_layers=self.trunc_te or 14, train=self.train,
                name="backbone")(x)
            if self.aggregation in ("seqpool", "cls"):
                return _l2(pooled)  # sequence pooling lives inside CCT
            b, n, _ = tokens.shape
            side = int(n ** 0.5)
            feat = tokens[:, : side * side].reshape(b, side, side, -1)
            dim = feat.shape[-1]
        else:
            raise NotImplementedError(self.backbone)

        if self.aggregation in ("gem", "spoc", "mac", "rmac"):
            if self.l2 == "before_pool":
                feat = _l2(feat)
            out = GlobalHead(self.aggregation, dim, name="aggregation")(feat)
            if self.l2 == "after_pool":
                out = _l2(out)
        else:
            out = GlobalHead(self.aggregation, dim,
                             self.netvlad_clusters, name="aggregation")(feat)

        if self.fc_output_dim is not None:
            out = nn.Dense(self.fc_output_dim, name="fc")(out)
            out = _l2(out)
        return out
