"""2D global aggregation heads (GeM and friends).

Reference equivalents: ``network_mm/image_pooling.py:8-16`` (GeM),
``network/image_pooling.py:23-200`` (ConvAP, CosPlace, MixVPR, RRM),
``model/functional.py:43-83`` (RMAC), ``model/aggregation.py`` (MAC/SPoC/
NetVLAD/CRN).  All operate on NHWC feature maps and return [B, C] (or the
aggregation's own output dim).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GeM(nn.Module):
    """Generalised-mean pooling with learnable exponent p (init 3):
    ``avgpool(clamp(x, eps)^p)^(1/p)`` — ``network_mm/image_pooling.py:8-16``.
    """

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, C]
        p = self.param("p", lambda k: jnp.ones((1,)) * self.p_init)
        x = jnp.clip(x, min=self.eps) ** p
        x = jnp.mean(x, axis=(1, 2))
        return x ** (1.0 / p)


class SPoC(nn.Module):
    """Global average pooling (``model/aggregation.py`` SPoC)."""

    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2))


class MAC(nn.Module):
    """Global max pooling (``model/aggregation.py`` MAC)."""

    @nn.compact
    def __call__(self, x):
        return jnp.max(x, axis=(1, 2))


def rmac_regions(h: int, w: int, levels: int = 3):
    """Static RMAC region geometry — the exact math of
    ``model/functional.py:43-83`` (ovr=0.4, steps 2..7, overplus on the
    long side, centers ``floor(wl2 + i*b) - wl2``).  Returns a list of
    (i0, j0, wl) squares; pure python so the caller stays jittable."""
    import numpy as np

    ovr = 0.4
    steps = np.array([2, 3, 4, 5, 6, 7], np.float32)
    mn = min(h, w)
    b = (max(h, w) - mn) / (steps - 1)
    idx = int(np.argmin(np.abs((mn * mn - mn * b) / (mn * mn) - ovr)))
    wd = idx + 1 if h < w else 0
    hd = idx + 1 if h > w else 0
    regions = []
    for level in range(1, levels + 1):
        wl = int(np.floor(2 * mn / (level + 1)))
        if wl == 0:
            continue
        wl2 = int(np.floor(wl / 2 - 1))
        bw = 0.0 if level + wd == 1 else (w - wl) / (level + wd - 1)
        bh = 0.0 if level + hd == 1 else (h - wl) / (level + hd - 1)
        cen_w = [int(np.floor(np.float32(wl2 + i * bw))) - wl2
                 for i in range(level + wd)]
        cen_h = [int(np.floor(np.float32(wl2 + i * bh))) - wl2
                 for i in range(level + hd)]
        for i0 in cen_h:
            for j0 in cen_w:
                regions.append((i0, j0, wl))
    return regions


class RMAC(nn.Module):
    """Regional MAC (``model/functional.py:43-83``): the GLOBAL max-pool
    vector plus max-pools over a multi-scale grid of square regions, each
    L2-normalised as ``v / (||v|| + eps)`` and summed.  Region geometry is
    computed statically from the (static) map shape, so the whole thing
    stays jittable."""

    levels: int = 3
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape

        def norm_add(v, r):
            r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + self.eps)
            return r if v is None else v + r

        # global vector first (functional.py:59-61)
        v = norm_add(None, jnp.max(x, axis=(1, 2)))
        for i0, j0, wl in rmac_regions(h, w, self.levels):
            region = x[:, i0 : i0 + wl, j0 : j0 + wl, :]
            v = norm_add(v, jnp.max(region, axis=(1, 2)))
        return v


def _l2n(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True),
                           1e-12)


class ConvAP(nn.Module):
    """Conv 1x1 channel projection -> s1 x s2 adaptive avg pool -> flatten
    -> L2 (``network/image_pooling.py:23-41``)."""

    out_channels: int = 256
    s1: int = 2
    s2: int = 2

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True)(x)
        x = nn.avg_pool(
            x,
            window_shape=(x.shape[1] // self.s1, x.shape[2] // self.s2),
            strides=(x.shape[1] // self.s1, x.shape[2] // self.s2),
        )
        # flatten channel-major, matching the reference's NCHW
        # ``x.flatten(1)`` (network/image_pooling.py:37) so descriptor
        # element order is checkpoint-compatible
        x = jnp.transpose(x, (0, 3, 1, 2))
        return _l2n(x.reshape(x.shape[0], -1))


class CosPlace(nn.Module):
    """channel-L2 -> GeM -> linear -> L2
    (``network/image_pooling.py:44-63``)."""

    out_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = _l2n(x)  # normalize descriptors across channels first
        v = GeM(name="gem")(x)
        v = nn.Dense(self.out_dim, name="fc")(v)
        return _l2n(v)


class FeatureMixerLayer(nn.Module):
    """Residual token mixer over the last axis (hw)
    (``network/image_pooling.py:67-84``)."""

    dim: int  # = hw
    mlp_ratio: float = 1.0

    @nn.compact
    def __call__(self, x):  # [B, C, hw]
        y = nn.LayerNorm(epsilon=1e-5)(x)  # torch nn.LayerNorm default eps
        y = nn.Dense(int(self.dim * self.mlp_ratio))(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class MixVPR(nn.Module):
    """MixVPR feature-mixer aggregation (``network/image_pooling.py:87-126``):
    [B,C,hw] -> L mixers over hw -> channel proj -> row proj -> flatten+L2."""

    in_channels: int = 256
    out_channels: int = 256
    mix_depth: int = 4
    mlp_ratio: float = 1.0
    out_rows: int = 4

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = jnp.swapaxes(x, -1, -2)  # [B, C, hw]
        for i in range(self.mix_depth):
            x = FeatureMixerLayer(dim=h * w, mlp_ratio=self.mlp_ratio,
                                  name=f"mix_{i}")(x)
        x = jnp.swapaxes(x, -1, -2)  # [B, hw, C]
        x = nn.Dense(self.out_channels, name="channel_proj")(x)
        x = jnp.swapaxes(x, -1, -2)  # [B, C', hw]
        x = nn.Dense(self.out_rows, name="row_proj")(x)
        return _l2n(x.reshape(b, -1))


class RRM(nn.Module):
    """Residual retrieval module: GAP -> LN -> residual MLP -> LN -> L2
    (``model/aggregation.py:58-83`` / ``network/image_pooling.py:133-152``)."""

    dim: int = 256

    @nn.compact
    def __call__(self, x):
        v = jnp.mean(x, axis=(1, 2))
        v = nn.LayerNorm(epsilon=1e-5, name="ln1")(v)  # torch LN eps
        h = nn.Dense(self.dim, name="fc1")(v)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        v = nn.LayerNorm(epsilon=1e-5, name="ln2")(v + h)
        return _l2n(v)


class NetVLAD(nn.Module):
    """NetVLAD with soft-assignment conv, matching
    ``model/aggregation.py:85-174``: per-descriptor softmax over K clusters,
    residual aggregation against centroids, intra-norm then full L2 norm.

    Centroid initialisation from k-means (faiss in the reference) is provided
    by ``init_from_kmeans`` using ``agplace_tpu.retrieval.kmeans``.
    """

    clusters_num: int = 64
    dim: int = 256
    work_with_tokens: bool = False

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] or [B, N, C]
        if x.ndim == 4:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        b, n, c = x.shape
        # descriptor-wise L2 norm (reference normalizes input first)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        centroids = self.param(
            "centroids", nn.initializers.normal(1.0), (self.clusters_num, c)
        )
        # soft-assign conv: NO bias — the reference's Conv2d(bias=False)
        # (``model/aggregation.py:105-110``; ``init_params`` even sets
        # ``self.conv.bias = None``)
        assign_w = self.param(
            "assign_w", nn.initializers.lecun_normal(), (c, self.clusters_num)
        )
        soft = jax.nn.softmax(
            jnp.dot(x, assign_w, preferred_element_type=jnp.float32),
            axis=-1,
        )  # [B, N, K]
        # vlad[b,k,c] = sum_n soft[b,n,k] * (x[b,n,c] - centroids[k,c])
        weighted_x = jnp.einsum("bnk,bnc->bkc", soft, x)
        counts = jnp.sum(soft, axis=1)  # [B, K]
        vlad = weighted_x - counts[..., None] * centroids[None]
        # intra-normalisation then global L2
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12
        )
        vlad = vlad.reshape(b, -1)
        return vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12
        )

    @staticmethod
    def init_from_kmeans(params, centroids, descriptors=None,
                         alpha: float = None):
        """Set centroids + soft-assign weights from k-means clusters —
        the reference ``init_params`` (``model/aggregation.py:112-125``):
        alpha = -ln(0.01) / mean(top1 - top2 dot of L2'd centroids against
        the training descriptors); assign weight = alpha * normalized
        centroids; centroids stored unnormalized; no bias."""
        import numpy as np

        c = np.asarray(centroids, np.float32)
        c_assign = c / np.linalg.norm(c, axis=1, keepdims=True)
        if alpha is None:
            if descriptors is None:
                raise ValueError("need descriptors (or explicit alpha)")
            dots = np.sort(c_assign @ np.asarray(descriptors, np.float32).T,
                           axis=0)[::-1]
            alpha = float(-np.log(0.01) / np.mean(dots[0] - dots[1]))
        params = dict(params)
        params["centroids"] = jnp.asarray(c)
        params["assign_w"] = jnp.asarray(alpha * c_assign.T)
        return params


class CRN(nn.Module):
    """Contextual Reweighting Network (``model/aggregation.py:177-259``):
    NetVLAD whose soft assignments are scaled by a multiscale context mask
    (3x3/5x5/7x7 filters over a 2x-downsampled map, fixed-1 accumulation
    conv, bilinear upsample)."""

    clusters_num: int = 64
    dim: int = 256

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        # descriptor-wise L2 norm
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        # context mask.  Downsample = AvgPool2d(3, stride 2, ceil_mode=True)
        # (``model/aggregation.py:181``): torch divides edge windows by the
        # CLIPPED in-bounds count, not the window size — so sum-pool and
        # divide by a same-shaped count pool (oracle-pinned in
        # tests/test_torch_aggregation_oracle.py).
        def _sumpool(v):
            return jax.lax.reduce_window(
                v, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (0, 1), (0, 1), (0, 0)])

        cnt = _sumpool(jnp.ones_like(x[..., :1]))
        xd = _sumpool(x) / cnt
        g3 = nn.Conv(32, (3, 3), padding=1, name="filter_3")(xd)
        g5 = nn.Conv(32, (5, 5), padding=2, name="filter_5")(xd)
        g7 = nn.Conv(20, (7, 7), padding=3, name="filter_7")(xd)
        g = nn.relu(jnp.concatenate([g3, g5, g7], axis=-1))
        # accumulation weight: fixed all-ones 1x1 conv (non-trainable in the
        # reference) == channel sum
        wmask = nn.relu(jnp.sum(g, axis=-1, keepdims=True))  # [B,h',w',1]
        mask = jax.image.resize(wmask, (b, h, w, 1), method="bilinear")

        centroids = self.param("centroids", nn.initializers.normal(1.0),
                               (self.clusters_num, c))
        # bias-free soft-assign conv, as in NetVLAD (CRN subclasses it in
        # the reference, ``model/aggregation.py:233``)
        assign_w = self.param("assign_w", nn.initializers.lecun_normal(),
                              (c, self.clusters_num))
        flat = x.reshape(b, h * w, c)
        soft = jax.nn.softmax(
            jnp.dot(flat, assign_w, preferred_element_type=jnp.float32),
            axis=-1)
        soft = soft * mask.reshape(b, h * w, 1)  # contextual reweighting
        weighted_x = jnp.einsum("bnk,bnc->bkc", soft, flat)
        counts = jnp.sum(soft, axis=1)
        vlad = weighted_x - counts[..., None] * centroids[None]
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(b, -1)
        return vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)


class GlobalHead(nn.Module):
    """Aggregation registry keyed by the reference's ``--aggregation`` flag."""

    aggregation: str = "gem"
    features_dim: int = 256
    netvlad_clusters: int = 64

    @nn.compact
    def __call__(self, x):
        agg = self.aggregation
        if agg == "gem":
            return GeM(name="gem")(x)
        if agg == "spoc":
            return SPoC(name="spoc")(x)
        if agg == "mac":
            return MAC(name="mac")(x)
        if agg == "rmac":
            return RMAC(name="rmac")(x)
        if agg == "convap":
            return ConvAP(self.features_dim, name="convap")(x)
        if agg == "cosplace":
            return CosPlace(self.features_dim, name="cosplace")(x)
        if agg == "mixvpr":
            return MixVPR(out_channels=self.features_dim, name="mixvpr")(x)
        if agg == "rrm":
            return RRM(self.features_dim, name="rrm")(x)
        if agg == "netvlad":
            return NetVLAD(self.netvlad_clusters, self.features_dim,
                           name="netvlad")(x)
        if agg == "crn":
            return CRN(self.netvlad_clusters, self.features_dim,
                       name="crn")(x)
        raise NotImplementedError(f"aggregation={agg}")
