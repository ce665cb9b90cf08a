"""AnyLoc / DINO toolkit — reference ``/root/reference/anyloc/``
(``dino_extractor.py:49-367``, ``utilities.py:219-294,630-1016``), rebuilt
TPU-native: a flax ViT feature extractor with facet taps (query / key /
value / token at any layer, the reference implements these as forward hooks)
and a VLAD aggregator whose vocabulary is fitted with the in-repo JAX k-means
(the reference uses faiss).  This is BASELINE.json config 3
("DINO-ViT / AnyLoc backbone with NetVLAD aggregation head").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agplace_tpu.retrieval.kmeans import kmeans
from agplace_tpu.retrieval.knn import ip_topk, l2_topk
from agplace_tpu.retrieval.recall import compute_recalls

_VIT_FACETS = ("query", "key", "value", "token", "attn")


class ViTExtractor(nn.Module):
    """DINO-style ViT patch-feature extractor (``dino_extractor.py:49-193``).

    Returns the requested facet's patch features at ``layer``:
        token  -> block output tokens            [B, N, D]
        query/key/value -> that projection's heads, concatenated [B, N, D]

    ``stride`` < patch implements the reference's stride-patching trick
    (denser feature maps from the same weights); positional embeddings are
    bilinearly resized to match (``dino_extractor.py:96-135``).
    """

    hidden: int = 384  # vit-small
    depth: int = 12
    heads: int = 6
    patch: int = 16
    stride: int = 16
    layer: int = 11
    facet: str = "token"

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:  # [B, H, W, 3]
        assert self.facet in _VIT_FACETS
        b, h, w, _ = x.shape
        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.stride, self.stride), padding="VALID",
                    name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.hidden)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.hidden))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)

        # pos embed at the native grid, resized for stride-patching
        native = 224 // self.patch
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, native * native + 1, self.hidden))
        if (gh, gw) != (native, native):
            grid = pos[:, 1:].reshape(1, native, native, self.hidden)
            grid = jax.image.resize(grid, (1, gh, gw, self.hidden),
                                    method="bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, self.hidden)], axis=1)
        x = x + pos

        out = None
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            d_head = self.hidden // self.heads
            q = nn.Dense(self.hidden, name=f"q_{i}")(y)
            k = nn.Dense(self.hidden, name=f"k_{i}")(y)
            v = nn.Dense(self.hidden, name=f"v_{i}")(y)
            if i == self.layer and self.facet in ("query", "key", "value"):
                out = {"query": q, "key": k, "value": v}[self.facet]
            qh = q.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
            kh = k.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
            vh = v.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
            attn = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                           preferred_element_type=jnp.float32)
                / jnp.sqrt(d_head), axis=-1)
            if i == self.layer and self.facet == "attn":
                out = attn.mean(axis=1)  # [B, N, N]
            o = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                           preferred_element_type=jnp.float32)
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, self.hidden)
            x = x + nn.Dense(self.hidden, name=f"proj_{i}")(o)
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(self.hidden * 4, name=f"mlp1_{i}")(y)
            x = x + nn.Dense(self.hidden, name=f"mlp2_{i}")(nn.gelu(y))
            if i == self.layer and self.facet == "token":
                out = x
        if out is None:  # layer beyond depth: final tokens
            out = x
        if self.facet != "attn":
            out = out[:, 1:]  # drop CLS: patch descriptors only
        return out


class _TappedAttention(nn.Module):
    """Multi-head self-attention with the q/k/v projections exposed.

    Parameter tree matches ``flax.linen.MultiHeadDotProductAttention``
    (query/key/value/out DenseGenerals), so ``convert_vit_b16`` checkpoints
    (utils/torch_convert.py) drop straight in.
    """

    heads: int

    @nn.compact
    def __call__(self, y):
        hidden = y.shape[-1]
        hd = hidden // self.heads
        q = nn.DenseGeneral((self.heads, hd), name="query")(y)
        k = nn.DenseGeneral((self.heads, hd), name="key")(y)
        v = nn.DenseGeneral((self.heads, hd), name="value")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32)
            / jnp.sqrt(hd).astype(y.dtype), axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                       preferred_element_type=jnp.float32).astype(y.dtype)
        out = nn.DenseGeneral(hidden, axis=(-2, -1), name="out")(o)
        b, n = y.shape[:2]
        taps = {f: t.reshape(b, n, hidden) for f, t in
                (("query", q), ("key", k), ("value", v))}
        return out, taps


class CosPlaceViTExtractFeatures(nn.Module):
    """CosPlace-ViT intermediate-layer extractor
    (``/root/reference/anyloc/utilities.py:134-211``): the reference wraps
    an HF ``ViTModel`` (default ``ViTConfig``: ViT-B/16) loaded from a
    CosPlace checkpoint and taps ``layer``'s query/key/value projection or
    the block's output tokens via forward hooks.  Here the taps are plain
    returns — and the encoder stops at ``layer`` instead of running the
    remaining blocks whose outputs the reference discards.

    Weights: ``utils/torch_convert.convert_vit_b16`` on the HF state_dict
    (same param tree as ``models/geoloc.ViTBackbone``; the unused deeper
    layers in the converted tree are simply ignored).
    """

    hidden: int = 768  # hft.ViTConfig() defaults (utilities.py:150)
    heads: int = 12
    patch: int = 16
    layer: int = 11
    facet: str = "token"
    use_cls: bool = False
    norm_descs: bool = True
    ln_eps: float = 1e-12  # HF ViT layer_norm_eps

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] NHWC
        assert self.facet in ("query", "key", "value", "token"), self.facet
        b = x.shape[0]
        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="embed")(x)
        x = x.reshape(b, -1, self.hidden)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.hidden))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.hidden))
        x = x + pos
        out = None
        for i in range(self.layer + 1):
            y = nn.LayerNorm(epsilon=self.ln_eps, name=f"ln1_{i}")(x)
            y, taps = _TappedAttention(heads=self.heads,
                                       name=f"attn_{i}")(y)
            if i == self.layer and self.facet != "token":
                out = taps[self.facet]
            x = x + y
            y = nn.LayerNorm(epsilon=self.ln_eps, name=f"ln2_{i}")(x)
            y = nn.Dense(self.hidden * 4, name=f"mlp1_{i}")(y)
            y = nn.Dense(self.hidden, name=f"mlp2_{i}")(nn.gelu(y))
            x = x + y
            if i == self.layer and self.facet == "token":
                out = x
        if not self.use_cls:
            out = out[:, 1:]  # patch descriptors only (utilities.py:205)
        if self.norm_descs:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out


# -------------- MAE 2D sine-cosine position embedding --------------
# Reference vendors these from facebookresearch/mae
# (``/root/reference/anyloc/utilities.py:315-391``); rebuilt here from the
# published formulation.

def get_1d_sincos_pos_embed_from_grid(embed_dim: int,
                                      pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] with sin in the first half of the
    channel dim and cos in the second (``utilities.py:344-362``)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", np.asarray(pos).reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int,
                                      grid: np.ndarray) -> np.ndarray:
    """grid[0]=h rows, grid[1]=w rows -> [H*W, embed_dim], h-encoding in
    the first half (``utilities.py:333-341``)."""
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """[grid*grid(+1), embed_dim]; w varies fastest (np.meshgrid with w
    first, ``utilities.py:315-330``); an all-zero row is prepended for the
    CLS token."""
    coords = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(coords, coords), axis=0)  # w first
    grid = grid.reshape(2, 1, grid_size, grid_size)
    pe = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token:
        pe = np.concatenate([np.zeros((1, embed_dim)), pe], axis=0)
    return pe


def interpolate_pos_embed(pos_embed: np.ndarray, num_patches: int,
                          num_extra_tokens: int = 1) -> np.ndarray:
    """Resize a ViT positional embedding [1, extra+N_old, D] to
    [1, extra+num_patches, D] (``utilities.py:370-391``): the extra
    (CLS/dist) tokens pass through unchanged, the patch grid is
    bicubic-resampled.  The reference mutates an MAE checkpoint dict in
    place, deriving ``num_extra_tokens`` from the model (:375); here it is
    a pure array function taking that count directly.
    """
    pos_embed = np.asarray(pos_embed, np.float32)
    n_tok, dim = pos_embed.shape[-2], pos_embed.shape[-1]
    orig_size = int((n_tok - num_extra_tokens) ** 0.5)
    new_size = int(num_patches ** 0.5)
    if orig_size == new_size:
        return pos_embed
    extra_tokens = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(
        1, orig_size, orig_size, dim)
    grid = jax.image.resize(jnp.asarray(grid),
                            (1, new_size, new_size, dim), method="bicubic")
    grid = np.asarray(grid).reshape(1, new_size * new_size, dim)
    return np.concatenate([extra_tokens, grid], axis=1)


class DinoV2ExtractFeatures(nn.Module):
    """DINOv2-style extractor (``utilities.py:219-294``): same tap mechanism,
    defaults sized like vit-base/14."""

    hidden: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 14
    layer: int = 11
    facet: str = "token"

    @nn.compact
    def __call__(self, x):
        return ViTExtractor(hidden=self.hidden, depth=self.depth,
                            heads=self.heads, patch=self.patch,
                            stride=self.patch, layer=self.layer,
                            facet=self.facet, name="vit")(x)


class VLAD:
    """VLAD aggregation over patch descriptors (``utilities.py:630-1016``):
    k-means vocabulary (cosine or euclidean), hard or soft assignment,
    intra-normalisation, optional descriptor normalisation, disk cache.
    """

    def __init__(self, num_clusters: int, desc_dim: Optional[int] = None,
                 intra_norm: bool = True, norm_descs: bool = True,
                 dist_mode: str = "cosine", vlad_mode: str = "hard",
                 soft_temp: float = 1.0, cache_dir: Optional[str] = None):
        assert vlad_mode in ("soft", "hard")
        assert dist_mode in ("cosine", "euclidean")
        self.num_clusters = num_clusters
        self.desc_dim = desc_dim
        self.intra_norm = intra_norm
        self.norm_descs = norm_descs
        self.mode = dist_mode
        self.vlad_mode = vlad_mode
        self.soft_temp = soft_temp
        self.c_centers: Optional[np.ndarray] = None
        self.cache_dir = cache_dir

    def _norm(self, d: np.ndarray) -> np.ndarray:
        return d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True),
                              1e-12)

    def fit(self, train_descs: Optional[np.ndarray], seed: int = 0):
        """k-means vocabulary (the reference uses fast-pytorch-kmeans with
        the same dist_mode; here the JAX Lloyd solver)."""
        if train_descs is None:
            cc = self._load_cache()
            if cc is None:
                raise ValueError("no training descriptors and no cache")
            self.c_centers = cc
            return self
        d = np.asarray(train_descs, np.float32)
        if self.norm_descs:
            d = self._norm(d)
        fit_d = self._norm(d) if self.mode == "cosine" else d
        centers, _ = kmeans(jax.random.PRNGKey(seed), jnp.asarray(fit_d),
                            self.num_clusters)
        self.c_centers = np.asarray(centers)
        self.desc_dim = d.shape[-1]
        self._save_cache()
        return self

    def fit_and_generate(self, train_descs: np.ndarray) -> np.ndarray:
        """Fit on the stacked descriptors then generate one VLAD per item
        (``utilities.py:799-823``)."""
        stacked = np.concatenate([np.asarray(t) for t in train_descs])
        self.fit(stacked)
        return self.generate_multi(train_descs)

    def generate(self, query_descs: np.ndarray) -> np.ndarray:
        """[N, D] patch descriptors -> [K*D] VLAD (``utilities.py:824-923``).

        Reference-exact, including two quirks of the shipped code
        (oracle-pinned in tests/test_torch_aggregation_oracle.py):

        * hard labels come from ``kmeans.predict`` on the RAW descriptors
          (``:905``) while residuals use the ``norm_descs``-normalised
          ones (``:965-968``) — visible only in euclidean mode;
        * the soft branch's ``rearrange(w * residuals, "q c d -> (q c) d")
          .sum(0)`` (``:913-916``) sums residuals to ALL centers weighted
          by the cluster-k assignment, i.e. vlad[k] = sum_q soft[q, k] *
          (C * d_q - sum_c center_c), not the per-center residual sum.
        """
        assert self.c_centers is not None, "fit first"
        raw = np.asarray(query_descs, np.float32)
        d = self._norm(raw) if self.norm_descs else raw
        residuals = d[:, None, :] - self.c_centers[None]  # [N, K, D]
        if self.vlad_mode == "hard":
            if self.mode == "cosine":
                sim = self._norm(raw) @ self._norm(self.c_centers).T
                labels = np.argmax(sim, axis=-1)
            else:
                d2 = ((raw[:, None] - self.c_centers[None]) ** 2).sum(-1)
                labels = np.argmin(d2, axis=-1)
            assign = np.eye(self.num_clusters, dtype=np.float32)[labels]
            vlad = (assign[..., None] * residuals).sum(axis=0)  # [K, D]
        else:
            sim = self._norm(raw) @ self._norm(self.c_centers).T
            e = np.exp(self.soft_temp * sim)
            assign = e / e.sum(-1, keepdims=True)
            # the (q c) d quirk: every cluster's residual contributes
            res_all = residuals.sum(axis=1)  # [N, D]
            vlad = assign.T @ res_all  # [K, D]
        if self.intra_norm:
            vlad = self._norm(vlad)
        vlad = vlad.reshape(-1)
        return vlad / max(np.linalg.norm(vlad), 1e-12)

    def generate_multi(self, multi_descs: Sequence[np.ndarray]) -> np.ndarray:
        return np.stack([self.generate(d) for d in multi_descs])

    # cache (``utilities.py:694-753``) -------------------------------------
    def _cache_path(self):
        import os

        if self.cache_dir is None:
            return None
        os.makedirs(self.cache_dir, exist_ok=True)
        return f"{self.cache_dir}/c_centers.npy"

    def _save_cache(self):
        p = self._cache_path()
        if p is not None:
            np.save(p, self.c_centers)

    def _load_cache(self):
        import os

        p = self._cache_path()
        if p is not None and os.path.exists(p):
            return np.load(p)
        return None


def get_top_k_recall(top_k: Sequence[int], db: np.ndarray, qu: np.ndarray,
                     gt_pos: Sequence[np.ndarray], method: str = "cosine"
                     ) -> Tuple[np.ndarray, np.ndarray, Dict[int, float]]:
    """AnyLoc's recall utility (``utilities.py:396-477``): top-k search
    (cosine similarity or L2) + per-k recall dict.  faiss replaced by the
    MXU retrieval engine."""
    k = max(top_k)
    if method == "cosine":
        dists, indices = ip_topk(jnp.asarray(qu), jnp.asarray(db), k)
    else:
        dists, indices = l2_topk(jnp.asarray(qu), jnp.asarray(db), k)
    indices = np.asarray(indices)
    recalls_arr, _ = compute_recalls(indices, gt_pos, top_k)
    recalls = {n: r / 100.0 for n, r in zip(top_k, recalls_arr)}
    return np.asarray(dists), indices, recalls
