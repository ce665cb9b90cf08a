"""Compact Convolutional Transformer (CCT) backbone — reference vendors
SHI-Labs' CCT (``/root/reference/model/cct/cct.py:32-360``,
``transformers.py``), used via ``--backbone cct384`` with cls/seqpool/
netvlad/gem aggregation.  ``cct_14_7x2_384``: 2-conv 7x7 tokenizer, 14
transformer layers, dim 384, LEARNABLE positional embedding
(``cct.py:342-349``), stochastic depth, sequence pooling head.

Encoder layer follows ``transformers.py:96-99`` exactly:

    src = src + drop_path(self_attn(pre_norm(src)))
    src = norm1(src)                       # post-attention STREAM norm
    src = src + drop_path(linear2(gelu(linear1(src))))

with fused no-bias qkv attention (``transformers.py:18-34``).  Weight
converter: ``utils/torch_convert.convert_cct``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_embedding(n_channels: int, dim: int) -> np.ndarray:
    """CCT's fixed sinusoidal positional embedding (``cct.py`` sine
    variants)."""
    pe = np.array([
        [p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)]
        for p in range(n_channels)
    ])
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None].astype(np.float32)


class CCTTokenizer(nn.Module):
    """n_conv_layers of [Conv kxk stride s -> ReLU -> MaxPool 3x3/2]
    (``model/cct/tokenizer.py:23-34``)."""

    embed_dim: int = 384
    kernel_size: int = 7
    stride: int = 2
    n_conv_layers: int = 2
    in_planes: int = 64  # intermediate conv width (tokenizer.py:13,19-21)

    @nn.compact
    def __call__(self, x):
        # reference channel schedule: [3] + [in_planes]*(n-1) + [embed_dim]
        # (n_filter_list, tokenizer.py:19-21) — cct_14_7x2_384 tokenizes
        # 3 -> 64 -> 384, NOT a halving ladder
        ch = [self.in_planes] * (self.n_conv_layers - 1) + [self.embed_dim]
        for i in range(self.n_conv_layers):
            x = nn.Conv(ch[i], (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride),
                        padding=self.kernel_size // 2, use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class CCT(nn.Module):
    """cct_14_7x2_384-shaped model returning (tokens, seqpool_vector)."""

    embed_dim: int = 384
    num_layers: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    stochastic_depth: float = 0.1
    positional_embedding: str = "learnable"  # learnable | sine (cct.py:343)
    train: bool = False

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3]
        c = self.embed_dim
        h = self.num_heads
        hd = c // h
        tokens = CCTTokenizer(c, name="tokenizer")(x)
        b, n, _ = tokens.shape
        if self.positional_embedding == "learnable":
            pos = self.param("pos", nn.initializers.normal(0.2), (1, n, c))
        else:
            pos = jnp.asarray(sinusoidal_embedding(n, c))
        tokens = tokens + pos

        # stochastic depth: linearly increasing drop rate per layer; at
        # train time residual branches are dropped per-sample
        dpr = np.linspace(0, self.stochastic_depth, self.num_layers)
        scale = hd ** -0.5
        for i in range(self.num_layers):
            # attention branch on pre-normed input (transformers.py:96)
            y = nn.LayerNorm(epsilon=1e-5, name=f"pre_norm_{i}")(tokens)
            qkv = nn.Dense(3 * c, use_bias=False, name=f"qkv_{i}")(y)
            qkv = qkv.reshape(b, n, 3, h, hd)
            q, k, v = (qkv[:, :, j] for j in range(3))
            attn = jax.nn.softmax(
                jnp.einsum("bnhd,bmhd->bhnm", q, k,
                           preferred_element_type=jnp.float32) * scale,
                axis=-1)
            y = jnp.einsum("bhnm,bmhd->bnhd", attn,
                           v.astype(jnp.float32)).reshape(b, n, c)
            y = nn.Dense(c, name=f"proj_{i}")(y.astype(tokens.dtype))
            tokens = tokens + self._drop_path(y, dpr[i], f"dp1_{i}")
            # post-attention STREAM norm, then the MLP (transformers.py:97-99)
            tokens = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(tokens)
            y = nn.Dense(int(c * self.mlp_ratio), name=f"mlp1_{i}")(tokens)
            y = nn.Dense(c, name=f"mlp2_{i}")(nn.gelu(y))
            tokens = tokens + self._drop_path(y, dpr[i], f"dp2_{i}")
        tokens = nn.LayerNorm(epsilon=1e-5, name="ln_f")(tokens)

        # sequence pooling (``transformers.py:163,199-201``):
        # softmax(attention_pool(x))^T @ x
        attn = nn.Dense(1, name="attention_pool")(tokens)  # [B, N, 1]
        attn = jax.nn.softmax(attn, axis=1)
        pooled = jnp.sum(attn * tokens, axis=1)  # [B, C]
        return tokens, pooled

    def _drop_path(self, y, rate, name):
        if not self.train or rate == 0.0:
            return y
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - rate, (y.shape[0], 1, 1))
        return y * keep / (1.0 - rate)
