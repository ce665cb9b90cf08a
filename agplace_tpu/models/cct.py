"""Compact Convolutional Transformer (CCT) backbone — reference vendors
SHI-Labs' CCT (``/root/reference/model/cct/cct.py:32-360``,
``transformers.py``), used via ``--backbone cct384`` with cls/seqpool/
netvlad/gem aggregation.  ``cct_14_7x2_384``: 2-conv 7x7 tokenizer, 14
transformer layers, dim 384, sinusoidal positional embedding, stochastic
depth, sequence pooling head.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_embedding(n_channels: int, dim: int) -> np.ndarray:
    """CCT's fixed sinusoidal positional embedding (``cct.py``)."""
    pe = np.array([
        [p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)]
        for p in range(n_channels)
    ])
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None].astype(np.float32)


class CCTTokenizer(nn.Module):
    """n_conv_layers of [Conv kxk stride s -> ReLU -> MaxPool 3x3/2]
    (``model/cct/tokenizer.py``)."""

    embed_dim: int = 384
    kernel_size: int = 7
    stride: int = 2
    n_conv_layers: int = 2

    @nn.compact
    def __call__(self, x):
        ch = [self.embed_dim // (2 ** (self.n_conv_layers - 1 - i))
              for i in range(self.n_conv_layers)]
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
    seq_len_hint: int = 96 * 96  # upper bound for pos-embed table
    train: bool = False

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3]
        tokens = CCTTokenizer(self.embed_dim, name="tokenizer")(x)
        b, n, c = tokens.shape
        pe = sinusoidal_embedding(n, c)
        tokens = tokens + jnp.asarray(pe)

        # stochastic depth: linearly increasing drop rate per layer; at
        # train time residual branches are dropped per-sample
        dpr = np.linspace(0, self.stochastic_depth, self.num_layers)
        for i in range(self.num_layers):
            y = nn.LayerNorm(name=f"ln1_{i}")(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn_{i}")(y, y)
            y = self._drop_path(y, dpr[i], f"dp1_{i}")
            tokens = tokens + y
            y = nn.LayerNorm(name=f"ln2_{i}")(tokens)
            y = nn.Dense(int(c * self.mlp_ratio), name=f"mlp1_{i}")(y)
            y = nn.Dense(c, name=f"mlp2_{i}")(nn.gelu(y))
            y = self._drop_path(y, dpr[i], f"dp2_{i}")
            tokens = tokens + y
        tokens = nn.LayerNorm(name="ln_f")(tokens)

        # sequence pooling (``cct.py`` SeqPool): attention-weighted sum
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
