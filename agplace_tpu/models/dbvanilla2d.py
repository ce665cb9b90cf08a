"""Aerial/database tower — reference ``models_baseline/dbvanilla2d.py:31-113``.

Per map type (satellite / roadmap / ...): truncated ResNet18 -> GeM ->
MLP(last_dim -> dim); per-map L2-normalise then mean over map types.

TPU-native differences:
* input is NHWC ``[B, NDB, NMAP, H, W, 3]`` (train) or ``[B, NMAP, H, W, 3]``
  (cache/test) — the two compiled entry points mirror the reference's 5D/6D
  dispatch (``dbvanilla2d.py:52-63``);
* the B*NDB*NMAP images are folded into one big batch so the whole tower is a
  single large-batch conv stack on the MXU (the reference loops per map type).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from agplace_tpu.config import DBConfig
from agplace_tpu.models.image_fe import ImageFE
from agplace_tpu.models.pooling import GeM


class MLP(nn.Module):
    """Linear -> LayerNorm -> ReLU -> Linear (``dbvanilla2d.py:17-28``)."""

    output_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_dim, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)  # torch LN default eps
        x = nn.relu(x)
        return nn.Dense(self.output_dim, name="fc2")(x)


class DBVanilla2D(nn.Module):
    config: DBConfig
    dim: int = 256
    nmap: int = 1
    output_l2: bool = True
    final_l2: bool = False
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, db_map: jnp.ndarray) -> jnp.ndarray:
        """db_map: [B, NDB, NMAP, H, W, 3] -> [B, NDB, dim]  (train)
                or [B, NMAP, H, W, 3]      -> [B, dim]       (cache/test)."""
        cfg = self.config
        if db_map.ndim == 5:
            mode = "cachetest"
            db_map = db_map[:, None]  # [B, 1, NMAP, H, W, 3]
        elif db_map.ndim == 6:
            mode = "train"
        else:
            raise ValueError(f"db_map ndim {db_map.ndim}")
        b, ndb, nmap, h, w, c = db_map.shape
        assert c == 3 and nmap == self.nmap

        n_branches = 1 if cfg.share_dbfe else nmap
        fes = [
            ImageFE(fe_type=cfg.image_fe, layers=cfg.image_fe_layers,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype, use_pallas_stem=cfg.stem_pallas,
                    name=f"fe_{i}")
            for i in range(n_branches)
        ]
        pools = [GeM(name=f"pool_{i}") for i in range(n_branches)]
        mlps = [MLP(self.dim, name=f"mlp_{i}") for i in range(n_branches)]
        vecs = []
        for i in range(nmap):
            branch = 0 if cfg.share_dbfe else i
            imgs = db_map[:, :, i].reshape(b * ndb, h, w, c)
            featmap, _ = fes[branch](imgs)
            vec = pools[branch](featmap)  # [B*NDB, C]
            vec = mlps[branch](vec)  # [B*NDB, dim]
            vecs.append(vec)
        out = jnp.stack(vecs, axis=1)  # [B*NDB, NMAP, dim]
        if self.output_l2:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        out = jnp.mean(out, axis=1)  # mean over map types (dbvanilla2d.py:83)
        out = out.reshape(b, ndb, self.dim)
        if self.final_l2:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        if mode == "cachetest":
            out = out[:, 0]  # [B, dim]
        return out
