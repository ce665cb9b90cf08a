"""Device-mesh utilities — the framework's scale-out substrate.

The reference's only parallelism is single-process DataParallel + a vendored
SyncBN (SURVEY.md §2.5).  Here scale-out is declarative: a ``Mesh`` with a
``data`` axis (batch sharding; BN stats are global automatically under GSPMD)
and a ``gallery`` axis (retrieval database sharding for 100k+ tile galleries).
Collectives ride ICI; code is identical from 1 chip to a pod.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agplace_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    gp = max(cfg.gallery_parallel, 1)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // gp
    assert dp * gp <= n, f"mesh {dp}x{gp} > {n} devices"
    dev_array = np.array(devices[: dp * gp]).reshape(dp, gp)
    return Mesh(dev_array, (cfg.data_axis, cfg.gallery_axis))


def resolve_data_mesh(cfg: Optional[MeshConfig],
                      batch_sizes: Sequence[int] = (),
                      devices: Optional[Sequence[jax.Device]] = None
                      ) -> Optional[Mesh]:
    """Data-parallel mesh for the live drivers, or None for single-device.

    ``data_parallel=-1`` means "all available devices".  The resolved way is
    clamped to the largest value that divides every batch size in
    ``batch_sizes`` (fixed-shape batches must split evenly over the axis).
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    dp = cfg.data_parallel if cfg.data_parallel > 0 else len(devices)
    dp = min(dp, len(devices))
    while dp > 1 and any(b % dp for b in batch_sizes):
        dp -= 1
    if dp <= 1:
        return None
    return make_mesh(
        MeshConfig(data_axis=cfg.data_axis, gallery_axis=cfg.gallery_axis,
                   data_parallel=dp, gallery_parallel=1),
        devices=devices[:dp])


def resolve_gallery_mesh(cfg: Optional[MeshConfig],
                         devices: Optional[Sequence[jax.Device]] = None
                         ) -> Optional[Mesh]:
    """Gallery-sharded retrieval mesh (``gallery_parallel=-1`` = all
    devices), or None when retrieval stays single-device."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    gp = cfg.gallery_parallel if cfg.gallery_parallel != -1 else len(devices)
    gp = min(gp, len(devices))
    if gp <= 1:
        return None
    return make_mesh(
        MeshConfig(data_axis=cfg.data_axis, gallery_axis=cfg.gallery_axis,
                   data_parallel=1, gallery_parallel=gp),
        devices=devices[:gp])


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Place a host batch on the mesh with the leading dim sharded over
    ``axis`` (and everything else replicated).  Works on pytrees including
    SparseVoxels."""
    def put(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, NamedSharding(
            mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
