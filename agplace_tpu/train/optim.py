"""Optimizers: per-group-LR Adam via an optax label partition.

The reference builds two Adam optimizers — one for the aerial tower at lrdb,
one for the query tower with per-module groups: the voxel branch at lrpc and
everything else at lr (``/root/reference/train.py:173-214``).  Here that is a
single labelled ``optax.multi_transform`` over the combined param tree
{"mm": ..., "db": ...}, which lets one jitted train step drive both towers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from agplace_tpu.config import TrainConfig

# query-tower modules trained at the point-cloud LR (train.py:177-178,183)
_PC_MODULES = ("vox_fe", "vox_pool")
_PC_WEIGHTS = ("vox_weight",)


def label_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """'db' for the aerial tower, 'pc' for the voxel branch of the query
    tower, 'base' for the rest."""

    def label_of(path) -> str:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if keys and keys[0] == "db":
            return "db"
        if len(keys) >= 2 and keys[0] == "mm":
            if keys[1] in _PC_MODULES or keys[1] in _PC_WEIGHTS:
                return "pc"
        return "base"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_of(path), params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optim == "adam":
        make = lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optim == "sgd":
        make = lambda lr: optax.sgd(lr)
    else:
        raise NotImplementedError(cfg.optim)

    transforms = {
        "base": make(cfg.lr) if cfg.train_modelq else optax.set_to_zero(),
        "pc": make(cfg.lrpc) if cfg.train_modelq else optax.set_to_zero(),
        "db": make(cfg.lrdb) if cfg.train_modeldb else optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, label_params)
