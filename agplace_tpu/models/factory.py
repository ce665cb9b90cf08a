"""Model factory — the reference's ``models/model_factory.py`` is DEAD
(broken imports, SURVEY.md §2.3); this is the working equivalent mapping the
``--modelq`` / ``--modeldb`` / ``--backbone`` surface to modules.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from agplace_tpu.config import Config


def make_query_model(cfg: Config, train: bool = False,
                     axis_name: Optional[str] = None):
    """--modelq: mm (live) | minkloc | minkloc_multimodal | geoloc."""
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" \
        else jnp.float32
    name = cfg.model.modelq
    if name == "mm":
        from agplace_tpu.models.mm import MM

        return MM(config=cfg.model.mm, train=train, axis_name=axis_name,
                  dtype=dtype)
    if name == "minkloc":
        from agplace_tpu.models.minkloc import MinkLoc

        return MinkLoc(feature_size=cfg.model.features_dim,
                       output_dim=cfg.model.features_dim,
                       train=train, axis_name=axis_name)
    if name == "minkloc_multimodal":
        from agplace_tpu.models.minkloc import MinkLocMultimodal

        return MinkLocMultimodal(
            cloud_fe_size=cfg.model.features_dim,
            image_fe_size=cfg.model.features_dim,
            output_dim=2 * cfg.model.features_dim,
            train=train, axis_name=axis_name)
    if name == "geoloc":
        from agplace_tpu.models.geoloc import GeoLocalizationNet

        return GeoLocalizationNet(
            backbone=cfg.model.backbone,
            aggregation=cfg.model.aggregation,
            features_dim=cfg.model.features_dim,
            netvlad_clusters=cfg.model.netvlad_clusters,
            fc_output_dim=cfg.model.fc_output_dim,
            l2=cfg.model.l2,
            train=train, axis_name=axis_name)
    raise NotImplementedError(f"modelq={name}")


def query_args(modelq: str, image, vox) -> tuple:
    """Positional args for a query tower built by ``make_query_model``:
    mm(image, vox) | minkloc(vox) | minkloc_multimodal(vox, image) |
    geoloc(image)."""
    if modelq == "mm":
        return (image, vox)
    if modelq == "minkloc":
        return (vox,)
    if modelq == "minkloc_multimodal":
        return (vox, image)
    if modelq == "geoloc":
        return (image,)
    raise NotImplementedError(f"modelq={modelq}")


def query_apply(modelq: str, model, variables, image, vox,
                mutable: bool = False):
    """Normalised forward: returns (out_dict with 'embedding', mutated_vars).
    Towers that return a bare array (geoloc) are wrapped."""
    args = query_args(modelq, image, vox)
    if mutable:
        out, mut = model.apply(variables, *args, mutable=["batch_stats"])
    else:
        out, mut = model.apply(variables, *args), {}
    if not isinstance(out, dict):
        out = {"embedding": out}
    return out, mut


def query_init(modelq: str, model, rng, image, vox):
    return model.init(rng, *query_args(modelq, image, vox))


def make_db_model(cfg: Config, train: bool = False,
                  axis_name: Optional[str] = None):
    """--modeldb: vanilla2d (live) | geoloc."""
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" \
        else jnp.float32
    name = cfg.model.db.modeldb
    if name == "vanilla2d":
        from agplace_tpu.models.dbvanilla2d import DBVanilla2D

        return DBVanilla2D(
            config=cfg.model.db,
            dim=cfg.model.features_dim,
            nmap=cfg.data.nmap,
            output_l2=cfg.model.mm.output_l2,
            final_l2=cfg.model.mm.final_l2,
            train=train, axis_name=axis_name, dtype=dtype)
    if name == "geoloc":
        from agplace_tpu.models.geoloc import GeoLocalizationNet

        return GeoLocalizationNet(
            backbone=cfg.model.backbone,
            aggregation=cfg.model.aggregation,
            features_dim=cfg.model.features_dim,
            train=train, axis_name=axis_name)
    raise NotImplementedError(f"modeldb={name}")
