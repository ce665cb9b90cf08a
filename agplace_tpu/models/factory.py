"""Model factory — the reference's ``models/model_factory.py`` is DEAD
(broken imports, SURVEY.md §2.3); this is the working equivalent mapping the
``--modelq`` / ``--modeldb`` / ``--backbone`` surface to modules.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
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
            trunc_te=cfg.model.trunc_te,
            train=train, axis_name=axis_name)
    raise NotImplementedError(f"modelq={name}")


def db_map_batched(db_map, embed_flat):
    """The db tower's 5D (cache/test) / 6D (train) entry handling, shared
    by ``shared_db_apply`` and ``GeoDB``: flatten B*NDB*NMAP maps into one
    image batch, embed via ``embed_flat`` ([N,H,W,C] -> [N,D]), per-map
    L2-normalise, mean over map types, restore the entry shape
    (``dbvanilla2d.py:52-83`` semantics)."""
    import jax.numpy as jnp

    nd = db_map.ndim
    if nd == 5:
        db_map = db_map[:, None]
    b, ndb, nmap, h, w, c = db_map.shape
    emb = embed_flat(db_map.reshape(b * ndb * nmap, h, w, c))
    emb = emb.reshape(b * ndb, nmap, -1)
    emb = emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    emb = jnp.mean(emb, axis=1).reshape(b, ndb, -1)
    return emb[:, 0] if nd == 5 else emb


def shared_db_apply(modelq: str, model, variables, db_map,
                    mutable: bool = False):
    """``--share_qdb``: embed aerial maps with the QUERY tower
    (``train.py:193-196``).  Handles the 5D/6D entries like DBVanilla2D
    (per-map L2 then mean over map types).  Only coherent for image-only
    query towers — the reference itself crashes with MM
    (``network_mm/mm.py:165-170``)."""
    if modelq != "geoloc":
        raise NotImplementedError(
            "share_qdb needs an image-only query tower (modelq='geoloc'); "
            "the reference MM raises NotImplementedError identically")
    mut = {}

    def embed_flat(flat):
        nonlocal mut
        if mutable:
            out, mut = model.apply(variables, flat, mutable=["batch_stats"])
        else:
            out = model.apply(variables, flat)
        return out["embedding"] if isinstance(out, dict) else out

    emb = db_map_batched(db_map, embed_flat)
    return emb, mut


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
        return GeoDB(cfg=cfg, train=train, axis_name=axis_name)
    raise NotImplementedError(f"modeldb={name}")


class GeoDB(nn.Module):
    """GeoLocalizationNet as the aerial tower: handles the db tower's 5D
    (cache/test) and 6D (train) entries like DBVanilla2D — flatten the
    B*NDB*NMAP maps into one batch, embed, per-map L2, mean over map types."""

    cfg: Config
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, db_map):
        from agplace_tpu.models.geoloc import GeoLocalizationNet

        net = GeoLocalizationNet(
            backbone=self.cfg.model.backbone,
            aggregation=self.cfg.model.aggregation,
            features_dim=self.cfg.model.features_dim,
            netvlad_clusters=self.cfg.model.netvlad_clusters,
            fc_output_dim=self.cfg.model.fc_output_dim,
            l2=self.cfg.model.l2,
            trunc_te=self.cfg.model.trunc_te,
            train=self.train, axis_name=self.axis_name,
            name="net")
        return db_map_batched(db_map, net)
