"""The jitted training / inference steps.

One ``train_step`` covers what the reference does per batch at
``/root/reference/train.py:301-341``: both tower forwards, the geo-BCE
"other" loss, the triplet loss over mined indices, backward, and both Adam
updates — all fused into a single XLA program with donated state.

Batch layout (fixed shapes; collate builds it):
    query_image:     [B, H, W, 3]
    vox:             SparseVoxels (query point clouds)
    query_eastnorth: [B, 2]
    db_map:          [B, 1+nneg, NMAP, H, W, 3]
    db_eastnorth:    [B, 1+nneg, 2]
    triplets_local:  [B*nneg, 3] int32  (indices into the flattened
                     [B*(2+nneg), C] feature matrix, query-first layout as in
                     the reference collate, ``kitti360:130-131``)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from agplace_tpu.config import Config
from agplace_tpu.models.factory import (
    make_db_model,
    make_query_model,
    query_apply,
    query_init,
    shared_db_apply,
)
from agplace_tpu.sparse.voxels import SparseVoxels
from agplace_tpu.train.losses import (
    compute_other_loss,
    compute_sare_loss,
    compute_triplet_loss,
)
from agplace_tpu.train.optim import make_optimizer
from agplace_tpu.train.state import TrainState


def build_models(cfg: Config, train: bool):
    """Both towers from the factory (the 'mm' pytree key names the query
    tower regardless of ``modelq``, for checkpoint stability).  With
    ``share_qdb`` the db tower is the query tower itself (db=None here; the
    apply paths route through ``shared_db_apply``)."""
    q = make_query_model(cfg, train=train)
    db = None if cfg.model.share_qdb else make_db_model(cfg, train=train)
    return q, db


def _make_tx(cfg: Config):
    return make_optimizer(cfg.train,
                          crn=cfg.model.aggregation == "crn",
                          freeze_te=cfg.model.freeze_te)


def init_state(cfg: Config, rng: jax.Array, sample_batch,
               train_ds=None) -> TrainState:
    """Initialise both towers (+ optimizer).  When the query tower is the
    DVGLB family with a netvlad/crn aggregation and ``train_ds`` is given,
    the cluster parameters are initialised from dataset descriptors — the
    intended behaviour of ``/root/reference/train.py:156-161`` (which crashes
    on the live towers as shipped, SURVEY.md §7.5)."""
    mm, db = build_models(cfg, train=False)
    k1, k2 = jax.random.split(rng)
    mm_vars = query_init(cfg.model.modelq, mm, k1,
                         sample_batch["query_image"], sample_batch["vox"])
    if (cfg.model.modelq == "geoloc"
            and cfg.model.aggregation in ("netvlad", "crn")
            and train_ds is not None):
        from agplace_tpu.train.netvlad_init import (
            initialize_netvlad_from_dataset,
        )

        mm_vars = initialize_netvlad_from_dataset(
            cfg, mm_vars, train_ds, seed=cfg.train.seed)
    db_vars = ({"params": {}} if db is None
               else db.init(k2, sample_batch["db_map"]))
    if (db is not None and cfg.model.db.modeldb == "geoloc"
            and cfg.model.aggregation in ("netvlad", "crn")
            and train_ds is not None):
        # the reference inits the DB model's netvlad (train.py:156-161)
        from agplace_tpu.train.netvlad_init import (
            initialize_netvlad_from_dataset,
        )

        db_vars = initialize_netvlad_from_dataset(
            cfg, db_vars, train_ds, seed=cfg.train.seed, tower="db")
    params = {"mm": mm_vars["params"], "db": db_vars["params"]}
    batch_stats = {
        "mm": mm_vars.get("batch_stats", {}),
        "db": db_vars.get("batch_stats", {}),
    }
    if cfg.model.pretrained:
        params, batch_stats = apply_pretrained_backbones(
            cfg, params, batch_stats)
    tx = _make_tx(cfg)
    return TrainState.create(params, batch_stats, tx)


def template_state(cfg: Config, seed: int = 0):
    """A checkpoint-restore template built from a tiny synthetic world —
    evaluation/serving entries need the state's SHAPES, not real data, so
    paying a real-dataset walk + mining pass for the template is waste.
    Shapes depend only on cfg (models are shape-polymorphic over batch)."""
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner

    import numpy as np

    ds = SyntheticDataset(n_db=8, n_q=4, image_size=cfg.data.q_resize,
                          n_points=64, nmap=cfg.data.nmap, seed=seed)
    rng = np.random.default_rng(seed)
    rows = TripletMiner(cfg, ds).mine_random(
        rng, cfg.train.train_batch_size)
    batch = collate_train(ds, rows, cfg, rng)
    return init_state(cfg, jax.random.PRNGKey(seed), batch)


def merge_pretrained_subtree(dst: dict, src: dict, where: str,
                             dropped: list) -> dict:
    """Overlay converted-weights ``src`` onto model-template ``dst``
    WITHOUT changing ``dst``'s tree structure: only keys the template
    already has are replaced (fresh heads stay random-init; converter
    layers beyond the model's truncation — e.g. ViT/CCT encoder blocks
    past ``trunc_te`` — are dropped into ``dropped``).  Structure-
    preserving grafts keep checkpoint trees identical whether or not
    weights were mounted at init time; a leaf shape mismatch is a
    converter bug and raises."""
    out = {}
    for k, v in dst.items():
        if k not in src:
            out[k] = v
        elif isinstance(v, dict) and isinstance(src[k], dict):
            out[k] = merge_pretrained_subtree(
                v, src[k], f"{where}/{k}", dropped)
        else:
            new = jnp.asarray(src[k])
            if new.shape != v.shape:
                raise ValueError(
                    f"pretrained graft shape mismatch at {where}/{k}: "
                    f"model {v.shape} vs weights {new.shape}")
            out[k] = new
    dropped.extend(f"{where}/{k}" for k in src if k not in dst)
    return out


def apply_pretrained_backbones(cfg: Config, params, batch_stats):
    """Graft pretrained weights into every image backbone: the MM image
    branch (resnet18/34, convnext_tiny, squeezenet — the reference builds
    all of them ``pretrained=True``, ``network_mm/image_fe.py:14-56``),
    each DBVanilla2D map-type branch (``network/image_fe.py`` via
    ``dbvanilla2d.py:38``), and the geoloc backbone family (resnet / vgg16 /
    alexnet / HF ViT, ``model/network.py:113-191``).  No-op with a logged
    warning per backbone when no weight source exists (zero-egress host
    without a mounted dir; see ``scripts/fetch_weights.py``)."""
    import logging

    from agplace_tpu.utils.torch_convert import load_pretrained_backbone

    log = logging.getLogger("pretrained")
    loaded: dict = {}

    def get(arch: str, **kw):
        key = (arch, tuple(sorted(kw.items())))
        if key not in loaded:
            loaded[key] = load_pretrained_backbone(
                arch, cfg.model.pretrained_path, **kw)
            if loaded[key] is None:
                log.warning(
                    "no pretrained %s weights found (set AGPLACE_WEIGHTS or "
                    "model.pretrained_path; see scripts/fetch_weights.py); "
                    "%s backbones stay random-init", arch, arch)
        return loaded[key]

    merge = merge_pretrained_subtree

    def graft(tower: str, path, arch: str, **kw):
        got = get(arch, **kw)
        if got is None:
            return
        p, s = got
        dropped: list = []
        node_p = params[tower]
        for k in path[:-1]:
            node_p = node_p[k]
        node_p[path[-1]] = merge(node_p[path[-1]], p, path[-1], dropped)
        if s:  # BN-less backbones (vgg/convnext/vit/...) have no stats
            node_s = batch_stats[tower]
            for k in path[:-1]:
                node_s = node_s.setdefault(k, {})
            node_s[path[-1]] = merge(
                node_s.get(path[-1], {}), s, path[-1], dropped)
        log.info("loaded pretrained %s into %s/%s%s", arch, tower,
                 "/".join(path),
                 f" (dropped {len(dropped)} unused subtrees)"
                 if dropped else "")

    def graft_fe(tower: str, prefix, fe: str, layers):
        """One ImageFE instance (``{prefix}/fe`` subtree)."""
        if fe in ("resnet18", "resnet34", "resnet50"):
            graft(tower, prefix + ("fe",), fe, num_stages=len(layers))
        elif fe == "convnext_tiny":
            graft(tower, prefix + ("fe",), fe, layers=tuple(layers))
        elif fe in ("squeezenet10", "squeezenet11"):
            # the trunk only: the 1x1 512->256 head is fresh in the
            # reference too (image_fe.py:45-49) — merge() leaves the
            # random-init "fc" in place
            graft(tower, prefix + ("fe",), fe)

    def graft_geoloc(tower: str, prefix):
        from agplace_tpu.models.geoloc import _RESNET_BACKBONES

        bb = cfg.model.backbone
        if bb in _RESNET_BACKBONES:
            arch, stages, _ = _RESNET_BACKBONES[bb]
            graft(tower, prefix + ("backbone",), arch, num_stages=stages)
        elif bb in ("vgg16", "alexnet"):
            graft(tower, prefix + ("backbone",), bb)
        elif bb in ("vit", "cct384"):
            node = params[tower]
            for k in prefix + ("backbone",):
                node = node[k]
            n_tokens = node["pos"].shape[1]  # resize PE to this geometry
            graft(tower, prefix + ("backbone",), bb, n_tokens=n_tokens)

    if cfg.model.modelq == "mm":
        graft_fe("mm", ("image_fe",), cfg.model.mm.imgfe,
                 cfg.model.mm.imgfe_layers)
    elif cfg.model.modelq == "geoloc":
        graft_geoloc("mm", ())
    if cfg.model.share_qdb:
        return params, batch_stats  # no db tower
    if cfg.model.db.modeldb == "vanilla2d":
        n_branches = 1 if cfg.model.db.share_dbfe else cfg.data.nmap
        for i in range(n_branches):
            graft_fe("db", (f"fe_{i}",), cfg.model.db.image_fe,
                     cfg.model.db.image_fe_layers)
    elif cfg.model.db.modeldb == "geoloc":
        graft_geoloc("db", ("net",))
    return params, batch_stats


def make_train_step(cfg: Config):
    """Returns ``train_step(state, batch) -> (state, metrics)``, jitted with
    donated state."""
    mm, db = build_models(cfg, train=True)
    tx = _make_tx(cfg)
    loss_cfg = cfg.train.loss
    bs = cfg.train.train_batch_size
    nneg = cfg.train.negs_num_per_query

    def loss_fn(params, batch_stats, batch):
        mm_out, mm_mut = query_apply(
            cfg.model.modelq, mm,
            {"params": params["mm"], "batch_stats": batch_stats["mm"]},
            batch["query_image"], batch["vox"], mutable=True,
        )
        if db is None:  # --share_qdb: query tower embeds the aerial maps
            # start from the query pass's mutated stats so both forwards
            # advance the shared BN running averages sequentially, as one
            # torch model would (query EMA step, then aerial EMA step)
            aerial, db_mut = shared_db_apply(
                cfg.model.modelq, mm,
                {"params": params["mm"],
                 "batch_stats": mm_mut.get("batch_stats",
                                           batch_stats["mm"])},
                batch["db_map"], mutable=True)
        else:
            aerial, db_mut = db.apply(
                {"params": params["db"], "batch_stats": batch_stats["db"]},
                batch["db_map"], mutable=["batch_stats"],
            )  # [B, 1+nneg, C]

        loss = 0.0
        metrics = {}
        if cfg.model.modelq == "mm":
            otherloss = compute_other_loss(
                mm_out, aerial, batch["query_eastnorth"],
                batch["db_eastnorth"], loss_cfg,
                positive_thd=cfg.data.train_positives_dist_threshold,
                negative_thd=cfg.data.val_positive_dist_threshold,
            )
            loss = loss + otherloss
            metrics["otherloss"] = otherloss

        ground = mm_out["embedding"][:, None, :]  # [B, 1, C]
        feats = jnp.concatenate([ground, aerial], axis=1)
        feats = feats.reshape(-1, feats.shape[-1])  # [B*(2+nneg), C]

        if loss_cfg.criterion == "triplet":
            tloss = compute_triplet_loss(feats, batch["triplets_local"], bs,
                                         nneg, loss_cfg.margin)
        elif loss_cfg.criterion == "sare_ind":
            tloss = compute_sare_loss(feats, batch["triplets_local"], bs,
                                      nneg, joint=False)
        elif loss_cfg.criterion == "sare_joint":
            tloss = compute_sare_loss(feats, batch["triplets_local"], bs,
                                      nneg, joint=True)
        else:
            raise NotImplementedError(loss_cfg.criterion)
        loss = loss + tloss * loss_cfg.tripletloss_weight
        metrics["triplet_loss"] = tloss
        metrics["loss"] = loss
        if db is None:
            # shared tower: the aerial pass started from the query pass's
            # mutated stats (above), so db_mut carries BOTH EMA steps
            new_stats = {
                "mm": db_mut.get("batch_stats",
                                 mm_mut.get("batch_stats",
                                            batch_stats["mm"])),
                "db": {},
            }
        else:
            new_stats = {
                "mm": mm_mut.get("batch_stats", batch_stats["mm"]),
                "db": db_mut.get("batch_stats", batch_stats["db"]),
            }
        return loss, (metrics, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def make_infer_fns(cfg: Config):
    """Jitted descriptor extractors for caching/eval (the reference's
    ``model(data_dict, 'db')`` / ``modelq(data_dict, 'q')`` no-grad passes,
    ``test.py:125-176``)."""
    mm, db = build_models(cfg, train=False)

    @jax.jit
    def embed_queries(params, batch_stats, query_image,
                      vox: SparseVoxels) -> jax.Array:
        out, _ = query_apply(
            cfg.model.modelq, mm,
            {"params": params["mm"], "batch_stats": batch_stats["mm"]},
            query_image, vox)
        return out["embedding"]

    @jax.jit
    def embed_db(params, batch_stats, db_map) -> jax.Array:
        # db_map: [B, NMAP, H, W, 3] cache entry -> [B, C]
        if db is None:  # --share_qdb
            out, _ = shared_db_apply(
                cfg.model.modelq, mm,
                {"params": params["mm"], "batch_stats": batch_stats["mm"]},
                db_map)
            return out
        return db.apply(
            {"params": params["db"], "batch_stats": batch_stats["db"]},
            db_map)

    return embed_queries, embed_db
