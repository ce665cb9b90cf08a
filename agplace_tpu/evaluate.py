"""Evaluation — reference ``test.py:89-189`` rebuilt on the TPU retrieval
engine: batched jitted descriptor extraction for database then queries,
matmul-L2 top-k (faiss replacement), Recall@N against the radius ground
truth.  Supports the reference's test methods including five_crops /
nearest_crop / maj_voting post-processing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agplace_tpu.config import Config
from agplace_tpu.data.base import PlaceDataset
from agplace_tpu.embed import (
    batched_embed_db,
    batched_embed_q,
    batched_embed_q_crops,
)
from agplace_tpu.retrieval.knn import l2_topk_blocked
from agplace_tpu.retrieval.recall import (
    compute_recalls,
    dedup_nearest_crop,
    maj_voting_merge,
)


def _topk(q_feats, db_feats, k: int, gallery_mesh=None):
    """Exact L2 top-k: mesh-sharded over the ``gallery`` axis when a
    multi-device gallery mesh is given (BASELINE config 5: 100k+ tiles),
    single-device blocked matmul otherwise."""
    if gallery_mesh is not None and gallery_mesh.shape.get("gallery", 1) > 1:
        from agplace_tpu.retrieval.sharded import (
            shard_gallery,
            sharded_l2_topk,
        )

        db_sh = shard_gallery(gallery_mesh, db_feats)
        d, i = sharded_l2_topk(gallery_mesh,
                               jnp.asarray(np.asarray(q_feats)), db_sh, k,
                               n_rows=len(db_feats))
        return np.asarray(d), np.asarray(i)
    d, i = l2_topk_blocked(q_feats, jnp.asarray(db_feats), k)
    return np.asarray(d), np.asarray(i)


def extract_features(
    cfg: Config,
    ds: PlaceDataset,
    params,
    batch_stats,
    embed_queries,
    embed_db,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Database-then-queries descriptor extraction with fixed-shape batches
    (final batch padded, mirroring the reference's two DataLoader passes).
    ``mesh``: optional data mesh — embed batches shard over its data axis."""
    bs = cfg.train.infer_batch_size

    db_feats = batched_embed_db(ds, list(range(ds.database_num)), embed_db,
                                params, batch_stats, bs, mesh=mesh)

    crop_methods = ("five_crops", "nearest_crop", "maj_voting")
    use_crops = cfg.eval.test_method in crop_methods
    if use_crops and not hasattr(ds, "load_query_crops"):
        # a silent single-descriptor fallback would feed [Q, C] rows into
        # evaluate_features' 5-crop reshapes — garbage recalls or a shape
        # error far from the cause
        raise ValueError(
            f"test_method {cfg.eval.test_method!r} needs a dataset with "
            f"load_query_crops; {type(ds).__name__} has none")
    if use_crops:
        # 5 descriptors per query, crop-major rows (test.py:159-172)
        q_feats = batched_embed_q_crops(ds, list(range(ds.queries_num)),
                                        embed_queries, params, batch_stats,
                                        bs, cfg, mesh=mesh)
    elif cfg.eval.test_method == "single_query":
        # ragged original-resolution queries: batch 1, like the reference's
        # queries_infer_batch_size=1 (test.py:141).  XLA compiles once per
        # unique image shape, so the storm is capped (VERDICT r3 item 7):
        # the first ``cfg.eval.max_query_shapes`` distinct shapes embed
        # exactly; any NEW shape after that is bilinearly resized to the
        # compiled shape of nearest aspect/area — the reference's own
        # hard_resize semantics applied to the tail — with one warning.
        # (Zero-padding instead would NOT be exact: pad cells pick up BN
        # bias through the convs and pollute the global GeM pool.)
        import logging

        from agplace_tpu.data.base import prepare_query_vox

        cap = max(1, cfg.eval.max_query_shapes)
        compiled: list = []  # (h, w) in first-appearance order
        warned = False
        feats = []
        for i in range(ds.queries_num):
            img = ds.load_query_image(i)
            shape = img.shape[:2]
            if shape not in compiled and len(compiled) < cap:
                compiled.append(shape)
            if shape not in compiled:
                if not warned:
                    warned = True
                    logging.warning(
                        "single_query: over %d distinct query shapes; "
                        "further new shapes are hard-resized into compiled "
                        "buckets (raise eval.max_query_shapes to compile "
                        "more)", cap)
                bh, bw = min(compiled, key=lambda s: abs(
                    np.log(shape[0] / s[0])) + abs(
                    np.log(shape[1] / s[1])))
                with jax.default_device(jax.devices("cpu")[0]):
                    img = np.asarray(jax.image.resize(
                        jnp.asarray(img), (bh, bw, img.shape[2]),
                        method="bilinear"))
            vox = prepare_query_vox(cfg, ds.load_query_points(i)[None])
            feats.append(np.asarray(
                embed_queries(params, batch_stats, jnp.asarray(img[None]),
                              vox)))
        q_feats = np.concatenate(feats)
    else:
        q_feats = batched_embed_q(ds, list(range(ds.queries_num)),
                                  embed_queries, params, batch_stats, bs,
                                  cfg, mesh=mesh)
    return q_feats, db_feats


def evaluate(
    cfg: Config,
    ds: PlaceDataset,
    params,
    batch_stats,
    embed_queries,
    embed_db,
    pca=None,
    mesh=None,
    gallery_mesh=None,
) -> Tuple[np.ndarray, str]:
    """Returns (recalls, recalls_str) — ``test.test`` equivalent.  With
    meshes, the embed passes run data-parallel and the retrieval runs
    gallery-sharded."""
    q_feats, db_feats = extract_features(cfg, ds, params, batch_stats,
                                         embed_queries, embed_db, mesh=mesh)
    if pca is None and cfg.eval.pca_dim:
        # --pca_dim with no prefit PCA: fit on the database descriptors
        # (up to 2^14 sampled rows, util.py:65-78 semantics) then reduce
        # both sides — the reference's fit path is dead as shipped
        # (util.py:70 imports a commented-out dataset), so this implements
        # the intended behaviour of ``test.py:104-107``'s pca.transform.
        from agplace_tpu.utils.pca import compute_pca

        pca = compute_pca(db_feats, cfg.eval.pca_dim, seed=cfg.train.seed)
    if pca is not None:
        q_feats = pca.transform(q_feats).astype(np.float32)
        db_feats = pca.transform(db_feats).astype(np.float32)
    return evaluate_features(cfg, ds, q_feats, db_feats,
                             gallery_mesh=gallery_mesh)


def evaluate_features(
    cfg: Config,
    ds: PlaceDataset,
    q_feats: np.ndarray,
    db_feats: np.ndarray,
    test_method: Optional[str] = None,
    gallery_mesh=None,
) -> Tuple[np.ndarray, str]:
    """compute_recall equivalent (``test.py:24-84``), including the crop
    post-processing paths.  For five_crops the caller passes 5*Q query rows
    (crop-major), matching ``test.py:159-172``."""
    method = test_method or cfg.eval.test_method
    k = max(cfg.eval.recall_values)

    if method in ("nearest_crop", "maj_voting"):
        if k > 20:
            # the reference reshapes its faiss search to (Q, 20*5)
            # (test.py:35-36), which requires max(recall_values) == 20;
            # recall values past the 20-deep crop merge would silently
            # report R@20 — refuse loudly instead (the reference crashes
            # on the reshape)
            raise ValueError(
                f"{method} supports recall values up to 20 (test.py:35-71 "
                f"20-prediction merge); got {cfg.eval.recall_values}")
        d, i = _topk(q_feats, db_feats, 20, gallery_mesh)
        d = d.reshape(ds.queries_num, 5 * 20)
        i = i.reshape(ds.queries_num, 5 * 20)
        if method == "nearest_crop":
            preds = dedup_nearest_crop(d, i, keep=20)
        else:
            preds = maj_voting_merge(d.reshape(-1, 5, 20).copy(),
                                     i.reshape(-1, 5, 20).copy(),
                                     cfg.eval.majority_weight, keep=20)
    else:
        if method == "five_crops":
            # mean across the 5 crop descriptors per query
            q_feats = q_feats.reshape(ds.queries_num, 5, -1).mean(axis=1)
        _, preds = _topk(q_feats, db_feats, k, gallery_mesh)

    return compute_recalls(preds, ds.soft_positives_per_query,
                           cfg.eval.recall_values)
