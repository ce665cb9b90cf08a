"""NetVLAD centroid initialisation from dataset descriptors — the intended
behaviour of ``initialize_netvlad_layer`` at ``/root/reference/train.py:156-161``
+ ``model/aggregation.py:106-140`` (which would crash on the live towers,
SURVEY.md §7.5): sample images, extract backbone patch descriptors, k-means
them (faiss in the reference; the JAX solver here), and set the NetVLAD
centroids + soft-assign conv from the clusters.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from agplace_tpu.models.pooling import NetVLAD
from agplace_tpu.retrieval.kmeans import kmeans


def initialize_netvlad(
    variables: Dict,
    backbone_apply: Callable[[np.ndarray], jax.Array],
    sample_images: np.ndarray,  # [N, H, W, 3]
    clusters_num: int = 64,
    descriptors_per_image: int = 100,
    netvlad_path: str = "aggregation/netvlad",
    seed: int = 0,
    alpha: float = None,
) -> Dict:
    """Returns a new variables dict with the NetVLAD params initialised.

    ``backbone_apply(images) -> [B, H', W', C]`` feature maps;
    ``netvlad_path``: '/'-separated path of the NetVLAD module inside
    ``variables['params']``.
    """
    rng = np.random.default_rng(seed)
    descs = []
    bs = 8
    for s in range(0, len(sample_images), bs):
        fm = np.asarray(backbone_apply(sample_images[s : s + bs]))
        b, h, w, c = fm.shape
        flat = fm.reshape(b, h * w, c)
        # per-descriptor L2 norm then random subsample (aggregation.py:112)
        flat = flat / np.maximum(
            np.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
        for i in range(b):
            take = rng.choice(h * w, size=min(descriptors_per_image, h * w),
                              replace=False)
            descs.append(flat[i, take])
    descs = np.concatenate(descs).astype(np.float32)

    centroids, _ = kmeans(jax.random.PRNGKey(seed), jnp.asarray(descs),
                          clusters_num)
    # walk to the netvlad params and replace
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    node = params
    keys = netvlad_path.split("/")
    for k in keys[:-1]:
        node = node[k]
    # alpha from the descriptor statistics unless pinned — the reference
    # ``init_params`` (``model/aggregation.py:112-125``)
    node[keys[-1]] = NetVLAD.init_from_kmeans(
        node[keys[-1]], np.asarray(centroids), descriptors=descs,
        alpha=alpha)
    out = dict(variables)
    out["params"] = params
    return out


def initialize_netvlad_from_dataset(cfg, variables: Dict, ds, seed: int = 0,
                                    n_images: int = 32,
                                    tower: str = "query") -> Dict:
    """Dataset-driven init for a GeoLocalizationNet tower: sample images
    (queries for the query tower, aerial tiles for the db tower), run the
    tower's own backbone, k-means the descriptors, and set the netvlad/crn
    cluster params.  Called from ``init_state`` when ``aggregation in
    ('netvlad','crn')`` — the reference's intent at ``train.py:156-161``
    (which inits the db model there)."""
    import jax

    from agplace_tpu.data.base import collate_cache_db, collate_cache_q
    from agplace_tpu.models.geoloc import _RESNET_BACKBONES

    rng = np.random.default_rng(seed)
    if tower == "db":
        n = min(n_images, ds.database_num)
        idx = rng.choice(ds.database_num, size=n, replace=False)
        maps = collate_cache_db(ds, list(idx))  # [n, NMAP, H, W, 3]
        images = np.asarray(maps).reshape(-1, *maps.shape[2:])
        # the db GeoLocalizationNet lives under the GeoDB wrapper's 'net'
        prefix = ("net",)
    else:
        n = min(n_images, ds.queries_num)
        idx = rng.choice(ds.queries_num, size=n, replace=False)
        images, _ = collate_cache_q(ds, list(idx), cfg)
        prefix = ()

    def sub(tree):
        for k in prefix:
            tree = tree[k]
        return tree

    backbone = cfg.model.backbone
    bvars = {"params": sub(variables["params"])["backbone"]}
    if "batch_stats" in variables:
        bvars["batch_stats"] = sub(variables["batch_stats"]).get(
            "backbone", {})
    if backbone in _RESNET_BACKBONES:
        from agplace_tpu.models.resnet import ResNetFeatures

        arch, stages, _ = _RESNET_BACKBONES[backbone]
        bb = ResNetFeatures(arch=arch, num_stages=stages)
        apply_fn = jax.jit(lambda im: bb.apply(bvars, im)[0])
    elif backbone == "vgg16":
        from agplace_tpu.models.geoloc import VGG16Features

        bb = VGG16Features()
        apply_fn = jax.jit(lambda im: bb.apply(bvars, im))
    elif backbone == "alexnet":
        from agplace_tpu.models.geoloc import AlexNetFeatures

        bb = AlexNetFeatures()
        apply_fn = jax.jit(lambda im: bb.apply(bvars, im))
    else:
        raise NotImplementedError(
            f"dataset netvlad init for backbone={backbone}")

    agg = cfg.model.aggregation  # 'netvlad' | 'crn' (same param keys)
    path = "/".join(prefix + ("aggregation", agg))
    return initialize_netvlad(
        variables, apply_fn, np.asarray(images),
        clusters_num=cfg.model.netvlad_clusters,
        netvlad_path=path, seed=seed)
