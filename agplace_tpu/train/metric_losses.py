"""Batch-hard metric-learning losses with masks — reference
``models/loss.py:27-156`` (MinkLoc lineage; pytorch-metric-learning based).

Jit-native rewrite: where the reference filters rows with data-dependent
``torch.where``, this keeps everything fixed-shape with validity masks —
anchors without a positive or negative simply contribute zero.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agplace_tpu.retrieval.knn import pairwise_l2


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def batch_hard_triplet_loss(
    embeddings: jax.Array,  # [N, C]
    positives_mask: jax.Array,  # [N, N] bool
    negatives_mask: jax.Array,  # [N, N] bool
    margin: float = 0.2,
    normalize_embeddings: bool = True,
    swap: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch-hard mining + triplet margin loss, avg over non-zero triplets
    (pytorch-metric-learning ``AvgNonZeroReducer`` semantics)."""
    x = _normalize(embeddings) if normalize_embeddings else embeddings
    d = pairwise_l2(x, x)  # [N, N]
    big = jnp.float32(1e9)

    # hardest positive (max distance among positives) per anchor
    pos_d = jnp.where(positives_mask, d, -big)
    hardest_pos = jnp.max(pos_d, axis=1)
    hardest_pos_idx = jnp.argmax(pos_d, axis=1)
    has_pos = jnp.any(positives_mask, axis=1)

    # hardest negative (min distance among negatives) per anchor
    neg_d = jnp.where(negatives_mask, d, big)
    hardest_neg = jnp.min(neg_d, axis=1)
    hardest_neg_idx = jnp.argmin(neg_d, axis=1)
    has_neg = jnp.any(negatives_mask, axis=1)

    valid = jnp.logical_and(has_pos, has_neg)
    ap = hardest_pos
    an = hardest_neg
    if swap:
        # distance(positive, negative): if smaller, use it (triplet swap)
        pn = d[hardest_pos_idx, hardest_neg_idx]
        an = jnp.minimum(an, pn)
    per_anchor = jnp.maximum(ap - an + margin, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)
    nonzero = jnp.sum((per_anchor > 0).astype(jnp.float32))
    loss = jnp.sum(per_anchor) / jnp.maximum(nonzero, 1.0)

    stats = {
        "num_triplets": jnp.sum(valid.astype(jnp.int32)),
        "num_non_zero_triplets": nonzero,
        "mean_pos_pair_dist": jnp.mean(jnp.where(valid, hardest_pos, 0.0)),
        "mean_neg_pair_dist": jnp.mean(jnp.where(valid, hardest_neg, 0.0)),
        "max_pos_pair_dist": jnp.max(jnp.where(valid, hardest_pos, -big)),
        "min_neg_pair_dist": jnp.min(jnp.where(valid, hardest_neg, big)),
    }
    return loss, stats


def multi_batch_hard_triplet_loss(
    outputs: Dict[str, jax.Array],
    positives_mask: jax.Array,
    negatives_mask: jax.Array,
    margin: float = 0.2,
    weights: Sequence[float] = (1.0, 0.0, 0.0),
    normalize_embeddings: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-modality weighted batch-hard loss over {embedding,
    cloud_embedding, image_embedding} (``models/loss.py:78-117``)."""
    assert len(weights) == 3
    loss = 0.0
    stats: Dict[str, jax.Array] = {}
    keys = ["embedding", "cloud_embedding", "image_embedding"]
    prefixes = ["final", "cloud", "image"]
    for w, key, prefix in zip(weights, keys, prefixes):
        if outputs.get(key) is None:
            continue
        l, s = batch_hard_triplet_loss(outputs[key], positives_mask,
                                       negatives_mask, margin,
                                       normalize_embeddings)
        stats.update({f"{prefix}_{k}": v for k, v in s.items()})
        if w > 0:
            loss = loss + w * l
    stats["loss"] = loss
    return loss, stats


def masks_from_eastnorth(eastnorth: np.ndarray, positive_thd: float = 10.0,
                         negative_thd: float = 25.0):
    """Build [N, N] positive/negative masks from UTM positions (the batch
    construction the MinkLoc trainers use)."""
    d = np.linalg.norm(eastnorth[:, None] - eastnorth[None], axis=-1)
    eye = np.eye(len(eastnorth), dtype=bool)
    positives = np.logical_and(d < positive_thd, ~eye)
    negatives = d > negative_thd
    return positives, negatives
