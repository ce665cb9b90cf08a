"""Training losses — behaviour parity with the reference.

* triplet: ``nn.TripletMarginLoss(margin=0.1, p=2, reduction='sum')`` over 10
  triplets per query, normalised by batch*negs (``train.py:51-79,226-227``)
* sare_ind / sare_joint: log-softmax contrastive (``model/functional.py:6-27``)
* otherloss: geo-supervised BCE/MSE/L1 on pairwise feature distances vs. UTM
  distance labels (``compute_other_loss.py``)

Everything is fixed-shape and jit-safe: the triplet indexing uses the same
[B*(2+nneg)] flattened feature layout as the reference
(``train.py:331-332``) with gathered index triples.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from agplace_tpu.config import LossConfig
from agplace_tpu.retrieval.knn import pairwise_l2


def _pairdist(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Row-wise L2 distance with torch's eps-inside-norm semantics."""
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + eps)


def triplet_margin_loss(anchor, positive, negative, margin: float = 0.1):
    """Sum-reduced triplet margin loss (torch parity)."""
    d_pos = _pairdist(anchor, positive)
    d_neg = _pairdist(anchor, negative)
    return jnp.sum(jnp.maximum(d_pos - d_neg + margin, 0.0))


def compute_triplet_loss(features: jax.Array, triplets_local: jax.Array,
                         batch_size: int, negs_num: int,
                         margin: float = 0.1) -> jax.Array:
    """features: [B*(2+nneg), C] flattened (query, pos, negs) per sample;
    triplets_local: [B*negs_num, 3] int32 (q, p, n) indices into features.

    Matches ``compute_loss`` at ``train.py:51-79``: sum over all triplets,
    divided by (batch_size * negs_num).
    """
    t = triplets_local.reshape(batch_size, negs_num, 3)
    q = features[t[..., 0].reshape(-1)]
    p = features[t[..., 1].reshape(-1)]
    n = features[t[..., 2].reshape(-1)]
    loss = triplet_margin_loss(q, p, n, margin)
    return loss / (batch_size * negs_num)


def sare_ind(query, positive, negative):
    """Independent SARE (``model/functional.py:6-15``): -log softmax of
    negated squared distances, positive first.  All inputs [1, C] (or [C])."""
    d_pos = jnp.sum((query - positive) ** 2, axis=-1)
    d_neg = jnp.sum((query - negative) ** 2, axis=-1)
    dist = -jnp.concatenate([jnp.atleast_1d(d_pos), jnp.atleast_1d(d_neg)])
    return -jax.nn.log_softmax(dist)[0]


def sare_joint(query, positive, negatives):
    """Joint SARE over all negatives at once (``model/functional.py:17-26``)."""
    return sare_ind(query, positive, negatives)


def compute_sare_loss(features: jax.Array, triplets_local: jax.Array,
                      batch_size: int, negs_num: int,
                      joint: bool = False) -> jax.Array:
    t = triplets_local.reshape(batch_size, negs_num, 3)
    if joint:
        # one term per query with its 10 negatives together
        def per_query(tq):
            q = features[tq[0, 0]][None]
            p = features[tq[0, 1]][None]
            n = features[tq[:, 2]]
            return sare_joint(q, p, n)

        loss = jnp.sum(jax.vmap(per_query)(t))
    else:
        flat = t.reshape(-1, 3)
        q = features[flat[:, 0]]
        p = features[flat[:, 1]]
        n = features[flat[:, 2]]
        d_pos = jnp.sum((q - p) ** 2, axis=-1)
        d_neg = jnp.sum((q - n) ** 2, axis=-1)
        pair = jnp.stack([-d_pos, -d_neg], axis=-1)
        loss = jnp.sum(-jax.nn.log_softmax(pair, axis=-1)[:, 0])
    return loss / (batch_size * negs_num)


# ---------------------------------------------------------------------------
# geo-supervised "other" loss (compute_other_loss.py)
# ---------------------------------------------------------------------------


def geo_pairwise_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance between UTM eastnorth rows via DIRECT differences.

    The expanded matmul form (``pairwise_l2``) is catastrophically imprecise
    here: UTM northings are ~4e6 m, so fp32 squared norms (~1.6e13) carry an
    absolute error of ~1e6, i.e. distance errors of ~1e3 m — larger than the
    10/25 m supervision thresholds (compute_other_loss.py:21-26).  The
    reference's ``torch.cdist`` subtracts first and is exact to ~mm; this
    matches it.  Caught by the full-model torch oracle
    (tests/test_torch_full_oracle.py)."""
    d = a[:, None, :] - b[None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def compute_bcemat(dist: jax.Array, positive_thd: float,
                   negative_thd: float) -> jax.Array:
    """0 for closer than positive_thd, 1 for farther than negative_thd,
    -1 (masked) in between (``compute_other_loss.py:21-26``)."""
    mat = jnp.full_like(dist, -1.0)
    mat = jnp.where(dist < positive_thd, 0.0, mat)
    mat = jnp.where(dist > negative_thd, 1.0, mat)
    return mat


def _masked_loss(featsdist: jax.Array, bcemat: jax.Array,
                 kind: str) -> jax.Array:
    mask = (bcemat != -1.0).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    target = jnp.where(mask > 0, bcemat, 0.0)
    if kind == "bce":
        # BCEWithLogitsLoss(input=dist, target)
        x = featsdist
        per = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    elif kind == "mse":
        per = (jax.nn.sigmoid(featsdist) - target) ** 2
    elif kind == "l1":
        per = jnp.abs(jax.nn.sigmoid(featsdist) - target)
    else:
        raise NotImplementedError(kind)
    return jnp.sum(per * mask) / n


def compute_other_loss(
    feats_ground: Dict[str, jax.Array],
    feats_aerial_embed: jax.Array,  # [B, NDB, C]
    query_eastnorth: jax.Array,  # [B, 2]
    db_eastnorth: jax.Array,  # [B, NDB, 2]
    cfg: LossConfig,
    positive_thd: float = 10.0,
    negative_thd: float = 25.0,
) -> jax.Array:
    """Four pair-group geo-BCE terms, each weighted by otherloss_weight
    (``compute_other_loss.py:54-113``): A-A on embeddings, and G-(A∪G) on
    embedding / imagevec_org / voxvec_org."""
    g_embed = feats_ground["embedding"]  # [B, C]
    g_image = feats_ground.get("imagevec_org", g_embed)
    g_vox = feats_ground.get("voxvec_org", g_embed)

    b, ndb, c = feats_aerial_embed.shape
    a_embed = feats_aerial_embed.reshape(-1, c)  # [B*NDB, C]
    en_g = query_eastnorth
    en_a = db_eastnorth.reshape(-1, 2)
    en_ag = jnp.concatenate([en_a, en_g], axis=0)

    ag_embed = jnp.concatenate([a_embed, g_embed], axis=0)
    ag_image = jnp.concatenate([a_embed, g_image], axis=0)
    ag_vox = jnp.concatenate([a_embed, g_vox], axis=0)

    d_aa = pairwise_l2(a_embed, a_embed)
    d_g_ag = pairwise_l2(g_embed, ag_embed)
    d_gi_ag = pairwise_l2(g_image, ag_image)
    d_gv_ag = pairwise_l2(g_vox, ag_vox)

    e_aa = geo_pairwise_dist(en_a, en_a)
    e_g_ag = geo_pairwise_dist(en_g, en_ag)

    kind = cfg.otherloss_type
    loss = (
        _masked_loss(d_aa, compute_bcemat(e_aa, positive_thd, negative_thd),
                     kind)
        + _masked_loss(d_g_ag,
                       compute_bcemat(e_g_ag, positive_thd, negative_thd),
                       kind)
        + _masked_loss(d_gi_ag,
                       compute_bcemat(e_g_ag, positive_thd, negative_thd),
                       kind)
        + _masked_loss(d_gv_ag,
                       compute_bcemat(e_g_ag, positive_thd, negative_thd),
                       kind)
    )
    return loss * cfg.otherloss_weight


def infonce_loss(features: jax.Array, triplets_local: jax.Array,
                 batch_size: int, negs_num: int,
                 temperature: float = 0.07) -> jax.Array:
    """InfoNCE over (q, p, negs) groups — wired to ``infonceloss_weight``
    (``tools/options.py:161``, weight 0 by default)."""
    t = triplets_local.reshape(batch_size, negs_num, 3)

    def per_query(tq):
        q = features[tq[0, 0]]
        p = features[tq[0, 1]]
        n = features[tq[:, 2]]
        pos = jnp.dot(q, p) / temperature
        neg = jnp.dot(n, q) / temperature
        logits = jnp.concatenate([pos[None], neg])
        return -jax.nn.log_softmax(logits)[0]

    return jnp.mean(jax.vmap(per_query)(t))
