from agplace_tpu.retrieval.knn import (
    ip_topk,
    l2_topk,
    l2_topk_blocked,
    pairwise_l2,
    pairwise_sq_l2,
    radius_neighbors,
)
from agplace_tpu.retrieval.recall import compute_recalls
