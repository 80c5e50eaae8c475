from .similarity import (
    cosine_similarity_multi_query,
    cosine_similarity_single_query,
    dot_product,
)
from .topk import (
    ALLOW_ALL,
    scan_topk_pallas,
    scan_topk_pallas_int4,
    scan_topk_pallas_int8,
    scan_topk_pallas_int8t,
)

__all__ = [
    "ALLOW_ALL",
    "cosine_similarity_multi_query",
    "cosine_similarity_single_query",
    "dot_product",
    "scan_topk_pallas",
    "scan_topk_pallas_int4",
    "scan_topk_pallas_int8",
    "scan_topk_pallas_int8t",
]
