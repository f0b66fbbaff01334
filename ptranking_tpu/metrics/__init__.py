"""On-device IR metrics (masked, batched, jit-safe)."""

from ptranking_tpu.metrics.adhoc import (
    precision_at_ks,
    ap_at_ks,
    nerr_at_ks,
    ndcg_at_ks,
    dcg,
    rankwise_err,
    kendall_tau,
    evaluate_all_at_ks,
)

__all__ = [
    "precision_at_ks",
    "ap_at_ks",
    "nerr_at_ks",
    "ndcg_at_ks",
    "dcg",
    "rankwise_err",
    "kendall_tau",
    "evaluate_all_at_ks",
]
