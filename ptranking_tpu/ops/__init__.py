"""Masked ranking primitives — the shared compute vocabulary of the framework."""

from ptranking_tpu.ops.sigmoid import robust_sigmoid, vanilla_sigmoid
from ptranking_tpu.ops.pairwise import (
    pairwise_diffs,
    pair_mask,
    triu_pair_mask,
    pairwise_comp_probs,
    delta_ndcg,
)
from ptranking_tpu.ops.sorting import (
    mask_scores,
    sort_labels_by_scores,
    ideal_sorted_labels,
    shuffle_ties_argsort,
)
from ptranking_tpu.ops.cumulative import logcumsumexp_reverse
from ptranking_tpu.ops.gains import gain, masked_softmax, masked_log_softmax

__all__ = [
    "robust_sigmoid",
    "vanilla_sigmoid",
    "pairwise_diffs",
    "pair_mask",
    "triu_pair_mask",
    "pairwise_comp_probs",
    "delta_ndcg",
    "mask_scores",
    "sort_labels_by_scores",
    "ideal_sorted_labels",
    "shuffle_ties_argsort",
    "logcumsumexp_reverse",
    "gain",
    "masked_softmax",
    "masked_log_softmax",
]
