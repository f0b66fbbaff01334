"""Batched, masked adhoc IR metrics: P@k, AP@k, (n)ERR@k, (n)DCG@k, Kendall tau.

Numerics mirror reference ptranking/metric/adhoc/adhoc_metric.py exactly,
including its quirks:
  * AP's denominator is the cumulative sum of the RAW ideal labels, not the
    binarised ones (adhoc_metric.py:86) — graded labels inflate the denominator.
  * ERR's satisfaction probability normalises by 2^max_label where max_label
    defaults to the max over the whole batch of ideal rankings
    (adhoc_metric.py:158,177).
  * `*_at_ks` report 0.0 for any cutoff k exceeding the list length
    (adhoc_metric.py:57-60,118-121,186-189,255-258). With padded lists the rule
    becomes: 0.0 whenever k exceeds the number of REAL documents.

All functions take labels already sorted into predicted / ideal order with pads
(label 0) at the tail — see ops/sorting.py — plus `n`, the per-query count of
real documents. Everything is jit-safe with static `ks`.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ptranking_tpu.types import LabelType
from ptranking_tpu.ops.gains import gain

_EPS = 1e-12


def _ranks(n_pos: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.arange(1, n_pos + 1, dtype=dtype)


def _take_at_ks(rankwise: jnp.ndarray, n: jnp.ndarray, ks: Sequence[int]) -> jnp.ndarray:
    """Gather rankwise[:, k-1] for each k, zeroing entries where k > n."""
    n_pos = rankwise.shape[-1]
    idx = jnp.asarray([min(k, n_pos) - 1 for k in ks], dtype=jnp.int32)
    vals = rankwise[:, idx]  # [B, K]
    valid = jnp.asarray(ks)[None, :] <= n[:, None]
    return jnp.where(valid, vals, 0.0)


def _rankwise_precision(pred_sorted_labels: jnp.ndarray) -> jnp.ndarray:
    bins = jnp.clip(pred_sorted_labels, 0.0, 1.0)
    cum = jnp.cumsum(bins, axis=-1)
    return cum / _ranks(pred_sorted_labels.shape[-1], pred_sorted_labels.dtype)


def precision_at_ks(pred_sorted_labels, n, ks) -> jnp.ndarray:
    """P@ks (reference torch_precision_at_ks, adhoc_metric.py:36-62)."""
    return _take_at_ks(_rankwise_precision(pred_sorted_labels), n, ks)


def ap_at_ks(pred_sorted_labels, ideal_sorted_labels, n, ks) -> jnp.ndarray:
    """AP@ks (reference torch_ap_at_ks, adhoc_metric.py:91-123)."""
    bins = jnp.clip(pred_sorted_labels, 0.0, 1.0)
    rank_prec = _rankwise_precision(pred_sorted_labels)
    cum_prec = jnp.cumsum(rank_prec * bins, axis=-1)
    denom = jnp.cumsum(ideal_sorted_labels, axis=-1)  # RAW labels, per reference
    rankwise_ap = cum_prec / jnp.maximum(denom, _EPS)
    return _take_at_ks(rankwise_ap, n, ks)


def rankwise_err(
    sorted_labels: jnp.ndarray, max_label: jnp.ndarray, point: bool = False
) -> jnp.ndarray:
    """Cascade-model ERR per rank position (reference torch_rankwise_err,
    adhoc_metric.py:127-151). Padded labels (0) have satisfaction prob 0 and
    leave the cascade untouched, so padding at the tail is harmless.
    """
    n_pos = sorted_labels.shape[-1]
    satis = (jnp.power(2.0, sorted_labels) - 1.0) / jnp.power(2.0, max_label)
    unsatis = 1.0 - satis
    cum_unsatis = jnp.cumprod(unsatis, axis=-1)
    # probability of reaching position i = prod of unsatis over positions < i
    cascade = jnp.concatenate(
        [jnp.ones_like(cum_unsatis[..., :1]), cum_unsatis[..., : n_pos - 1]], axis=-1
    )
    expt = satis * cascade / _ranks(n_pos, sorted_labels.dtype)
    out = jnp.cumsum(expt, axis=-1)
    if point:
        return out[..., -1:]
    return out


def nerr_at_ks(
    pred_sorted_labels, ideal_sorted_labels, n, ks, max_label: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """nERR@ks (reference torch_nerr_at_ks, adhoc_metric.py:166-193)."""
    if max_label is None:
        max_label = jnp.max(ideal_sorted_labels)  # batch-global, per reference
    max_label = jnp.asarray(max_label, pred_sorted_labels.dtype)
    sys_err = rankwise_err(pred_sorted_labels, max_label)
    ideal_err = rankwise_err(ideal_sorted_labels, max_label)
    rankwise_nerr = sys_err / jnp.maximum(ideal_err, _EPS)
    return _take_at_ks(rankwise_nerr, n, ks)


def dcg(
    sorted_labels: jnp.ndarray,
    label_type: LabelType = LabelType.MultiLabel,
    cumulative: bool = True,
) -> jnp.ndarray:
    """(Cumulative) DCG per position with gain/log2 discounts
    (reference torch_dcg_at_ks, adhoc_metric.py:219-235)."""
    n_pos = sorted_labels.shape[-1]
    gains = gain(sorted_labels, label_type)
    discounts = jnp.log2(jnp.arange(n_pos, dtype=sorted_labels.dtype) + 2.0)
    terms = gains / discounts
    if cumulative:
        return jnp.cumsum(terms, axis=-1)
    return jnp.sum(terms, axis=-1, keepdims=True)


def ndcg_at_ks(
    pred_sorted_labels,
    ideal_sorted_labels,
    n,
    ks,
    label_type: LabelType = LabelType.MultiLabel,
) -> jnp.ndarray:
    """nDCG@ks (reference torch_ndcg_at_ks, adhoc_metric.py:243-260)."""
    sys_dcg = dcg(pred_sorted_labels, label_type)
    ideal_dcg = dcg(ideal_sorted_labels, label_type)
    rankwise_ndcg = sys_dcg / jnp.maximum(ideal_dcg, _EPS)
    return _take_at_ks(rankwise_ndcg, n, ks)


def kendall_tau(sys_ranking: jnp.ndarray, natural_ascending_as_reference: bool = True):
    """Kendall tau by inversion counting on a 1-D ranking
    (reference torch_kendall_tau, adhoc_metric.py:265-293). Ties not handled."""
    assert sys_ranking.ndim == 1
    n = sys_ranking.shape[0]
    diffs = sys_ranking[:, None] - sys_ranking[None, :]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    if natural_ascending_as_reference:
        concordant = jnp.where(upper, jnp.clip(diffs, 0.0, 1.0), 0.0)
        return 1.0 - 4.0 * jnp.sum(concordant) / (n * (n - 1))
    discordant = jnp.where(upper, jnp.clip(diffs, -1.0, 0.0), 0.0)
    return 1.0 + 4.0 * jnp.sum(discordant) / (n * (n - 1))


def evaluate_all_at_ks(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    ks: Tuple[int, ...],
    label_type: LabelType = LabelType.MultiLabel,
    max_label: Optional[jnp.ndarray] = None,
):
    """One fused pass computing nDCG/nERR/AP/P @ks from raw scores.

    Replaces the reference's adhoc_performance_at_ks device->host loop
    (reference base/ranker.py:202-268): sort, gather and all four metric
    families stay on-chip; only [B, K] scalars leave the device.

    Returns dict of [B, len(ks)] arrays plus "n" = real-doc counts [B].
    """
    from ptranking_tpu.ops.sorting import sort_labels_by_scores, ideal_sorted_labels as ideal_fn

    _, pred_sorted, _ = sort_labels_by_scores(scores, labels, mask)
    ideal_sorted = ideal_fn(labels, mask)
    n = jnp.sum(mask, axis=-1)
    return {
        "nDCG": ndcg_at_ks(pred_sorted, ideal_sorted, n, ks, label_type),
        "nERR": nerr_at_ks(pred_sorted, ideal_sorted, n, ks, max_label=max_label),
        "AP": ap_at_ks(pred_sorted, ideal_sorted, n, ks),
        "P": precision_at_ks(pred_sorted, n, ks),
        "n": n,
    }
