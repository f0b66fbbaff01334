"""Differentiable metrics given smooth (expected/approximated) ranks.

Masked counterparts of reference ptranking/metric/smooth_metric/
metric_as_opt_objective.py:12-258: P / AP / nERR / nDCG as maximization
objectives. `smooth_ranks` come from ops (approx_ranks) or expected ranks
under Gaussian uncertainty (models/prob.py). Each returns a scalar LOSS
(negated sum over the batch).

opt_ideal=True scores labels in their given (ideal, presorted) order against
the smooth ranks; opt_ideal=False re-sorts by ascending smooth rank first.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ptranking_tpu.types import LabelType
from ptranking_tpu.ops import gain

_EPS = 1e-12


def _topk_mask(mask: jnp.ndarray, top_k: Optional[int]) -> jnp.ndarray:
    if top_k is None:
        return mask
    n = mask.shape[-1]
    return mask & (jnp.arange(n) < min(top_k, n))[None]


def _resort(smooth_ranks, labels, mask):
    """Ascending smooth rank with pads last; labels follow."""
    key = jnp.where(mask, smooth_ranks, 1e9)
    order = jnp.argsort(key, axis=-1, stable=True)
    return (jnp.take_along_axis(key, order, -1),
            jnp.take_along_axis(jnp.where(mask, labels, 0.0), order, -1),
            jnp.take_along_axis(mask, order, -1))


def precision_as_objective(smooth_ranks, labels, mask, top_k=None,
                           opt_ideal: bool = True, **_):
    """(reference precision_as_opt_objective, metric_as_opt_objective.py:12-73).
    sum_i natural_rank_i / smooth_rank_i * bin_label_i / k, negated."""
    if not opt_ideal:
        smooth_ranks, labels, mask = _resort(smooth_ranks, labels, mask)
    n = labels.shape[-1]
    bins = jnp.clip(labels, 0.0, 1.0)
    natural = jnp.arange(1, n + 1, dtype=labels.dtype)[None]
    sel = _topk_mask(mask, top_k)
    denom = top_k if top_k is not None else jnp.maximum(jnp.sum(mask, -1), 1)
    prec = jnp.sum(jnp.where(sel, natural / jnp.maximum(smooth_ranks, _EPS) * bins, 0.0), -1) / denom
    return -jnp.sum(prec)


def ap_as_objective(smooth_ranks, labels, mask, top_k=None, opt_ideal: bool = True, **_):
    """Smooth AP (reference AP_as_opt_objective, metric_as_opt_objective.py:75-146):
    AP = mean over relevant docs of (# relevant at-or-above / smooth rank)."""
    n = labels.shape[-1]
    natural = jnp.arange(1, n + 1, dtype=labels.dtype)[None]
    if opt_ideal:
        # reference's ADOPTED formulation (metric_as_opt_objective.py:88-92):
        # AP = sum_i cumsum_j<=i(natural_j/smooth_j)/natural_i * bin_i / #rele
        bins = jnp.where(mask, jnp.clip(labels, 0.0, 1.0), 0.0)
        cum = jnp.cumsum(jnp.where(mask, natural / jnp.maximum(smooth_ranks, _EPS), 0.0), -1)
        rankwise_pre = cum / natural
        sel = _topk_mask(mask, top_k)
        terms = jnp.where(sel, rankwise_pre * bins, 0.0)
        denom = jnp.maximum(jnp.sum(jnp.where(sel, bins, 0.0), -1), 1.0)
        return -jnp.sum(jnp.sum(terms, -1) / denom)
    smooth_ranks, labels, mask = _resort(smooth_ranks, labels, mask)
    bins = jnp.where(mask, jnp.clip(labels, 0.0, 1.0), 0.0)
    cum_rele = jnp.cumsum(bins, axis=-1)
    sel = _topk_mask(mask, top_k)
    terms = jnp.where(sel, cum_rele / jnp.maximum(smooth_ranks, _EPS) * bins, 0.0)
    denom = jnp.maximum(jnp.sum(jnp.where(sel, bins, 0.0), -1), 1.0)
    return -jnp.sum(jnp.sum(terms, -1) / denom)


def nerr_as_objective(smooth_ranks, labels, mask, top_k=None, max_label=None,
                      opt_ideal: bool = True, **_):
    """Smooth nERR (reference nERR_as_opt_objective,
    metric_as_opt_objective.py:148-211): cascade ERR with 1/smooth_rank in
    place of 1/position, normalized by the ideal ERR."""
    from ptranking_tpu.metrics.adhoc import rankwise_err

    if max_label is None:
        max_label = jnp.max(jnp.where(mask, labels, 0.0))
    # ideal ERR from the PRESORTED labels, before any resort (reference
    # computes batch_ideal_err from batch_std_labels first,
    # metric_as_opt_objective.py:155-156)
    k = top_k if top_k is not None else labels.shape[-1]
    ideal = rankwise_err(jnp.where(mask, labels, 0.0), max_label)[..., min(k, labels.shape[-1]) - 1]
    if not opt_ideal:
        smooth_ranks, labels, mask = _resort(smooth_ranks, labels, mask)
    labels = jnp.where(mask, labels, 0.0)
    satis = (jnp.power(2.0, labels) - 1.0) / jnp.power(2.0, max_label)
    unsatis = jnp.where(mask, 1.0 - satis, 1.0)
    cum_unsatis = jnp.cumprod(unsatis, axis=-1)
    cascade = jnp.concatenate([jnp.ones_like(cum_unsatis[..., :1]), cum_unsatis[..., :-1]], -1)
    sel = _topk_mask(mask, top_k)
    err = jnp.sum(jnp.where(sel, satis * cascade / jnp.maximum(smooth_ranks, _EPS), 0.0), -1)
    return -jnp.sum(err / jnp.maximum(ideal, _EPS))


def ndcg_as_objective(smooth_ranks, labels, mask, top_k=None,
                      label_type: LabelType = LabelType.MultiLabel,
                      opt_ideal: bool = True, **_):
    """Smooth nDCG (reference nDCG_as_opt_objective,
    metric_as_opt_objective.py:213-258): gains / log2(smooth_rank + 1) / IDCG."""
    n = labels.shape[-1]
    idcg_gains = gain(jnp.where(mask, labels, 0.0), label_type)
    discounts = jnp.log2(jnp.arange(n, dtype=labels.dtype) + 2.0)
    idcg = jnp.maximum(jnp.sum(jnp.where(mask, idcg_gains / discounts, 0.0), -1), _EPS)
    if not opt_ideal:
        smooth_ranks, labels, mask = _resort(smooth_ranks, labels, mask)
    gains = gain(jnp.where(mask, labels, 0.0), label_type)
    sel = _topk_mask(mask, top_k)
    dcg = jnp.sum(jnp.where(sel, gains / jnp.log2(jnp.maximum(smooth_ranks, _EPS) + 1.0), 0.0), -1)
    return -jnp.sum(dcg / idcg)


SMOOTH_OBJECTIVES = {
    "P": precision_as_objective,
    "AP": ap_as_objective,
    "nERR": nerr_as_objective,
    "nDCG": ndcg_as_objective,
}
