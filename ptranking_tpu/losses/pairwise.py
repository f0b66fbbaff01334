"""Pairwise losses (RankNet family).

All BCE terms are computed from logits via softplus — numerically stable where
the reference clamps probabilities (reference ranknet.py:36-40 feeds sigmoids
into F.binary_cross_entropy).
"""

import jax
import jax.numpy as jnp

from ptranking_tpu.ops import pairwise_diffs, triu_pair_mask


def _pair_bce_from_logits(logits, targets):
    """BCE(sigmoid(x), t) = softplus(x) - t*x, elementwise."""
    return jax.nn.softplus(logits) - targets * logits


def ranknet(scores, labels, mask, sigma: float = 1.0, use_pallas: bool = False, **_):
    """Pairwise logistic loss over valid i<j pairs, summed.

    Mirrors reference RankNet.custom_loss_function
    (ptranking/ltr_adhoc/pairwise/ranknet.py:25-50): p_ij = sigmoid(sigma*(s_i-s_j)),
    target (1 + clamp(l_i-l_j, -1, 1))/2, BCE on the strict upper triangle.
    use_pallas routes through the fused tiled kernel (ops/pallas/pairwise.py).
    """
    if use_pallas:
        from ptranking_tpu.ops.pallas import ranknet_pallas

        return ranknet_pallas(scores, labels, mask, sigma=sigma)
    logits = sigma * pairwise_diffs(scores)
    targets = 0.5 * (1.0 + jnp.clip(pairwise_diffs(labels), -1.0, 1.0))
    bce = _pair_bce_from_logits(logits, targets)
    return jnp.sum(jnp.where(triu_pair_mask(mask), bce, 0.0))
