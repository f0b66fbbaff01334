"""Masked pairwise primitives for pairwise/listwise losses.

The O(n^2) pairwise score-difference matrix is the hot op of the framework
(reference get_pairwise_comp_probs, ptranking/ltr_adhoc/util/lambda_utils.py:5-23
and get_delta_ndcg, ptranking/metric/metric_utils.py:19-45). On TPU these are
batched rank-1 broadcasts that XLA fuses with the consuming elementwise ops; a
fused Pallas kernel (ops/pallas) avoids materialising [B,N,N] in HBM for large N.
"""

import jax.numpy as jnp

from ptranking_tpu.types import LabelType
from ptranking_tpu.ops.gains import gain


def pairwise_diffs(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, N, N] with out[b, i, j] = x[b, i] - x[b, j]."""
    return x[..., :, None] - x[..., None, :]


def pair_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] bool -> [B, N, N] bool; True where both docs are real."""
    return mask[..., :, None] & mask[..., None, :]


def triu_pair_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Valid strictly-upper-triangular pairs (i < j), both docs real.

    Replaces the reference's torch.triu(..., diagonal=1) selection
    (e.g. ranknet.py:38-40), which is only correct because the reference
    never pads.
    """
    n = mask.shape[-1]
    i = jnp.arange(n)
    upper = i[:, None] < i[None, :]
    return pair_mask(mask) & upper


def pairwise_comp_probs(scores: jnp.ndarray, labels: jnp.ndarray, sigma: float = 1.0):
    """Predicted and target probabilities that doc i beats doc j.

    p_ij = sigmoid(sigma * (s_i - s_j)); std_p_ij = (1 + clamp(l_i - l_j, -1, 1)) / 2.
    Mirrors reference get_pairwise_comp_probs (lambda_utils.py:5-23). Callers must
    apply a pair mask — padded entries produce garbage values here by design
    (keeping this fn fusible instead of branching).
    """
    import jax

    p_ij = jax.nn.sigmoid(sigma * pairwise_diffs(scores))
    s_ij = jnp.clip(pairwise_diffs(labels), -1.0, 1.0)
    std_p_ij = 0.5 * (1.0 + s_ij)
    return p_ij, std_p_ij


def delta_ndcg(
    ideal_labels: jnp.ndarray,
    pred_sorted_labels: jnp.ndarray,
    mask: jnp.ndarray,
    label_type: LabelType = LabelType.MultiLabel,
) -> jnp.ndarray:
    """|Delta nDCG| of swapping each pair of the predicted ranking.

    delta[b, i, j] = |g_i - g_j| / IDCG * |1/log2(i+2) - 1/log2(j+2)|.
    Mirrors reference get_delta_ndcg (metric_utils.py:19-45); masked so that
    padded documents contribute zero weight.

    ideal_labels: [B, N] labels sorted descending (ideal ranking, pads last)
    pred_sorted_labels: [B, N] labels sorted by predicted score (pads last)
    mask: [B, N]
    """
    n = ideal_labels.shape[-1]
    gains = gain(jnp.where(mask, ideal_labels, 0.0), label_type)
    discounts = 1.0 / jnp.log2(jnp.arange(n, dtype=ideal_labels.dtype) + 2.0)
    idcg = jnp.sum(gains * discounts * mask, axis=-1, keepdims=True)  # [B, 1]
    idcg = jnp.maximum(idcg, 1e-12)

    pred_gains = gain(jnp.where(mask, pred_sorted_labels, 0.0), label_type)
    n_gains = pred_gains / idcg  # [B, N]

    ng_diffs = jnp.abs(pairwise_diffs(n_gains))
    dist_diffs = jnp.abs(discounts[:, None] - discounts[None, :])  # [N, N]
    delta = ng_diffs * dist_diffs[None, :, :]
    return jnp.where(pair_mask(mask), delta, 0.0)
